package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType,
  DateType, IntegerType, LongType, ShortType, StringType, StructType}

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

/**
 * A key-sorted parquet table committed through a FILE-LIST manifest — the
 * lakehouse table-format design (Delta/Iceberg) reduced to its minimum so
 * that point mutations do not rewrite the table.
 *
 * Why [[Tables.compactSorted]]'s versioned DIRECTORY is not enough: a
 * directory-level version can only swap the whole component, so any
 * mutation — however small — costs a full rewrite. At 100 TB, an upsert
 * batch touching 0.1 % of the key space must rewrite ~0.1 % of the files,
 * not 100 % of the bytes. That requires the committed unit to be a LIST OF
 * FILES (untouched files stay in place by reference) plus per-file key
 * stats (so the writer knows which files a batch touches without reading
 * them).
 *
 * CONCURRENCY: commits are OPTIMISTIC. Every commit claims the next
 * version by atomic rename; a loser re-reads the winner's manifest and
 * either REBASES (commits its already-written files on top, iff the
 * winner's commit is file- and key-range-disjoint from its own batch —
 * the common CDC-ingest-racing-other-ingest case) or RE-DRIVES the whole
 * operation against the new state (overlapping keys, compactions, schema
 * changes — a compaction conflicts with everything), bounded by
 * `maxRetries`, then fails loudly. Retention never deletes a FRESH
 * unreferenced data file (orphan grace period,
 * `graft.manifest.orphanGraceMs`), so a winner's sweep cannot destroy
 * files a concurrent loser is about to rebase-commit; abandoned attempt
 * dirs become sweepable once the grace elapses.
 *
 * Layout under `path/`:
 * {{{
 *   data/txn-<N>/part-*.parquet   files written by transaction N
 *   manifest-<N>                  commit N: header + one line per live file
 * }}}
 *
 * The manifest is a small UTF-8 text file: the table schema, the merge-key
 * column, and for every live data file its relative path, row count, and
 * the key's min/max AS WRITTEN (computed by a column-pruned pass over just
 * the new batch at write time — never a table scan). Commit is atomic:
 * write `manifest-<N>.tmp`, then rename to `manifest-<N>` — rename fails
 * if the version already exists, so a concurrent second writer can never
 * silently replace the first commit; it loses the claim and enters the
 * optimistic rebase/retry protocol below. Readers list `manifest-*`,
 * take the highest N, and read exactly
 * the files it names — a crashed transaction's `data/txn-*` orphan is
 * invisible because no manifest references it, and the retried
 * transaction overwrites it.
 *
 * COPY-ON-WRITE MERGE ([[merge]]/[[deleteKeys]]): the update batch's
 * distinct keys are range-joined against the per-file [min,max] intervals
 * (file-count-sized, broadcast), yielding the TOUCHED file set; only those
 * files are read (anti-join out the updated keys) and rewritten together
 * with the new rows; the new manifest carries the untouched entries
 * FORWARD BY REFERENCE. Retention keeps the last `retain` versions' files
 * fully readable (configurable per table, default 2 = current + one
 * superseded; a reader that resolved an in-window version keeps its
 * files; only a reader spanning the whole window can break — the
 * table-format snapshot-expiry contract, same as [[Tables.compactSorted]])
 * and [[readAt]] gives time travel across that window.
 *
 * Scale notes: the manifest is driver-side and file-count-sized — at
 * petabyte scale a production format shards it (manifest lists); the
 * mechanism here is the same, single-level. Measured operating bound
 * (ManifestScaleSpec, 10,000 entries with one secondary stats column,
 * warm JVM): manifest ≈ 0.76 MB, write ≈ 66 ms, parse ≈ 68 ms,
 * interval-cut (one small Spark job) ≈ 0.7 s — all O(file count), so
 * ~10⁵ files (≈ 10 MB manifest, sub-second driver parse) is the
 * practical single-level ceiling before manifest-list sharding is the
 * right design. Successive merges add txn
 * files whose ranges overlap older ones, degrading the touch-set bound
 * toward "all files" — [[compactTable]] restores globally disjoint
 * per-file ranges, exactly like the LSM index compactions. Merge keys
 * must be non-null (enforced loudly) and of a type whose string round-trip
 * is exact — integral and string keys are; the key comparison itself runs
 * IN SPARK (the stored min/max are cast back to the key's type before the
 * range join), so ordering semantics are Spark's own, not the JVM's.
 */
object ManifestTable {

  /** A file's DELETION VECTOR reference: `dvRel` is the table-relative
    * path of a parquet sidecar dir holding the file's dead keys
    * (columns `__f` = data-file relPath, `__k` = key), `dead` the
    * TOTAL dead rows of this file recorded there — so the entry's
    * `rows` stays the LIVE count and physical rows = rows + dead.
    * Several entries may share one sidecar (one per commit); reads
    * scope the anti-join to each entry's own rows by file name. */
  case class DvRef(dvRel: String, dead: Long)

  /** One live data file: path relative to the table root, its LIVE row
    * count (physical rows minus any deletion-vector dead rows), the
    * merge key's min/max within it (string-encoded; None only for a
    * zero-row file; CONSERVATIVE bounds once a deletion vector shrinks
    * the live set — pruning and touch sets only need a superset),
    * optional SECONDARY per-column stats (col → (min, max), nulls
    * ignored) for manifest-level file pruning on non-key predicates
    * ([[prunedRead]]), and the optional deletion-vector reference. */
  case class FileEntry(relPath: String, rows: Long,
                       min: Option[String], max: Option[String],
                       extra: Map[String, (String, String)] = Map.empty,
                       dv: Option[DvRef] = None)

  /** `tag` is consumer-owned metadata committed ATOMICALLY with the data
    * (one manifest rename): incremental consumers (the mirror, the agg
    * view) store their "applied up to source version N" cursor here, so
    * the cursor can never disagree with the data it describes — a
    * separate cursor file always leaves a crash window between data
    * apply and cursor advance. `zCols` records the PHYSICAL LAYOUT
    * (Some = Morton curve on the pair, None = key-sorted) so
    * maintenance can preserve it — compaction must not silently rewrite
    * a Z table key-sorted. `retain` is the retention window in VERSIONS
    * (current + retain−1 superseded stay fully readable — time travel
    * reaches back retain−1 hops, and a change-feed consumer may lag up
    * to retain−1 source commits before it must re-bootstrap); it is
    * table metadata, carried by every commit, so all writers of a table
    * honor one window. */
  case class Manifest(version: Long, keyCol: String, keyType: DataType,
                      schema: StructType, statsCols: Seq[String],
                      entries: Seq[FileEntry], tag: Option[String] = None,
                      zCols: Option[(String, String)] = None,
                      retain: Int = 2, op: String = "unknown",
                      commitTs: Long = 0L,
                      partCols: Seq[String] = Seq.empty,
                      constraints: Seq[(String, String)] = Seq.empty,
                      colMap: Seq[(String, String)] = Seq.empty,
                      retiredPhys: Seq[String] = Seq.empty)

  /** COLUMN MAPPING (Delta column-mapping / Iceberg schema-evolution
    * parity): the manifest `schema` holds LOGICAL names — what readers
    * and writers see — while data files on disk hold PHYSICAL names
    * that NEVER change once written. `colMap` records the non-identity
    * logical→physical pairs (empty for a table never renamed: physical
    * = logical, zero overhead on that hot path), so
    * [[renameColumn]]/[[dropColumn]] are METADATA-ONLY commits — at
    * 100 TB, renaming or dropping a column costs one manifest write,
    * zero data files. `retiredPhys` lists physical names of DROPPED
    * columns: old files still hold their bytes, so a later
    * [[evolveSchema]] must never hand that physical name to a new
    * logical column (the stale values would resurrect) — it assigns a
    * fresh suffixed physical name instead. Every scan reads files with
    * the physical schema and projects to logical at the boundary;
    * every write projects logical→physical just before the parquet
    * writer. Manifest-level stats (`statsCols`, per-entry `extra`,
    * key min/max) stay keyed by the manifest's own LOGICAL names —
    * values are name-independent, and a rename commit rewrites the
    * stats keys along with the schema. */
  private[io] def physNameOf(colMap: Seq[(String, String)],
                             logical: String): String = {
    var i = 0
    while (i < colMap.length) {
      if (colMap(i)._1 == logical) return colMap(i)._2
      i += 1
    }
    logical
  }

  private[io] def physSchemaOf(colMap: Seq[(String, String)],
                               schema: StructType): StructType =
    if (colMap.isEmpty) schema
    else StructType(schema.fields.map(f =>
      f.copy(name = physNameOf(colMap, f.name))))

  /** Project a LOGICAL-named frame to PHYSICAL names in schema order —
    * the write-boundary step. Identity-mapped tables skip the extra
    * projection node entirely. */
  private def toPhysical(colMap: Seq[(String, String)], schema: StructType,
                         df: DataFrame): DataFrame =
    if (colMap.isEmpty) df
    else df.select(schema.fields.map(f =>
      col(f.name).as(physNameOf(colMap, f.name))): _*)

  /** The logical-side projection over a PHYSICAL-named scan. */
  private def toLogical(colMap: Seq[(String, String)], schema: StructType,
                        df: DataFrame): DataFrame =
    if (colMap.isEmpty) df
    else df.select(schema.fields.map(f =>
      col(physNameOf(colMap, f.name)).as(f.name)): _*)

  /** The atomic version claim was lost to a concurrent committer — the
    * retryable conflict signal ([[rewrite]] rebases or re-drives on it;
    * after bounded retries it surfaces as the final failure's cause). */
  final class ConcurrentCommitException(msg: String)
    extends IllegalStateException(msg)

  /** TEST-ONLY injection point: invoked between an attempt's data write
    * and its manifest commit, so a spec can deterministically land a
    * competing commit inside the race window. Never set outside tests. */
  private[io] var commitFence: () => Unit = () => ()

  /** JVM-wide per-table-path commit locks. The version claim below is
    * exists-check + rename; rename-fails-if-destination-exists holds on
    * HDFS (a true atomic claim) but NOT on POSIX local filesystems
    * (java.io.File#renameTo silently replaces), so two in-JVM writers
    * racing the same version could both pass the exists check and the
    * later rename would silently swallow the earlier commit. This lock
    * closes that TOCTOU window for every writer in the same JVM — the
    * scenario single-driver deployments and tests actually hit.
    * Cross-PROCESS multi-writer safety additionally requires a
    * filesystem whose rename fails on an existing destination (HDFS) —
    * the same atomic-vs-best-effort LogStore split production table
    * formats make for object stores. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  // the key is FILESYSTEM-QUALIFIED: two in-JVM writers addressing the
  // same table via different spellings ("/t" vs "file:/t", or a relative
  // path) must take the SAME lock, or the TOCTOU window reopens exactly
  // for the racing-writer case the lock exists to close
  private def commitLock(fs: org.apache.hadoop.fs.FileSystem,
                         path: String): Object =
    commitLocks.computeIfAbsent(
      fs.makeQualified(new Path(path)).toString, _ => new Object)

  /** What a copy-on-write commit did — the evidence that skipping worked:
    * `filesRewritten` (touched, read + rewritten) vs `filesCarried`
    * (untouched, forwarded by reference, zero bytes moved). */
  case class MergeStats(version: Long, filesBefore: Int, filesRewritten: Int,
                        filesWritten: Int, filesCarried: Int)

  private def enc(s: String) = URLEncoder.encode(s, UTF_8)
  private def dec(s: String) = URLDecoder.decode(s, UTF_8)

  /** The documented merge-key contract, ENFORCED: the key's min/max are
    * stored string-encoded and cast back for the touch-set range join, so
    * the key type must round-trip exactly through a string cast. Integral
    * and string types do; binary keys mangle (non-UTF8 bytes), floating
    * keys break on NaN (fails every range predicate, so the covering file
    * is silently missed and a merge INSERTS a duplicate instead of
    * replacing — silent corruption). Refuse loudly at create time. */
  private def requireMergeableKeyType(keyCol: String, dt: DataType): Unit = {
    import org.apache.spark.sql.types._
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    require(ok, s"merge key '$keyCol' has type ${dt.simpleString}; only " +
      "integral and string keys round-trip exactly through the manifest's " +
      "string-encoded min/max (binary mangles non-UTF8 bytes, floating " +
      "NaN fails every range predicate and would silently corrupt " +
      "merges) — use an integral or string key column")
  }
  private def hfs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------- commit

  private def manifestFile(path: String, v: Long) = new Path(s"$path/manifest-$v")

  /** Committed version numbers on disk, ascending — the one shared
    * manifest-name parse (its `.tmp` predicate has to stay in lock-step
    * everywhere, so no caller re-implements it). */
  private def listVersions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val fs = hfs(spark, root)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && !n.contains(".tmp"))
      .map(_.drop("manifest-".length))
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .toSeq.sorted
  }

  /** Highest committed version, or None for a nonexistent/empty table. */
  def latestVersion(spark: SparkSession, path: String): Option[Long] =
    listVersions(spark, path).lastOption

  /** Read the manifests of the given versions, SKIPPING any that a
    * concurrent writer's retention retired between the listing and the
    * read — the transient window every multi-writer read API shares. */
  private def readRetained(spark: SparkSession, path: String,
                           versions: Seq[Long]): Seq[Manifest] =
    versions.flatMap { v =>
      try Some(readManifestAt(spark, path, v))
      catch { case _: java.io.FileNotFoundException => None }
    }

  private[io] def writeManifest(spark: SparkSession, path: String, v: Long,
                            keyCol: String, keyType: DataType,
                            schema: StructType, statsCols: Seq[String],
                            entries: Seq[FileEntry],
                            tag: Option[String] = None,
                            zCols: Option[(String, String)] = None,
                            retain: Int = 2,
                            op: String = "unknown",
                            partCols: Seq[String] = Seq.empty,
                            // NO default: table policy must be threaded
                            // through EVERY commit path explicitly — a
                            // defaulted parameter would let a new commit
                            // site silently drop the table's constraints
                            constraints: Seq[(String, String)],
                            // NO default for the same reason: dropping
                            // the column mapping on a carry-forward
                            // commit would misread every file written
                            // before a rename
                            colMap: Seq[(String, String)],
                            retiredPhys: Seq[String]): Unit = {
    require(retain >= 2, s"retain=$retain: the window must keep at least " +
      "the current and one superseded version (changesBetween needs both " +
      "sides of the last commit)")
    val sb = new StringBuilder
    sb ++= "graft-manifest\t1\n"
    sb ++= s"key\t${enc(keyCol)}\n"
    sb ++= s"keytype\t${enc(keyType.json)}\n"
    sb ++= s"schema\t${enc(schema.json)}\n"
    sb ++= s"retain\t$retain\n"
    // commitTs is clamped to be strictly monotone in version: with
    // uncoordinated writers, clock skew could stamp version N+1 earlier
    // than N, and readAsOfTime's highest-version-with-ts<=query pick
    // would then serve commits stamped after the asked-for time. Reading
    // the predecessor is one small-file read; retention always keeps the
    // immediately superseded version at claim time (retain >= 2).
    val prevTs =
      if (v <= 1L) 0L
      else scala.util.Try(readManifestAt(spark, path, v - 1).commitTs)
        .getOrElse(0L)
    sb ++= s"op\t${enc(op)}\t${math.max(System.currentTimeMillis, prevTs + 1)}\n"
    tag.foreach(t => sb ++= s"tag\t${enc(t)}\n")
    zCols.foreach { case (a, b) =>
      sb ++= s"layout\tzorder\t${enc(a)}\t${enc(b)}\n" }
    // single-col tables keep the legacy `partcol` line (older
    // manifests parse unchanged); multi-col tables write `partcols`
    if (partCols.size == 1) sb ++= s"partcol\t${enc(partCols.head)}\n"
    else if (partCols.size > 1)
      sb ++= s"partcols\t${partCols.map(enc).mkString("\t")}\n"
    constraints.foreach { case (n, ex) =>
      sb ++= s"check\t${enc(n)}\t${enc(ex)}\n" }
    colMap.foreach { case (l, p) =>
      sb ++= s"colmap\t${enc(l)}\t${enc(p)}\n" }
    if (retiredPhys.nonEmpty)
      sb ++= s"physretired\t${retiredPhys.map(enc).mkString("\t")}\n"
    if (statsCols.nonEmpty)
      sb ++= s"statscols\t${statsCols.map(enc).mkString("\t")}\n"
    entries.foreach { e =>
      def f(o: Option[String]) = o.fold("null")(x => "v:" + enc(x))
      val extras = statsCols.flatMap { c =>
        e.extra.get(c) match {
          case Some((mn, mx)) => Seq(f(Some(mn)), f(Some(mx)))
          case None => Seq("null", "null")
        }
      }
      // the dv fields sit AFTER the fixed-width extras block, so the
      // positional parse below stays back-compatible: old manifests
      // simply end the line earlier
      val dvf = e.dv.fold("")(d => s"\tdv:${enc(d.dvRel)}\t${d.dead}")
      sb ++= (s"f\t${enc(e.relPath)}\t${e.rows}\t${f(e.min)}\t${f(e.max)}" +
        extras.map("\t" + _).mkString + dvf + "\n")
    }
    val fs = hfs(spark, new Path(path))
    // tmp name unique PER ATTEMPT: two writers racing toward the same
    // version must never share a tmp file — one's rename would consume
    // (or a crash leave corrupt) the other's half-written commit, and
    // the loser would die on a raw filesystem error instead of the
    // clean concurrent-commit signal (found by the 4-writer stress test)
    val tmp = new Path(s"$path/manifest-$v.tmp-" +
      java.util.UUID.randomUUID.toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes(UTF_8)) finally out.close()
    // Commit = rename tmp → final. On HDFS, rename FAILS if the
    // destination exists — a true atomic claim. POSIX rename overwrites,
    // so on a local FS the exists-check below is the guard; the JVM-wide
    // per-table lock makes exists+rename atomic against every other
    // writer in this process (see [[commitLock]]), so a second writer
    // racing the same version loses loudly instead of silently
    // replacing the first commit.
    val dst = manifestFile(path, v)
    val claimed = commitLock(fs, path).synchronized {
      !fs.exists(dst) && fs.rename(tmp, dst)
    }
    if (!claimed) {
      fs.delete(tmp, false)
      throw new ConcurrentCommitException(
        s"concurrent commit: $path/manifest-$v already exists " +
        "(another writer claimed this version first)")
    }
  }

  def readManifest(spark: SparkSession, path: String): Manifest =
    readManifestAt(spark, path, latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $path")))

  def readManifestAt(spark: SparkSession, path: String, v: Long): Manifest = {
    val fs = hfs(spark, new Path(path))
    val in = fs.open(manifestFile(path, v))
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      new String(bos.toByteArray, UTF_8)
    } finally in.close()
    var keyCol: String = null
    var keyType: DataType = null
    var schema: StructType = null
    var statsCols: Seq[String] = Seq.empty
    var tag: Option[String] = None
    var zCols: Option[(String, String)] = None
    var retain: Int = 2 // pre-retention manifests carry no line: old window
    var op: String = "unknown"
    var commitTs: Long = 0L
    var partCols: Seq[String] = Seq.empty
    val constraints = Seq.newBuilder[(String, String)]
    val colMap = Seq.newBuilder[(String, String)]
    var retiredPhys: Seq[String] = Seq.empty
    val entries = Seq.newBuilder[FileEntry]
    text.split('\n').filter(_.nonEmpty).foreach { line =>
      val parts = line.split('\t')
      parts(0) match {
        case "graft-manifest" =>
        case "key"     => keyCol = dec(parts(1))
        case "keytype" => keyType = DataType.fromJson(dec(parts(1)))
        case "schema"  => schema = DataType.fromJson(dec(parts(1)))
                            .asInstanceOf[StructType]
        case "retain"  => retain = parts(1).toInt
        case "op"      => op = dec(parts(1)); commitTs = parts(2).toLong
        case "tag"     => tag = Some(dec(parts(1)))
        case "layout"  => zCols = Some((dec(parts(2)), dec(parts(3))))
        case "partcol" => partCols = Seq(dec(parts(1)))
        case "partcols" => partCols = parts.drop(1).map(dec).toSeq
        case "check"   => constraints += (dec(parts(1)) -> dec(parts(2)))
        case "colmap"  => colMap += (dec(parts(1)) -> dec(parts(2)))
        case "physretired" => retiredPhys = parts.drop(1).toSeq.map(dec)
        case "statscols" => statsCols = parts.drop(1).toSeq.map(dec)
        case "f" =>
          def g(s: String) = if (s == "null") None else Some(dec(s.drop(2)))
          val extra = statsCols.zipWithIndex.flatMap { case (c, i) =>
            (g(parts(5 + 2 * i)), g(parts(6 + 2 * i))) match {
              case (Some(mn), Some(mx)) => Some(c -> (mn, mx))
              case _ => None
            }
          }.toMap
          val dvAt = 5 + 2 * statsCols.length
          val dv =
            if (parts.length > dvAt + 1 && parts(dvAt).startsWith("dv:"))
              Some(DvRef(dec(parts(dvAt).drop(3)), parts(dvAt + 1).toLong))
            else None
          entries += FileEntry(dec(parts(1)), parts(2).toLong,
            g(parts(3)), g(parts(4)), extra, dv)
        case other => throw new IllegalStateException(
          s"unknown manifest record '$other' in $path/manifest-$v")
      }
    }
    require(keyCol != null && keyType != null && schema != null,
      s"malformed manifest $path/manifest-$v")
    Manifest(v, keyCol, keyType, schema, statsCols, entries.result(), tag,
      zCols, retain, op, commitTs, partCols, constraints.result(),
      colMap.result(), retiredPhys)
  }

  // ----------------------------------------------------------------- reads

  /** Current table content: exactly the files the latest manifest names. */
  def read(spark: SparkSession, path: String): DataFrame =
    readFiles(spark, path, readManifest(spark, path))

  /** Time travel: the table as of committed version `v` — valid within
    * the table's retention window (the manifest's `retain` field: the
    * current + retain−1 superseded versions; older data is retired). */
  def readAt(spark: SparkSession, path: String, v: Long): DataFrame =
    readFiles(spark, path, readManifestAt(spark, path, v))

  /** All RETAINED versions, newest first — history reaches exactly as
    * far as the retention window (`keepVersions`), the same contract as
    * [[readAt]]; each row carries the version, the operation that
    * committed it, its wall-clock commit time, live file/row counts,
    * and the consumer tag. The Delta `DESCRIBE HISTORY` shape, driven
    * from the manifests alone — no data file is opened. */
  def history(spark: SparkSession, path: String): DataFrame = {
    // readRetained, not a direct read: a concurrent writer's retention
    // may retire a listed version before it is read — a transient
    // miss, not an error, under the multi-writer model
    val versions = listVersions(spark, path)
    // loud on a missing/empty table (same contract as readManifest) —
    // a typo'd path must not masquerade as a fully-retired history.
    // The guard sits on the LISTING: if versions existed but every one
    // retired between the list and the read (a fast concurrent writer),
    // the result is transiently empty, not an error
    require(versions.nonEmpty, s"no committed manifest under $path")
    val rows = readRetained(spark, path, versions.reverse).map { m =>
      org.apache.spark.sql.Row(m.version, m.op, m.commitTs,
        m.entries.size.toLong, m.entries.map(_.rows).sum,
        m.tag.orNull)
    }
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("version", LongType),
        StructField("op", StringType),
        StructField("commit_ts", LongType),
        StructField("n_files", LongType),
        StructField("n_rows", LongType),
        StructField("tag", StringType))))
  }

  /** Time travel by WALL-CLOCK TIME: the table as of the latest
    * retained commit at or before `tsMillis` (epoch millis) — the
    * `TIMESTAMP AS OF` shape. Loud errors outside the window: before
    * the oldest retained commit (retired — widen `keepVersions`), or
    * when an UNSTAMPED pre-upgrade manifest makes the answer
    * ambiguous — but only then: stamped newer versions stay
    * time-travelable while older unstamped ones age out. */
  def readAsOfTime(spark: SparkSession, path: String,
                   tsMillis: Long): DataFrame = {
    val best = manifestAsOfTime(spark, path, tsMillis)
    readFiles(spark, path, best)
  }

  /** The manifest-selection half of [[readAsOfTime]], reusable by any
    * snapshot-pinning caller (the `timestampAsOf` connector option). */
  private[io] def manifestAsOfTime(spark: SparkSession, path: String,
                                   tsMillis: Long): Manifest = {
    val manifests = readRetained(spark, path, listVersions(spark, path))
    require(manifests.nonEmpty, s"no committed manifest under $path")
    val candidates = manifests.filter(m =>
      m.commitTs > 0L && m.commitTs <= tsMillis)
    if (candidates.isEmpty) {
      if (manifests.exists(_.commitTs == 0L))
        throw new IllegalStateException(
          s"$path has retained manifests without commit timestamps " +
          "(written before time travel by time existed) and no stamped " +
          s"version at or before ts=$tsMillis — use readAt, or wait for " +
          "the unstamped versions to retire")
      throw new IllegalStateException(
        s"no retained version of $path at or before ts=$tsMillis " +
        s"(oldest retained: v${manifests.head.version} at " +
        s"${manifests.head.commitTs}) — the snapshot is retired; widen " +
        "keepVersions (ManifestTable.setRetention) to travel further back")
    }
    val best = candidates.last
    // an unstamped manifest NEWER than the best stamped candidate has
    // an unknown commit time — it may also precede tsMillis, so serving
    // `best` could silently serve a stale snapshot; refuse the
    // ambiguity (resolves itself once the unstamped version retires)
    if (manifests.exists(m => m.commitTs == 0L && m.version > best.version))
      throw new IllegalStateException(
        s"$path has an unstamped retained manifest newer than the best " +
        s"stamped candidate v${best.version} — the answer at " +
        s"ts=$tsMillis is ambiguous; use readAt, or wait for the " +
        "unstamped versions to retire")
    best
  }

  /** The raw multi-file read: explicit file list, manifest schema,
    * recursiveFileLookup — the option disables directory-partition
    * inference, so a partition-pure file living under `__p=<value>/`
    * can never have a `__p` column invented outside the schema (flat
    * files are unaffected). PHYSICAL rows: no deletion vector applied
    * — only [[readEntries]] and the dv-commit's matched-row scan may
    * call this. */
  /** relPath → readable location. Ordinary entries are RELATIVE to the
    * table root; a [[shallowClone]]'s borrowed entries carry the
    * source's ABSOLUTE/qualified path and resolve as themselves —
    * which also keeps them invisible to this table's retention sweep
    * (it walks only the local `data/` tree). */
  private[io] def absOf(path: String, rel: String): String =
    if (rel.startsWith("/") || isQualified(rel)) rel else s"$path/$rel"

  // "file:/x", "hdfs://nn/x", "s3a://b/x" — any scheme-qualified URI
  // (Hadoop's makeQualified renders local paths WITHOUT the authority
  // slashes, so a bare "://" test misses them)
  private[io] def isQualified(p: String): Boolean =
    p.matches("^[A-Za-z][A-Za-z0-9+.-]*:/.*")

  private def readEntriesRaw(spark: SparkSession, path: String,
                             schema: StructType,
                             entries: Seq[FileEntry]): DataFrame =
    if (entries.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).option("recursiveFileLookup", "true")
        .parquet(entries.map(e => absOf(path, e.relPath)): _*)

  /** LIVE rows of the given entries: files without a deletion vector
    * read as-is (the plain codegen'd scan — the hot path at 100 TB,
    * where dv'd files are the mutating fringe); files WITH one get the
    * dead (file, key) pairs anti-joined out, grouped per sidecar so
    * each sidecar is opened once. The join key is (parquet file NAME,
    * merge key): `_metadata.file_name` sidesteps the URL-encoding
    * mismatch absolute paths carry ([[statsFor]]'s %20 gotcha), and a
    * (name, key) pair names at most one physical row — names embed a
    * per-task UUID, so the only same-named files are the partition
    * dirs one partition-pure task wrote, and those come from ONE
    * key-unique batch. File attribution is REQUIRED — a
    * key dead in one file may be live in another (deleted then
    * re-inserted), so a key-only anti-join would over-delete. The
    * anti-join side is broadcast when the manifest's recorded dead
    * counts say it is small — a stats-driven plan choice with no
    * extra job. */
  private def readEntries(spark: SparkSession, path: String,
                          schema: StructType, keyCol: String,
                          entries: Seq[FileEntry],
                          colMap: Seq[(String, String)]): DataFrame = {
    // files hold PHYSICAL names (stable across renames) — scan physical,
    // project to the caller's logical schema at the end. Identity-mapped
    // tables take the colMap.isEmpty fast path inside the helpers: no
    // extra projection node.
    val pSchema = physSchemaOf(colMap, schema)
    val pKey = physNameOf(colMap, keyCol)
    val (dvd, clean) = entries.partition(_.dv.isDefined)
    val cleanDf = toLogical(colMap, schema,
      readEntriesRaw(spark, path, pSchema, clean))
    if (dvd.isEmpty) return cleanDf
    val dvParts = dvd.groupBy(_.dv.get.dvRel).toSeq.sortBy(_._1).map {
      case (dvRel, es) =>
        val rels = es.map(_.relPath).toSet
        val dead0 = spark.read.parquet(s"$path/$dvRel")
          // the sidecar may carry pairs for files this manifest no
          // longer lists (fully-dead entries dropped, files re-pointed
          // by a later commit) — scope to this group's files
          .filter(col("__f").isin(rels.toSeq: _*))
          .select(element_at(split(col("__f"), "/"), -1).as("__dvfn"),
            col("__k"))
        val totalDead = es.map(_.dv.get.dead).sum
        val dead = if (totalDead <= 2000000L) broadcast(dead0) else dead0
        val data = readEntriesRaw(spark, path, pSchema, es)
          .withColumn("__fn", col("_metadata.file_name"))
        toLogical(colMap, schema,
          data.join(dead, data("__fn") === dead("__dvfn") &&
              data(pKey) === dead("__k"), "left_anti")
            .select(pSchema.fieldNames.map(col): _*))
    }
    dvParts.foldLeft(cleanDf)(_ unionByName _)
  }

  /** Dead (file, key) pairs of `entries` under their OWN vectors, one
    * scoped read per sidecar GROUP — never a union of all sidecars
    * filtered by file membership. The distinction is load-bearing for
    * multiset consumers: a file's stale pair subset can survive in
    * ANOTHER entry's still-referenced sidecar (a later repoint carries
    * pairs forward while the old sidecar stays live for its other
    * files), and a membership-only filter over the union would read
    * those pairs twice — `exceptAll` in [[changeSidesBetween]] does
    * not cancel duplicates, so a double-counted pair surfaces as a
    * phantom add/delete in the change feed. Scoping each group to the
    * relPaths that point at its sidecar (the [[readEntries]] shape)
    * reads every pair exactly once. Columns: `__f` (sidecar path
    * form), `__k` cast to `keyType`. */
  private def deadPairsScoped(spark: SparkSession, path: String,
                              keyType: DataType,
                              entries: Seq[FileEntry]): DataFrame = {
    val withDv = entries.filter(_.dv.isDefined)
    if (withDv.isEmpty)
      spark.emptyDataFrame.select(lit("").as("__f"),
        lit(null).cast(keyType).as("__k")).limit(0)
    else
      withDv.groupBy(_.dv.get.dvRel).toSeq.sortBy(_._1).map {
        case (dvRel, es) =>
          spark.read.parquet(s"$path/$dvRel")
            .filter(col("__f").isin(es.map(_.relPath): _*))
            .select(col("__f"), col("__k").cast(keyType).as("__k"))
      }.reduce(_ unionByName _)
  }

  private[io] def readFiles(spark: SparkSession, path: String,
                            m: Manifest): DataFrame =
    readEntries(spark, path, m.schema, m.keyCol, m.entries, m.colMap)

  // ---------------------------------------------------------------- writes

  /** Create (or overwrite) the table: key-sort `df` into `numFiles` files
    * with disjoint per-file key ranges, record per-file stats, commit
    * manifest 1. The stats pass is column-pruned over just the written
    * batch. `keepVersions` (≥2) sets the table's retention window: the
    * current + keepVersions−1 superseded versions stay fully readable,
    * so [[readAt]] reaches back keepVersions−1 hops and a change-feed
    * consumer may lag that many source commits before re-bootstrap.
    * Create itself is destructive (it replaces the path) and is NOT
    * part of the optimistic-concurrency protocol — only commits on an
    * existing table are. */
  def create(df: DataFrame, path: String, keyCol: String,
             numFiles: Int, statsCols: Seq[String] = Seq.empty,
             tag: Option[String] = None, keepVersions: Int = 2,
             checkConstraints: Seq[(String, String)] = Seq.empty): Unit = {
    require(statsCols.forall(df.schema.fieldNames.contains),
      s"statsCols not in schema: ${statsCols.filterNot(
        df.schema.fieldNames.contains)}")
    requireMergeableKeyType(keyCol, df.schema(keyCol).dataType)
    requireConstraintNames(checkConstraints)
    val spark = df.sparkSession
    val root = new Path(path)
    hfs(spark, root).delete(root, true)
    val txnRel = "data/txn-1"
    // constraints declared AT create validate the incoming content
    // inside the create write itself (observed metrics) — no
    // create-then-addCheckConstraint second scan over a just-written
    // 100 TB table. A refused create commits no manifest: the path
    // holds no table (create is destructive either way).
    val (gated, verifyChecks) = observeChecks(df, checkConstraints)
    Tables.writeSortedBy(gated, s"$path/$txnRel", numFiles, keyCol)
    verifyChecks()
    val entries = statsFor(spark, path, txnRel, keyCol, df.schema, statsCols,
      Seq.empty)
    writeManifest(spark, path, 1L, keyCol, df.schema(keyCol).dataType,
      df.schema, statsCols, entries, tag, retain = keepVersions,
      op = "create", constraints = checkConstraints,
      colMap = Seq.empty, retiredPhys = Seq.empty)
  }

  private def requireConstraintNames(cs: Seq[(String, String)]): Unit = {
    require(cs.forall(_._1.nonEmpty), "constraint names must be non-empty")
    require(cs.map(_._1).distinct.size == cs.size,
      s"duplicate constraint names: ${cs.map(_._1).diff(
        cs.map(_._1).distinct).mkString(",")}")
  }

  /** Z-ORDERED create: rows land on the Morton curve of (`zColA`,
    * `zColB`) ([[Tables.writeZOrdered]]) with per-file stats recorded
    * for BOTH columns, so [[prunedRead]] skips files from the manifest
    * on EITHER dimension — the two-dimensional-predicate layout
    * (time × user, region × price) carried through to manifest-level
    * pruning. The merge key's per-file ranges are recorded too but are
    * WIDE under a Z layout (files are rectangles in (a, b) space, not
    * key runs), so copy-on-write merges touch more files than under
    * [[create]] — pick this layout for read-heavy tables with 2-D
    * predicates, the key-sorted one for mutation-heavy tables; restore
    * the curve after merges with [[compactTableZOrdered]]. */
  def createZOrdered(df: DataFrame, path: String, keyCol: String,
                     numFiles: Int, zColA: String, zColB: String): Unit = {
    // validate BEFORE the destructive delete — a typo'd column name
    // must not destroy an existing table at this path
    val missing = Seq(keyCol, zColA, zColB)
      .filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"column(s) ${missing.mkString(",")} not in schema " +
      s"${df.schema.fieldNames.mkString(",")}")
    requireMergeableKeyType(keyCol, df.schema(keyCol).dataType)
    val spark = df.sparkSession
    val root = new Path(path)
    hfs(spark, root).delete(root, true)
    val txnRel = "data/txn-1"
    Tables.writeZOrdered(df, s"$path/$txnRel", numFiles, zColA, zColB)
    val statsCols = Seq(zColA, zColB).filterNot(_ == keyCol)
    val entries = statsFor(spark, path, txnRel, keyCol, df.schema, statsCols,
      Seq.empty)
    writeManifest(spark, path, 1L, keyCol, df.schema(keyCol).dataType,
      df.schema, statsCols, entries, tag = None,
      zCols = Some((zColA, zColB)), op = "create-zorder",
      constraints = Seq.empty, colMap = Seq.empty, retiredPhys = Seq.empty)
  }

  // --------------------------------------------------- partitioned tables

  /** The partition-key contract, same reasoning as the merge key's: the
    * partition value is compared as its manifest-stored STRING (driver-
    * side equality for the metadata-only ops), so its type must
    * round-trip exactly through a string cast. */
  private def requirePartitionColType(partCol: String, dt: DataType): Unit = {
    import org.apache.spark.sql.types._
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case _ => false
    }
    require(ok, s"partition column '$partCol' has type ${dt.simpleString}; " +
      "only integral and string partition values round-trip exactly " +
      "through the manifest's string-encoded stats (the metadata-only " +
      "partition ops compare them driver-side)")
  }

  private def requirePartitioned(m: Manifest, path: String): Seq[String] = {
    if (m.partCols.isEmpty) throw new IllegalStateException(
      s"$path is not a partitioned table (created by create/createZOrdered," +
      " not createPartitioned) — partition-level ops need the " +
      "partition-pure layout")
    m.partCols
  }

  /** The layout invariant every commit path on a partitioned table must
    * re-establish: each file holds exactly ONE value of EVERY partition
    * column (stored min == max), and the value is recorded — a file
    * with NO recorded range means null partition values (rows the
    * writer routed to the hive default partition), which the partition
    * ops could neither address nor preserve, so they are refused at
    * write time. */
  private def requirePartitionPure(partCols: Seq[String],
                                   entries: Seq[FileEntry],
                                   path: String): Unit =
    entries.foreach { e =>
      partCols.foreach { partCol =>
        e.extra.get(partCol) match {
          case Some((mn, mx)) =>
            require(mn == mx, s"$path/${e.relPath} spans partition values " +
              s"[$mn, $mx] of '$partCol' — not partition-pure; the table's " +
              "layout invariant is broken")
          case None => throw new IllegalStateException(
            s"$path/${e.relPath} has no recorded '$partCol' range — the " +
            "batch carries NULL partition values; partition columns must " +
            "be non-null")
        }
      }
    }

  /** The (one per partition column) values a file of a partitioned
    * table holds, in partition-column order. */
  private[io] def partValuesOf(m: Manifest, e: FileEntry,
                               path: String): Seq[String] = {
    val pcs = requirePartitioned(m, path)
    pcs.map { pc =>
      e.extra.get(pc) match {
        case Some((mn, mx)) if mn == mx => mn
        case _ => throw new IllegalStateException(
          s"$path/${e.relPath} is not partition-pure on '$pc' — was this " +
          "table written by createPartitioned and mutated only through " +
          "ManifestTable commit paths?")
      }
    }
  }

  /** The LEADING partition value — what the value-addressed partition
    * ops ([[deletePartitions]] / [[readPartitions]] /
    * [[compactPartitions]]) match on. For a multi-level table the
    * leading column is the coarse axis (the "day" of (day, source)), so
    * value-level ops address a whole leading slice across its
    * sub-partitions. */
  private[io] def partValueOf(m: Manifest, e: FileEntry,
                              path: String): String =
    partValuesOf(m, e, path).head

  /** PARTITIONED create ([[Tables.writePartitionPure]] layout): every
    * data file holds exactly one value of `partCol` and the manifest
    * records it, so the standard warehouse partition ops become
    * MANIFEST-ONLY commits — [[deletePartitions]] /
    * [[overwritePartitions]] drop/replace the matching entries with
    * ZERO untouched bytes rewritten, and [[readPartitions]] cuts the
    * file list driver-side before any footer opens. This is the
    * north-star 100 TB fact-table layout (drop a day, backfill a day,
    * read a day — each at metadata cost); copy-on-write [[merge]] /
    * [[deleteKeys]] still work and re-establish purity on every
    * rewrite. `partCol` values must be non-null; the key must still be
    * a mergeable type. Within each partition's file, rows are key-
    * sorted, so per-file KEY ranges stay tight for the merge touch
    * set.
    *
    * `numFiles` = 0 writes one file per partition value (fine when
    * values are many and similar-sized); > 0 range-splits the write
    * across that many tasks so a LARGE partition value becomes several
    * key-disjoint files written in parallel instead of one single-task
    * straggler file — see [[Tables.writePartitionPure]]. The partition
    * ops are file-count-agnostic either way. */
  def createPartitioned(df: DataFrame, path: String, keyCol: String,
                        partCol: String, statsCols: Seq[String] = Seq.empty,
                        tag: Option[String] = None,
                        keepVersions: Int = 2, numFiles: Int = 0,
                        checkConstraints: Seq[(String, String)] = Seq.empty)
      : Unit =
    createPartitioned(df, path, keyCol, Seq(partCol), statsCols, tag,
      keepVersions, numFiles, checkConstraints)

  /** MULTI-LEVEL partitioned create: `partCols` in coarse-to-fine order
    * — e.g. `(date, source)` — lay out as nested partition directories
    * (one sub-dir level per column, [[Tables.writePartitionPure]]).
    * Every file is pure on EVERY partition column, so the connector
    * exposes ALL of them as real Spark partition columns (static
    * pruning + DPP on each), and the value-addressed partition ops
    * address the LEADING column (drop/compact/read a whole date across
    * its sources); [[overwritePartitions]] replaces exact value TUPLES
    * (backfill one (date, source) cell). */
  def createPartitioned(df: DataFrame, path: String, keyCol: String,
                        partCols: Seq[String], statsCols: Seq[String],
                        tag: Option[String],
                        keepVersions: Int, numFiles: Int,
                        checkConstraints: Seq[(String, String)])
      : Unit = {
    // validate BEFORE the destructive delete (same contract as create)
    require(partCols.nonEmpty, "createPartitioned needs at least one " +
      "partition column")
    require(partCols.distinct.length == partCols.length,
      s"duplicate partition column(s): " +
      partCols.diff(partCols.distinct).mkString(","))
    val missing = (Seq(keyCol) ++ partCols ++ statsCols)
      .filterNot(df.schema.fieldNames.contains)
    require(missing.isEmpty, s"column(s) ${missing.mkString(",")} not in " +
      s"schema ${df.schema.fieldNames.mkString(",")}")
    require(!partCols.contains(keyCol), s"partition columns must differ " +
      s"from the merge key '$keyCol' (partitioning by a unique key makes " +
      "one file per row)")
    requireMergeableKeyType(keyCol, df.schema(keyCol).dataType)
    partCols.foreach(pc =>
      requirePartitionColType(pc, df.schema(pc).dataType))
    requireConstraintNames(checkConstraints)
    val spark = df.sparkSession
    val root = new Path(path)
    hfs(spark, root).delete(root, true)
    val txnRel = "data/txn-1"
    val (gated, verifyChecks) = observeChecks(df, checkConstraints)
    Tables.writePartitionPure(gated, s"$path/$txnRel", partCols, keyCol,
      numFiles)
    verifyChecks()
    // partCols always lead the tracked stats — the partition ops read
    // the per-file (min==max) values from them
    val allStats = (partCols ++ statsCols).distinct
    val entries = statsFor(spark, path, txnRel, keyCol, df.schema, allStats,
      Seq.empty)
    requirePartitionPure(partCols, entries, path)
    writeManifest(spark, path, 1L, keyCol, df.schema(keyCol).dataType,
      df.schema, allStats, entries, tag, retain = keepVersions,
      op = "create-partitioned", partCols = partCols,
      constraints = checkConstraints,
      colMap = Seq.empty, retiredPhys = Seq.empty)
  }

  /** METADATA-ONLY partition drop: remove every file whose partition
    * value is in `values` from the manifest — no data file is read or
    * written (retention retires the dropped files after the window).
    * The returned [[MergeStats]] is the evidence: filesRewritten ==
    * filesWritten == 0 always. A value matching nothing burns no
    * version (at most a tag-only commit). Incremental consumers see the
    * drop as an ordinary change window (the dropped files' rows diff
    * out as deletes). */
  def deletePartitions(spark: SparkSession, path: String, values: Seq[Any],
                       setTag: Option[String] = None,
                       maxRetries: Int = 3): MergeStats =
    retryingCommit(spark, path, maxRetries) { m =>
      requirePartitioned(m, path)
      val vals = values.map(String.valueOf).toSet
      val (dropped, kept) =
        m.entries.partition(e => vals(partValueOf(m, e, path)))
      if (dropped.isEmpty) {
        setTag.foreach(t => setTagOnly(spark, path, t, maxRetries))
        val n = m.entries.size
        MergeStats(latestVersion(spark, path).getOrElse(m.version), n, 0, 0, n)
      } else {
        commitFence()
        writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
          m.schema, m.statsCols, kept, setTag.orElse(m.tag), m.zCols,
          m.retain, op = "delete-partitions", partCols = m.partCols,
          constraints = m.constraints, colMap = m.colMap,
          retiredPhys = m.retiredPhys)
        retireKeeping(spark, path, m.version + 1, m.retain)
        MergeStats(m.version + 1, m.entries.size, 0, 0, kept.size)
      }
    }

  /** METADATA-ONLY partition drop addressed at ANY partition level of a
    * multi-level table — "drop source X across all dates" on a
    * (date, source) layout. Every file is partition-pure on EVERY
    * level (not just the leading one), so matching entries are
    * identified driver-side from their recorded per-level value and
    * removed from the manifest with zero data files read or written —
    * the same cost class as the leading-column [[deletePartitions]].
    * `partCol` must be one of the table's partition columns; values
    * compare through the manifest's string encoding (the partition-op
    * convention). A value matching nothing burns no version. */
  def deletePartitionValues(spark: SparkSession, path: String,
                            partCol: String, values: Seq[Any],
                            setTag: Option[String] = None,
                            maxRetries: Int = 3): MergeStats =
    retryingCommit(spark, path, maxRetries) { m =>
      val pcs = requirePartitioned(m, path)
      val level = pcs.indexWhere(_.equalsIgnoreCase(partCol))
      require(level >= 0, s"'$partCol' is not a partition column of " +
        s"$path (partitioned by ${pcs.mkString(",")})")
      val vals = values.map(String.valueOf).toSet
      val (dropped, kept) = m.entries.partition(e =>
        vals(partValuesOf(m, e, path)(level)))
      if (dropped.isEmpty) {
        setTag.foreach(t => setTagOnly(spark, path, t, maxRetries))
        val n = m.entries.size
        MergeStats(latestVersion(spark, path).getOrElse(m.version), n, 0, 0, n)
      } else {
        commitFence()
        writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
          m.schema, m.statsCols, kept, setTag.orElse(m.tag), m.zCols,
          m.retain, op = "delete-partitions", partCols = m.partCols,
          constraints = m.constraints, colMap = m.colMap,
          retiredPhys = m.retiredPhys)
        retireKeeping(spark, path, m.version + 1, m.retain)
        MergeStats(m.version + 1, m.entries.size, 0, 0, kept.size)
      }
    }

  /** DYNAMIC partition overwrite (the `partitionOverwriteMode=dynamic`
    * shape): exactly the partition values PRESENT in `replacement` are
    * replaced wholesale; every other partition is carried by reference,
    * untouched on disk. The replacement lands partition-pure in a fresh
    * txn dir, its values are read off the new entries' stats (driver-
    * side — no extra pass over the data), and the commit swaps the
    * matching manifest entries — so a day-level backfill rewrites one
    * day and commits one manifest, whatever the table's size.
    * `replacement` must carry exactly the table schema. An EMPTY
    * replacement replaces nothing (and burns no version) — use
    * [[deletePartitions]] to drop a partition. Conflicts rebase: the
    * written files are snapshot-independent, so a lost claim recommits
    * against the winner's entries (the standard retry budget).
    * `numFiles` > 0 range-splits a large backfill across that many
    * write tasks ([[Tables.writePartitionPure]]). */
  def overwritePartitions(spark: SparkSession, path: String,
                          replacement: DataFrame,
                          setTag: Option[String] = None,
                          maxRetries: Int = 3, numFiles: Int = 0): MergeStats = {
    val m0 = readManifest(spark, path)
    val pc = requirePartitioned(m0, path)
    val missing = m0.schema.fieldNames.filterNot(replacement.columns.contains)
    val extra = replacement.columns.filterNot(m0.schema.fieldNames.contains)
    require(missing.isEmpty && extra.isEmpty,
      s"replacement schema must match the table's exactly; missing: " +
      s"${missing.mkString(",")} extra: ${extra.mkString(",")} " +
      "(evolve the table first, or project the batch)")
    val ordered = replacement.select(
      m0.schema.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
    val txnRel = freshTxnRel(m0.version + 1)
    val (gatedRepl, verifyChecks) = observeChecks(ordered, m0.constraints)
    Tables.writePartitionPure(toPhysical(m0.colMap, m0.schema, gatedRepl),
      s"$path/$txnRel", pc.map(physNameOf(m0.colMap, _)),
      physNameOf(m0.colMap, m0.keyCol), numFiles)
    verifyChecks()
    val newE = statsFor(spark, path, txnRel, m0.keyCol, m0.schema,
      m0.statsCols, m0.colMap)
    requirePartitionPure(pc, newE, path)
    // dynamic overwrite replaces exact value TUPLES present in the
    // replacement (for multi-level tables: one (date, source) cell)
    val replaced = newE.map(e => pc.map(c => e.extra(c)._1)).toSet
    retryingCommit(spark, path, maxRetries) { base =>
      // the files above are snapshot-INDEPENDENT, so committing them on
      // a winner's base is always serial-equivalent — as long as the
      // table's identity metadata still matches what they were written
      // under (additive schema evolution is fine: the new files simply
      // null-extend like every pre-evolution file)
      require(base.partCols == pc && base.statsCols == m0.statsCols &&
        base.constraints == m0.constraints && base.colMap == m0.colMap,
        s"$path changed layout/stats tracking/constraints under this " +
        "overwrite — re-drive it against the current table")
      if (replaced.isEmpty) {
        setTag.foreach(t => setTagOnly(spark, path, t, maxRetries))
        val n = base.entries.size
        MergeStats(latestVersion(spark, path).getOrElse(base.version),
          n, 0, 0, n)
      } else {
        val kept =
          base.entries.filterNot(e => replaced(partValuesOf(base, e, path)))
        commitFence()
        writeManifest(spark, path, base.version + 1, base.keyCol,
          base.keyType, base.schema, base.statsCols, kept ++ newE,
          setTag.orElse(base.tag), base.zCols, base.retain,
          op = "overwrite-partitions", partCols = base.partCols,
          constraints = base.constraints, colMap = base.colMap,
          retiredPhys = base.retiredPhys)
        retireKeeping(spark, path, base.version + 1, base.retain)
        MergeStats(base.version + 1, base.entries.size, 0, newE.size,
          kept.size)
      }
    }
  }

  /** Partition-pruned read: the file list is cut to the requested
    * values DRIVER-SIDE against the manifest's recorded per-file value
    * — no Spark job, no footer opened, before the scan even plans. The
    * complement of [[prunedRead]] (range pruning on any tracked stats
    * column) for the exact-partition case. */
  def readPartitions(spark: SparkSession, path: String,
                     values: Seq[Any]): DataFrame = {
    val m = readManifest(spark, path)
    requirePartitioned(m, path)
    val vals = values.map(String.valueOf).toSet
    readEntries(spark, path, m.schema, m.keyCol,
      m.entries.filter(e => vals(partValueOf(m, e, path))), m.colMap)
  }

  /** PER-PARTITION compaction (the `OPTIMIZE … WHERE pt IN (…)` shape):
    * rewrite ONLY the named partitions' files — every other partition
    * is carried by reference, untouched on disk. This is the
    * maintenance op the streaming-CDC-into-partitioned-table loop
    * needs: merges accumulate files in the hot partitions while cold
    * history stays put, so compaction cost must scale with the HOT SET,
    * not the table ([[compactTable]] rewrites everything — wrong shape
    * at 100 TB). Content is unchanged (same rows, fresh layout);
    * `numFiles` > 0 range-splits the rewrite, 0 writes one file per
    * value. Values matching nothing burn no version. The returned
    * [[MergeStats]] is the evidence: filesRewritten == the selected
    * partitions' old file count, filesCarried == everything else.
    * Conflicts re-drive the rewrite against the winner's entries. */
  def compactPartitions(spark: SparkSession, path: String, values: Seq[Any],
                        numFiles: Int = 0,
                        maxRetries: Int = 3): MergeStats =
    retryingCommit(spark, path, maxRetries) { m =>
      val pc = requirePartitioned(m, path)
      val vals = values.map(String.valueOf).toSet
      val (selected, kept) =
        m.entries.partition(e => vals(partValueOf(m, e, path)))
      if (selected.isEmpty) {
        val n = m.entries.size
        MergeStats(latestVersion(spark, path).getOrElse(m.version), n, 0, 0, n)
      } else {
        val nextV = m.version + 1
        val txnRel = freshTxnRel(nextV)
        Tables.writePartitionPure(
          toPhysical(m.colMap, m.schema,
            readEntries(spark, path, m.schema, m.keyCol, selected,
              m.colMap)),
          s"$path/$txnRel", pc.map(physNameOf(m.colMap, _)),
          physNameOf(m.colMap, m.keyCol), numFiles)
        val newE = statsFor(spark, path, txnRel, m.keyCol, m.schema,
          m.statsCols, m.colMap)
        requirePartitionPure(pc, newE, path)
        commitFence()
        writeManifest(spark, path, nextV, m.keyCol, m.keyType, m.schema,
          m.statsCols, kept ++ newE, m.tag, m.zCols, m.retain,
          op = "compact-partitions", partCols = m.partCols,
          constraints = m.constraints, colMap = m.colMap,
          retiredPhys = m.retiredPhys)
        retireKeeping(spark, path, nextV, m.retain)
        MergeStats(nextV, m.entries.size, selected.size, newE.size, kept.size)
      }
    }

  /** The live partition inventory — ops visibility, manifest-only: one
    * row per partition value with its file and row counts. */
  def describePartitions(spark: SparkSession, path: String): DataFrame = {
    val m = readManifest(spark, path)
    requirePartitioned(m, path)
    import scala.jdk.CollectionConverters._
    val rows = m.entries.groupBy(e => partValueOf(m, e, path)).toSeq
      .sortBy(_._1)
      .map { case (v, es) =>
        org.apache.spark.sql.Row(v, es.size.toLong, es.map(_.rows).sum) }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      org.apache.spark.sql.types.StructField("partition",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_files",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType))))
  }

  /** The Z-layout's compaction: rewrite onto a fresh Morton curve
    * (merges land key-sorted txns that fall off the curve; this puts
    * the whole table back on it) — also the MIGRATION from a key-sorted
    * table to the Z layout: the z columns join the tracked stats (so
    * [[prunedRead]] works on them from this commit on) and the layout
    * is recorded in the manifest (so [[compactTable]]'s auto-dispatch
    * preserves it). Same atomic commit and retention as
    * [[compactTable]]. */
  def compactTableZOrdered(spark: SparkSession, path: String, numFiles: Int,
                           zColA: String, zColB: String,
                           maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(m.partCols.isEmpty, s"$path is partition-pure on " +
        s"'${m.partCols.mkString(",")}' — the Z and partition layouts are mutually " +
        "exclusive (a Morton rewrite would break the metadata-only " +
        "partition ops); recreate the table to change layout")
      val missing = Seq(zColA, zColB).filterNot(m.schema.fieldNames.contains)
      require(missing.isEmpty, s"column(s) ${missing.mkString(",")} not in " +
        s"the table schema ${m.schema.fieldNames.mkString(",")}")
      val nextV = m.version + 1
      val txnRel = freshTxnRel(nextV)
      val statsCols = (m.statsCols ++
        Seq(zColA, zColB).filterNot(_ == m.keyCol)).distinct
      Tables.writeZOrdered(
        toPhysical(m.colMap, m.schema, readFiles(spark, path, m)),
        s"$path/$txnRel", numFiles,
        physNameOf(m.colMap, zColA), physNameOf(m.colMap, zColB))
      commitFence()
      writeManifest(spark, path, nextV, m.keyCol, m.keyType, m.schema,
        statsCols, statsFor(spark, path, txnRel, m.keyCol, m.schema,
          statsCols, m.colMap), m.tag, Some((zColA, zColB)), m.retain,
        op = "compact-zorder", partCols = m.partCols,
        constraints = m.constraints, colMap = m.colMap,
        retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, nextV, m.retain)
    }

  /** Drive one commit `attempt` against the latest manifest with
    * optimistic FULL retry: on a lost version claim the snapshot is
    * re-read and the attempt re-driven against the winner's state (a
    * compaction or metadata commit derives everything from the current
    * manifest, so re-driving IS its rebase — there is no cheaper
    * disjoint path like [[attemptRewrite]]'s), up to `maxRetries` extra
    * times, then the conflict surfaces loudly. Abandoned attempts' data
    * files are grace-period orphans, swept by later retention. */
  private def retryingCommit[T](spark: SparkSession, path: String,
                                maxRetries: Int)(attempt: Manifest => T): T = {
    var left = maxRetries
    while (true) {
      val m = readManifest(spark, path)
      try return attempt(m)
      catch { case e: ConcurrentCommitException =>
        if (left <= 0) throw conflictExhausted(path, e)
        left -= 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-file (rows, min(key), max(key)) of a freshly written txn dir —
    * one column-pruned scan of the NEW files only, grouped by the file
    * metadata column. Loudly rejects null merge keys: a null never
    * matches a range join, so a null-keyed row could neither be found
    * nor updated again. */
  private def statsFor(spark: SparkSession, root: String, txnRel: String,
                       keyCol: String, schema: StructType,
                       statsCols: Seq[String],
                       colMap: Seq[(String, String)]): Seq[FileEntry] = {
    // FOOTER FAST PATH: the just-written parquet footers already carry
    // exact per-file row counts, null counts, and min/max for the
    // integer/long/string/date/boolean types every table here keys and
    // tracks on — so the common commit collects its manifest stats as a
    // METADATA-ONLY driver pass (zero Spark jobs) instead of re-reading
    // the bytes it just wrote. At 100 TB the difference is writing the
    // data once vs writing it and reading it all back. Types whose
    // chunk statistics are not exact element values (float/double's
    // signed-zero widening, INT96 timestamps which carry no stats,
    // oversized binaries that parquet drops) return None and take the
    // scan below — correctness never depends on the fast path.
    footerStats(spark, root, txnRel, keyCol, schema, statsCols, colMap) match {
      case Some(entries) => return entries
      case None =>
    }
    val dir = s"$root/$txnRel"
    // the just-written files hold PHYSICAL names; stats stay keyed by
    // the manifest's LOGICAL statsCols (the index-zipped extra map)
    val pSchema = physSchemaOf(colMap, schema)
    val pKey = physNameOf(colMap, keyCol)
    val pStats = statsCols.map(physNameOf(colMap, _))
    val extraAggs = pStats.flatMap(c => Seq(
      min(col(c)).cast("string"), max(col(c)).cast("string")))
    // recursiveFileLookup: a partition-pure txn ([[Tables
    // .writePartitionPure]]) nests files under `__p=<value>/` — read
    // them as plain leaves instead of letting partition discovery
    // invent a `__p` column outside the schema (flat txns unaffected)
    val rows = spark.read.schema(pSchema)
      .option("recursiveFileLookup", "true").parquet(dir)
      .select(col(pKey).as("__k") +: col("_metadata.file_path").as("__f")
        +: pStats.map(col): _*)
      .groupBy("__f")
      .agg(count(lit(1)).as("n"), count("__k").as("nk")
        +: min("__k").cast("string").as("mn")
        +: max("__k").cast("string").as("mx")
        +: extraAggs: _*)
      .collect()
    rows.map { r =>
      // _metadata.file_path is URL-ENCODED (SparkPath.urlEncoded): a
      // partition dir holding a space ("__p=4-NOT SPECIFIED") comes
      // back as "%20" here while the on-disk name has the literal
      // space — decode to the FILESYSTEM form before slicing the rel
      // path, or every later read/sweep of the entry resolves to a
      // nonexistent file
      val abs0 = r.getString(0)
      val abs =
        try new java.net.URI(abs0).getPath
        catch { case _: java.net.URISyntaxException => abs0 }
      require(r.getLong(1) == r.getLong(2),
        s"null merge key in $abs: ${r.getLong(1) - r.getLong(2)} row(s) — " +
        "merge keys must be non-null")
      // rel = everything from the txn dir down (partition-pure txns
      // nest one `__p=<value>` level; flat txns have the file directly).
      // lastIndexOf: the txn dir is always the DEEPEST match — a table
      // root whose own path happens to contain a matching segment (e.g.
      // /data/txn-1/mytable) must not slice the rel path early
      val marker = "/" + txnRel + "/"
      val at = abs.lastIndexOf(marker)
      require(at >= 0, s"file $abs not under txn dir $txnRel")
      val rel = abs.substring(at + 1)
      val extra = statsCols.zipWithIndex.flatMap { case (c, i) =>
        (Option(r.getString(5 + 2 * i)), Option(r.getString(6 + 2 * i))) match {
          case (Some(mn), Some(mx)) => Some(c -> (mn, mx))
          case _ => None // all-null column in this file: no stats, never pruned
        }
      }.toMap
      FileEntry(rel, r.getLong(1), Option(r.getString(3)),
        Option(r.getString(4)), extra)
    }.toSeq.sortBy(_.relPath)
  }

  /** [[statsFor]]'s metadata-only fast path: manifest stats straight
    * from the parquet FOOTERS of a just-written txn. None = some
    * needed column's chunk statistics are not exact element values on
    * this layout — caller re-scans. The supported types' footer
    * min/max ARE exact values from the data (parquet drops, never
    * truncates, column-chunk stats by default), and their orderings
    * agree with Spark's (signed numeric; unsigned byte-wise for UTF8
    * strings, same as UTF8String); the string rendering below matches
    * `cast(col AS string)` for each, so entries are bit-identical to
    * the scan's. Null merge keys are a REAL error (same refusal as the
    * scan), never a fallback. Footer reads parallelize on a bounded
    * driver pool — ~KB each, so even a 10⁵-file commit stays in
    * seconds; the scan they replace would be the whole txn's bytes. */
  private[io] def footerStats(spark: SparkSession, root: String,
                              txnRel: String,
                              keyCol: String, schema: StructType,
                              statsCols: Seq[String],
                              colMap: Seq[(String, String)])
      : Option[Seq[FileEntry]] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val pKey = physNameOf(colMap, keyCol)
    val pStats = statsCols.map(physNameOf(colMap, _))
    val needed = (pKey +: pStats).zip(keyCol +: statsCols)
    // a needed column whose SPARK type footer stats can't represent
    // exactly rules the whole txn out before any footer is opened
    def footerable(dt: DataType): Boolean = dt match {
      case IntegerType | LongType | ShortType | ByteType | StringType |
           DateType | BooleanType => true
      case _ => false
    }
    if (!needed.forall { case (_, l) => footerable(schema(l).dataType) })
      return None
    val dirPath = new Path(s"$root/$txnRel")
    val fs = hfs(spark, dirPath)
    val files = {
      val it = fs.listFiles(dirPath, true)
      val b = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (n.endsWith(".parquet") && !n.startsWith("_") &&
            !n.startsWith(".")) b += st
      }
      b.result()
    }
    if (files.isEmpty) return Some(Seq.empty)

    // unsigned byte-wise compare — UTF8String / parquet UTF8 ordering
    def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    // (value, stats-string) per supported type; None = primitive/type
    // mismatch (not this path's layout — bail out)
    def extract(dt: DataType,
                c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData)
        : Option[(Any, Any)] = {
      val s = c.getStatistics
      val prim = c.getPrimitiveType.getPrimitiveTypeName
      val ok = dt match {
        case IntegerType | ShortType | ByteType | DateType => prim == INT32
        case LongType => prim == INT64
        case StringType => prim == BINARY
        case BooleanType => prim == BOOLEAN
        case _ => false
      }
      if (!ok || s == null || !s.hasNonNullValue) None
      else Some((s.genericGetMin, s.genericGetMax))
    }
    def lt(dt: DataType, a: Any, b: Any): Boolean = dt match {
      case StringType => cmpBytes(
        a.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
        b.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes) < 0
      case BooleanType => !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
      case LongType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case _ => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    }
    def render(dt: DataType, v: Any): String = dt match {
      case StringType => new String(
        v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes, UTF_8)
      case DateType =>
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
      case _ => v.toString
    }

    // per file: rows, key nulls (None = footer doesn't say → rescan),
    // per needed column Option[(min,max)] (None = all-null in file) —
    // wrapped in an outer Option: None = this file defeats the path
    case class FStat(rel: String, rows: Long, keyNulls: Long,
                     cols: Map[String, Option[(String, String)]])
    def statOne(st: org.apache.hadoop.fs.FileStatus): Option[Option[FStat]] = {
      import scala.jdk.CollectionConverters._
      val abs = st.getPath.toUri.getPath
      val marker = "/" + txnRel + "/"
      val at = abs.lastIndexOf(marker)
      require(at >= 0, s"file $abs not under txn dir $txnRel")
      val rel = abs.substring(at + 1)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, fs.getConf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala.filter(_.getRowCount > 0L)
        val rows = blocks.map(_.getRowCount).sum
        if (rows == 0L) return Some(None) // empty file: no entry (scan parity)
        var keyNulls = 0L
        val acc = scala.collection.mutable.Map
          .empty[String, Option[(Any, Any)]] // None = all-null so far
        for (b <- blocks; (p, l) <- needed) {
          val dt = schema(l).dataType
          val c = b.getColumns.asScala
            .find(c => c.getPath.size == 1 && c.getPath.toDotString == p)
            .getOrElse(return None)
          val s = c.getStatistics
          if (p == pKey) {
            if (s == null || !s.isNumNullsSet) return None
            keyNulls += s.getNumNulls
          }
          extract(dt, c) match {
            case Some((mn, mx)) => acc(p) = Some(acc.getOrElse(p, None) match {
              case Some((a, b0)) => (if (lt(dt, mn, a)) mn else a,
                if (lt(dt, b0, mx)) mx else b0)
              case None => (mn, mx)
            })
            case None =>
              // no min/max: exact only when provably an all-null chunk
              if (s == null || !s.isNumNullsSet ||
                  s.getNumNulls != b.getRowCount) return None
              if (!acc.contains(p)) acc(p) = None
          }
        }
        if (keyNulls > 0L)
          throw new IllegalArgumentException(
            s"requirement failed: null merge key in $abs: $keyNulls " +
            "row(s) — merge keys must be non-null")
        Some(Some(FStat(rel, rows, keyNulls, needed.map { case (p, l) =>
          p -> acc(p).map { case (a, b) =>
            val dt = schema(l).dataType
            (render(dt, a), render(dt, b))
          }
        }.toMap)))
      } finally rd.close()
    }

    // bounded driver pool: footers are metadata-sized point reads
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(files.length, 32))
    val results =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        import scala.concurrent.duration._
        scala.concurrent.Await.result(
          scala.concurrent.Future.traverse(files)(f =>
            scala.concurrent.Future(statOne(f))),
          Duration.Inf)
      } finally pool.shutdown()
    if (results.contains(None)) return None // some file defeats the path
    Some(results.flatMap(_.get).map { f =>
      val extra = statsCols.flatMap { l =>
        f.cols(physNameOf(colMap, l)).map(l -> _)
      }.toMap
      val (kmn, kmx) = f.cols(pKey).getOrElse(
        return None) // unreachable: keyNulls==0 ⇒ key has values
      FileEntry(f.rel, f.rows, Some(kmn), Some(kmx), extra)
    }.sortBy(_.relPath))
  }

  /** Single-file txn write with the per-file stats OBSERVED during the
    * write job itself — for one output file, the file's stats ARE the
    * batch's global aggregates, so the [[statsFor]] re-read of the
    * just-written bytes is a whole second Spark job of pure overhead.
    * Frequently-committed small tables (group-cardinality agg views
    * syncing every source commit) live on this path; the arrangement
    * (one partition, key-sorted) matches `writeSortedBy(numFiles = 1)`
    * exactly, so the physical layout is indistinguishable. */
  /** Gate a batch write on the table's CHECK constraints at ZERO extra
    * job cost: the violation counts ride the write job itself as
    * observed metrics (the [[writeSingleFileObserved]] technique), so
    * enforcement never adds a second pass over the data — the property
    * that makes constraints affordable at 100 TB ingest rates. Returns
    * the instrumented frame to write and a verifier to call AFTER the
    * write action but BEFORE the manifest commit: a violation throws
    * with the constraint named, no manifest is written, and the
    * already-written files are ordinary orphans for the grace-aged
    * retention sweep. SQL CHECK semantics: a NULL predicate passes
    * (violated only when the expression is definitely false). */
  private def observeChecks(df: DataFrame,
                            constraints: Seq[(String, String)])
      : (DataFrame, () => Unit) =
    if (constraints.isEmpty) (df, () => ())
    else {
      val obs = org.apache.spark.sql.Observation()
      val aggs = constraints.zipWithIndex.map { case ((_, ex), i) =>
        sum(when(not(coalesce(expr(ex).cast("boolean"), lit(true))), 1L)
          .otherwise(0L)).as(s"__viol$i")
      }
      val gated = df.observe(obs, aggs.head, aggs.tail: _*)
      (gated, () => {
        val mm = obs.get
        constraints.zipWithIndex.foreach { case ((n, ex), i) =>
          val v = Option(mm(s"__viol$i")).fold(0L)(_.asInstanceOf[Long])
          if (v > 0L) throw new IllegalStateException(
            s"CHECK constraint '$n' ($ex) violated by $v row(s) in the " +
            "written batch — commit refused; the table is unchanged " +
            "(the attempt's files are unreferenced and will be " +
            "grace-swept)")
        }
      })
    }

  private def writeSingleFileObserved(spark: SparkSession, root: String,
                                      txnRel: String, df: DataFrame,
                                      keyCol: String, statsCols: Seq[String],
                                      colMap: Seq[(String, String)],
                                      schema: StructType): Seq[FileEntry] = {
    val dir = s"$root/$txnRel"
    val obs = org.apache.spark.sql.Observation()
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), count(col(keyCol)).as("nk"),
        min(col(keyCol)).cast("string").as("mn"),
        max(col(keyCol)).cast("string").as("mx")) ++
      statsCols.zipWithIndex.flatMap { case (c, i) => Seq(
        min(col(c)).cast("string").as(s"mn$i"),
        max(col(c)).cast("string").as(s"mx$i")) }
    // stats observed on the LOGICAL frame; the physical projection is
    // the last node before the writer (a pure rename — order preserved).
    // coalesce(1), not repartition(1): the single-file path is the
    // tiny-commit shape, where the repartition's shuffle (plus its AQE
    // stage job) costs more than computing the small upstream in the
    // one task that must write the file anyway.
    toPhysical(colMap, schema,
      df.coalesce(1).sortWithinPartitions(col(keyCol))
        .observe(obs, aggs.head, aggs.tail: _*))
      .write.mode("overwrite").parquet(dir)
    val mm = obs.get
    val n = mm("n").asInstanceOf[Long]
    if (n == 0L) return Seq.empty // statsFor parity: empty file, no entry
    require(n == mm("nk").asInstanceOf[Long],
      s"null merge key in $dir: ${n - mm("nk").asInstanceOf[Long]} " +
      "row(s) — merge keys must be non-null")
    val p = new Path(dir)
    val fs = hfs(spark, p)
    val files = fs.listStatus(p).map(_.getPath.getName)
      .filter(f => f.endsWith(".parquet") && !f.startsWith("_")).sorted
    require(files.length == 1,
      s"expected exactly one data file in $dir, got ${files.length}")
    val extra = statsCols.zipWithIndex.flatMap { case (c, i) =>
      (Option(mm(s"mn$i").asInstanceOf[String]),
        Option(mm(s"mx$i").asInstanceOf[String])) match {
        case (Some(a), Some(b)) => Some(c -> (a, b))
        case _ => None
      }
    }.toMap
    Seq(FileEntry(s"$txnRel/${files.head}", n,
      Option(mm("mn").asInstanceOf[String]),
      Option(mm("mx").asInstanceOf[String]), extra))
  }

  /** FULL single-file swap of a TINY table's content, gated by metrics
    * observed during the write — the ONE-JOB commit primitive for
    * consumer tables (agg views) whose whole state is one file: the
    * caller bakes its validity probes into `newContent`'s plan as
    * Observations, this writes the file (stats fused, same job), then
    * calls `gate` — which reads the now-complete observations — BEFORE
    * any manifest is committed. gate None = commit the swap (all-new
    * entries, tag atomic with the data); gate Some = the window carried
    * no change, commit tag-only (the written copy becomes a grace-period
    * orphan); gate throw = nothing committed at all. A lost version
    * claim surfaces as [[ConcurrentCommitException]] for the caller to
    * re-drive — `newContent` derives from snapshot `m`, so a conflicting
    * winner invalidates it. */
  private[io] def commitSingleFileSwap(spark: SparkSession, path: String,
                                       m: Manifest, newContent: DataFrame,
                                       setTag: String, op: String)
                                      (gate: () => Option[String]): Unit = {
    require(m.partCols.isEmpty && m.zCols.isEmpty,
      "single-file swap is for flat key-sorted tables only")
    val txnRel = freshTxnRel(m.version + 1)
    // constraint gating rides the same single write job as the swap's
    // own fused probes/stats (observeChecks) — still ONE Spark job
    val (gatedContent, verifyChecks) =
      observeChecks(newContent, m.constraints)
    val newE = writeSingleFileObserved(spark, path, txnRel, gatedContent,
      m.keyCol, m.statsCols, m.colMap, m.schema)
    verifyChecks()
    gate() match {
      case Some(_) => setTagOnly(spark, path, setTag)
      case None =>
        writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
          m.schema, m.statsCols, newE, Some(setTag), m.zCols, m.retain, op,
          constraints = m.constraints, colMap = m.colMap,
          retiredPhys = m.retiredPhys)
        retireKeeping(spark, path, m.version + 1, m.retain)
    }
  }

  /** Copy-on-write UPSERT: rows of `updates` replace same-key rows; new
    * keys are inserted. Only files whose [min,max] key range contains an
    * update key are read and rewritten; everything else is carried by
    * reference. `updates` must be key-unique (last-writer-wins is
    * undefined otherwise — same contract as the K3 JDBC upsert).
    * `numFiles` 0 = one output file per touched input file (+1 for a
    * pure insert). `setTag` commits consumer metadata atomically with
    * the data; None preserves the current tag. `maxRetries` bounds the
    * optimistic-concurrency rebase/re-drive attempts after a lost
    * version claim (0 = fail loudly on first conflict). */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            numFiles: Int = 0, setTag: Option[String] = None,
            maxRetries: Int = 3): MergeStats =
    rewrite(spark, path, Some(updates), None, numFiles, setTag, maxRetries)

  /** FULL CONTENT REPLACEMENT as ONE versioned commit — the `INSERT
    * OVERWRITE` primitive: the incoming frame becomes the table's
    * entire content while the table's IDENTITY is preserved (merge
    * key, partition layout, stats columns, CHECK constraints —
    * validated against the new content inside the write job — column
    * mapping, retention, tag). Unlike [[create]], which deletes the
    * root and starts history at version 1, an overwrite is an ordinary
    * commit: superseded files stay readable through the retention
    * window, so time travel reaches the pre-overwrite snapshot and the
    * change feed sees one labeled transition. Content must be
    * key-unique (the [[create]] contract). `numFiles` 0 sizes the
    * write like-for-like (one file per current entry; partitioned
    * tables stay partition-pure with one file per value). */
  def overwriteData(spark: SparkSession, path: String, df: DataFrame,
                    numFiles: Int = 0, setTag: Option[String] = None,
                    maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      val unknown = df.columns.filterNot(m.schema.fieldNames.contains)
      require(unknown.isEmpty,
        s"overwrite batch carries column(s) ${unknown.mkString(",")} the " +
        "table schema lacks — evolve the table first " +
        "(ManifestTable.evolveSchema) or drop them explicitly")
      val missing = m.schema.fieldNames.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"overwrite batch lacks table column(s) ${missing.mkString(",")} " +
        "— an overwrite defines the WHOLE content, every column is " +
        "required")
      val orderedCols = m.schema.fields.map(f => col(f.name).cast(f.dataType))
      val data = df.select(orderedCols: _*)
      val txnRel = freshTxnRel(m.version + 1)
      val nFiles = if (numFiles > 0) numFiles else math.max(1, m.entries.size)
      val (gated, verifyChecks) = observeChecks(data, m.constraints)
      val newE = (m.partCols, m.zCols) match {
        case (Seq(), Some((za, zb))) =>
          // a Z-ordered table's full rewrite stays ON the curve — a
          // key-sorted overwrite would silently drop the recorded
          // layout the manifest still claims
          Tables.writeZOrdered(toPhysical(m.colMap, m.schema, gated),
            s"$path/$txnRel", nFiles,
            physNameOf(m.colMap, za), physNameOf(m.colMap, zb))
          statsFor(spark, path, txnRel, m.keyCol, m.schema, m.statsCols,
            m.colMap)
        case (Seq(), None) =>
          Tables.writeSortedBy(toPhysical(m.colMap, m.schema, gated),
            s"$path/$txnRel", nFiles, physNameOf(m.colMap, m.keyCol))
          statsFor(spark, path, txnRel, m.keyCol, m.schema, m.statsCols,
            m.colMap)
        case (pcs, _) =>
          Tables.writePartitionPure(toPhysical(m.colMap, m.schema, gated),
            s"$path/$txnRel", pcs.map(physNameOf(m.colMap, _)),
            physNameOf(m.colMap, m.keyCol), numFiles)
          val e = statsFor(spark, path, txnRel, m.keyCol, m.schema,
            m.statsCols, m.colMap)
          requirePartitionPure(pcs, e, path)
          e
      }
      verifyChecks()
      writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
        m.schema, m.statsCols, newE, setTag.orElse(m.tag), m.zCols,
        m.retain, "overwrite", partCols = m.partCols,
        constraints = m.constraints, colMap = m.colMap,
        retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** Copy-on-write DELETE of the keys in `keys` (any DataFrame carrying
    * the key column). Touched files are rewritten without those rows;
    * untouched files are carried by reference. */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
                 numFiles: Int = 0, setTag: Option[String] = None,
                 maxRetries: Int = 3): MergeStats =
    rewrite(spark, path, None, Some(keys), numFiles, setTag, maxRetries)

  /** Upsert `upserts` AND delete `delKeys` in ONE atomic commit (one
    * manifest rename) — the primitive incremental consumers need: a
    * change batch lands all-or-nothing together with its `setTag`
    * cursor, leaving no half-applied crash window. The key sets must be
    * disjoint (a changesBetween feed never deletes and upserts the same
    * key; if both appear, the upsert wins). */
  def upsertAndDelete(spark: SparkSession, path: String, upserts: DataFrame,
                      delKeys: DataFrame, numFiles: Int = 0,
                      setTag: Option[String] = None,
                      maxRetries: Int = 3): MergeStats =
    rewrite(spark, path, Some(upserts), Some(delKeys), numFiles, setTag,
      maxRetries)

  /** What a deletion-vector commit did: files re-pointed at a new
    * vector (their bytes untouched on disk), rows newly marked dead,
    * entries dropped because their last live row died, and fresh data
    * files appended (the upsert batch — never a rewrite). */
  case class DvStats(version: Long, filesRepointed: Int, deadMarked: Long,
                     filesDropped: Int, filesWritten: Int)

  /** DELETION-VECTOR delete: mark the keys dead in a parquet sidecar
    * and re-point the covering files' manifest entries at it — ZERO
    * data files rewritten, write cost ∝ the batch, not the touched
    * files. This is the low-write-amplification mutation path for
    * tables whose files are large relative to their churn (deleting 3
    * rows from a 1 GB file costs a 3-row sidecar, not a 1 GB rewrite);
    * [[deleteKeys]] (copy-on-write) remains the right call when churn
    * is dense, and [[compactTable]]/[[compactPartitions]] MATERIALIZE
    * the vectors (reads apply them, so the compacted files come out
    * clean and the sidecars age out of retention). Reads, time travel,
    * the change feed, incremental consumers, and later copy-on-write
    * merges all see exactly the live rows. A file whose last live row
    * dies is dropped from the manifest entirely. Deleting keys already
    * dead (or absent) is a no-op per key; a batch marking nothing new
    * burns no version. */
  def deleteKeysDV(spark: SparkSession, path: String, keys: DataFrame,
                   setTag: Option[String] = None,
                   maxRetries: Int = 3): DvStats =
    dvCommit(spark, path, None, Some(keys), 0, setTag, maxRetries)

  /** DELETION-VECTOR upsert (merge without rewrite): matched keys are
    * marked dead via the sidecar exactly like [[deleteKeysDV]] and the
    * full batch is APPENDED as fresh key-sorted files — the touched
    * files' bytes never move, so write cost is ∝ the batch. Same
    * key-unique contract as [[merge]]. `numFiles` 0 = one appended
    * file. The append does fragment the key-range layout over time —
    * the compaction family folds it back (and materializes the
    * vectors) on the usual maintenance cadence. */
  def upsertDV(spark: SparkSession, path: String, updates: DataFrame,
               numFiles: Int = 0, setTag: Option[String] = None,
               maxRetries: Int = 3): DvStats =
    dvCommit(spark, path, Some(updates), None, numFiles, setTag, maxRetries)

  /** PREDICATE DELETE (`DELETE FROM t WHERE cond`) at metadata speed
    * where the stats allow it, and deletion-vector speed everywhere
    * else — ONE atomic commit, ZERO data files rewritten:
    *
    *   - files whose stats PROVE every row matches (merge-key or
    *     partition-column comparisons covering the whole [min,max]
    *     range — both are non-null by contract, so range coverage is
    *     row coverage) leave the manifest outright: never opened,
    *     never sidecar'd. Dropping a year of a time-keyed or
    *     time-partitioned table is a manifest write.
    *   - files that POSSIBLY hold a match are read (file-pruned — the
    *     [[readWhere]] sets), and their matching LIVE keys are marked
    *     dead through the usual sidecar re-point.
    *   - files the stats rule out are untouched, byte-identical.
    *
    * `cond` must be deterministic (it is evaluated once against stats
    * and once against rows); SQL DELETE semantics apply — rows where
    * `cond` is NULL survive. Returns the dv accounting: `deadMarked`
    * includes the dropped files' rows, `filesDropped` the metadata
    * drops (plus any file the sidecar fully killed). Re-derives its
    * row set from the fresh snapshot on each optimistic-concurrency
    * retry, so a conflicting winner's changes are honored. */
  def deleteWhere(spark: SparkSession, path: String, cond: Column,
                  setTag: Option[String] = None,
                  maxRetries: Int = 3): DvStats =
    retryingCommit(spark, path, maxRetries) { m =>
      val exprOpt = analyzedCond(spark, m.schema, cond)
      val (possible, covered) = exprOpt
        .map(whereSetsExpr(spark, m, _))
        .getOrElse((m.entries, Set.empty[String]))
      // bloom file-skipping only ever rules files OUT of the match
      // read (a "no" is exact); coverage proofs are untouched by it
      val uncovered = possible.filterNot(e => covered(e.relPath))
      val partial = exprOpt
        .map(BloomSkip.prune(spark, path, m, _, uncovered))
        .getOrElse(uncovered)
      if (partial.isEmpty && covered.isEmpty) {
        // predicate provably matches nothing: burn no version
        setTag.foreach(t => setTagOnly(spark, path, t))
        DvStats(m.version, 0, 0L, 0, 0)
      } else {
        val keys = readEntries(spark, path, m.schema, m.keyCol, partial,
          m.colMap).filter(cond).select(col(m.keyCol))
        // partial IS the touch set: every live image of a matched key
        // sits in a candidate file (keys are table-unique and were
        // found there), so the probe job is pure re-derivation
        attemptDvCommit(spark, path, m, None, Some(keys), 0, setTag,
          covered,
          touchedOverride = Some(partial.map(_.relPath).toSet))
      }
    }

  /** PREDICATE UPDATE (`UPDATE t SET col = expr, … WHERE cond`) — the
    * [[deleteWhere]] sibling that completes the DML triad next to
    * [[mergeInto]]: matching rows are found with the [[readWhere]]
    * file-pruned read, their post-images computed column-wise (`set`
    * expressions see the row's CURRENT values, so `price -> price + 1`
    * works), and the result lands through ONE deletion-vector commit —
    * old images die in sidecars, post-images append key-sorted, no
    * data file is rewritten; cost ∝ matched rows, never table size.
    * The merge key is not updatable (rewriting identity breaks the key
    * contract — delete + insert instead). `cond` must be deterministic;
    * rows where it is NULL are untouched (SQL semantics). Post-images
    * are functions of the target's current rows, so each
    * optimistic-concurrency retry re-derives them against the fresh
    * snapshot. `numFiles` 0 = one appended file. */
  def updateWhere(spark: SparkSession, path: String, cond: Column,
                  set: Map[String, Column], numFiles: Int = 0,
                  setTag: Option[String] = None,
                  maxRetries: Int = 3): DvStats = {
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    retryingCommit(spark, path, maxRetries) { m =>
      val unknown = set.keys.filterNot(m.schema.fieldNames.contains)
      require(unknown.isEmpty,
        s"SET references column(s) ${unknown.mkString(",")} the table " +
        "schema lacks")
      require(!set.contains(m.keyCol),
        s"the merge key '${m.keyCol}' is not updatable — delete + insert " +
        "instead")
      val exprOpt = analyzedCond(spark, m.schema, cond)
      val possible0 = exprOpt.map(whereSetsExpr(spark, m, _)._1)
        .getOrElse(m.entries)
      val possible = exprOpt
        .map(BloomSkip.prune(spark, path, m, _, possible0))
        .getOrElse(possible0)
      // persisted: the post images feed BOTH the batch-key projection
      // and the appended file's write — without the cache the second
      // action re-reads and re-filters the candidate files
      val post = readEntries(spark, path, m.schema, m.keyCol, possible,
          m.colMap)
        .filter(cond)
        .select(m.schema.fieldNames.map(f =>
          set.get(f).map(_.as(f)).getOrElse(col(f))): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // possible IS the touch set (the deleteWhere argument: matched
      // keys' live images all sit in candidate files, and the merge
      // key is not updatable so post images kill only those)
      try attemptDvCommit(spark, path, m, Some(post), None, numFiles,
        setTag, touchedOverride = Some(possible.map(_.relPath).toSet))
      finally post.unpersist(blocking = false)
    }
  }

  /** Upsert + delete in ONE deletion-vector commit (the dv twin of
    * [[upsertAndDelete]], same disjoint-keys contract). */
  def upsertAndDeleteDV(spark: SparkSession, path: String,
                        upserts: DataFrame, delKeys: DataFrame,
                        numFiles: Int = 0, setTag: Option[String] = None,
                        maxRetries: Int = 3): DvStats =
    dvCommit(spark, path, Some(upserts), Some(delKeys), numFiles, setTag,
      maxRetries)

  /** PREDICATE REPLACE (`INSERT OVERWRITE ... PARTITION (c=v)`, Delta's
    * `replaceWhere`): delete every row matching `cond` AND land
    * `replacement` in ONE atomic deletion-vector commit — a reader
    * either sees the old slice or the new one, never the gap a
    * delete-then-insert pair would open, and a crash between the two
    * can never leave the slice removed with no replacement. The delete
    * half rides [[deleteWhere]]'s machinery verbatim (stats coverage
    * proofs drop fully-matching files metadata-only, bloom skipping
    * prunes the match read); the replacement appends as fresh
    * key-sorted (partition-pure on a partitioned table) files. A key
    * both matched and re-inserted is an in-commit upsert: the old image
    * dies in the sidecar, the new image appends — no disjointness
    * contract. Each optimistic-concurrency retry re-derives the matched
    * row set from the fresh snapshot. Matching nothing while replacing
    * nothing burns no version. */
  def replaceWhere(spark: SparkSession, path: String, cond: Column,
                   replacement: DataFrame, numFiles: Int = 0,
                   setTag: Option[String] = None,
                   maxRetries: Int = 3): DvStats = {
    // consumed by several jobs per attempt (touch set, dead-pair scan,
    // the append) and possibly across retries — same persist rationale
    // as [[dvCommit]]
    val repl = replacement.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try retryingCommit(spark, path, maxRetries) { m =>
      val exprOpt = analyzedCond(spark, m.schema, cond)
      val (possible, covered) = exprOpt
        .map(whereSetsExpr(spark, m, _))
        .getOrElse((m.entries, Set.empty[String]))
      val uncovered = possible.filterNot(e => covered(e.relPath))
      val partial = exprOpt
        .map(BloomSkip.prune(spark, path, m, _, uncovered))
        .getOrElse(uncovered)
      val keys =
        if (partial.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(org.apache.spark.sql.types
              .StructField(m.keyCol, m.keyType, nullable = false))))
        else readEntries(spark, path, m.schema, m.keyCol, partial,
          m.colMap).filter(cond).select(col(m.keyCol))
      attemptDvCommit(spark, path, m, Some(repl), Some(keys), numFiles,
        setTag, covered)
    } finally repl.unpersist(blocking = false)
  }

  private def dvCommit(spark: SparkSession, path: String,
                       upserts0: Option[DataFrame], dels0: Option[DataFrame],
                       numFiles: Int, setTag: Option[String],
                       maxRetries: Int): DvStats = {
    // same persist rationale as [[rewrite]]: both inputs feed several
    // jobs (touch set, the matched-pair scan, the sidecar write, the
    // append) and may be expensive upstream derivations
    val upserts = upserts0.map(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dels = dels0.map(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try retryingCommit(spark, path, maxRetries) { m =>
      attemptDvCommit(spark, path, m, upserts, dels, numFiles, setTag)
    } finally {
      upserts.foreach(_.unpersist(blocking = false))
      dels.foreach(_.unpersist(blocking = false))
    }
  }

  private def attemptDvCommit(spark: SparkSession, path: String, m: Manifest,
                              upserts: Option[DataFrame],
                              dels: Option[DataFrame],
                              numFiles: Int,
                              setTag: Option[String],
                              dropRels: Set[String] = Set.empty,
                              // predicate callers (deleteWhere /
                              // updateWhere / replaceWhere) already
                              // know the candidate files driver-side
                              // from the stats+bloom pruning — any
                              // SUPERSET of the true touch set is
                              // sound (an untouched candidate scans to
                              // zero dead pairs and is carried
                              // verbatim), and passing it skips the
                              // touch-probe Spark job every dv commit
                              // otherwise pays
                              touchedOverride: Option[Set[String]] = None)
      : DvStats = {
    upserts.foreach { u =>
      val unknown = u.columns.filterNot(m.schema.fieldNames.contains)
      require(unknown.isEmpty,
        s"upsert batch carries column(s) ${unknown.mkString(",")} the " +
        s"table schema lacks — evolve the table first " +
        s"(ManifestTable.evolveSchema) or drop them explicitly")
    }
    // the dv read path bolts helper columns onto the data frame; a
    // schema already using those names would be silently clobbered
    val reserved = Seq("__fn", "__dvfn", "__f", "__k")
      .filter(m.schema.fieldNames.contains)
    require(reserved.isEmpty, s"deletion vectors reserve column name(s) " +
      s"${reserved.mkString(",")} — rename them or use the copy-on-write " +
      "ops (merge/deleteKeys)")
    val keyK = col(m.keyCol)
    val keySets = upserts.map(_.select(keyK)).toSeq ++
      dels.map(_.select(keyK)).toSeq
    // materialized by several actions (the touch-set probe and
    // newPairs' semi join) — persist the key projection rather than
    // re-deriving its upstream filter per action. NO distinct(): the
    // semi join and the touch probe are duplicate-insensitive, and the
    // distinct's shuffle (plus AQE stage jobs) would tax every dv
    // commit for nothing.
    val batchKeys = keySets.reduce(_ unionByName _)
      .select(keyK.cast(m.keyType).as("__k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try attemptDvBody(spark, path, m, upserts, dels, numFiles, setTag,
      batchKeys, dropRels, touchedOverride)
    finally batchKeys.unpersist(blocking = false)
  }

  private def attemptDvBody(spark: SparkSession, path: String, m: Manifest,
                            upserts: Option[DataFrame],
                            dels: Option[DataFrame], numFiles: Int,
                            setTag: Option[String],
                            batchKeys: DataFrame,
                            // [[deleteWhere]]'s metadata-drop set:
                            // entries removed WHOLESALE (every row
                            // proved dead) — never scanned, never
                            // sidecar'd, just absent from the next
                            // manifest (the CoW-delete file-drop shape,
                            // so CDF and retention treat them alike)
                            dropRels: Set[String] = Set.empty,
                            touchedOverride: Option[Set[String]] = None)
      : DvStats = {
    val keyK = col(m.keyCol)
    // ≤1 live file: same trade as the copy-on-write path — probing
    // whether the batch intersects the one file's range costs a Spark
    // job, and the dead-pair scan below finds the same answer anyway
    // (zero matches commits nothing)
    val touched0 = touchedOverride.getOrElse {
      if (m.entries.size <= 1) m.entries.map(_.relPath).toSet
      else touchSet(spark, batchKeys.select(col("__k").as(m.keyCol)),
        col(m.keyCol), m)
    }
    // a dropped file may still RANGE-cover batch keys (overlapping key
    // ranges); it must not be scanned or re-added through keptTouched
    val touched = touched0 -- dropRels
    val touchedE = m.entries.filter(e => touched(e.relPath))

    // dead pairs = (file, key) of PHYSICAL rows matching a batch key,
    // minus pairs an earlier vector already holds (double-delete is a
    // per-key no-op and must not inflate the dead accounting). Pairs
    // carry BOTH file handles: the url-encoded absolute path (exact —
    // the per-file accounting decodes it driver-side, the [[statsFor]]
    // technique) and the bare file name (the read-side anti-join
    // handle; exact for pairs because same-named files can only come
    // from one partition-pure write job, whose batch is key-unique, so
    // a (name, key) pair still names at most one physical row).
    val phys =
      if (touchedE.isEmpty)
        // an empty scan has no _metadata column to select — and nothing
        // to mark dead
        spark.emptyDataFrame.select(lit("").as("__fp"), lit("").as("__fn"),
          lit(null).cast(m.keyType).as("__k")).limit(0)
      else readEntriesRaw(spark, path, physSchemaOf(m.colMap, m.schema),
          touchedE)
        .select(col("_metadata.file_path").as("__fp"),
          col("_metadata.file_name").as("__fn"),
          col(physNameOf(m.colMap, m.keyCol)).cast(m.keyType).as("__k"))
    // each entry's FULL dead set lives in its own sidecar (repoints
    // consolidate pairs forward), so the per-sidecar-group scoped read
    // is complete — and, unlike a union filtered by file membership,
    // never double-reads a file whose stale pairs also survive in
    // another still-referenced sidecar (carryOld below writes these
    // pairs into the NEXT sidecar; duplicates there would inflate it
    // and poison later changesBetween multiset diffs)
    val oldPairs = deadPairsScoped(spark, path, m.keyType, touchedE)
    val oldPairsFn = oldPairs
      .select(element_at(split(col("__f"), "/"), -1).as("__fn"), col("__k"))
    val newPairs = phys.join(batchKeys, Seq("__k"), "left_semi")
      .join(oldPairsFn, Seq("__fn", "__k"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // per-file newly-dead counts: metadata-sized (≤ one row per
      // touched file) — the entry arithmetic below is driver-side.
      // file_path → entry resolution matches against the TOUCHED
      // ENTRIES' resolved locations, never a path-prefix parse: a
      // shallow clone's borrowed entries live under the SOURCE
      // table's dirs (slicing at this table's txn marker would
      // mis-relativize them), and a FILE NAME alone is ambiguous on
      // partition-pure layouts (one write job emits the same part
      // name under every `__p=` dir). The metadata path is
      // URL-encoded while the manifest stores the filesystem form
      // ([[statsFor]] gotcha) — decode before comparing; the suffix
      // fallback covers path-form differences (scheme, relative
      // table roots), and rel paths carry their txn dir so a suffix
      // names at most one entry.
      val fpRows = jobDesc(spark, "dv dead-pairs") {
        newPairs.groupBy("__fp")
          .agg(count(lit(1)).as("n")).collect()
      }
      val relByAbs: Map[String, String] = touchedE.map(e =>
        new Path(absOf(path, e.relPath)).toUri.getPath -> e.relPath).toMap
      def relOf(fp: String): String = {
        val abs =
          try new java.net.URI(fp).getPath
          catch { case _: java.net.URISyntaxException => fp }
        relByAbs.getOrElse(abs,
          touchedE.collectFirst {
            case e if abs == e.relPath ||
                abs.endsWith("/" + e.relPath) => e.relPath
          }.getOrElse(throw new IllegalStateException(
            s"file $abs not among the touched entries of $path")))
      }
      val relByFp: Map[String, String] =
        fpRows.map(r => r.getString(0) -> relOf(r.getString(0))).toMap
      val deadByRel: Map[String, Long] =
        fpRows.map(r => relByFp(r.getString(0)) -> r.getLong(1)).toMap
      val deadTotal = deadByRel.values.sum

      val nextV = m.version + 1
      val dataRel = freshTxnRel(nextV)
      // sidecar OUTSIDE the data txn dir: statsFor scans the txn dir
      // recursively and must never see vector rows as table rows
      val dvRel = s"$dataRel-dv"

      // the upsert batch APPENDS as fresh key-sorted files — never a
      // rewrite of existing bytes. WRITE-FIRST: the append's own
      // recorded stats reveal emptiness, so the common non-empty case
      // pays no separate isEmpty probe job; an all-empty batch leaves
      // only an orphan txn dir (uuid-suffixed, grace-aged retention
      // sweeps it) and burns no version.
      val appended = upserts match {
        case Some(u) => jobDesc(spark, "dv append") {
          val ordered = m.schema.fields.map(f => col(f.name).cast(f.dataType))
          // CHECK constraints gate the appended batch inside its own
          // write job (observed metrics — no second pass)
          val (gatedU, verifyChecks) =
            observeChecks(u.select(ordered: _*), m.constraints)
          val written = m.partCols match {
            case pcs if pcs.nonEmpty =>
              // a partitioned table's append must stay partition-pure,
              // or the metadata-only partition ops lose their addressing
              Tables.writePartitionPure(
                toPhysical(m.colMap, m.schema, gatedU),
                s"$path/$dataRel", pcs.map(physNameOf(m.colMap, _)),
                physNameOf(m.colMap, m.keyCol), numFiles)
              val e = statsFor(spark, path, dataRel, m.keyCol, m.schema,
                m.statsCols, m.colMap)
              requirePartitionPure(pcs, e, path)
              e
            case _ =>
              val n = math.max(1, numFiles)
              if (n == 1)
                writeSingleFileObserved(spark, path, dataRel,
                  gatedU, m.keyCol, m.statsCols, m.colMap, m.schema)
              else {
                Tables.writeSortedBy(
                  toPhysical(m.colMap, m.schema, gatedU),
                  s"$path/$dataRel", n, physNameOf(m.colMap, m.keyCol))
                statsFor(spark, path, dataRel, m.keyCol, m.schema,
                  m.statsCols, m.colMap)
              }
          }
          verifyChecks()
          written.filter(_.rows > 0L)
        }
        case None => Seq.empty
      }

      if (deadTotal == 0L && appended.isEmpty && dropRels.isEmpty) {
        // nothing newly dead and nothing to append: burn no version —
        // but a consumer's cursor must still advance, or its window
        // (e.g. deletes of keys its mirror never had) replays forever
        setTag.foreach(t => setTagOnly(spark, path, t))
        return DvStats(m.version, 0, 0L, 0, 0)
      }

      // files with ≥1 newly-dead row re-point to the NEW sidecar; it
      // carries their new pairs plus their prior pairs (consolidation
      // — one sidecar read per file group at read time). Touched files
      // with nothing newly dead keep their old reference untouched.
      val repointedE = touchedE.filter(e =>
        deadByRel.getOrElse(e.relPath, 0L) > 0L)
      val (dropped, updatedE) =
        if (repointedE.isEmpty) (Seq.empty[FileEntry], Seq.empty[FileEntry])
        else {
          val repointedRels = repointedE.map(_.relPath).toSet
          val fpToRel = spark.createDataFrame(
              relByFp.toSeq.filter(kv => repointedRels(kv._2)))
            .toDF("__fp", "__f")
          val carryOld = oldPairs.filter(
            col("__f").isin(repointedRels.toSeq: _*))
          // sidecars are kept (file, key)-unique by construction — the
          // scoped carryOld + the anti-joined newPairs cannot collide —
          // and the distinct() pins that invariant against any sidecar
          // a prior writer left duplicated (consolidateDv parity); the
          // set is pair-sized, so the dedup shuffle is trivial next to
          // the data-file scan above
          jobDesc(spark, "dv sidecar-write") {
            val np = newPairs.join(broadcast(fpToRel), Seq("__fp"))
              .select(col("__f"), col("__k"))
            // FIRST vector on every re-pointed file (the common case —
            // a fresh delete/update): nothing to carry and newPairs is
            // (file,key)-unique by construction (one physical row per
            // pair, anti-joined against prior pairs), so the defensive
            // union+distinct — a shuffle plus AQE stage jobs on every
            // dv commit — is skipped outright
            val out =
              if (repointedE.forall(_.dv.isEmpty)) np
              else np.unionByName(carryOld).distinct()
            out.write.mode("overwrite").parquet(s"$path/$dvRel")
          }
          val split = repointedE.map { e =>
            val newDead = deadByRel(e.relPath)
            val live = e.rows - newDead
            require(live >= 0L, s"dv accounting bug on ${e.relPath}: " +
              s"live=$live")
            e.copy(rows = live,
              dv = Some(DvRef(dvRel, e.dv.fold(0L)(_.dead) + newDead)))
          }.partition(_.rows == 0L)
          split
        }
      // a fully-dead file leaves the manifest; its rows are all in the
      // sidecar but no entry points there, so the reader never opens it
      val keptTouched = touchedE.filter(e =>
        deadByRel.getOrElse(e.relPath, 0L) == 0L) ++ updatedE
      val carried = m.entries.filterNot(e =>
        touched(e.relPath) || dropRels(e.relPath))
      // e.rows is the LIVE count (every dv commit decrements it, see
      // `split` above), so summing it counts exactly the rows this drop
      // newly kills — rows already dead in a carried sidecar are NOT
      // in it (no subtraction of e.dv.dead here, that would double-
      // discount); DeleteWhereSpec pins this on a dv-carrying file
      val dropRows = m.entries.filter(e => dropRels(e.relPath))
        .map(_.rows).sum

      val op =
        if (dropRels.nonEmpty) "delete-where-dv"
        else if (upserts.isDefined && dels.isDefined) "upsert+delete-dv"
        else if (upserts.isDefined) "merge-dv"
        else "delete-dv"
      commitFence()
      writeManifest(spark, path, nextV, m.keyCol, m.keyType, m.schema,
        m.statsCols, carried ++ keptTouched ++ appended,
        setTag.orElse(m.tag), m.zCols, m.retain, op, partCols = m.partCols,
        constraints = m.constraints, colMap = m.colMap,
        retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, nextV, m.retain)
      DvStats(nextV, updatedE.size, deadTotal + dropRows,
        dropped.size + dropRels.size, appended.size)
    } finally newPairs.unpersist(blocking = false)
  }

  /** One `WHEN MATCHED [AND condition] THEN action` clause of a
    * conditional merge ([[mergeInto]]). `condition` (None = always) and
    * [[UpdateSet]] expressions reference TARGET columns as `t.<col>`
    * and SOURCE columns as `s.<col>`. */
  case class WhenMatched(condition: Option[Column], action: MatchedAction)
  sealed trait MatchedAction
  /** Update only the named columns; the rest keep the target's values.
    * The merge key itself is not updatable (rewriting identity breaks
    * the key contract — delete + insert instead). */
  case class UpdateSet(set: Map[String, Column]) extends MatchedAction
  /** Remove the matched row. */
  case object DeleteMatched extends MatchedAction

  /** CONDITIONAL copy-on-write MERGE — the Delta-merge shape, so a CDC
    * feed with column-level updates needs no pre-joining:
    * {{{
    * MERGE INTO target t USING source s ON t.key = s.key
    *   WHEN MATCHED AND <cond1> THEN UPDATE SET colA = <expr>, ...
    *   WHEN MATCHED AND <cond2> THEN DELETE
    *   WHEN NOT MATCHED THEN INSERT *
    * }}}
    * Clauses apply FIRST-MATCH-WINS per row; a matched row no clause
    * accepts is carried unchanged, and `insertUnmatched` controls the
    * NOT MATCHED branch (the source must then carry the full table
    * schema; extra source columns are fine either way — usable in
    * conditions, never written). `insertCond` (requires
    * `insertUnmatched`) further gates the inserted rows — the SQL
    * `WHEN NOT MATCHED AND <cond> THEN INSERT` shape; it references
    * source columns as `s.<col>` and never affects matched processing.
    * `whenNotMatchedBySource` handles TARGET rows whose key the source
    * lacks (`WHEN NOT MATCHED BY SOURCE THEN DELETE / UPDATE SET`):
    * first-match-wins like the matched clauses, but conditions and SET
    * expressions may reference only target columns (`t.<col>`). It
    * reads the FULL target (the semantics require deciding every
    * target row) — at scale prefer source-driven merges where the
    * touch set bounds the read — and it disables the cheap disjoint
    * rebase: ANY concurrent winner re-resolves, because a winner's
    * insert is itself "not matched by source". `source` must be
    * key-unique; `assertSourceUnique` verifies that against the
    * persisted source and fails loudly naming duplicates (the SQL
    * MERGE tier turns this on — Delta's cardinality check; the
    * programmatic default trusts the documented contract and skips the
    * extra aggregation job).
    *
    * Composition: the matched rows are resolved here (touch-set-pruned
    * file read + broadcast-friendly key join), then the post-images and
    * delete keys land through [[upsertAndDelete]] — ONE atomic commit
    * with the full optimistic-concurrency protocol. The touched files
    * are read twice (once to resolve matches, once in the rewrite's
    * survivor pass) — the price of composing on the audited commit
    * path; both reads are touch-set-bounded, never table scans.
    *
    * CONCURRENCY: unlike plain merge, the post-images here are
    * FUNCTIONS of the target's current rows, so a conflicting winner
    * that touched this batch's files or keys invalidates them — the
    * rewrite underneath therefore runs with its cheap disjoint-REBASE
    * only (still valid: a disjoint winner changed nothing the clauses
    * read), and any overlapping conflict comes back here to re-resolve
    * conditions and post-images against the winner's state before
    * retrying. A no-op outcome (no clause matched a row, nothing to
    * insert) burns NO version — at most a metadata-only tag commit. */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
                whenMatched: Seq[WhenMatched],
                insertUnmatched: Boolean = true,
                numFiles: Int = 0, setTag: Option[String] = None,
                maxRetries: Int = 3,
                insertCond: Option[Column] = None,
                whenNotMatchedBySource: Seq[WhenMatched] = Seq.empty,
                assertSourceUnique: Boolean = false): MergeStats = {
    require(insertCond.isEmpty || insertUnmatched,
      "insertCond without insertUnmatched — there is no insert to gate")
    // resolved several times below (matched join, inserts, the rewrite
    // underneath, and possibly conflict re-resolutions) — persist
    val src = source.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var left = maxRetries
      var uniqueChecked = false
      while (true) {
        val m = readManifest(spark, path)
        val key = m.keyCol
        val tableCols = m.schema.fieldNames
        if (assertSourceUnique && !uniqueChecked) {
          // one aggregation over the persisted source; collects at most
          // a handful of offenders for the message
          val dups = src.groupBy(col(key)).agg(count(lit(1)).as("__n"))
            .filter(col("__n") > 1).limit(5)
            .collect().map(_.get(0)).mkString(", ")
          require(dups.isEmpty, s"merge source is not key-unique on " +
            s"'$key' — duplicate key(s): $dups … (each source key must " +
            "match at most one post-image; pre-aggregate the source)")
          uniqueChecked = true
        }
        whenNotMatchedBySource.foreach {
          case WhenMatched(_, UpdateSet(set)) =>
            val unknown = set.keys.filterNot(tableCols.contains)
            require(unknown.isEmpty, s"NOT MATCHED BY SOURCE UPDATE SET " +
              s"names column(s) ${unknown.mkString(",")} not in the table " +
              "schema")
            require(!set.contains(key), s"UPDATE SET must not rewrite " +
              s"the merge key '$key' — delete + insert instead")
          case _ => ()
        }
        whenMatched.foreach {
          case WhenMatched(_, UpdateSet(set)) =>
            val unknown = set.keys.filterNot(tableCols.contains)
            require(unknown.isEmpty, s"UPDATE SET names column(s) " +
              s"${unknown.mkString(",")} not in the table schema")
            require(!set.contains(key), s"UPDATE SET must not rewrite " +
              s"the merge key '$key' — delete + insert instead")
          case _ => ()
        }
        if (insertUnmatched) {
          val missing = tableCols.filterNot(source.columns.contains)
          require(missing.isEmpty, "WHEN NOT MATCHED THEN INSERT needs " +
            s"the source to carry the full table schema; missing: " +
            missing.mkString(","))
        } else require(source.columns.contains(key),
          s"source lacks the merge key column '$key'")

        // NO distinct(): every consumer — the touch probe, the nms
        // anti-join, the rebase guard's re-probe — is duplicate-
        // insensitive, and the source is key-unique by contract anyway;
        // the shuffle only taxed the touch-set job
        val srcKeys = src.select(col(key))
        // NOT MATCHED BY SOURCE must decide EVERY target row, so the
        // touch set widens to the whole table (the semantics, not a
        // missed optimization — Delta scans the full target too)
        val touched =
          if (whenNotMatchedBySource.nonEmpty) m.entries.map(_.relPath).toSet
          else touchSet(spark, srcKeys, col(key), m)
        val touchedE = m.entries.filter(e => touched(e.relPath))
        val target = readEntries(spark, path, m.schema, m.keyCol, touchedE,
          m.colMap)
        val joined = target.alias("t")
          .join(src.alias("s"), col(s"t.$key") === col(s"s.$key"), "inner")
        // first-match-wins clause index per matched row (−1 = no clause
        // accepts the row → not in the batch, survives unchanged)
        val actionIdx = whenMatched.zipWithIndex
          .foldRight(lit(-1): Column) { case ((wm, i), rest) =>
            when(wm.condition.getOrElse(lit(true)), lit(i)).otherwise(rest)
          }
        // consumed by several branches (updates, dels, emptiness
        // probes) — persist so the matched join runs once per attempt
        val acted = joined.withColumn("__action", actionIdx)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // target rows the source does NOT match, with their own
        // first-match-wins clause index — same algebra as the matched
        // side, over `t.` columns only. Persisted: consumed by the
        // update/delete splits and the no-op probe.
        val nmsActed = whenNotMatchedBySource.headOption.map { _ =>
          val nmsIdx = whenNotMatchedBySource.zipWithIndex
            .foldRight(lit(-1): Column) { case ((wm, i), rest) =>
              when(wm.condition.getOrElse(lit(true)), lit(i))
                .otherwise(rest)
            }
          target.alias("t").join(srcKeys, Seq(key), "left_anti")
            .withColumn("__action", nmsIdx)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        try {
          val updates = whenMatched.zipWithIndex.collect {
            case (WhenMatched(_, UpdateSet(set)), i) =>
              acted.filter(col("__action") === i)
                .select(tableCols.toSeq.map(c =>
                  set.getOrElse(c, col(s"t.$c")).as(c)): _*)
          }
          val deleteIdx = whenMatched.zipWithIndex.collect {
            case (WhenMatched(_, DeleteMatched), i) => i
          }
          val dels0 =
            if (deleteIdx.isEmpty) None
            else Some(acted
              .filter(col("__action").isin(deleteIdx.map(Int.box): _*))
              .select(col(s"t.$key").as(key)))
          val inserts0 =
            if (!insertUnmatched) None
            else Some {
              val unmatched = src.alias("s")
                .join(target.select(col(key)), Seq(key), "left_anti")
              insertCond.fold(unmatched)(unmatched.filter)
                .select(tableCols.toSeq.map(c => col(c)): _*)
            }
          // ROW-empty outcomes (not just structurally absent clauses)
          // must not burn a version: a periodic conditional merge whose
          // clauses match nothing would otherwise consume the
          // time-travel/change-feed window and leave orphan empty
          // files. The matched side probes the PERSISTED acted rows;
          // the insert side probes the anti-join DIRECTLY (below)
          val hasActed = !acted.filter(col("__action") =!= -1).isEmpty
          // probed directly from the insert anti-join (touch-set-bounded,
          // lazy — only runs when no clause fired). NOT count arithmetic
          // (src.count > acted.count): that is only valid while the
          // target is strictly key-unique, and a duplicate target key (a
          // contract violation other paths surface loudly) would inflate
          // acted and silently swallow genuine inserts as a no-op
          def hasInserts = inserts0.exists(i => !i.isEmpty)
          def hasNms = nmsActed.exists(n =>
            !n.filter(col("__action") =!= -1).isEmpty)
          if (!hasActed && !hasInserts && !hasNms) {
            setTag.foreach(t => setTagOnly(spark, path, t, maxRetries))
            val n = m.entries.size
            return MergeStats(latestVersion(spark, path).getOrElse(m.version),
              n, 0, 0, n)
          }
          val nmsUpdates = nmsActed.toSeq.flatMap { nms =>
            whenNotMatchedBySource.zipWithIndex.collect {
              case (WhenMatched(_, UpdateSet(set)), i) =>
                nms.filter(col("__action") === i)
                  .select(tableCols.toSeq.map(c =>
                    set.getOrElse(c, col(s"t.$c")).as(c)): _*)
            }
          }
          val nmsDelIdx = whenNotMatchedBySource.zipWithIndex.collect {
            case (WhenMatched(_, DeleteMatched), i) => i
          }
          val nmsDels = nmsActed.filter(_ => nmsDelIdx.nonEmpty).map(nms =>
            nms.filter(col("__action").isin(nmsDelIdx.map(Int.box): _*))
              .select(col(s"t.$key").as(key)))
          val upserts = (updates ++ nmsUpdates ++ inserts0.toSeq)
            .reduceOption(_ unionByName _)
          val allDels = (dels0.toSeq ++ nmsDels.toSeq)
            .reduceOption(_ unionByName _)
          try return rewrite(spark, path, upserts, allDels, numFiles, setTag,
            maxRetries = left, op = "merge-conditional",
            allowRedrive = false, snapshot = Some(m),
            rebaseGuard = Some((srcKeys, touched)),
            // a winner's INSERT is itself "not matched by source": the
            // cheap disjoint rebase would carry its rows past the nms
            // clauses unexamined — any conflict must re-resolve
            allowRebase = whenNotMatchedBySource.isEmpty)
          catch { case e: ConcurrentCommitException =>
            // an overlapping winner invalidated the resolved
            // post-images — re-resolve against its state and retry
            if (left <= 0) throw conflictExhausted(path, e)
            left -= 1
          }
        } finally {
          acted.unpersist(blocking = false)
          nmsActed.foreach(_.unpersist(blocking = false))
        }
      }
      throw new IllegalStateException("unreachable")
    } finally src.unpersist(blocking = false)
  }

  /** Current consumer tag, or None. */
  def readTag(spark: SparkSession, path: String): Option[String] =
    readManifest(spark, path).tag

  /** The tag as a source-version number, with a curated error when the
    * tag belongs to some other consumer convention — a raw
    * NumberFormatException would name neither the path nor the remedy. */
  private[graft] def numericTag(spark: SparkSession, path: String,
                                missingMsg: String): Long =
    readTag(spark, path) match {
      case None => throw new IllegalStateException(missingMsg)
      case Some(t) if t.nonEmpty && t.forall(_.isDigit) => t.toLong
      case Some(t) => throw new IllegalStateException(
        s"sync tag on $path is '$t', not a source version number — the " +
        "table is tracked by a different consumer convention; refusing " +
        "to sync over it (re-bootstrap to adopt it)")
    }

  /** Shared consumer-job dispatch (the mirror and the agg view are the
    * first two; the next consumer should not clone the refusal
    * semantics): no destination → bootstrap; destination without a sync
    * tag → refuse loudly (it was not created by this consumer;
    * overwriting would destroy a table the job does not own);
    * otherwise → sync. */
  private[graft] def dispatchConsumer(spark: SparkSession, dstPath: String)
      (bootstrap: => Long)(sync: => Option[(Long, Long)])
      : Option[(Long, Long)] =
    latestVersion(spark, dstPath) match {
      case None => Some((0L, bootstrap))
      case Some(_) if readTag(spark, dstPath).isEmpty =>
        throw new IllegalStateException(
          s"$dstPath exists but carries no sync tag — it was not " +
          "bootstrapped by this job; refusing to overwrite it")
      case Some(_) => sync
    }

  /** ADDITIVE schema evolution as a metadata-only commit: append
    * `newCols` to the table schema without touching a single data file —
    * readers supply the manifest schema to every scan, so files written
    * before the evolution yield NULL for the new columns (the parquet
    * missing-column contract), and later merges may carry them. Only
    * ADDING nullable columns here; renames and drops are their own
    * metadata-only commits ([[renameColumn]], [[dropColumn]] — column
    * mapping); RETYPING is refused loudly (it needs a rewrite, because
    * old files would otherwise silently misread). */
  def evolveSchema(spark: SparkSession, path: String,
                   newCols: StructType, maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(newCols.nonEmpty, "evolveSchema with no columns is a no-op " +
        "that would still burn a version — refuse it")
      // case-INSENSITIVE on both checks: Spark's default resolution is
      // case-insensitive, so a column differing only in case would make
      // every later reference AMBIGUOUS — adding it can never be right
      val lowered = newCols.fieldNames.map(_.toLowerCase)
      require(lowered.distinct.length == lowered.length,
        s"duplicate column names within newCols: " +
        lowered.diff(lowered.distinct).mkString(","))
      val clash = newCols.fieldNames.filter(n =>
        m.schema.fieldNames.exists(_.equalsIgnoreCase(n)))
      require(clash.isEmpty,
        s"evolveSchema only ADDS columns; ${clash.mkString(",")} already " +
        "exist (drop/rename/retype require a rewrite)")
      val widened = StructType(m.schema.fields ++
        newCols.fields.map(_.copy(nullable = true)))
      // physical-name assignment: a new logical column may reuse its
      // own name ONLY if no live or RETIRED physical column holds it —
      // a dropped column's bytes still live in old files, and handing
      // its physical name to a new column would resurrect stale values
      val usedPhys = m.schema.fieldNames.map(physNameOf(m.colMap, _)).toSet ++
        m.retiredPhys
      val newMaps = newCols.fieldNames.flatMap { n =>
        if (!usedPhys(n)) None
        else {
          var i = m.version + 1
          while (usedPhys(s"${n}__p$i")) i += 1
          Some(n -> s"${n}__p$i")
        }
      }
      commitFence()
      writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
        widened, m.statsCols, m.entries, m.tag, m.zCols, m.retain,
        op = "evolve-schema", partCols = m.partCols,
        constraints = m.constraints, colMap = m.colMap ++ newMaps,
        retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** The column names a CHECK constraint expression references —
    * parsed, not resolved, so it works driver-side with no plan.
    * Multi-part names keep their last part (flat tables only). */
  private def constraintRefs(exprSql: String): Set[String] =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(exprSql).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.last.toLowerCase(java.util.Locale.ROOT)
    }.toSet

  private def requireNoConstraintRefs(m: Manifest, name: String,
                                      what: String): Unit = {
    val lc = name.toLowerCase(java.util.Locale.ROOT)
    val hit = m.constraints.filter(c => constraintRefs(c._2).contains(lc))
    require(hit.isEmpty,
      s"cannot $what column '$name': CHECK constraint(s) " +
      s"${hit.map(_._1).mkString(", ")} reference it — drop the " +
      "constraint(s) first and re-add them against the new schema")
  }

  /** RENAME a column as a METADATA-ONLY commit (Delta column-mapping
    * parity): data files keep their PHYSICAL column names forever, so
    * the rename rewrites one manifest — zero data files, whatever the
    * table's size. Every name the manifest carries follows: the merge
    * key, tracked stats columns (per-file stats are name-independent
    * values and carry verbatim), the Z layout and the partition
    * column. Time travel and RESTORE keep working across the rename
    * (each retained version reads under its own names; restore
    * translates through the stable physical identity). A column a
    * CHECK constraint references is refused — the stored SQL text
    * would silently stop matching; drop and re-add the constraint.
    * Incremental consumers: a CDF window spanning the rename emits
    * rows in the TO-side (new) names, same policy as additive
    * evolution — mirrors must adopt the rename (their own
    * renameColumn) before syncing past it. */
  def renameColumn(spark: SparkSession, path: String, oldName: String,
                   newName: String, maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(m.schema.fieldNames.contains(oldName),
        s"no column '$oldName' in $path " +
        s"(have: ${m.schema.fieldNames.mkString(", ")})")
      require(!m.schema.fieldNames.contains(newName),
        s"column '$newName' already exists in $path")
      require(newName.nonEmpty && !newName.contains('\t') &&
        !newName.contains('\n'), s"invalid column name '$newName'")
      requireNoConstraintRefs(m, oldName, "rename")
      val phys = physNameOf(m.colMap, oldName)
      val newSchema = StructType(m.schema.fields.map(f =>
        if (f.name == oldName) f.copy(name = newName) else f))
      // identity pairs stay OUT of the map (the hot-path fast test is
      // colMap.isEmpty); a rename BACK to the physical name deletes
      // its pair instead of recording (x, x)
      val newMap = m.colMap.filterNot(_._1 == oldName) ++
        (if (newName == phys) Seq.empty else Seq(newName -> phys))
      def sub(c: String) = if (c == oldName) newName else c
      commitFence()
      writeManifest(spark, path, m.version + 1, sub(m.keyCol), m.keyType,
        newSchema, m.statsCols.map(sub),
        m.entries.map(e => e.copy(extra = e.extra.map {
          case (c, mm) => sub(c) -> mm })),
        m.tag, m.zCols.map { case (a, b) => (sub(a), sub(b)) }, m.retain,
        op = s"rename-column($oldName->$newName)",
        partCols = m.partCols.map(sub),
        constraints = m.constraints, colMap = newMap,
        retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** WIDEN a column's type as a METADATA-ONLY commit (the Delta "type
    * widening" shape): the manifest schema changes, zero data files
    * move — Spark's parquet reader promotes the old files' physical
    * type (int32→long etc.) under the wider requested schema, and
    * every later write lands in the wide type. The id column that
    * outgrows int, the counter that outgrows int: one manifest write
    * at 100 TB.
    *
    * Supported: the integral chain (byte→short→int→long, any upward
    * hop — string-encoded manifest stats round-trip EXACTLY through
    * the wider type, so key/stats/partition/Z reasoning stays sound,
    * including the merge key itself and its deletion-vector sidecars,
    * whose stored keys re-cast on read), and float→double for
    * STATS-FREE columns only — a float min/max re-read as double does
    * NOT bound the promoted values (0.1f ≠ 0.1d), so widening a
    * stats-bearing float would make pruning unsound; those need a
    * rewrite. Narrowing and everything else are refused loudly. */
  def widenColumn(spark: SparkSession, path: String, name: String,
                  newType: DataType, maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(m.schema.fieldNames.contains(name),
        s"no column '$name' in $path " +
        s"(have: ${m.schema.fieldNames.mkString(", ")})")
      val oldType = m.schema(name).dataType
      val rank: Map[DataType, Int] = Map(org.apache.spark.sql.types
        .ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
      val integralUp = rank.contains(oldType) && rank.contains(newType) &&
        rank(newType) > rank(oldType)
      val floatUp = oldType == org.apache.spark.sql.types.FloatType &&
        newType == org.apache.spark.sql.types.DoubleType
      require(integralUp || floatUp,
        s"unsupported widening ${oldType.simpleString} -> " +
        s"${newType.simpleString} on '$name' — supported: " +
        "byte/short/int -> wider integral, float -> double " +
        "(narrowing never)")
      if (floatUp) {
        val statted = name == m.keyCol || m.statsCols.contains(name) ||
          m.partCols.contains(name) ||
          m.zCols.exists(z => z._1 == name || z._2 == name)
        require(!statted,
          s"float->double widening refused for stats-bearing '$name': " +
          "recorded float min/max re-read as double would not bound the " +
          "promoted values (pruning would turn unsound) — rewrite the " +
          "table instead")
      }
      val newSchema = StructType(m.schema.fields.map(f =>
        if (f.name == name) f.copy(dataType = newType) else f))
      commitFence()
      writeManifest(spark, path, m.version + 1, m.keyCol,
        if (name == m.keyCol) newType else m.keyType,
        newSchema, m.statsCols, m.entries, m.tag, m.zCols, m.retain,
        op = s"widen-column($name:${oldType.simpleString}->" +
          s"${newType.simpleString})",
        partCols = m.partCols, constraints = m.constraints,
        colMap = m.colMap, retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** DROP a column as a METADATA-ONLY commit: the column leaves the
    * schema and the tracked stats; its bytes stay in the already-
    * written files, simply never read again (scans request only the
    * manifest schema's physical columns) — at 100 TB, dropping a
    * column costs one manifest write, and the bytes age out as files
    * are rewritten by ordinary churn/compaction. The physical name is
    * RETIRED: a later [[evolveSchema]] adding a same-named column gets
    * a fresh physical name, so the old files' stale values can never
    * resurrect (they read as NULL for the new column, like any
    * pre-evolution file). Refused for the merge key, the partition
    * column, a Z-layout column, and any column a CHECK constraint
    * references. */
  def dropColumn(spark: SparkSession, path: String, name: String,
                 maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(m.schema.fieldNames.contains(name),
        s"no column '$name' in $path " +
        s"(have: ${m.schema.fieldNames.mkString(", ")})")
      require(name != m.keyCol,
        s"cannot drop the merge key '$name' of $path")
      require(!m.partCols.contains(name),
        s"cannot drop the partition column '$name' of $path")
      require(!m.zCols.exists(z => z._1 == name || z._2 == name),
        s"cannot drop Z-layout column '$name' of $path (compact onto a " +
        "different layout first)")
      requireNoConstraintRefs(m, name, "drop")
      val phys = physNameOf(m.colMap, name)
      commitFence()
      writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
        StructType(m.schema.fields.filterNot(_.name == name)),
        m.statsCols.filterNot(_ == name),
        m.entries.map(e => e.copy(extra = e.extra - name)),
        m.tag, m.zCols, m.retain, op = s"drop-column($name)",
        partCols = m.partCols, constraints = m.constraints,
        colMap = m.colMap.filterNot(_._1 == name),
        retiredPhys = (m.retiredPhys :+ phys).distinct)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** Metadata-only commit: same file list, new tag — used when a sync
    * window turns out to carry no data changes (a source compaction) but
    * the cursor must still advance so the empty diff is not recomputed
    * forever. */
  def setTagOnly(spark: SparkSession, path: String, tag: String,
                 maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      commitFence()
      writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
        m.schema, m.statsCols, m.entries, Some(tag), m.zCols, m.retain,
        op = "set-tag", partCols = m.partCols,
        constraints = m.constraints, colMap = m.colMap,
        retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** SHALLOW CLONE (the Delta `CREATE TABLE … SHALLOW CLONE src`
    * shape): a NEW table at `dstPath` whose manifest BORROWS the
    * source's data files — zero data bytes copied, so cloning a 100 TB
    * table costs one manifest write (plus the pair-sized deletion-
    * vector sidecars, which ARE copied so the clone owns its dead-row
    * bookkeeping). The clone then lives independently: merges/deletes/
    * dv commits write LOCAL files and never touch the source; the
    * source never sees the clone. Borrowed entries carry the source's
    * absolute path, so the clone's retention sweep (local `data/` walk)
    * can never delete source bytes.
    *
    * The experiment-on-production shape: clone, mutate, measure, drop.
    *
    * LIFETIME CAVEAT (same as Delta's): the clone references source
    * files WITHOUT protecting them — a source VACUUM/retention pass
    * that retires files the clone still borrows breaks the clone's
    * reads (loud FileNotFoundException). Sever before source churn
    * outruns its retention: `compactTable(dst)` rewrites everything
    * local (any full rewrite does) — [[severClone]] names that exact
    * operation and no-ops when nothing is borrowed; [[vacuumPreview]]
    * with a `registry` warns when a planned retirement would break a
    * borrower. Schema, stats, constraints, column mapping, Z layout,
    * and partition metadata all carry over; the consumer tag does NOT
    * (a clone is not the consumer).
    *
    * `asOfVersion` clones a RETAINED snapshot instead of the head —
    * fork yesterday's state for a what-if without touching today's;
    * refused (like [[readAt]]) once retention has retired it. */
  def shallowClone(spark: SparkSession, srcPath0: String,
                   dstPath: String, keepVersions: Int = 2,
                   asOfVersion: Option[Long] = None): Unit = {
    // borrowed entries bake the source path into relPaths that [[absOf]]
    // must later recognize as absolute — a relative srcPath would make
    // them resolve against the CLONE's root (every borrowed read FNFE),
    // so qualify it here (filesystem-anchored, like Delta's clone)
    val srcPath =
      if (srcPath0.startsWith("/") || isQualified(srcPath0)) srcPath0
      else {
        val p = new org.apache.hadoop.fs.Path(srcPath0)
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .makeQualified(p).toString
      }
    val m = asOfVersion match {
      case Some(v) => readManifestAt(spark, srcPath, v)
      case None => readManifest(spark, srcPath)
    }
    require(latestVersion(spark, dstPath).isEmpty,
      s"$dstPath already holds a table — clone into a fresh path")
    // copy each sidecar group, rewriting its file handles to the
    // borrowed (absolute) form so the pair scoping stays exact
    val dvMap: Map[String, String] =
      m.entries.filter(_.dv.isDefined).groupBy(_.dv.get.dvRel).map {
        case (dvRel, es) =>
          val newRel = s"${freshTxnRel(1L)}-dv"
          import spark.implicits._
          val remap = es.map(e =>
              (e.relPath, absOf(srcPath, e.relPath)))
            .toDF("__f", "__fNew")
          spark.read.parquet(absOf(srcPath, dvRel))
            .join(broadcast(remap), Seq("__f"))
            .select(col("__fNew").as("__f"), col("__k"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$dstPath/$newRel")
          dvRel -> newRel
      }
    val entries = m.entries.map { e =>
      e.copy(relPath = absOf(srcPath, e.relPath),
        dv = e.dv.map(d => d.copy(dvRel = dvMap(d.dvRel))))
    }
    writeManifest(spark, dstPath, 1L, m.keyCol, m.keyType, m.schema,
      m.statsCols, entries, tag = None, zCols = m.zCols,
      retain = keepVersions, op = s"shallow-clone($srcPath@v${m.version})",
      partCols = m.partCols, constraints = m.constraints, colMap = m.colMap,
      retiredPhys = m.retiredPhys)
  }

  /** SEVER a shallow clone: localize every borrowed entry so the table
    * no longer references any source byte — after this, source vacuum /
    * retention churn can never break it (the operable answer to the
    * [[shallowClone]] lifetime caveat). Implemented as the recorded-
    * layout full rewrite ([[compactTable]], which reads borrowed +
    * local entries alike, materializes deletion vectors, and commits
    * all-local files); the op is named so history shows WHY the rewrite
    * happened. A table with no borrowed entries is a no-op (returns
    * false) — severing twice costs one manifest read. */
  def severClone(spark: SparkSession, path: String,
                 numFiles: Int = 8): Boolean = {
    val m = readManifest(spark, path)
    val borrowed = m.entries.exists(e =>
      e.relPath.startsWith("/") || isQualified(e.relPath))
    if (!borrowed) false
    else { compactTable(spark, path, numFiles); true }
  }

  /** Metadata-only commit changing the retention window (`keepVersions`
    * ≥ 2, see [[create]]). WIDENING takes effect immediately; NARROWING
    * sweeps the now-out-of-window versions on this commit's retirement
    * pass. */
  def setRetention(spark: SparkSession, path: String, keepVersions: Int,
                   maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      commitFence()
      writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
        m.schema, m.statsCols, m.entries, m.tag, m.zCols, keepVersions,
        partCols = m.partCols,
        op = "set-retention", constraints = m.constraints,
        colMap = m.colMap, retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, keepVersions)
    }

  /** Add a CHECK constraint (Delta `ALTER TABLE … ADD CONSTRAINT`
    * parity): `exprSql` is any boolean SQL expression over the table's
    * columns; from this commit on, every batch a mutation writes is
    * gated on it INSIDE the write job itself (observed metrics — zero
    * extra passes, see [[observeChecks]]), and a violating commit is
    * refused with the table unchanged. NOT NULL is the special case
    * `"col IS NOT NULL"`. Standard SQL semantics: a NULL predicate
    * passes. EXISTING rows are validated first (one short-circuiting
    * scan through any deletion vectors) — a constraint the current
    * content violates is refused, so holders can trust it describes
    * the whole table, not just future writes. Content-invariant
    * maintenance (compaction, consolidation) is exempt by
    * construction; [[restoreVersion]] keeps the CURRENT constraint set
    * while re-pointing at old data, so a restore past an
    * add-constraint can reintroduce pre-validation rows — re-add the
    * constraint to re-validate if that matters. Concurrency: adding a
    * constraint conflicts with EVERY in-flight rewrite (the rebase
    * check refuses a winner whose constraint set differs, forcing the
    * loser to re-drive and re-validate its batch). */
  def addCheckConstraint(spark: SparkSession, path: String, name: String,
                         exprSql: String, maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(name.nonEmpty, "constraint name must be non-empty")
      require(!m.constraints.exists(_._1 == name),
        s"constraint '$name' already exists on $path (drop it first)")
      val bad = readFiles(spark, path, m)
        .filter(not(coalesce(expr(exprSql).cast("boolean"), lit(true))))
        .limit(1).collect()
      require(bad.isEmpty,
        s"existing rows violate '$name' ($exprSql), e.g. ${bad.head} — " +
        "clean the table before adding the constraint")
      commitFence()
      writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
        m.schema, m.statsCols, m.entries, m.tag, m.zCols, m.retain,
        op = s"add-constraint($name)", partCols = m.partCols,
        constraints = m.constraints :+ (name -> exprSql),
        colMap = m.colMap, retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** Drop a CHECK constraint by name — metadata-only commit. */
  def dropCheckConstraint(spark: SparkSession, path: String, name: String,
                          maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(m.constraints.exists(_._1 == name),
        s"no constraint '$name' on $path " +
        s"(have: ${m.constraints.map(_._1).mkString(", ")})")
      commitFence()
      writeManifest(spark, path, m.version + 1, m.keyCol, m.keyType,
        m.schema, m.statsCols, m.entries, m.tag, m.zCols, m.retain,
        op = s"drop-constraint($name)", partCols = m.partCols,
        constraints = m.constraints.filterNot(_._1 == name),
        colMap = m.colMap, retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** Fresh, collision-free txn dir for one commit ATTEMPT. Unique per
    * attempt, not per version: two optimistic committers racing toward
    * the same next version must never share a directory
    * (`writeSortedBy`'s overwrite would clobber the other's files), and
    * a rebase may commit these files under a LATER version than the dir
    * name suggests — the name is cosmetic, manifests carry exact
    * relative paths. An abandoned attempt's dir is referenced by no
    * manifest and is swept by retention after the orphan grace. */
  private def freshTxnRel(v: Long): String =
    s"data/txn-$v-${java.util.UUID.randomUUID.toString.take(8)}"

  /** The touch set of `batchKeys` against a manifest: relPaths of files
    * whose stored [min, max] key range contains at least one batch key —
    * a broadcast interval join against the file-count-sized range table;
    * min/max go back through a cast so the comparison is Spark's own
    * ordering for the key type (exact for integral and string keys). */
  /** Tag the Spark jobs a commit phase fires — the UI (and the
    * ProbeCommitAnatomy census) then attributes each tiny-commit job
    * to its phase instead of a bare '?'. Restores the caller's
    * description (thread-local, so concurrent writers don't clobber
    * each other). */
  private[io] def jobDesc[T](spark: SparkSession, label: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft: $label")
    try f finally sc.setJobDescription(prev)
  }

  private def touchSet(spark: SparkSession, batchKeys: DataFrame,
                       keyK: Column, m: Manifest): Set[String] =
    if (m.entries.isEmpty) Set.empty
    else jobDesc(spark, "touch-set") {
      val ranges = spark.createDataFrame(
          m.entries.map(e => (e.relPath, e.min.orNull, e.max.orNull)))
        .toDF("__f", "__mn", "__mx")
        .select(col("__f"), col("__mn").cast(m.keyType).as("__mn"),
          col("__mx").cast(m.keyType).as("__mx"))
      // ONE job, ONE stage: per-partition set-fold + driver merge. The
      // agg form (collect_set + final agg) costs an exchange, which AQE
      // materializes as an extra stage-job on every commit; folding to
      // a per-partition Set and merging ≤ parallelism sets driver-side
      // is the same answer with no shuffle at all. Sets are file-count
      // bounded — driver-safe at any batch size.
      batchKeys.join(broadcast(ranges),
          keyK >= col("__mn") && keyK <= col("__mx"))
        .select(col("__f"))
        .rdd.mapPartitions { it =>
          val s = scala.collection.mutable.HashSet.empty[String]
          it.foreach(r => s += r.getString(0))
          Iterator(s)
        }.collect().foldLeft(Set.empty[String])(_ ++ _)
    }

  private def conflictExhausted(path: String, cause: Throwable) =
    new IllegalStateException(
      s"commit conflict on $path: retry budget exhausted — concurrent " +
      "writers are committing faster than this one can rebase; re-drive " +
      "the operation (or serialize the writers)", cause)

  private def rewrite(spark: SparkSession, path: String,
                      upserts0: Option[DataFrame], dels0: Option[DataFrame],
                      numFiles: Int, setTag: Option[String],
                      maxRetries: Int = 3,
                      op: String = "",
                      allowRedrive: Boolean = true,
                      snapshot: Option[Manifest] = None,
                      rebaseGuard: Option[(DataFrame, Set[String])] = None,
                      allowRebase: Boolean = true)
      : MergeStats = {
    val opName =
      if (op.nonEmpty) op
      else (upserts0, dels0) match {
        case (Some(_), Some(_)) => "upsert+delete"
        case (Some(_), None) => "merge"
        case _ => "delete"
      }
    // both inputs are consumed repeatedly (touch-set keys, the rewrite,
    // and possibly conflict re-drives) and may be expensive upstream
    // derivations — persist for the duration, released in the finally
    val upserts = upserts0.map(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dels = dels0.map(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // a caller whose inputs were RESOLVED against a snapshot (mergeInto)
    // must commit against that same snapshot — re-reading latest here
    // would silently adopt a winner that landed during the resolution
    // and claim the next version uncontested with stale post-images
    try attemptRewrite(spark, path,
      snapshot.getOrElse(readManifest(spark, path)),
      upserts, dels, numFiles, setTag, maxRetries, opName, allowRedrive,
      rebaseGuard, allowRebase)
    finally {
      upserts.foreach(_.unpersist(blocking = false))
      dels.foreach(_.unpersist(blocking = false))
    }
  }

  /** One optimistic rewrite attempt against snapshot `m`: compute the
    * touch set, write the replacement files, then claim version
    * `m.version+1`. On a lost claim the conflict handler below picks
    * REBASE (winner disjoint — commit the same files on top, zero
    * recompute) or RE-DRIVE (winner overlaps — recurse against the
    * winner's state), spending one retry either way. */
  private def attemptRewrite(spark: SparkSession, path: String, m: Manifest,
                             upserts: Option[DataFrame],
                             dels: Option[DataFrame], numFiles: Int,
                             setTag: Option[String],
                             retriesLeft: Int, op: String,
                             allowRedrive: Boolean = true,
                             rebaseGuard: Option[(DataFrame, Set[String])] =
                               None,
                             allowRebase: Boolean = true): MergeStats = {
    // a batch carrying columns the table schema lacks would be silently
    // narrowed by the select(orderedCols) projection below — after a
    // source-side schema evolution that is exactly how direct merge()/
    // upsertAndDelete() callers (e.g. StreamingUpsertJob's non-cdf path)
    // would silently lose data, so refuse loudly with the same remedy
    // applyChanges gives its feeds (dels only contribute their key
    // column, so extra columns there are harmless by contract)
    upserts.foreach { u =>
      val unknown = u.columns.filterNot(m.schema.fieldNames.contains)
      require(unknown.isEmpty,
        s"upsert batch carries column(s) ${unknown.mkString(",")} the " +
        s"table schema lacks — evolve the table first " +
        s"(ManifestTable.evolveSchema) or drop them explicitly")
    }
    val keyK = col(m.keyCol)
    val keySets = upserts.map(_.select(keyK)).toSeq ++
      dels.map(_.select(keyK)).toSeq
    // NO distinct(): every consumer is duplicate-insensitive — the
    // touch set's collect_set dedups in its partial aggregation, the
    // survivors anti-join matches set-wise, and the rebase guard
    // re-runs the same touch probe. The distinct would add a full
    // shuffle (plus AQE stage jobs) to EVERY commit for nothing —
    // the dominant overhead class on tiny frequent commits.
    val batchKeys = keySets.reduce(_ unionByName _)
    // ≤1 live file: the only possible touch set is that file, and
    // probing whether the batch actually intersects its range costs
    // exactly the Spark job the skip saves. An out-of-range pure insert
    // then rewrites one single-task file instead of carrying it — the
    // right trade below the file count where touch-set pruning has
    // anything to prune (group-cardinality agg views hit this on every
    // sync; commit-path job count is their dominant cost)
    val touched =
      if (m.entries.size <= 1) m.entries.map(_.relPath).toSet
      else touchSet(spark, batchKeys, keyK, m)

    val (touchedE, carriedE) = m.entries.partition(e => touched(e.relPath))
    val orderedCols = m.schema.fields.map(f => col(f.name).cast(f.dataType))
    val survivors =
      if (touchedE.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      else
        readEntries(spark, path, m.schema, m.keyCol, touchedE, m.colMap)
          .join(batchKeys, Seq(m.keyCol), "left_anti")
    val newData = upserts match {
      case Some(u) => survivors.unionByName(u.select(orderedCols: _*))
      case None => survivors
    }

    val txnRel = freshTxnRel(m.version + 1)
    val nFiles =
      if (numFiles > 0) numFiles
      else math.max(1,
        touchedE.size + (if (upserts.isDefined && touchedE.isEmpty) 1 else 0))
    // a PARTITIONED table's rewrites stay partition-pure (every commit
    // path preserves the layout invariant the metadata-only partition
    // ops depend on); numFiles is layout-driven there — one file per
    // touched partition value. Single-file flat writes fuse the stats
    // pass INTO the write job (observed metrics) — one job instead of
    // two, the dominant saving for small frequently-committed tables
    // CHECK constraints gate the rewritten content inside the write job
    // itself (observed metrics — no second pass); survivors re-pass by
    // construction, so the gate is effectively on the batch
    val (gatedData, verifyChecks) = observeChecks(newData, m.constraints)
    val newE = jobDesc(spark, "rewrite-write") { m.partCols match {
      case pcs if pcs.nonEmpty =>
        Tables.writePartitionPure(toPhysical(m.colMap, m.schema, gatedData),
          s"$path/$txnRel", pcs.map(physNameOf(m.colMap, _)),
          physNameOf(m.colMap, m.keyCol))
        val e = statsFor(spark, path, txnRel, m.keyCol, m.schema,
          m.statsCols, m.colMap)
        requirePartitionPure(pcs, e, path)
        e
      case Seq() if nFiles == 1 =>
        writeSingleFileObserved(spark, path, txnRel, gatedData, m.keyCol,
          m.statsCols, m.colMap, m.schema)
      case _ =>
        Tables.writeSortedBy(toPhysical(m.colMap, m.schema, gatedData),
          s"$path/$txnRel", nFiles, physNameOf(m.colMap, m.keyCol))
        statsFor(spark, path, txnRel, m.keyCol, m.schema, m.statsCols,
          m.colMap)
    } }
    verifyChecks()

    def commitOn(base: Manifest): MergeStats = {
      val carriedNow = base.entries.filterNot(e => touched(e.relPath))
      val nextV = base.version + 1
      writeManifest(spark, path, nextV, base.keyCol, base.keyType,
        base.schema, base.statsCols, carriedNow ++ newE,
        setTag.orElse(base.tag), base.zCols, base.retain, op,
        partCols = base.partCols, constraints = base.constraints,
        colMap = base.colMap, retiredPhys = base.retiredPhys)
      retireKeeping(spark, path, nextV, base.retain)
      MergeStats(nextV, base.entries.size, touchedE.size, newE.size,
        carriedNow.size)
    }

    /** Lost the version claim. Rebase iff the winner's state is DISJOINT
      * from this batch: same schema/layout/stats AND the batch's touch
      * set against the winner's manifest is exactly the files this
      * attempt already read-and-rewrote — i.e. the winner neither
      * rewrote a file we read (our survivors would resurrect its
      * superseded rows) nor landed a new file covering any of our keys
      * (both copies of a key would survive). Then committing the same
      * files on top is serial-equivalent to winner-then-us. Anything
      * else re-drives the whole rewrite against the winner's state. */
    def onConflict(e: ConcurrentCommitException,
                   retries: Int): MergeStats = {
      if (retries <= 0) throw conflictExhausted(path, e)
      val latest = readManifest(spark, path)
      // rebaseGuard: a conditional merge's clauses READ more rows than
      // its post-images touch (every source-matched key, and source-key
      // presence for NOT MATCHED) — the disjointness check must cover
      // that wider key set, or a winner that changed a
      // matched-but-no-clause-fired row would rebase without the
      // clauses being re-evaluated. A def, not a val: its touch-set
      // job only runs once the cheap metadata equalities pass
      def guardOk = rebaseGuard.forall { case (ks, expected) =>
        touchSet(spark, ks, keyK, latest) == expected }
      // the files this attempt read must be IDENTICAL in the winner's
      // manifest, not merely same-named: a deletion-vector commit
      // re-points an entry without moving the file, and rebasing over
      // it would commit survivors read WITHOUT the winner's vector —
      // resurrecting the very rows it killed
      def sameTouchedEntries = {
        val latestByRel = latest.entries.map(e => e.relPath -> e).toMap
        touchedE.forall(e => latestByRel.get(e.relPath).contains(e))
      }
      val rebasable = allowRebase && latest.schema.json == m.schema.json &&
        latest.zCols == m.zCols && latest.statsCols == m.statsCols &&
        // a winner that changed the CHECK constraint set invalidates
        // this attempt's validation — the batch was gated against the
        // snapshot's constraints, so it must re-drive and re-validate
        latest.constraints == m.constraints &&
        // a winner that changed the column MAPPING invalidates this
        // attempt's already-written files (their physical names were
        // projected under the snapshot's map)
        latest.colMap == m.colMap && latest.retiredPhys == m.retiredPhys &&
        guardOk && touchSet(spark, batchKeys, keyK, latest) == touched &&
        sameTouchedEntries
      if (rebasable)
        try commitOn(latest)
        catch { case e2: ConcurrentCommitException =>
          onConflict(e2, retries - 1) }
      else if (allowRedrive)
        // the guard's expected touch set was computed against the
        // ORIGINAL snapshot — meaningless for a re-driven attempt's new
        // base, so drop it (today's only guarded caller forbids
        // re-drive anyway)
        attemptRewrite(spark, path, latest, upserts, dels, numFiles,
          setTag, retries - 1, op, allowRedrive, rebaseGuard = None)
      else
        // the caller's inputs are FUNCTIONS of the snapshot (mergeInto's
        // resolved post-images) — an overlapping winner invalidates
        // them, so surface the conflict for re-resolution instead of
        // re-driving with stale rows
        throw e
    }

    commitFence()
    try commitOn(m)
    catch { case e: ConcurrentCommitException =>
      onConflict(e, retriesLeft) }
  }

  /** CHANGE DATA FEED between two committed versions (both within the
    * retention window — the superseded version is readable for one
    * cycle, so polling consumers that keep up never miss a diff):
    * emits one row per changed row, labeled `_change_type` ∈
    * {{{insert, delete, update_pre, update_post}}} — an updated key
    * contributes its old row as `update_pre` and its new row as
    * `update_post`, the Delta-CDF shape.
    *
    * The diff reads ONLY the files that differ between the two
    * manifests: files carried by reference between versions are skipped
    * entirely (zero bytes read for the untouched 99.9 % of a big table),
    * and rows a rewrite carried unchanged cancel in the multiset
    * `exceptAll` — so a COMPACTION, which moves every row to new files
    * without changing any, correctly emits ZERO changes. Cost scales
    * with the size of the touched files, not the table. */
  def changesBetween(spark: SparkSession, path: String,
                     fromV: Long, toV: Long): DataFrame = {
    val (adds, dels, m) = changeSidesBetween(spark, path, fromV, toV)
    val key = col(m.keyCol)
    val cols = m.schema.fieldNames.map(col)
    // a key present on both sides of the surviving diff is an update
    val updKeys = adds.select(key).intersect(dels.select(key))
      .withColumn("__upd", lit(true))
    def label(df: DataFrame, updLabel: String, plainLabel: String) =
      df.join(updKeys, Seq(m.keyCol), "left")
        .select(when(col("__upd"), updLabel).otherwise(plainLabel)
          .as("_change_type") +: cols: _*)
    label(adds, "update_post", "insert")
      .unionByName(label(dels, "update_pre", "delete"))
  }

  /** The UNLABELED change feed: (adds, dels, toManifest) — the row
    * multisets present only at `toV` / only at `fromV`, computed from
    * the manifest-DISAGREEING files exactly like [[changesBetween]]
    * (which is these sides plus Delta-CDF labeling). Incremental
    * consumers that reduce the feed anyway — the agg view folds signs
    * (+1 per add, −1 per del; pre/post labels carry no extra
    * information for it), the mirror upserts all adds and deletes the
    * del-only keys — read the sides directly and skip the update-key
    * intersection and two label joins, one diff-wide shuffle less per
    * sync cycle. */
  def changeSidesBetween(spark: SparkSession, path: String,
                         fromV: Long, toV: Long)
      : (DataFrame, DataFrame, Manifest) = {
    val mFrom = readManifestAt(spark, path, fromV)
    val mTo = readManifestAt(spark, path, toV)
    // file identity for the diff = relPath + deletion-vector state: a
    // dv commit changes a file's LIVE content without moving it, so a
    // relPath-only compare would skip the file on both sides and the
    // feed would silently miss the deletes. Each side still reads with
    // its OWN dv ref, so the exceptAll surfaces exactly the rows the
    // new vector killed.
    def sig(e: FileEntry) =
      e.relPath + e.dv.fold("")(d => s"\t${d.dvRel}\t${d.dead}")
    // DV-DELTA FAST PATH: a file present in BOTH manifests whose only
    // disagreement is its vector state changed no bytes — its diff is
    // exactly the rows whose (file, key) pairs moved in or out of the
    // dead set. The generic path would read the file TWICE (once per
    // side's vector) and push both copies through a full-width
    // exceptAll; the fast path reads it ONCE raw and semi-joins the
    // sidecar-pair delta — the consumer-cost shape that makes dv
    // mutations cheap to FOLLOW, not just to make. Multiset safety of
    // splitting these files out of the exceptAll: keys are unique
    // within a manifest, so a dv-delta file's rows can never cancel
    // against another disagreeing file's rows. Both directions are
    // live: restore can re-point to an entry with FEWER dead rows, and
    // those resurrected rows must surface as adds.
    val fromByRel = mFrom.entries.map(e => e.relPath -> e).toMap
    val dvDeltaTo = mTo.entries.filter(e =>
      fromByRel.get(e.relPath).exists(f => sig(f) != sig(e)))
    val dvDeltaRels = dvDeltaTo.map(_.relPath).toSet
    val fromRel = mFrom.entries.map(sig).toSet
    val toRel = mTo.entries.map(sig).toSet
    // BOTH sides read with the TO schema: schema evolution is additive
    // ([[evolveSchema]]), so the to-side schema is always a widening of
    // the from-side's — old files yield NULL for later-added columns,
    // and the positional exceptAll compares like with like (a window
    // spanning an evolution commit would otherwise fail at analysis
    // time on mismatched column counts)
    // ... and with the TO-side COLUMN MAPPING: physical names are
    // stable across renames, so projecting both sides through mTo's
    // map reads a window spanning a rename consistently in the new
    // logical names (the same policy as the schema choice above)
    def side(entries: Seq[FileEntry], other: Set[String]): DataFrame =
      readEntries(spark, path, mTo.schema, mTo.keyCol,
        entries.filterNot(e =>
          other.contains(sig(e)) || dvDeltaRels.contains(e.relPath)),
        mTo.colMap)
    val oldRows = side(mFrom.entries, toRel)
    val newRows = side(mTo.entries, fromRel)
    var adds = newRows.exceptAll(oldRows)
    var dels = oldRows.exceptAll(newRows)
    if (dvDeltaTo.nonEmpty) {
      // dead (name, key) pairs of the delta files under each side's
      // vector — sidecars are pair-sized, the delta smaller still.
      // MUST be the per-sidecar-group scoped read ([[deadPairsScoped]]):
      // the exceptAll below is multiset arithmetic, and a union read
      // that double-counts a file whose stale pairs survive in another
      // delta file's sidecar would emit a still-dead row as an ADD (or
      // a live one as a phantom delete) into the change feed
      def pairsOf(entries: Seq[FileEntry]): DataFrame =
        deadPairsScoped(spark, path, mTo.keyType, entries)
          .select(element_at(split(col("__f"), "/"), -1).as("__fn"),
            col("__k"))
      val fromDelta = mFrom.entries.filter(e => dvDeltaRels(e.relPath))
      val pTo = pairsOf(dvDeltaTo)
      val pFrom = pairsOf(fromDelta)
      val newlyDead = pTo.exceptAll(pFrom)   // dead at to, live at from
      val revived = pFrom.exceptAll(pTo)     // dead at from, live at to
      val pSchemaTo = physSchemaOf(mTo.colMap, mTo.schema)
      val raw = readEntriesRaw(spark, path, pSchemaTo, dvDeltaTo)
        .withColumn("__fn", col("_metadata.file_name"))
      val pKeyTo = physNameOf(mTo.colMap, mTo.keyCol)
      def rowsFor(pairs0: DataFrame): DataFrame = {
        val p = pairs0.withColumnRenamed("__k", "__dk")
          .withColumnRenamed("__fn", "__dfn")
        toLogical(mTo.colMap, mTo.schema,
          raw.join(p, raw("__fn") === p("__dfn") &&
              raw(pKeyTo) === p("__dk"), "left_semi")
            .select(pSchemaTo.fieldNames.map(col): _*))
      }
      dels = dels.unionByName(rowsFor(newlyDead))
      adds = adds.unionByName(rowsFor(revived))
    }
    (adds, dels, mTo)
  }

  /** Apply a change feed (the [[changesBetween]] shape) to ANOTHER
    * manifest table — incremental replication: the mirror advances at
    * cost ∝ the change batch, never the table. `update_post` and
    * `insert` rows upsert; `delete` keys are removed; `update_pre` rows
    * are superseded by their `update_post` twin and carry no action.
    * Replaying the same feed converges (upserts overwrite identically,
    * deletes of absent keys are no-ops), so an at-least-once consumer
    * that crashed between apply and cursor advance self-heals. */
  def applyChanges(spark: SparkSession, targetPath: String,
                   changes0: DataFrame,
                   setTag: Option[String] = None,
                   dv: Boolean = false): Unit = {
    val m = readManifest(spark, targetPath)
    // a feed carrying columns the destination does not know would be
    // silently narrowed by the projection below — after a source
    // schema evolution that is exactly how a mirror would silently
    // diverge, so refuse loudly instead
    val unknown = changes0.columns
      .filterNot(c => c == "_change_type" || m.schema.fieldNames.contains(c))
    require(unknown.isEmpty,
      s"feed carries column(s) ${unknown.mkString(",")} the destination " +
      s"schema lacks — evolve the destination first " +
      s"(ManifestTable.evolveSchema) or re-bootstrap")
    val dataCols = m.schema.fieldNames.map(col)
    // the feed is consumed several times (emptiness probe + the apply)
    // and is typically a changesBetween diff — persist it for the
    // duration
    val changes = changes0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val upserts = changes
        .filter(col("_change_type").isin("insert", "update_post"))
        .select(dataCols: _*)
      val dels = changes.filter(col("_change_type") === "delete")
        .select(col(m.keyCol))
      if (changes.isEmpty)
        // no data change (e.g. the window covered only a compaction):
        // still advance the tag so the empty diff is not recomputed
        // forever
        setTag.foreach(t => setTagOnly(spark, targetPath, t))
      else {
        // ONE atomic commit: upserts + deletes + tag land together, so
        // there is no half-applied crash window between them. `dv`
        // routes through the deletion-vector twin — the consumer's
        // write cost drops to ∝ the batch (sidecar + append) instead
        // of the touched files; the usual compaction cadence
        // materializes the vectors back out
        if (dv) upsertAndDeleteDV(spark, targetPath, upserts, dels,
          setTag = setTag)
        else upsertAndDelete(spark, targetPath, upserts, dels,
          setTag = setTag)
        ()
      }
    } finally changes.unpersist(blocking = false)
  }

  /** One incremental sync step: apply everything the mirror has not
    * seen (dst's tag → source latest) in ONE atomic commit that also
    * advances the tag. Returns the (fromV, toV) applied, or None when
    * already caught up. The cursor lives in the DESTINATION's manifest
    * tag, committed by the same rename as the data — there is no crash
    * window where the data and the cursor disagree, so a retried sync
    * either re-derives the identical feed (tag unchanged) or starts
    * cleanly after it (tag advanced). */
  /** Shared consumer-sync prologue (every incremental consumer must
    * keep these refusal semantics identical, so none re-implements
    * them): resolve the unseen window (destination tag → source
    * latest) and its unlabeled diff sides. None = caught up; a
    * numericTag failure = foreign/missing cursor; a window reaching
    * past the source's retention = the loud lag error with BOTH
    * remedies (re-bootstrap, or widen retention). */
  private[io] def consumerWindow(spark: SparkSession, srcPath: String,
                                 dstPath: String, consumerNoun: String)
      : Option[(Long, Long, DataFrame, DataFrame, Manifest)] = {
    val latest = latestVersion(spark, srcPath).getOrElse(
      throw new IllegalStateException(s"no committed manifest under $srcPath"))
    val from = numericTag(spark, dstPath,
      s"no sync tag on $dstPath — bootstrap the $consumerNoun first")
    if (from >= latest) return None
    val (adds, dels, mTo) =
      try changeSidesBetween(spark, srcPath, from, latest)
      catch {
        case e: java.io.FileNotFoundException =>
          throw lagError(consumerNoun, from, latest, e)
      }
    Some((from, latest, adds, dels, mTo))
  }

  private[io] def lagError(consumerNoun: String, from: Long, latest: Long,
                       cause: Throwable): IllegalStateException =
    new IllegalStateException(
      s"$consumerNoun tag v$from lagged past the source's " +
      s"retention window (latest v$latest; the source keeps its " +
      s"last `retain` versions) — re-bootstrap the $consumerNoun " +
      "from a full source read, or widen the source's retention " +
      "(ManifestTable.setRetention)", cause)

  /** Wrap a consumer's MATERIALIZATION of a change window.
    * [[consumerWindow]] reads only the two manifests eagerly — the
    * window's data-file reads are lazy DataFrames that materialize
    * later, inside the consumer's own join/commit work, so a concurrent
    * writer's retention sweep deleting files mid-sync would surface as
    * an opaque Spark task FileNotFoundException instead of the loud lag
    * error. This maps a FileNotFoundException in the failure's cause
    * chain back to that error (with its re-bootstrap / widen-retention
    * remedies) — but ONLY when the missing file lives under `srcPath`:
    * the wrapped body also materializes the consumer's OWN files and
    * commit work, and a missing/corrupt view or mirror file needs a
    * different remedy than "re-bootstrap the consumer", so those
    * surface unmapped. */
  private[io] def materializingWindow[T](consumerNoun: String, from: Long,
                                         latest: Long, srcPath: String)
                                        (body: => T): T =
    try body
    catch {
      case e: Throwable if {
        // scheme-insensitive containment: task errors report absolute
        // URIs ("file:/tmp/.../t/data/txn-…") while callers may hold a
        // bare path — compare on the URI path component. Filesystems
        // also differ in ENCODING: a path with spaces or unicode may
        // arrive URL-encoded ("%20", the [[statsFor]] gotcha), so the
        // message is matched both raw and URL-decoded.
        val srcMark = new Path(srcPath).toUri.getPath
        def mentionsSrc(msg: String): Boolean =
          msg.contains(srcMark) || {
            val decoded =
              try URLDecoder.decode(msg, UTF_8)
              catch { case _: IllegalArgumentException => msg }
            decoded.contains(srcMark)
          }
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16)
          .exists(t => t.isInstanceOf[java.io.FileNotFoundException] &&
            Option(t.getMessage).exists(mentionsSrc))
      } => throw lagError(consumerNoun, from, latest, e)
    }

  def syncMirror(spark: SparkSession, srcPath: String,
                 dstPath: String): Option[(Long, Long)] = {
    val (from, latest, adds, dels, mTo) =
      consumerWindow(spark, srcPath, dstPath, "mirror")
        .getOrElse(return None)
    // destination-schema guard, same refusal as applyChanges: a source
    // evolution the mirror has not adopted must not silently narrow
    val dstSchema = readManifest(spark, dstPath).schema
    val unknown = mTo.schema.fieldNames.filterNot(dstSchema.fieldNames.contains)
    require(unknown.isEmpty,
      s"source feed carries column(s) ${unknown.mkString(",")} the mirror " +
      s"schema lacks — evolve the mirror first (ManifestTable.evolveSchema)")
    // the unlabeled sides ARE the mirror's plan: every add upserts
    // (insert and update_post alike), del-only keys delete (update_pre
    // rows are dels with a matching add — superseded, anti-joined away);
    // both sides derive from one diff, persisted for the two consumers
    val addsP = adds.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val delsP = dels.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try materializingWindow("mirror", from, latest, srcPath) {
      if (addsP.isEmpty && delsP.isEmpty)
        // no data change (e.g. the window covered only a compaction):
        // still advance the tag so the empty diff is not recomputed
        setTagOnly(spark, dstPath, latest.toString)
      else {
        val delKeys = delsP.select(col(mTo.keyCol))
          .join(addsP.select(col(mTo.keyCol)), Seq(mTo.keyCol), "left_anti")
        upsertAndDelete(spark, dstPath, addsP, delKeys,
          setTag = Some(latest.toString))
        ()
      }
    } finally {
      addsP.unpersist(blocking = false)
      delsP.unpersist(blocking = false)
    }
    Some((from, latest))
  }

  /** File-count auto-compaction trigger — the same no-human-deciding
    * maintenance the persisted-index family gets from
    * `maybeCompactDedupIndex`: every merge adds a txn whose key range
    * overlaps older files, degrading the touch-set bound, so compact
    * when the live file count exceeds `maxFiles`. Cost of the check is
    * one manifest read (no filesystem walk — the manifest IS the file
    * list). LAYOUT-AWARE via [[compactTable]]'s dispatch: a Z table
    * auto-compacts back onto its Morton curve, never silently
    * key-sorted. Returns true when a compaction ran. */
  def maybeCompactTable(spark: SparkSession, path: String, maxFiles: Int,
                        numFiles: Int): Boolean = {
    val n = readManifest(spark, path).entries.size
    if (n <= maxFiles) false
    else { compactTable(spark, path, numFiles); true }
  }

  /** Dead-ratio auto-compaction trigger — [[maybeCompactTable]]'s twin
    * for DELETION-VECTOR churn: dv commits never add files, so the
    * file-count trigger never fires on them, but every read of a dv'd
    * file pays the anti-join and scans rows it then discards. Compact
    * (materializing the vectors) once the table-wide dead fraction
    * `dead / (live + dead)` exceeds `maxDeadRatio` — the standard
    * rewrite-when-vectors-accumulate policy, decided from ONE manifest
    * read (the dead counts are recorded per entry; no data file is
    * opened). Returns true when a compaction ran. */
  def maybeCompactDeadRatio(spark: SparkSession, path: String,
                            maxDeadRatio: Double, numFiles: Int): Boolean = {
    require(maxDeadRatio > 0.0 && maxDeadRatio < 1.0,
      s"maxDeadRatio=$maxDeadRatio must be in (0, 1)")
    val m = readManifest(spark, path)
    val live = m.entries.map(_.rows).sum
    val dead = m.entries.flatMap(_.dv).map(_.dead).sum
    if (dead == 0L || dead.toDouble / (live + dead) <= maxDeadRatio) false
    else { compactTable(spark, path, numFiles); true }
  }

  /** RESTORE: roll the table back to retained version `v` as a NEW
    * commit (the Delta `RESTORE` shape) — a metadata-only commit
    * re-pointing the manifest at the old version's files, which the
    * retention window still holds, so no data moves and the bad
    * version stays readable for a post-mortem until it ages out.
    * History reads create → bad-commit → restore; incremental
    * consumers see the rollback as an ordinary CDF window (the diff
    * between the bad version and the restore cancels to exactly the
    * undone rows) and converge like any other commit. Restoring to a
    * retired version fails loudly (FileNotFoundException from the
    * manifest read — widen `keepVersions` before you need it).
    *
    * Restore rolls back DATA, not schema: the CURRENT schema is kept
    * (additive evolution is metadata-only, so it is always a widening
    * of the restored version's — pre-evolution files null-extend
    * exactly as before the restore, and the change feed's
    * to-side-is-widest invariant holds, so evolved consumers converge
    * instead of wedging on a narrowed feed). The restored version's
    * TAG comes back WITH its data — tag and data were committed
    * atomically at that version, and a consumer destination rolled
    * back to old data under a newer cursor would silently never
    * re-apply the undone window. Layout and stats tracking follow the
    * restored FILES (they are the physical truth being re-pointed
    * at). */
  def restoreVersion(spark: SparkSession, path: String, v: Long,
                     maxRetries: Int = 3): Unit =
    retryingCommit(spark, path, maxRetries) { m =>
      require(v < m.version, s"restore target v$v is not a PAST version " +
        s"(current v${m.version})")
      val old = readManifestAt(spark, path, v)
      // the restored version's metadata is keyed by ITS OWN logical
      // names; the commit keeps the CURRENT schema, so every carried
      // name (key, stats, layout, partition) translates through the
      // STABLE physical identity to its current logical name — a
      // rename between v and now must not leave the manifest pointing
      // at names the current schema lacks. A stats column whose
      // current logical vanished (dropped) drops out of tracking.
      def nowFor(oldLogical: String): Option[String] = {
        val phys = physNameOf(old.colMap, oldLogical)
        m.schema.fieldNames.find(n => physNameOf(m.colMap, n) == phys)
      }
      val keyNow = nowFor(old.keyCol).getOrElse(throw new IllegalStateException(
        s"restore(v$v): the restored version's key column '${old.keyCol}' " +
        s"no longer exists in the current schema of $path"))
      val statsNow = old.statsCols.flatMap(c => nowFor(c).map(c -> _))
      val statsRename = statsNow.toMap
      val entriesNow =
        if (old.statsCols.forall(c => statsRename.get(c).contains(c)))
          old.entries
        else old.entries.map(e => e.copy(extra = e.extra.flatMap {
          case (c, mm) => statsRename.get(c).map(_ -> mm) }))
      def bothNow(ab: (String, String)): Option[(String, String)] =
        for (a <- nowFor(ab._1); b <- nowFor(ab._2)) yield (a, b)
      commitFence()
      // keyType must agree with the KEPT (current) schema, not the
      // restored version's: after a widenColumn on the key (int→long) a
      // restore carrying old.keyType would make later dv commits cast
      // wide batch keys down through the narrow type (ANSI failure or
      // silent wrap). The restored entries' narrow string stats cast up
      // through the wide type losslessly.
      writeManifest(spark, path, m.version + 1, keyNow,
        m.schema(keyNow).dataType,
        m.schema, statsNow.map(_._2), entriesNow, old.tag,
        old.zCols.flatMap(bothNow),
        m.retain, op = s"restore(v$v)",
        partCols = old.partCols.flatMap(c => nowFor(c).toSeq),
        // constraints are table POLICY, not data — the restore keeps the
        // CURRENT set (re-add to re-validate rewound content if needed)
        constraints = m.constraints,
        // likewise the mapping: it describes the CURRENT schema's view
        // of the stable physical names, and retirement is monotone
        colMap = m.colMap, retiredPhys = m.retiredPhys)
      retireKeeping(spark, path, m.version + 1, m.retain)
    }

  /** Manual VACUUM: run the retention sweep now, without a commit —
    * deletes out-of-window manifests and any aged unreferenced data
    * file (crashed transactions, abandoned optimistic attempts, retired
    * versions that accumulated since the last commit's own sweep). The
    * orphan grace period (`graft.manifest.orphanGraceMs`) still
    * applies: a FRESH unreferenced file may belong to an in-flight
    * committer and always survives — there is deliberately no
    * force/zero-grace flag, the same reason production formats guard
    * their vacuum retention. Idle tables clean up without having to
    * burn a version. */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val m = readManifest(spark, path)
    retireKeeping(spark, path, m.version, m.retain)
  }

  /** What one [[maintain]] pass did — each field the trigger it fired. */
  case class MaintenanceReport(materializedDeadRatio: Boolean,
                               consolidatedSidecars: Boolean,
                               compactedFileCount: Boolean,
                               smallFilesFolded: Boolean,
                               vacuumed: Boolean,
                               // partitioned tables only: the partition
                               // values the fragmentation trigger folded
                               compactedPartitions: Seq[String] = Nil,
                               // per indexed column: files whose
                               // bloom-skip rows this pass built
                               bloomIndexed: Map[String, Int] = Map.empty)

  /** ONE-CALL MAINTENANCE — the cron entry point a CDC-fed table
    * needs: run the auto-triggers in dependency order, each firing
    * only when its manifest-read policy says so (a quiet table costs
    * a few manifest reads and nothing else).
    *
    *   1. dead-ratio compaction ([[maybeCompactDeadRatio]]) — when the
    *      recorded dead fraction crosses `maxDeadRatio`, rewrite and
    *      MATERIALIZE the vectors (this also folds small files, so the
    *      later steps usually no-op after it);
    *   2. otherwise sidecar consolidation ([[consolidateDv]]) — fold
    *      fragmented vectors into one, metadata-tier;
    *   3. file-count compaction ([[maybeCompactTable]]) for flat
    *      tables past `maxFiles`;
    *   4. small-file fold: flat tables run [[compactSmallFiles]] when
    *      more than `maxSmallFiles` files sit under `targetRows` — the
    *      incremental OPTIMIZE for CDC fragment mass; PARTITIONED
    *      tables (round 14) auto-select the FRAGMENTED partitions —
    *      file count past `maxFiles` or more than `maxSmallFiles`
    *      sub-`targetRows` files within one value — and fold only
    *      those via [[compactPartitions]], partition-pure, leaving
    *      every healthy partition byte-untouched (the value-aware
    *      shape a 100 TB date-partitioned table needs: cost scales
    *      with the hot partitions, never the table);
    *   5. [[vacuum]] — the retention sweep, always.
    *
    * Defaults suit the test scale; a production deployment tunes them
    * to its file-size targets. Every step is the ordinary audited
    * commit path — crash-safe, concurrency-safe, content-invariant. */
  def maintain(spark: SparkSession, path: String,
               maxDeadRatio: Double = 0.2,
               maxFiles: Int = 64, numFiles: Int = 8,
               targetRows: Long = 10000L,
               maxSmallFiles: Int = 4): MaintenanceReport = {
    val materialized =
      maybeCompactDeadRatio(spark, path, maxDeadRatio, numFiles)
    val consolidated = !materialized && consolidateDv(spark, path)
    val m0 = readManifest(spark, path)
    val compacted = m0.partCols.isEmpty &&
      maybeCompactTable(spark, path, maxFiles, numFiles)
    val smallFolded = !materialized && !compacted && m0.partCols.isEmpty && {
      val small = readManifest(spark, path).entries
        .count(e => e.rows < targetRows)
      small > maxSmallFiles && {
        compactSmallFiles(spark, path, targetRows); true
      }
    }
    // partitioned twin of steps 3+4: fold ONLY the fragmented
    // partitions (decided from the manifest's recorded counts alone),
    // one partition-pure rewrite whose cost is the fragment mass
    val partsFolded: Seq[String] =
      if (materialized || m0.partCols.isEmpty) Nil
      else {
        val m1 = readManifest(spark, path)
        val frag = m1.entries.groupBy(e => partValueOf(m1, e, path))
          .collect { case (v, es)
            if es.size > maxFiles ||
              es.count(_.rows < targetRows) > maxSmallFiles => v }
          .toSeq.sorted
        if (frag.nonEmpty) compactPartitions(spark, path, frag)
        frag
      }
    // bloom-skip refresh AFTER the compactions above: they are exactly
    // the steps that mint new (unindexed) files; one incremental build
    // per existing index keeps probe effectiveness without a second
    // cron entry. No index → one existence check, nothing else.
    val bloomIndexed = BloomSkip.refreshAll(spark, path)
    vacuum(spark, path)
    MaintenanceReport(materialized, consolidated, compacted, smallFolded,
      vacuumed = true, compactedPartitions = partsFolded,
      bloomIndexed = bloomIndexed)
  }

  /** Full rewrite into `numFiles` files on the table's RECORDED layout
    * (the manifest's `layout` line): key-sorted tables get globally
    * range-disjoint files back; Z tables go back onto their Morton
    * curve — a maintenance pass must never silently change the physical
    * layout out from under the table's read patterns. Readers stay
    * concurrent: same manifest commit, same one-cycle retention. */
  def compactTable(spark: SparkSession, path: String, numFiles: Int,
                   maxRetries: Int = 3): Unit =
    readManifest(spark, path).zCols match {
      case Some((a, b)) =>
        compactTableZOrdered(spark, path, numFiles, a, b, maxRetries)
      case None =>
        retryingCommit(spark, path, maxRetries) { m =>
          // the layout can only change between the dispatch read above
          // and this attempt via a concurrent Z migration — vanishingly
          // rare, but committing key-sorted would silently drop the
          // recorded curve, so refuse and let the caller re-dispatch
          require(m.zCols.isEmpty, s"$path became Z-ordered while this " +
            "compaction was in flight — re-run compactTable to dispatch " +
            "onto the recorded layout")
          val nextV = m.version + 1
          val txnRel = freshTxnRel(nextV)
          // a partitioned table compacts back onto its partition-pure
          // layout (numFiles range-split, one file per value when 0) —
          // a key-sorted rewrite would silently break the metadata-only
          // partition ops
          m.partCols match {
            case Seq() =>
              Tables.writeSortedBy(
                toPhysical(m.colMap, m.schema, readFiles(spark, path, m)),
                s"$path/$txnRel", numFiles, physNameOf(m.colMap, m.keyCol))
            case pcs =>
              Tables.writePartitionPure(
                toPhysical(m.colMap, m.schema, readFiles(spark, path, m)),
                s"$path/$txnRel", pcs.map(physNameOf(m.colMap, _)),
                physNameOf(m.colMap, m.keyCol), numFiles)
          }
          val newE = statsFor(spark, path, txnRel, m.keyCol, m.schema,
            m.statsCols, m.colMap)
          if (m.partCols.nonEmpty)
            requirePartitionPure(m.partCols, newE, path)
          commitFence()
          writeManifest(spark, path, nextV, m.keyCol, m.keyType, m.schema,
            m.statsCols, newE, m.tag, zCols = None, retain = m.retain,
            op = "compact", partCols = m.partCols,
            constraints = m.constraints, colMap = m.colMap,
            retiredPhys = m.retiredPhys)
          retireKeeping(spark, path, nextV, m.retain)
        }
    }

  /** Consolidate every live deletion vector into ONE sidecar — the
    * metadata-tier maintenance between dv commits and a materializing
    * compaction: repeated dv commits leave the dv'd entries pointing at
    * several sidecars (each read pays one anti-join GROUP per sidecar),
    * and this folds all current dead pairs into a single fresh sidecar
    * and re-points every dv'd entry at it. No data file is touched;
    * cost ∝ the total dead-pair count (sidecar-sized). Entries' dead
    * counts are preserved verbatim — a file's pair set in its CURRENT
    * sidecar is always the complete one (consolidating commits carry
    * old pairs forward), and the cross-sidecar union is deduplicated
    * in case a still-referenced older sidecar holds a stale subset.
    * Already-single (or vector-free) tables are a no-op. */
  def consolidateDv(spark: SparkSession, path: String,
                    maxRetries: Int = 3): Boolean =
    retryingCommit(spark, path, maxRetries) { m =>
      val dvd = m.entries.filter(_.dv.isDefined)
      val rels = dvd.map(_.dv.get.dvRel).distinct
      if (rels.size <= 1) false
      else {
        val nextV = m.version + 1
        val dvRel = s"${freshTxnRel(nextV)}-dv"
        val dvdRels = dvd.map(_.relPath)
        spark.read.parquet(rels.map(r => s"$path/$r"): _*)
          .filter(col("__f").isin(dvdRels: _*))
          .distinct()
          .write.mode("overwrite").parquet(s"$path/$dvRel")
        val entries = m.entries.map(e => e.dv match {
          case Some(d) => e.copy(dv = Some(DvRef(dvRel, d.dead)))
          case None => e
        })
        commitFence()
        writeManifest(spark, path, nextV, m.keyCol, m.keyType, m.schema,
          m.statsCols, entries, m.tag, m.zCols, m.retain,
          op = "consolidate-dv", partCols = m.partCols,
          constraints = m.constraints, colMap = m.colMap,
          retiredPhys = m.retiredPhys)
        retireKeeping(spark, path, nextV, m.retain)
        true
      }
    }

  /** INCREMENTAL OPTIMIZE — bin-pack ONLY the small files: every merge
    * appends batch-sized files next to table-sized ones, and a full
    * [[compactTable]] pays a whole-table rewrite to fold them back
    * (the wrong shape at 100 TB: rewrite cost must scale with the
    * SMALL-FILE MASS, not the table). Files with fewer than
    * `targetRows` live rows — and every file still carrying a deletion
    * vector, whose reads pay the anti-join — are rewritten together
    * into ~target-sized key-sorted files; everything else is carried
    * by reference, byte-untouched. A single qualifying file with no
    * vector is left alone (rewriting one small file buys nothing).
    * Decided from the manifest's recorded row counts alone; returns
    * the [[MergeStats]] evidence (filesRewritten == the small-file
    * count). Flat key-sorted tables only: partitioned tables have
    * [[compactPartitions]] (their maintenance must stay
    * partition-pure) and Z tables re-cluster onto their curve via
    * [[compactTable]]'s dispatch. */
  def compactSmallFiles(spark: SparkSession, path: String,
                        targetRows: Long,
                        maxRetries: Int = 3): MergeStats = {
    require(targetRows > 0, s"targetRows=$targetRows must be positive")
    retryingCommit(spark, path, maxRetries) { m =>
      require(m.partCols.isEmpty, s"$path is partitioned — use " +
        "compactPartitions (maintenance must stay partition-pure)")
      require(m.zCols.isEmpty, s"$path is Z-ordered — use compactTable " +
        "(maintenance must stay on the recorded curve)")
      val (small, big) = m.entries.partition(e =>
        e.rows < targetRows || e.dv.isDefined)
      if (small.isEmpty ||
          (small.size == 1 && small.head.dv.isEmpty)) {
        val n = m.entries.size
        MergeStats(m.version, n, 0, 0, n)
      } else {
        val nextV = m.version + 1
        val txnRel = freshTxnRel(nextV)
        val rows = small.map(_.rows).sum
        val nFiles = math.max(1, (rows / math.max(1L, targetRows)).toInt)
        // readEntries applies any deletion vectors, so the rewrite
        // MATERIALIZES them — the folded files come out clean
        Tables.writeSortedBy(
          toPhysical(m.colMap, m.schema,
            readEntries(spark, path, m.schema, m.keyCol, small, m.colMap)),
          s"$path/$txnRel", nFiles, physNameOf(m.colMap, m.keyCol))
        val newE = statsFor(spark, path, txnRel, m.keyCol, m.schema,
          m.statsCols, m.colMap)
        commitFence()
        writeManifest(spark, path, nextV, m.keyCol, m.keyType, m.schema,
          m.statsCols, big ++ newE, m.tag, zCols = None, retain = m.retain,
          op = "compact-small", partCols = Seq.empty,
          constraints = m.constraints, colMap = m.colMap,
          retiredPhys = m.retiredPhys)
        retireKeeping(spark, path, nextV, m.retain)
        MergeStats(nextV, m.entries.size, small.size, newE.size, big.size)
      }
    }
  }

  /** MANIFEST-LEVEL file pruning on a secondary stats column: read only
    * the files whose recorded [min, max] for `statsCol` intersects
    * [lo, hi] — the decision happens against the manifest's interval
    * list, before any parquet footer is opened (on an object store that
    * is the difference between one small-file read and a full listing +
    * footer fetch per file). Files without recorded stats for the column
    * (all-null, or written before the column was tracked) are read
    * conservatively. The interval compare runs IN SPARK with the
    * column's stored type, like the merge touch-set. Rows still need the
    * predicate applied — pruning is file-granular:
    * {{{ prunedRead(...).filter(col(c).between(lo, hi)) }}} */
  def prunedRead(spark: SparkSession, path: String, statsCol: String,
                 lo: Any, hi: Any): DataFrame = {
    val m = readManifest(spark, path)
    require(m.statsCols.contains(statsCol) || m.keyCol == statsCol,
      s"no stats recorded for column '$statsCol' " +
      s"(tracked: ${m.keyCol} :: ${m.statsCols.mkString(",")})")
    val colType = m.schema(statsCol).dataType
    def range(e: FileEntry): Option[(String, String)] =
      if (statsCol == m.keyCol)
        for (mn <- e.min; mx <- e.max) yield (mn, mx)
      else e.extra.get(statsCol)
    val (statted, blind) = m.entries.partition(e => range(e).isDefined)
    val keep: Set[String] =
      if (statted.isEmpty) Set.empty
      else {
        val ranges = spark.createDataFrame(statted.map { e =>
            val (mn, mx) = range(e).get; (e.relPath, mn, mx)
          }).toDF("__f", "__mn", "__mx")
          .select(col("__f"), col("__mn").cast(colType).as("__mn"),
            col("__mx").cast(colType).as("__mx"))
        ranges.filter(col("__mx") >= lit(lo).cast(colType) &&
            col("__mn") <= lit(hi).cast(colType))
          .select("__f").collect().map(_.getString(0)).toSet
      }
    readEntries(spark, path, m.schema, m.keyCol,
      statted.filter(e => keep(e.relPath)) ++ blind, m.colMap)
  }

  /** FILTER-PUSHDOWN READ: the query-shaped front door to manifest
    * pruning — pass any boolean predicate and the file list is cut
    * DRIVER-SIDE against the manifest's per-file stats before a single
    * parquet footer opens, then the FULL predicate applies as an
    * ordinary filter (pruning is file-granular; Spark's own parquet
    * pushdown still handles row groups inside the kept files). This is
    * what a table format's data-skipping layer does with a WHERE
    * clause, without needing an explicit [[prunedRead]] column/range
    * call per conjunct.
    *
    * Prunable shapes (on the merge key, any tracked stats column, and
    * — partitioned tables — the partition column, which always leads
    * the tracked stats): `=`, `<`, `<=`, `>`, `>=`, `IN`, null-safe
    * equality to a non-null literal, string `startsWith`, and any
    * AND/OR tree over those. Everything else — other columns,
    * functions of columns, `NOT`, nulls tests — contributes no pruning
    * (conservatively TRUE for the file decision) but still filters
    * rows. An OR prunes only when BOTH sides prune (the sound rule).
    * Files without recorded stats for a referenced column are read
    * conservatively. Interval comparisons run IN SPARK with the
    * column's stored type over the file-count-sized range table (the
    * [[prunedRead]] / touch-set technique) — exact ordering, no
    * driver-side string compares, one metadata-sized job. */
  def readWhere(spark: SparkSession, path: String, cond: Column): DataFrame = {
    val m = readManifest(spark, path)
    // ONE analysis of the predicate feeds both pruning tiers:
    // stats-range pruning first, then the bloom file-skipping index
    // (when built — BloomSkip) shrinks the survivors by membership on
    // equality/IN conjuncts that ranges can never prune
    val kept = analyzedCond(spark, m.schema, cond) match {
      case None => m.entries
      case Some(e) =>
        BloomSkip.prune(spark, path, m, e, whereSetsExpr(spark, m, e)._1)
    }
    readEntries(spark, path, m.schema, m.keyCol, kept, m.colMap).filter(cond)
  }

  /** The file-pruning half of [[readWhere]], reusable by any caller
    * that wants the kept entry list (ops visibility, tests). */
  private[io] def entriesWhere(spark: SparkSession, m: Manifest,
                               cond: Column): Seq[FileEntry] =
    whereSets(spark, m, cond)._1

  /** Both halves of predicate-vs-stats reasoning in ONE metadata-sized
    * pass: `_1` = files that POSSIBLY hold a matching row (the sound
    * read/prune set — see [[readWhere]] for the shapes), `_2` = rel
    * paths PROVABLY matched on every row, the [[deleteWhere]]
    * metadata-drop set. Coverage proofs use the MERGE KEY (non-null by
    * table contract) and the PARTITION column (non-null and one value
    * per file by the partition-pure write contract) — for both, "the
    * whole [min,max] range satisfies the comparison" really does mean
    * every row matches. Ordinary stats columns never prove coverage: a
    * null the stats don't record makes the predicate non-true for that
    * row, so coverage would over-delete. AND needs both sides proved;
    * OR either; anything else proves nothing (conservatively
    * uncovered). */
  private[io] def whereSets(spark: SparkSession, m: Manifest,
                            cond: Column): (Seq[FileEntry], Set[String]) =
    analyzedCond(spark, m.schema, cond) match {
      case Some(e) => whereSetsExpr(spark, m, e)
      case None => (m.entries, Set.empty)
    }

  /** Column → catalyst Expression without the private[sql] bridge: an
    * ANALYZED probe plan over an empty frame with the table schema.
    * The raw plan won't do — Spark 4's Column DSL builds
    * UnresolvedFunction('=') nodes, and only the analyzer rewrites
    * them to EqualTo/LessThan/... that the stats/bloom matchers read.
    * Driver-only, no job; analysis failures (unknown column) return
    * None — callers fall back to no pruning and the failure surfaces
    * on the real read. Shared so each DML/read call analyzes its
    * predicate exactly ONCE across both pruning tiers. */
  private[io] def analyzedCond(spark: SparkSession, schema: StructType,
                               cond: Column): Option[
      org.apache.spark.sql.catalyst.expressions.Expression] =
    scala.util.Try(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .filter(cond).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }).toOption.flatten

  /** [[whereSets]] over an ALREADY-RESOLVED catalyst predicate — the
    * planner-integrated entry point: [[GraftFileIndex]] receives the
    * analyzer's resolved `dataFilters` directly, so re-rendering them
    * through a Column would only re-run analysis. Same conservative
    * contract: any shape the matchers below don't recognize prunes
    * nothing and covers nothing. */
  private[io] def whereSetsExpr(
      spark: SparkSession, m: Manifest,
      expr0: org.apache.spark.sql.catalyst.expressions.Expression)
      : (Seq[FileEntry], Set[String]) = {
    import org.apache.spark.sql.catalyst.{expressions => cexp}
    // Tight exclusive upper bound of the `startsWith(prefix)` range, in
    // CODE POINTS (code-point order IS UTF-8 byte order, the order
    // string stats compare in). A per-CHAR bump is unsound at the
    // surrogate boundary: '퟿'+1 = '\uD800' is an unpaired high
    // surrogate whose UTF-8 encoding is '?' (0x3F) — byte-wise SMALLER
    // than the prefix, so `mn < next` would prune files that DO contain
    // matches. A bump landing in the surrogate gap skips to U+E000 (the
    // gap is unencodable, so the bound stays tight); only an
    // all-U+10FFFF prefix has no successor (None).
    def nextPrefix(prefix: String): Option[String] = {
      val cps = prefix.codePoints.toArray
      var i = cps.length - 1
      while (i >= 0) {
        val nx0 = cps(i) + 1
        val nx = if (nx0 >= 0xD800 && nx0 <= 0xDFFF) 0xE000 else nx0
        if (nx <= 0x10FFFF) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < i) { sb.appendCodePoint(cps(j)); j += 1 }
          sb.appendCodePoint(nx)
          return Some(sb.toString)
        }
        i -= 1
      }
      None
    }
    // resolve an attribute to its schema-cased name, only when its
    // stats are actually recorded (key min/max or a tracked column)
    def tracked(e: cexp.Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        m.schema.fieldNames
          .find(_.equalsIgnoreCase(a.nameParts.last))
          .filter(n => n == m.keyCol || m.statsCols.contains(n))
      case a: cexp.Attribute =>
        m.schema.fieldNames.find(_.equalsIgnoreCase(a.name))
          .filter(n => n == m.keyCol || m.statsCols.contains(n))
      case _ => None
    }
    def litOf(e: cexp.Expression): Option[cexp.Literal] = e match {
      case l: cexp.Literal if l.value != null => Some(l)
      case _ => None
    }
    // per-conjunct interval predicate over the range table's columns
    // (__mn_<c>, __mx_<c>); None = unprunable (≡ TRUE for the file).
    // NULL-safe by construction: a missing range yields NULL, and the
    // final coalesce(pred, true) keeps the file conservatively.
    def mn(c: String) = col(s"__mn_$c")
    def mx(c: String) = col(s"__mx_$c")
    // the literal keeps ITS OWN type (its internal value matches it)
    // and goes through a cast to the stored stats type — never a
    // re-typed Literal, whose internal representation would not match
    // catalyst Literal → Column publicly: render to its SQL form
    // (types carried: 5L, 'x', DATE '…') and re-parse
    def typedLit(c: String, l: cexp.Literal): Column =
      expr(l.sql).cast(m.schema(c).dataType)
    def prune(e: cexp.Expression): Option[Column] = e match {
      case cexp.And(l, r) => (prune(l), prune(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b) // TRUE ∧ p = p
      }
      case cexp.Or(l, r) => for (a <- prune(l); b <- prune(r)) yield a || b
      case cexp.EqualTo(a, v) => eq(a, v).orElse(eq(v, a))
      case cexp.EqualNullSafe(a, v) => eq(a, v).orElse(eq(v, a))
      case cexp.LessThan(a, v) =>
        ineq(a, v)((c, l) => mn(c) < l).orElse(ineq(v, a)((c, l) => mx(c) > l))
      case cexp.LessThanOrEqual(a, v) =>
        ineq(a, v)((c, l) => mn(c) <= l)
          .orElse(ineq(v, a)((c, l) => mx(c) >= l))
      case cexp.GreaterThan(a, v) =>
        ineq(a, v)((c, l) => mx(c) > l).orElse(ineq(v, a)((c, l) => mn(c) < l))
      case cexp.GreaterThanOrEqual(a, v) =>
        ineq(a, v)((c, l) => mx(c) >= l)
          .orElse(ineq(v, a)((c, l) => mn(c) <= l))
      case cexp.In(a, vs) =>
        val lits = vs.flatMap(litOf)
        if (lits.length == vs.length && lits.nonEmpty)
          tracked(a).map(c => lits.map(v =>
            mn(c) <= typedLit(c, v) && mx(c) >= typedLit(c, v))
            .reduce(_ || _))
        else None
      case cexp.StartsWith(a, p) =>
        for (c <- tracked(a); v <- litOf(p)) yield {
          val prefix = v.value.toString
          // [prefix, nextPrefix(prefix)) — all-U+10FFFF prefixes fall
          // back to the lower bound only
          val t = m.schema(c).dataType
          val lower = mx(c) >= lit(prefix).cast(t)
          nextPrefix(prefix).fold(lower)(nx =>
            lower && mn(c) < lit(nx).cast(t))
        }
      case _ => None
    }
    def eq(a: cexp.Expression, v: cexp.Expression): Option[Column] =
      for (c <- tracked(a); l <- litOf(v)) yield
        mn(c) <= typedLit(c, l) && mx(c) >= typedLit(c, l)
    def ineq(a: cexp.Expression, v: cexp.Expression)
            (f: (String, Column) => Column): Option[Column] =
      for (c <- tracked(a); l <- litOf(v)) yield f(c, typedLit(c, l))

    // ---- the COVERAGE dual: Some(col) = "predicate provably TRUE for
    // every row of the file". Provable columns: the MERGE KEY (non-null
    // by contract), the PARTITION column (partition-pure writes refuse
    // nulls and enforce one value per file, so its range IS its every
    // row) — a time-partitioned table's `DELETE WHERE pt < …` drops
    // whole partitions metadata-only, the retention shape — and (round
    // 14) any tracked stats column carrying a `"c IS NOT NULL"` CHECK
    // constraint: the constraint is enforced inside every write job AND
    // backfill-validated at add time, so the recorded [min,max] bounds
    // EVERY row, exactly what coverage needs. Only the canonical
    // textual form licenses it — anything fancier stays prune-only.
    // (Documented residual, per the [[restoreVersion]] contract: a
    // restore past the constraint's add can reintroduce pre-validation
    // rows without re-validating; re-add the constraint after such a
    // restore if coverage proofs must stay trustworthy.) ----
    val notNullRe =
      "(?i)^\\s*\"?([A-Za-z_][A-Za-z0-9_]*)\"?\\s+IS\\s+NOT\\s+NULL\\s*$".r
    val notNullCols: Set[String] = m.constraints.flatMap { case (_, sql) =>
      sql match {
        case notNullRe(c) =>
          m.schema.fieldNames.find(_.equalsIgnoreCase(c))
        case _ => None
      }
    }.toSet
    def keyed(e: cexp.Expression): Option[String] =
      tracked(e).filter(c => c == m.keyCol || m.partCols.contains(c) ||
        (m.statsCols.contains(c) && notNullCols(c)))
    def keq(a: cexp.Expression, v: cexp.Expression): Option[Column] =
      for (c <- keyed(a); l <- litOf(v)) yield
        mn(c) === typedLit(c, l) && mx(c) === typedLit(c, l)
    def kineq(a: cexp.Expression, v: cexp.Expression)
             (f: (String, Column) => Column): Option[Column] =
      for (c <- keyed(a); l <- litOf(v)) yield f(c, typedLit(c, l))
    def cover(e: cexp.Expression): Option[Column] = e match {
      case cexp.And(l, r) => for (a <- cover(l); b <- cover(r)) yield a && b
      case cexp.Or(l, r) => (cover(l), cover(r)) match {
        case (Some(a), Some(b)) => Some(a || b)
        case (a, b) => a.orElse(b) // one side covering the file suffices
      }
      case cexp.EqualTo(a, v) => keq(a, v).orElse(keq(v, a))
      case cexp.EqualNullSafe(a, v) => keq(a, v).orElse(keq(v, a))
      case cexp.LessThan(a, v) =>
        kineq(a, v)((c, l) => mx(c) < l).orElse(kineq(v, a)((c, l) => mn(c) > l))
      case cexp.LessThanOrEqual(a, v) =>
        kineq(a, v)((c, l) => mx(c) <= l)
          .orElse(kineq(v, a)((c, l) => mn(c) >= l))
      case cexp.GreaterThan(a, v) =>
        kineq(a, v)((c, l) => mn(c) > l).orElse(kineq(v, a)((c, l) => mx(c) < l))
      case cexp.GreaterThanOrEqual(a, v) =>
        kineq(a, v)((c, l) => mn(c) >= l)
          .orElse(kineq(v, a)((c, l) => mx(c) <= l))
      case cexp.In(a, vs) =>
        val lits = vs.flatMap(litOf)
        if (lits.length == vs.length && lits.nonEmpty)
          // provable only for a single-valued file whose value is listed
          keyed(a).map(c => mn(c) === mx(c) &&
            lits.map(v => mn(c) === typedLit(c, v)).reduce(_ || _))
        else None
      case cexp.StartsWith(a, p) =>
        for (c <- keyed(a); v <- litOf(p);
             nx <- nextPrefix(v.value.toString)) yield {
          val t = m.schema(c).dataType
          // every string in [prefix, nextPrefix(prefix)) carries the
          // prefix
          mn(c) >= lit(v.value.toString).cast(t) && mx(c) < lit(nx).cast(t)
        }
      case _ => None
    }

    val (pruneP, coverP) = (prune(expr0), cover(expr0))
    if (m.entries.isEmpty || (pruneP.isEmpty && coverP.isEmpty))
      return (m.entries, Set.empty)
    // referenced columns' ranges, typed via cast (stats are stored
    // string-encoded); unrecorded ranges stay NULL — kept on the
    // possible side, never covered on the proof side
    val cols = (m.keyCol +: m.statsCols).distinct
    def range(e: FileEntry, c: String): (String, String) =
      if (c == m.keyCol) (e.min.orNull, e.max.orNull)
      else e.extra.get(c).map(x => (x._1, x._2)).getOrElse((null, null))
    val rows = m.entries.map(e =>
      org.apache.spark.sql.Row.fromSeq(e.relPath +:
        cols.flatMap(c => { val (a, b) = range(e, c); Seq(a, b) })))
    val schema = StructType(
      org.apache.spark.sql.types.StructField("__f",
        org.apache.spark.sql.types.StringType) +:
      cols.flatMap(c => Seq(
        org.apache.spark.sql.types.StructField(s"__rmn_$c",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(s"__rmx_$c",
          org.apache.spark.sql.types.StringType))))
    import scala.jdk.CollectionConverters._
    val ranges = spark.createDataFrame(rows.asJava, schema)
      .select(col("__f") +: cols.flatMap(c => Seq(
        col(s"__rmn_$c").cast(m.schema(c).dataType).as(s"__mn_$c"),
        col(s"__rmx_$c").cast(m.schema(c).dataType).as(s"__mx_$c"))): _*)
    val flags = ranges.select(col("__f"),
        coalesce(pruneP.getOrElse(lit(true)), lit(true)).as("__possible"),
        coalesce(coverP.getOrElse(lit(false)), lit(false)).as("__covered"))
      .collect()
    val keep = flags.filter(_.getBoolean(1)).map(_.getString(0)).toSet
    val covered = flags.filter(_.getBoolean(2)).map(_.getString(0)).toSet
    (m.entries.filter(e => keep(e.relPath)), covered)
  }

  /** The live file inventory as a DataFrame — ops visibility: per file
    * its row count, key range, and each tracked secondary column's
    * range (null when unrecorded). */
  def describe(spark: SparkSession, path: String): DataFrame = {
    val m = readManifest(spark, path)
    import scala.jdk.CollectionConverters._
    val fields = StructType(
      Seq(org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rows",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("key_min",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("key_max",
          org.apache.spark.sql.types.StringType)) ++
      m.statsCols.flatMap(c => Seq(
        org.apache.spark.sql.types.StructField(s"${c}_min",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(s"${c}_max",
          org.apache.spark.sql.types.StringType))) ++
      Seq(org.apache.spark.sql.types.StructField("dv_file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("dv_dead",
          org.apache.spark.sql.types.LongType)))
    val rows = m.entries.map { e =>
      org.apache.spark.sql.Row.fromSeq(
        Seq(e.relPath, e.rows, e.min.orNull, e.max.orNull) ++
        m.statsCols.flatMap(c => e.extra.get(c) match {
          case Some((mn, mx)) => Seq(mn, mx)
          case None => Seq(null, null)
        }) ++
        Seq(e.dv.map(_.dvRel).orNull,
          e.dv.map(d => java.lang.Long.valueOf(d.dead)).orNull))
    }
    spark.createDataFrame(rows.asJava, fields)
  }

  /** The one place the retention-window arithmetic lives: after
    * `latestV` is the newest committed version, keep the last `retain`
    * versions (latestV − retain + 1 .. latestV) — every commit path and
    * [[vacuum]] must retire through this, a slipped `− 1` elsewhere
    * would silently widen or narrow the window. */
  /** What the next retention pass would remove — [[vacuumPreview]].
    * `borrowBreaking`: (borrower table, file) pairs where a planned
    * retirement in `files` is still BORROWED by a shallow clone the
    * caller registered — vacuuming now breaks that clone's reads. */
  case class VacuumPlan(keepFrom: Long, manifests: Seq[Long],
                        files: Seq[String], pendingGrace: Seq[String],
                        borrowBreaking: Seq[(String, String)] = Nil)

  /** DRY-RUN of the retention sweep (the `VACUUM DRY RUN` every
    * operator wants before trusting an automated deleter): returns
    * exactly what the NEXT commit's pass would delete — out-of-window
    * manifest versions, data/sidecar files referenced by no retained
    * manifest AND older than the orphan grace — plus `pendingGrace`,
    * the unreferenced files the grace period is still protecting (a
    * crashed attempt's files, or files a lagging rebase may yet
    * commit). Read-only: nothing is touched. The spec pins this
    * against the real sweep — everything previewed in `files` is gone
    * after the next commit, everything else remains.
    *
    * `registry`: other manifest-table paths the CALLER knows about
    * (there is deliberately no global catalog — clones are free-
    * standing directories). Each is checked for entries borrowing from
    * THIS table; any planned retirement they still reference lands in
    * `borrowBreaking` so the operator can [[severClone]] the borrower
    * (or skip the vacuum) first. Path matching is best-effort textual
    * (scheme/authority-stripped), the right trade for a dry-run
    * advisory. */
  def vacuumPreview(spark: SparkSession, path: String,
                    registry: Seq[String] = Nil): VacuumPlan = {
    val root = new Path(path)
    val fs = hfs(spark, root)
    val graceMs = spark.conf.getOption("graft.manifest.orphanGraceMs")
      .map(_.toLong).getOrElse(15L * 60 * 1000)
    val now = System.currentTimeMillis
    val m = readManifest(spark, path)
    val keepFrom = m.version - (m.retain - 1)
    val keptVersions = (keepFrom to m.version).filter(v =>
      fs.exists(manifestFile(path, v)))
    val keptEntries = keptVersions.flatMap(v =>
      readManifestAt(spark, path, v).entries)
    val referenced: Set[String] = keptEntries.map(_.relPath).toSet
    val refDvDirs: Seq[String] =
      keptEntries.flatMap(_.dv.map(_.dvRel)).distinct
    def dvReferenced(rel: String): Boolean =
      refDvDirs.exists(d => rel == d || rel.startsWith(d + "/"))
    val manifests = fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && !n.contains(".tmp"))
      .map(_.drop("manifest-".length))
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .filter(_ < keepFrom).toSeq.sorted
    val files = Seq.newBuilder[String]
    val pending = Seq.newBuilder[String]
    val dataDir = new Path(s"$path/data")
    def walk(dir: Path, relPrefix: String): Unit =
      fs.listStatus(dir).foreach { f =>
        val rel = s"$relPrefix/${f.getPath.getName}"
        if (f.isDirectory) walk(f.getPath, rel)
        else if (!referenced.contains(rel) && !dvReferenced(rel)) {
          if (now - f.getModificationTime > graceMs) files += rel
          else pending += rel
        }
      }
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).filter(_.isDirectory).foreach(txn =>
        walk(txn.getPath, s"data/${txn.getPath.getName}"))
    val planned = files.result().sorted
    // scheme/authority-stripped textual form: borrowed entries may be
    // qualified ("file:/x/…") while this table was opened as "/x"
    def canon(p: String): String =
      p.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:(//[^/]*)?", "")
    val selfC = canon(path).stripSuffix("/")
    val breaking = for {
      other <- registry if canon(other).stripSuffix("/") != selfC
      mo <- scala.util.Try(readManifest(spark, other)).toOption.toSeq
      plannedAbs = planned.map(r => s"$selfC/$r").toSet
      e <- mo.entries
      if (e.relPath.startsWith("/") || isQualified(e.relPath)) &&
        plannedAbs.contains(canon(e.relPath))
    } yield (other, e.relPath)
    VacuumPlan(keepFrom, manifests, planned,
      pending.result().sorted, breaking)
  }

  private def retireKeeping(spark: SparkSession, path: String,
                            latestV: Long, retain: Int): Unit =
    retire(spark, path, keepFrom = latestV - (retain - 1))

  /** Retention: keep every file referenced by a manifest >= `keepFrom`
    * (the manifest's `retain` window of superseded versions stays fully
    * readable), delete older manifests and any data file no kept
    * manifest references — which also sweeps crashed-transaction orphans
    * and zero-row part files. An unreferenced data file is only deleted
    * once it is OLDER than the orphan grace period
    * (`graft.manifest.orphanGraceMs` in the session conf, default 15
    * min): under optimistic concurrency an in-flight committer has
    * written its attempt's txn files but not yet claimed a version, and
    * a concurrent winner's sweep must not destroy files a rebase is
    * about to commit — the same reason production formats age-gate
    * their vacuum. Manifests themselves are committed (never in-flight),
    * so out-of-window manifests are deleted immediately. */
  private def retire(spark: SparkSession, path: String,
                     keepFrom: Long): Unit = {
    val root = new Path(path)
    val fs = hfs(spark, root)
    val graceMs = spark.conf.getOption("graft.manifest.orphanGraceMs")
      .map(_.toLong).getOrElse(15L * 60 * 1000)
    val now = System.currentTimeMillis
    val latest = latestVersion(spark, path).getOrElse(return)
    val keptVersions = (keepFrom to latest).filter(v =>
      fs.exists(manifestFile(path, v)))
    val keptEntries = keptVersions.flatMap(v =>
      readManifestAt(spark, path, v).entries)
    val referenced: Set[String] = keptEntries.map(_.relPath).toSet
    // deletion-vector sidecars are DIRECTORIES (a parquet write's part
    // files + _SUCCESS) referenced by prefix — every file under a
    // referenced sidecar stays, or the next read of a dv'd entry
    // resolves to a half-deleted vector
    val refDvDirs: Seq[String] =
      keptEntries.flatMap(_.dv.map(_.dvRel)).distinct
    def dvReferenced(rel: String): Boolean =
      refDvDirs.exists(d => rel == d || rel.startsWith(d + "/"))
    // older manifests out; crashed writers' aged tmp files too (a live
    // optimistic committer's tmp is younger than the grace)
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("manifest-") && !n.contains(".tmp")) {
        val v = n.drop("manifest-".length)
        if (v.forall(_.isDigit) && v.nonEmpty && v.toLong < keepFrom)
          fs.delete(st.getPath, false)
      } else if (n.startsWith("manifest-") && n.contains(".tmp") &&
          now - st.getModificationTime > graceMs)
        fs.delete(st.getPath, false)
    }
    // unreferenced data files out (once past the grace); then empty
    // dirs bottom-up. RECURSIVE below the txn level: a partition-pure
    // txn ([[Tables.writePartitionPure]]) nests its files one
    // `__p=<value>/` level down, and rel paths in the manifest carry
    // that level — a flat sweep would neither match nor clean them
    val dataDir = new Path(s"$path/data")
    if (!fs.exists(dataDir)) return
    // empty-dir deletion is AGE-GATED like the files: an in-flight
    // writer creates its (momentarily empty) _temporary scaffolding
    // right as it starts — a concurrent winner's sweep deleting a fresh
    // empty dir rips the directory out from under the writing task
    // (found by the 4-writer stress test racing this very sweep)
    def sweep(dir: Path, relPrefix: String): Unit = {
      fs.listStatus(dir).foreach { f =>
        val rel = s"$relPrefix/${f.getPath.getName}"
        if (f.isDirectory) {
          sweep(f.getPath, rel)
          if (now - f.getModificationTime > graceMs &&
              fs.listStatus(f.getPath).isEmpty)
            fs.delete(f.getPath, false)
        } else if (!referenced.contains(rel) && !dvReferenced(rel) &&
            now - f.getModificationTime > graceMs)
          fs.delete(f.getPath, false)
      }
    }
    fs.listStatus(dataDir).filter(_.isDirectory).foreach { txn =>
      sweep(txn.getPath, s"data/${txn.getPath.getName}")
      if (now - txn.getModificationTime > graceMs &&
          fs.listStatus(txn.getPath).isEmpty)
        fs.delete(txn.getPath, false)
    }
  }
}
