package graft.io

import java.io.ByteArrayInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{expressions => cexp}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

import graft.io.ManifestTable.{FileEntry, Manifest}

/** BLOOM FILE-SKIPPING INDEX — membership pruning for the predicates
  * min/max stats can NEVER prune: an equality or IN lookup on a column
  * whose values are spread across every file (ids, digests, user keys
  * — any column uncorrelated with the table's sort), where every
  * file's [min,max] covers the probe and the whole table would scan.
  * A per-FILE bloom filter answers "definitely not in this file" and
  * drops the file from the read before any footer opens — the
  * manifest-level analogue of the parquet row-group blooms
  * ([[Tables.writeHashClusteredBloom]]), one tier up: at 100 TB the
  * row-group bloom still costs a footer RPC per file; this one costs
  * nothing per skipped file.
  *
  * DESIGN — a sidecar ACCELERATOR, not manifest state (zero surgery on
  * the commit paths, which is what makes it safe to bolt onto a table
  * with ten mutation families):
  *
  *  - the index lives at `<table>/_bloomidx/<physicalCol>/` as parquet
  *    rows (`__f` relPath, `__bloom` serialized filter), OUTSIDE
  *    `data/` so the retention sweep never touches it, keyed by the
  *    PHYSICAL column name so renames can't orphan it;
  *  - data files are IMMUTABLE, so an index row can never go stale —
  *    a deletion vector shrinks a file's live set (bloom stays a sound
  *    superset), and compaction/merge produce NEW files that simply
  *    have no row yet;
  *  - files WITHOUT an index row are kept conservatively, so the index
  *    is correct at every degree of staleness; [[build]] is
  *    INCREMENTAL (indexes only live files lacking rows — the shape
  *    [[ManifestTable.maintain]] runs on a cadence via
  *    [[refreshAll]]), and bloom decisions only ever SHRINK the
  *    possible-set — never the coverage proofs;
  *  - BUILD is one column-pruned distributed aggregation: per-file
  *    blooms come from Spark's own `BloomFilterAggregate` over
  *    `xxhash64(value)` — partial-aggregable, kilobyte state per file,
  *    no row ever reaches the driver. Integral values hash through a
  *    CAST TO LONG on both build and probe sides, so
  *    [[ManifestTable.widenColumn]] can never split the hash space
  *    (an int written yesterday and the long that probes it tomorrow
  *    hash identically);
  *  - PROBE is a file-count-sized job: index rows for the candidate
  *    files test `mightContain` against the conjunct's hashed
  *    literals executor-side; only surviving relPaths return. Only
  *    top-level AND conjuncts of shape `col = lit` / `col IN (lits)`
  *    (integral through widening casts, or string) prune — anything
  *    else is ignored, conservatively.
  *
  * Soundness: a bloom never false-negatives, so "no" really means no
  * row of that file can satisfy the equality — excluding the file from
  * a read ([[ManifestTable.readWhere]], the connector's
  * [[GraftFileIndex]]) or from a DML possible-set
  * ([[ManifestTable.deleteWhere]]/`updateWhere`) is exact. False
  * positives only cost I/O. */
object BloomSkip {

  private def dirOf(path: String, physCol: String): String =
    s"$path/_bloomidx/$physCol"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Normalized hash of one value, matching the build side's
    * `xxhash64(cast(col as long))` / `xxhash64(col)`. */
  private def hashOf(v: Any): Long = {
    val lit = v match {
      case b: Byte => cexp.Literal(b.toLong, LongType)
      case s: Short => cexp.Literal(s.toLong, LongType)
      case i: Int => cexp.Literal(i.toLong, LongType)
      case l: Long => cexp.Literal(l, LongType)
      case u: org.apache.spark.unsafe.types.UTF8String =>
        cexp.Literal(u, StringType)
      case s: String => cexp.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType)
      case other => throw new IllegalArgumentException(
        s"bloom-skip: unsupported probe value $other")
    }
    new cexp.XxHash64(Seq(lit)).eval(null).asInstanceOf[Long]
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def supported(dt: DataType): Boolean =
    integral(dt) || dt == StringType

  /** Build (or incrementally extend) the index on `col`: one
    * column-pruned scan of exactly the live files that lack an index
    * row, one partial-aggregated shuffle of kilobyte bloom states, one
    * appended parquet of (relPath, bloom). Returns how many files were
    * indexed (0 = already complete — the cheap steady-state probe).
    * `fpp` sizes the per-file filter against the file's recorded row
    * count (bits ≈ 1.44·rows·log2(1/fpp); capped at `maxItems`). */
  def build(spark: SparkSession, path: String, col0: String,
            fpp: Double = 0.03, maxItems: Long = 4000000L): Int = {
    require(fpp > 0 && fpp < 1, s"fpp=$fpp out of (0,1)")
    val m = ManifestTable.readManifest(spark, path)
    val field = m.schema.fieldNames.find(_.equalsIgnoreCase(col0))
      .getOrElse(throw new IllegalArgumentException(
        s"bloom-skip: no column '$col0' in ${m.schema.fieldNames.mkString(",")}"))
    val dt = m.schema(field).dataType
    require(supported(dt), s"bloom-skip: column '$field' has type " +
      s"${dt.simpleString}; only integral and string columns index " +
      "(hash-exact through widening)")
    val phys = ManifestTable.physNameOf(m.colMap, field)
    val dir = dirOf(path, phys)
    val have0: Set[String] =
      if (!fs(spark, new Path(dir)).exists(new Path(dir))) Set.empty
      // file-count-sized collect (one rel string per indexed file);
      // bloom bytes are column-pruned away
      else spark.read.parquet(dir).select("__f")
        .collect().map(_.getString(0)).toSet
    // index GC: rows for retired files (vacuumed versions, compacted
    // fragments) are harmless but accumulate; once they outnumber the
    // live rows, fold the index down to the live set. Overwrite is the
    // accelerator-grade commit: a crash mid-rewrite costs pruning
    // effectiveness, never correctness (missing rows read conservative)
    val live = m.entries.map(_.relPath).toSet
    val have: Set[String] =
      if (have0.nonEmpty && (have0 -- live).size > have0.size / 2) {
        import spark.implicits._
        val liveDf = live.toSeq.toDF("__f")
        val tmp = new Path(dir + ".gc")
        val d = new Path(dir)
        val f = fs(spark, d)
        // distributed fold into a staging dir, then swap — bloom bytes
        // never reach the driver; a crash between delete and rename
        // leaves no index (conservative reads) until the next build
        spark.read.parquet(dir).join(broadcast(liveDf), "__f")
          .write.mode("overwrite").parquet(tmp.toString)
        f.delete(d, true)
        f.rename(tmp, d)
        have0.intersect(live)
      } else have0
    val todo = m.entries.filter(e => !have(e.relPath))
    if (todo.isEmpty) return 0
    // absolute (clone-borrowed entries carry their own roots) → rel map,
    // normalized to URI-path form to match _metadata.file_path
    val relByUri: Map[String, String] = todo.map { e =>
      new Path(ManifestTable.absOf(path, e.relPath)).toUri.getPath ->
        e.relPath
    }.toMap
    val items = math.min(maxItems,
      math.max(1L, todo.map(_.rows).max))
    // optimal bits for the target fpp at this item count; the
    // BloomFilterAggregate conf cap (64M bits) still applies above
    val bits = math.max(64L, math.ceil(
      -items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val valueCol =
      if (dt == StringType) org.apache.spark.sql.functions.col(phys)
      else org.apache.spark.sql.functions.col(phys).cast("long")
    val agg = Bridge.column(new cexp.aggregate.BloomFilterAggregate(
      new cexp.XxHash64(Seq(Bridge.expression(
        org.apache.spark.sql.functions.col("__v")))),
      cexp.Literal(items), cexp.Literal(bits)).toAggregateExpression())
    val paths = todo.map(e => ManifestTable.absOf(path, e.relPath))
    // recursiveFileLookup, like readEntriesRaw: a partition-pure file
    // under `__p=<value>/` must not have a partition column invented
    // outside the single-field schema
    val rows = spark.read
      .schema(StructType(Seq(m.schema(field).copy(name = phys))))
      .option("recursiveFileLookup", "true")
      .parquet(paths: _*)
      .select(org.apache.spark.sql.functions.col("_metadata.file_path")
          .as("__f"), valueCol.as("__v"))
      .groupBy("__f").agg(agg.as("__bloom"))
    val relByUriB = relByUri
    import spark.implicits._
    val out = rows.as[(String, Array[Byte])].map { case (f, bloom) =>
      val uri =
        try new java.net.URI(f).getPath
        catch { case _: java.net.URISyntaxException => f }
      (relByUriB.getOrElse(uri, sys.error(
        s"bloom-skip: scanned file $uri not in the build set")), bloom)
    }.toDF("__f", "__bloom")
    out.write.mode("append").parquet(dir)
    todo.size
  }

  /** Drop the index on `col` (by its CURRENT logical name). */
  def drop(spark: SparkSession, path: String, col0: String): Unit = {
    val m = ManifestTable.readManifest(spark, path)
    val phys = m.schema.fieldNames.find(_.equalsIgnoreCase(col0))
      .map(ManifestTable.physNameOf(m.colMap, _)).getOrElse(col0)
    val d = new Path(dirOf(path, phys))
    fs(spark, d).delete(d, true)
  }

  /** Incrementally refresh EVERY existing index of the table — the
    * [[ManifestTable.maintain]] step: after compactions introduce new
    * files, each listed `_bloomidx/<physCol>` whose physical column
    * still maps to a live logical column gets its missing rows built.
    * Returns (column → files indexed), empty when no index exists. */
  def refreshAll(spark: SparkSession, path: String,
                 fpp: Double = 0.03): Map[String, Int] = {
    val root = new Path(s"$path/_bloomidx")
    val f = fs(spark, root)
    if (!f.exists(root)) return Map.empty
    val m = ManifestTable.readManifest(spark, path)
    val physToLogical = m.schema.fieldNames
      .map(n => ManifestTable.physNameOf(m.colMap, n) -> n).toMap
    f.listStatus(root).toSeq.map(_.getPath.getName).sorted.flatMap { phys =>
      physToLogical.get(phys) match {
        case Some(l) => Some(l -> build(spark, path, l, fpp))
        case None =>
          // the column was dropped (physical name retired) — its index
          // can never be probed again; reclaim it
          f.delete(new Path(dirOf(path, phys)), true)
          None
      }
    }.toMap
  }

  /** The probe: shrink `kept` (a sound possible-set) by testing each
    * eligible top-level AND conjunct of `expr0` against the column's
    * index. Files lacking an index row always survive; absent
    * index dirs cost one existence check.
    *
    * The probe is DRIVER-LOCAL in the steady state: index dirs are
    * file-count × kilobytes, so the deserialized filters live in a
    * bounded driver cache ([[IdxCache]], validated per probe by one
    * `listStatus` against the dir's (name, length, mtime) census) and
    * membership tests run in-process — repeated point lookups, and the
    * connector's planning-time [[GraftFileIndex.listFiles]] pruning,
    * launch ZERO Spark jobs. An index dir past the cache budget falls
    * back to the executor-side membership job. Every per-probe read is
    * failure-guarded: an index racing a [[build]] GC swap (delete +
    * rename) simply prunes nothing this probe — the accelerator
    * contract (staleness or absence costs pruning effectiveness,
    * never correctness). */
  private[io] def prune(spark: SparkSession, path: String, m: Manifest,
                        expr0: cexp.Expression,
                        kept: Seq[FileEntry]): Seq[FileEntry] = {
    if (kept.isEmpty) return kept
    // cheap short-circuit before conjunct analysis: no index root
    val root = new Path(s"$path/_bloomidx")
    if (scala.util.Try(!fs(spark, root).exists(root)).getOrElse(true))
      return kept
    val probes = conjunctProbes(m, expr0)
    if (probes.isEmpty) return kept
    var current = kept
    probes.foreach { case (phys, values) =>
      if (current.nonEmpty) current = scala.util.Try(
        pruneOne(spark, path, phys, values, current)).getOrElse(current)
    }
    current
  }

  /** One conjunct's membership cut — driver-cached filters when the
    * index fits the budget, the executor-side job otherwise. Throws
    * propagate to [[prune]]'s conservative catch. */
  private def pruneOne(spark: SparkSession, path: String, phys: String,
                       values: Seq[Any],
                       current: Seq[FileEntry]): Seq[FileEntry] = {
    val dir = dirOf(path, phys)
    val hashes = values.map(hashOf)
    IdxCache.get(spark, dir) match {
      case IdxCache.Missing => current
      case IdxCache.Loaded(blooms) =>
        current.filter { e =>
          blooms.get(e.relPath) match {
            case Some(bf) => hashes.exists(bf.mightContainLong)
            case None => true // unindexed file reads conservatively
          }
        }
      case IdxCache.TooBig =>
        if (!fs(spark, new Path(dir)).exists(new Path(dir))) current
        else {
          val rels = current.map(_.relPath)
          import spark.implicits._
          val relsDf = rels.toDF("__f")
          val indexed = spark.read.parquet(dir)
            .join(broadcast(relsDf), "__f")
          // executor-side membership test, one deserialization per
          // (file, conjunct) — file-count-sized rows, never data;
          // one (rel, boolean) per candidate comes back
          val hs = hashes
          val verdicts = indexed.as[(String, Array[Byte])].map {
            case (rel, bytes) =>
              val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
              (rel, hs.exists(bf.mightContainLong))
          }.collect()
          val no = verdicts.collect { case (rel, false) => rel }.toSet
          if (no.isEmpty) current
          else current.filterNot(e => no(e.relPath))
        }
    }
  }

  /** Column-mapping aware `prune` over an UNANALYZED predicate — the
    * Column-API entry point (tests, ad-hoc callers), sharing
    * [[ManifestTable.analyzedCond]]'s probe-plan analysis. The DML/read
    * paths analyze ONCE and call [[prune]] directly. Analysis failure
    * = no pruning. */
  private[io] def pruneCond(spark: SparkSession, path: String, m: Manifest,
                            cond: org.apache.spark.sql.Column,
                            kept: Seq[FileEntry]): Seq[FileEntry] = {
    if (kept.isEmpty) return kept
    ManifestTable.analyzedCond(spark, m.schema, cond) match {
      case Some(e) => prune(spark, path, m, e, kept)
      case None => kept
    }
  }

  /** Bounded driver-side cache of deserialized per-file bloom filters,
    * keyed by index dir and validated by the dir's (name, length,
    * mtime) listing census — one metadata RPC per probe, refreshed
    * automatically when [[build]]/GC rewrite the dir. Total
    * deserialized bytes are capped; a dir whose on-disk index exceeds
    * the per-dir budget is never loaded (executor-side probing keeps
    * working), so driver memory stays bounded at any table scale. */
  private[io] object IdxCache {
    sealed trait Result
    case class Loaded(blooms: Map[String, BloomFilter]) extends Result
    case object TooBig extends Result
    case object Missing extends Result

    // per-dir and total budgets for SERIALIZED index bytes (the
    // deserialized footprint is the same order): file-count × KB
    private val MaxDirBytes = 32L << 20
    private val MaxTotalBytes = 128L << 20

    private case class Entry(stamp: Seq[(String, Long, Long)],
                             bytes: Long,
                             blooms: Map[String, BloomFilter])
    private val cache =
      new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)

    private[io] def invalidate(): Unit =
      cache.synchronized(cache.clear())

    def get(spark: SparkSession, dir: String): Result = {
      val d = new Path(dir)
      val f = fs(spark, d)
      if (!f.exists(d)) return Missing
      val parts = f.listStatus(d).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.sortBy(_.getPath.getName)
      if (parts.isEmpty) return Missing
      val stamp = parts.map(st =>
        (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq
      val bytes = parts.map(_.getLen).sum
      if (bytes > MaxDirBytes) return TooBig
      cache.synchronized {
        val hit = cache.get(dir)
        if (hit != null && hit.stamp == stamp) return Loaded(hit.blooms)
      }
      // load OUTSIDE the lock: parquet-hadoop record reads on the
      // driver (same shape as GraftDvCache), no Spark job
      val blooms = load(spark, parts.map(_.getPath))
      cache.synchronized {
        cache.put(dir, Entry(stamp, bytes, blooms))
        var total = 0L
        val it = cache.values().iterator()
        while (it.hasNext) total += it.next().bytes
        val evict = cache.entrySet().iterator()
        while (total > MaxTotalBytes && evict.hasNext) {
          val e = evict.next()
          if (e.getKey != dir) { total -= e.getValue.bytes; evict.remove() }
        }
      }
      Loaded(blooms)
    }

    private def load(spark: SparkSession,
                     files: Seq[Path]): Map[String, BloomFilter] = {
      import org.apache.parquet.hadoop.ParquetReader
      import org.apache.parquet.hadoop.example.GroupReadSupport
      val conf = spark.sessionState.newHadoopConf()
      val out = Map.newBuilder[String, BloomFilter]
      files.foreach { p =>
        val reader = ParquetReader.builder(new GroupReadSupport(), p)
          .withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            if (g.getFieldRepetitionCount("__f") > 0 &&
                g.getFieldRepetitionCount("__bloom") > 0)
              out += g.getString("__f", 0) -> BloomFilter.readFrom(
                new ByteArrayInputStream(
                  g.getBinary("__bloom", 0).getBytes))
            g = reader.read()
          }
        } finally reader.close()
      }
      out.result()
    }
  }

  /** Top-level AND conjuncts usable as bloom probes:
    * (physicalCol, probe values). An attribute reaches the index
    * directly or through an integral-WIDENING cast (value-preserving,
    * and the build normalizes integrals to long — the widened probe
    * hashes identically). Everything else contributes nothing. */
  private def conjunctProbes(m: Manifest, expr0: cexp.Expression)
      : Seq[(String, Seq[Any])] = {
    def attrOf(e: cexp.Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        m.schema.fieldNames.find(_.equalsIgnoreCase(a.nameParts.last))
      case a: cexp.Attribute =>
        m.schema.fieldNames.find(_.equalsIgnoreCase(a.name))
      case c: cexp.Cast =>
        // only integral→integral widening preserves the probe value
        if (integral(c.child.dataType) && integral(c.dataType) &&
            c.dataType.defaultSize >= c.child.dataType.defaultSize)
          attrOf(c.child)
        else None
      case _ => None
    }
    def eligible(n: String): Option[String] =
      if (supported(m.schema(n).dataType))
        Some(ManifestTable.physNameOf(m.colMap, n))
      else None
    def litOf(e: cexp.Expression): Option[Any] = e match {
      case l: cexp.Literal if l.value != null &&
        (integral(l.dataType) || l.dataType == StringType) => Some(l.value)
      case _ => None
    }
    def conjuncts(e: cexp.Expression): Seq[cexp.Expression] = e match {
      case cexp.And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def probeOf(a: cexp.Expression, vs: Seq[cexp.Expression])
        : Option[(String, Seq[Any])] =
      for {
        n <- attrOf(a)
        phys <- eligible(n)
        lits = vs.flatMap(litOf)
        if lits.length == vs.length && lits.nonEmpty
      } yield phys -> lits
    conjuncts(expr0).flatMap {
      case cexp.EqualTo(a, v) => probeOf(a, Seq(v))
        .orElse(probeOf(v, Seq(a)))
      case cexp.EqualNullSafe(a, v) => probeOf(a, Seq(v))
        .orElse(probeOf(v, Seq(a)))
      case cexp.In(a, vs) => probeOf(a, vs)
      case cexp.InSet(a, set) =>
        // analyzer-converted large IN lists: values are already
        // internal representations
        attrOf(a).flatMap(eligible).flatMap { phys =>
          if (set.exists(_ == null)) None
          else Some(phys -> set.toSeq)
        }
      case _ => None
    }
  }
}
