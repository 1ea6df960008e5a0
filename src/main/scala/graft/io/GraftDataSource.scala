package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter, RelationProvider, TableScan}
import org.apache.spark.sql.types._

import graft.io.ManifestTable.{DvRef, FileEntry, Manifest}

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * [[ManifestTable]] lakehouse as a REGISTERED SPARK TABLE FORMAT, the
  * Delta-connector shape: a manifest-driven [[FileIndex]] plugged into
  * Spark's own `HadoopFsRelation`, so the ENTIRE native parquet stack —
  * vectorized readers, whole-stage codegen, row-group filter pushdown,
  * column pruning — executes the scan, while manifest min/max stats
  * prune the FILE LIST inside Catalyst's planning (the same
  * [[ManifestTable.whereSetsExpr]] reasoning `readWhere` uses, now fed
  * by the planner's `dataFilters` with zero user opt-in: any
  * `df.filter(...)` over the loaded frame skips non-matching files
  * before a single task launches). Deletion vectors and column mapping
  * — the two features a raw parquet scan can't see — are applied by
  * [[GraftParquetFileFormat]] at the reader boundary, so every query
  * shape (SQL over a temp view, joins, streaming `foreachBatch` reads)
  * observes exactly the logical table [[ManifestTable.read]] serves.
  *
  * Read options: `versionAsOf` (retained version number),
  * `timestampAsOf` (epoch millis, [[ManifestTable.readAsOfTime]]
  * semantics), `readChangeFeed=true` with `startingVersion` /
  * `endingVersion` (the CDF relation, [[ManifestTable.changesBetween]]
  * columns: `_change_type` + the table schema), `history=true` /
  * `describe=true` (the commit log / live file inventory as relations —
  * DESCRIBE HISTORY parity, manifest-only).
  *
  * Write (`df.write.format("graft")`): `key` names the merge key
  * (required on create), `numFiles` the create fan-out, `statsCols` a
  * comma-separated secondary-stats list, `partCol` a partition spec
  * (DSv1 writers don't receive `.partitionBy()` — the option is the
  * Delta shape; comma-separated = multi-level coarse-to-fine, e.g.
  * "date,source", routing to [[ManifestTable.createPartitioned]]).
  * `Overwrite` (re)creates; `Append` upserts through
  * [[ManifestTable.merge]] on an existing table and creates otherwise
  * (`mergeSchema=true` evolves additively first); `ErrorIfExists`/
  * `Ignore` keep their SaveMode contracts.
  *
  * SQL writes: plain `INSERT INTO` / `INSERT OVERWRITE` land as
  * manifest commits through [[GraftSnapshotRelation]]'s
  * InsertableRelation route; `DELETE`/`UPDATE`/`MERGE INTO` (and
  * partitioned-table inserts, incl. static `PARTITION` specs) route
  * through [[GraftDmlRule]] when `graft.GraftExtensions` is
  * registered. No SQL write can ever land unmanifested files — the
  * raw file-commit path is sealed at
  * [[GraftParquetFileFormat.prepareWrite]].
  *
  * At 100 TB the division of labor is the point: the driver touches
  * ONLY the manifest (file-count-sized) and one listing RPC per commit
  * directory; executors read ONLY the pruned file set through Spark's
  * codegen'd parquet path; a dv-carrying file costs one extra
  * executor-side sidecar read scoped to that file's dead pairs. */
class GraftSourceProvider extends RelationProvider
    with org.apache.spark.sql.sources.SchemaRelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  /** `spark.readStream.format("graft").option("readChangeFeed", "true")`
    * — TAIL a table's change feed as a standard streaming source:
    * offsets are table VERSIONS (checkpoint-durable, exactly the
    * [[ManifestTable.changesBetween]] cursor), each micro-batch is the
    * labeled feed of one version window, and recovery resumes from the
    * committed version with no loss or duplication — the Delta
    * CDF-streaming shape, composable with every downstream sink and
    * stateful operator instead of the job-shaped
    * [[graft.jobs.StreamingChangeFeedJob]]. `startingVersion` is the
    * BASELINE snapshot (exclusive): the consumer is assumed to hold
    * version N and streams the changes AFTER it; default = the
    * table's current version at stream start (only new changes).
    * Lag bound = the table's retention window, loud when exceeded. */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val path = requireCdf(sqlContext, parameters)
    val m = ManifestTable.readManifest(sqlContext.sparkSession, path)
    (shortName(), StructType(
      StructField("_change_type", StringType, nullable = false) +:
        m.schema.fields))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val path = requireCdf(sqlContext, parameters)
    val spark = sqlContext.sparkSession
    val m = ManifestTable.readManifest(spark, path)
    require(opt(parameters, "startingVersion").isEmpty ||
      opt(parameters, "startingTimestamp").isEmpty,
      "graft: startingVersion and startingTimestamp are mutually exclusive")
    val startV = opt(parameters, "startingVersion").map(_.toLong)
      .orElse(opt(parameters, "startingTimestamp").map(ts =>
        // baseline = the snapshot current AT that time; changes AFTER
        // it stream (the readAsOfTime selection, same loud windows)
        ManifestTable.manifestAsOfTime(spark, path, ts.toLong).version))
      .getOrElse(m.version)
    new GraftChangeFeedSource(spark, path, startV,
      StructType(StructField("_change_type", StringType, nullable = false)
        +: m.schema.fields),
      opt(parameters, "maxVersionsPerTrigger").map(_.toLong))
  }

  private def requireCdf(sqlContext: SQLContext,
                         parameters: Map[String, String]): String = {
    require(opt(parameters, "readChangeFeed").exists(_.toBoolean),
      "graft streaming read serves the CHANGE FEED: pass " +
      "option(\"readChangeFeed\", \"true\") (a plain table tail is the " +
      "feed's insert/update_post rows — filter _change_type downstream)")
    opt(parameters, "path").getOrElse(throw new IllegalArgumentException(
      "graft: load(path) is required — the table root"))
  }

  /** `df.writeStream.format("graft")` — continuous CDC ingestion into a
    * manifest table, the [[graft.streaming.StreamingJobs
    * .streamingTableUpsert]] semantics behind the standard sink API:
    * each micro-batch lands as an upsert ([[ManifestTable.merge]]), a
    * deletion-vector commit (`dv=true` — sidecar + append, zero
    * rewrites), or a change-feed application (`cdf=true` — `_change_type`
    * labeled rows), bootstrapping the table from the first batch when
    * `key` is given. Replays converge: every path is content-idempotent,
    * the documented at-least-once + idempotent-key design (SURVEY
    * §7.4.1). */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft: option(\"path\", <tableRoot>) is required for the sink"))
    new GraftStreamSink(path,
      opt(parameters, "key"),
      opt(parameters, "numFiles").map(_.toInt).getOrElse(8),
      opt(parameters, "cdf").exists(_.toBoolean),
      opt(parameters, "dv").exists(_.toBoolean),
      // `partCol` shapes the BOOTSTRAP only (first batch creates a
      // partitioned table); later batches land through merge, which
      // preserves whatever layout the table has — same contract as the
      // batch writer's partCol option
      opt(parameters, "partCol"),
      opt(parameters, "mergeSchema").exists(_.toBoolean))
  }

  private def opt(parameters: Map[String, String], k: String): Option[String] =
    parameters.get(k).orElse(parameters.get(k.toLowerCase))

  /** Schema-first resolution — two callers share it: (1) `CREATE
    * TABLE t (cols...) USING graft` declares a schema over a path with
    * NO table yet — bootstrap an EMPTY manifest table with that schema
    * (the DDL-first workflow: declare, then `INSERT INTO`); (2) every
    * by-name resolution of a catalog table passes the catalog's
    * recorded schema — an EXISTING table serves its manifest schema
    * (the truth: programmatic `evolveSchema`/`widenColumn` move it
    * past the catalog's recording), as long as every declared column
    * still exists by name (a disagreement beyond that means the
    * catalog entry points at the wrong table — refuse loudly). */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String],
                              schema: StructType): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft: load(path) is required — the table root"))
    if (ManifestTable.latestVersion(spark, path).isEmpty) {
      val key = opt(parameters, "key").getOrElse(
        throw new IllegalArgumentException(
          "graft: option(\"key\", <mergeKeyColumn>) is required to " +
          "create a table from a declared schema"))
      val empty = spark.createDataFrame(
        new java.util.ArrayList[Row](), schema)
      val statsCols = opt(parameters, "statsCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      opt(parameters, "partCol") match {
        case Some(pc) => ManifestTable.createPartitioned(empty, path, key,
          pc.split(",").map(_.trim).filter(_.nonEmpty).toSeq, statsCols,
          None, 2, opt(parameters, "numFiles").map(_.toInt).getOrElse(0),
          Seq.empty)
        case None => ManifestTable.create(empty, path, key,
          opt(parameters, "numFiles").map(_.toInt).getOrElse(1), statsCols)
      }
    } else {
      val m = ManifestTable.readManifest(spark, path)
      val missing = schema.fields.filterNot(f =>
        m.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
      require(missing.isEmpty,
        s"graft: the declared schema names column(s) " +
        s"${missing.map(_.name).mkString(",")} the table at $path lacks " +
        "— is the catalog entry pointing at the right table?")
    }
    createRelation(sqlContext, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft: load(path) is required — the table root"))
    if (opt(parameters, "history").exists(_.toBoolean))
      // DESCRIBE HISTORY parity: the retained commit log as a relation
      // (manifest-only — no data file opens)
      return new GraftLocalRelation(sqlContext,
        () => ManifestTable.history(spark, path))
    if (opt(parameters, "describe").exists(_.toBoolean))
      // the live file inventory: per file its row count, key range and
      // tracked column ranges — ops visibility through plain SQL
      return new GraftLocalRelation(sqlContext,
        () => ManifestTable.describe(spark, path))
    if (opt(parameters, "readChangeFeed").exists(_.toBoolean)) {
      val from = opt(parameters, "startingVersion").getOrElse(
        throw new IllegalArgumentException(
          "graft: readChangeFeed requires startingVersion")).toLong
      val to = opt(parameters, "endingVersion")
        .map(_.toLong)
        .getOrElse(ManifestTable.readManifest(spark, path).version)
      return new GraftChangeFeedRelation(sqlContext, path, from, to)
    }
    val (m, current) = (opt(parameters, "versionAsOf"),
        opt(parameters, "timestampAsOf")) match {
      case (Some(v), None) =>
        (ManifestTable.readManifestAt(spark, path, v.toLong), false)
      case (None, Some(ts)) =>
        (ManifestTable.manifestAsOfTime(spark, path, ts.toLong), false)
      case (None, None) => (ManifestTable.readManifest(spark, path), true)
      case _ => throw new IllegalArgumentException(
        "graft: versionAsOf and timestampAsOf are mutually exclusive")
    }
    // pass the resolution's options through as the relation's options:
    // the catalog's cached-relation reuse compares them against the
    // table's storage options on every hit and rebuilds via copy() on
    // ANY mismatch — carrying them makes the steady-state hit
    // comparison equal, so cached relations (and their file listings)
    // actually get reused
    GraftSourceProvider.snapshotRelation(spark, path, m, current,
      options = parameters)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft: save(path) is required — the table root"))
    val exists = scala.util.Try(
      ManifestTable.readManifest(spark, path)).isSuccess
    def doCreate(): Unit = {
      val key = opt(parameters, "key").getOrElse(
        throw new IllegalArgumentException(
          "graft: option(\"key\", <mergeKeyColumn>) is required to create"))
      val numFiles = opt(parameters, "numFiles").map(_.toInt).getOrElse(8)
      val statsCols = opt(parameters, "statsCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      opt(parameters, "partCol") match {
        // DSv1 writers don't receive .partitionBy() columns — the
        // partition layout is an option, like Delta's partitionBy;
        // comma-separated = multi-level, coarse-to-fine ("date,source")
        case Some(pc) => ManifestTable.createPartitioned(
          data, path, key, pc.split(",").map(_.trim).filter(_.nonEmpty)
            .toSeq, statsCols, None, 2, numFiles, Seq.empty)
        case None => ManifestTable.create(data, path, key, numFiles, statsCols)
      }
    }
    mode match {
      case SaveMode.Overwrite => opt(parameters, "replaceWhere") match {
        // Delta's replaceWhere: Overwrite scoped to a predicate — ONE
        // atomic commit that deletes the matching rows and lands the
        // batch (ManifestTable.replaceWhere), instead of re-creating
        // the table. Every batch row must itself MATCH the predicate
        // (the Delta contract — otherwise "overwrite WHERE date='d1'"
        // could smuggle d2 rows past the reader's mental model); the
        // gate rides the write job via raise_error, zero extra passes.
        case Some(pred) =>
          import org.apache.spark.sql.functions.{col, concat, expr, lit,
            raise_error, struct, to_json, when}
          require(exists, s"graft: option(\"replaceWhere\", …) targets " +
            s"an existing table, but none exists at $path — create it " +
            "first (mode overwrite without the option)")
          val cond = expr(pred)
          val gated = data.filter(
            when(cond, lit(true))
              .otherwise(raise_error(
                concat(lit("graft replaceWhere: batch row does not " +
                  s"match the predicate ($pred): "),
                  to_json(struct(data.columns.map(col).toSeq: _*))))
                .cast("boolean")))
          ManifestTable.replaceWhere(spark, path, cond, gated)
          ()
        case None => doCreate()
      }
      case SaveMode.Append =>
        if (exists) {
          // option("mergeSchema","true") — ADDITIVE schema evolution on
          // append, the Delta shape: columns the batch carries beyond
          // the table schema are added first (a metadata-only
          // evolveSchema commit; old files null-extend, CDF serves the
          // widest schema), then the batch upserts. Non-additive diffs
          // (retype/rename) still refuse inside evolveSchema/merge —
          // evolution never silently rewrites existing columns. Without
          // the option, an extra column refuses loudly (merge's check).
          val batch =
            if (opt(parameters, "mergeSchema").exists(_.toBoolean)) {
              val m = ManifestTable.readManifest(spark, path)
              val (aligned, newCols) =
                GraftSourceProvider.alignMergeSchema(m.schema, data)
              if (newCols.nonEmpty)
                ManifestTable.evolveSchema(spark, path, StructType(newCols))
              aligned
            } else data
          ManifestTable.merge(spark, path, batch)
        } else doCreate()
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft table already exists at $path (mode=ErrorIfExists)")
        else doCreate()
      case SaveMode.Ignore => if (!exists) doCreate()
    }
    createRelation(sqlContext, parameters)
  }
}

object GraftSourceProvider {
  /** `mergeSchema`'s new-column split, CASE-INSENSITIVELY (the rest of
    * Spark resolution is case-insensitive by default, so the split must
    * match): a batch column differing from a table column only in case
    * (`Score` vs `score`) is the SAME column — renamed onto the table's
    * spelling, never evolved as a duplicate that would make every later
    * read throw AMBIGUOUS_REFERENCE. Returns the aligned batch and the
    * genuinely new fields. */
  private[io] def alignMergeSchema(tableSchema: StructType,
                                   batch: DataFrame)
      : (DataFrame, Seq[org.apache.spark.sql.types.StructField]) = {
    val byLower = tableSchema.fields.map(f => f.name.toLowerCase -> f.name)
      .toMap
    val renames = batch.schema.fields.flatMap { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(tn) if tn != f.name => Some(f.name -> tn)
        case _ => None
      }
    }
    val aligned = renames.foldLeft(batch) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to) }
    val newCols = batch.schema.fields
      .filterNot(f => byLower.contains(f.name.toLowerCase))
    (aligned, newCols.toSeq)
  }

  /** The batch relation over one pinned manifest snapshot: logical
    * schema outward, manifest-pruned file list inward, dv + column
    * mapping applied in the file format. `current` marks a head
    * snapshot (insertable); time-travel snapshots refuse inserts. */
  private[io] def snapshotRelation(spark: SparkSession, path: String,
                                   m: Manifest,
                                   current: Boolean = true,
                                   options: Map[String, String] = Map.empty)
      : BaseRelation = {
    val colMap = m.colMap
    val keyPhys = ManifestTable.physNameOf(colMap, m.keyCol)
    // dv scope per file, keyed by the file's URI path (scheme-stripped
    // absolute path — the form PartitionedFile reports on executors);
    // file NAMES alone could collide across borrowed (cloned) roots
    val dvByUri: Map[String, GraftDvScope] = m.entries.flatMap { e =>
      e.dv.map { d =>
        val abs = ManifestTable.absOf(path, e.relPath)
        new Path(abs).toUri.getPath ->
          GraftDvScope(ManifestTable.absOf(path, d.dvRel), e.relPath)
      }
    }.toMap
    val fileFormat = new GraftParquetFileFormat(
      m.keyCol, keyPhys, m.keyType, colMap, dvByUri)
    // a partitioned table exposes its partition column(s) as REAL
    // Spark partition columns (overlapping with dataSchema keeps their
    // original positions in the relation schema): Catalyst then does
    // static partition pruning AND dynamic partition pruning (DPP)
    // itself, on EACH level of a multi-column layout — the values come
    // from the manifest, per partition directory
    val partitionSchema = StructType(m.partCols.map(m.schema(_)))
    new GraftSnapshotRelation(spark, path, m,
      new GraftFileIndex(spark, path, m), partitionSchema,
      m.schema, fileFormat, options, current)
  }
}

/** The snapshot relation: a [[HadoopFsRelation]] (so the whole native
  * parquet read stack plans the scan) that is ALSO an
  * [[InsertableRelation]] — and that ordering is the SQL-write safety
  * contract. Spark's `DataSourceAnalysis` matches `InsertableRelation`
  * BEFORE its `HadoopFsRelation` file-commit fallback, so a plain
  * `INSERT INTO` / `INSERT OVERWRITE` on a graft table (catalog name or
  * path) lands as a MANIFEST COMMIT — [[ManifestTable.merge]] (keyed
  * upsert, the table's append primitive) or
  * [[ManifestTable.overwriteData]] (full replacement, history kept) —
  * never as raw `part-*.parquet` under the table root. The one insert
  * shape that would still reach the file-commit path (a static
  * `PARTITION (...)` clause) is sealed off by
  * [[GraftParquetFileFormat.prepareWrite]] throwing loudly: silent
  * unmanifested writes are impossible by construction. */
private[io] class GraftSnapshotRelation(
    spark: SparkSession, val tablePath: String, m: Manifest,
    index: FileIndex, partitionSchema0: StructType,
    dataSchema0: StructType,
    fileFormat0: org.apache.spark.sql.execution.datasources.FileFormat,
    options0: Map[String, String], val current: Boolean)
  extends HadoopFsRelation(index, partitionSchema0, dataSchema0, None,
    fileFormat0, options0)(spark)
  with org.apache.spark.sql.sources.InsertableRelation {

  /** The pinned snapshot — [[GraftDmlRule]] consults it (partition
    * column, merge key) when routing SQL DML to the manifest ops. */
  private[io] def manifest: Manifest = m

  /** `copy` PRESERVES THIS CLASS. Spark itself copies the relation in
    * places the subclass must survive — most critically
    * `FindDataSourceTable` on a relation-cache HIT whose per-statement
    * options differ (an INSERT arrives with
    * `__required_write_privileges__=INSERT` while the cached entry came
    * from a SELECT): it rebuilds via `r.copy(options = merged)`, and
    * the generated case-class copy would return a PLAIN
    * HadoopFsRelation — silently dropping [[InsertableRelation]], which
    * re-opens the raw file-commit insert path this class exists to
    * close. All six case fields pass through verbatim (the optimizer's
    * partition-pruning copy swaps the FileIndex, and that must stick);
    * only the graft identity (table path, snapshot, currency) rides
    * along. */
  override def copy(location: FileIndex, partitionSchema: StructType,
                    dataSchema: StructType,
                    bucketSpec: Option[org.apache.spark.sql.catalyst
                      .catalog.BucketSpec],
                    fileFormat: org.apache.spark.sql.execution
                      .datasources.FileFormat,
                    options: Map[String, String])(
                    sparkSession: SparkSession): HadoopFsRelation =
    new GraftSnapshotRelation(sparkSession, tablePath, m, location,
      partitionSchema, dataSchema, fileFormat, options, current)

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(current,
      s"graft: cannot insert into a TIME-TRAVEL snapshot of $tablePath " +
      "— load the table without versionAsOf/timestampAsOf")
    if (overwrite) ManifestTable.overwriteData(spark, tablePath, data)
    else { ManifestTable.merge(spark, tablePath, data); () }
    // the session catalog caches resolved relations by table name, and
    // this relation pins the PRE-insert snapshot — invalidate so the
    // next query over the catalog name re-resolves the new manifest.
    // TARGETED: only the names known to resolve to THIS path (recorded
    // by GraftDmlRule at resolution time) — a busy multi-table session
    // must not re-resolve its whole catalog per INSERT. Without the
    // extension the registry never populates, so the conservative
    // whole-cache fallback keeps extensionless sessions correct.
    GraftNameRegistry.namesFor(tablePath) match {
      case names if names.nonEmpty =>
        names.foreach(spark.sessionState.catalog.invalidateCachedTable)
      case _ => spark.sessionState.catalog.invalidateAllCachedTables()
    }
  }
}

/** Table-path → catalog identifiers observed to resolve to it, recorded
  * by [[GraftDmlRule]] during analysis (extension sessions only). Lets
  * post-commit invalidation drop exactly the target's relation-cache
  * entries instead of the whole session cache. Process-wide and
  * bounded: identifiers are tiny, but a pathological session churning
  * table paths must not grow the map without limit. */
private[io] object GraftNameRegistry {
  private val max = 4096
  private val byPath = new java.util.concurrent.ConcurrentHashMap[
    String, Set[org.apache.spark.sql.catalyst.TableIdentifier]]()

  def record(path: String,
             ident: org.apache.spark.sql.catalyst.TableIdentifier): Unit = {
    if (byPath.size > max) byPath.clear() // crude, safe: falls back to
                                          // whole-cache invalidation
    byPath.merge(path, Set(ident), _ ++ _)
    ()
  }

  def namesFor(path: String)
      : Set[org.apache.spark.sql.catalyst.TableIdentifier] =
    byPath.getOrDefault(path, Set.empty)
}

/** Manifest-driven [[FileIndex]]: the file listing Catalyst consults
  * when planning a scan over a graft table. `listFiles` receives the
  * query's resolved data filters and keeps only the entries whose
  * recorded min/max ranges POSSIBLY match ([[ManifestTable
  * .whereSetsExpr]]'s conservative half) — manifest-level file
  * skipping with no reader involvement, the Delta/Iceberg scan-plan
  * shape. The index is pinned to ONE manifest snapshot (refresh is a
  * no-op by design: a committed manifest is immutable; a new read
  * plans a new index), so a query never observes a torn table across
  * concurrent commits.
  *
  * Driver cost: one `listStatus` RPC per live commit directory at
  * construction (file sizes are needed for split planning and are not
  * in the manifest), then pure in-memory pruning per plan — no
  * recursive tree walk, no per-file RPCs. */
class GraftFileIndex(spark: SparkSession, tablePath: String, m: Manifest)
    extends FileIndex {

  // FileStatus per live entry, fetched with one listing per distinct
  // parent directory (commit dirs; partition subdirs; a clone's
  // borrowed source dirs). Borrowed absolute paths resolve through
  // their own filesystem. Loud on a manifest entry with no backing
  // file — that is corruption, not an empty result.
  private val statusOf: Map[String, FileStatus] = {
    val conf = spark.sessionState.newHadoopConf()
    val byParent = m.entries
      .map(e => e.relPath -> new Path(ManifestTable.absOf(tablePath, e.relPath)))
      .groupBy(_._2.getParent)
    byParent.flatMap { case (parent, es) =>
      val fs = parent.getFileSystem(conf)
      val listed = fs.listStatus(parent)
        .map(st => st.getPath.getName -> st).toMap
      es.map { case (rel, abs) =>
        rel -> listed.getOrElse(abs.getName,
          throw new IllegalStateException(
            s"graft manifest v${m.version} of $tablePath names missing " +
            s"file $abs"))
      }
    }
  }

  // planning may consult the listing more than once per query
  // (the partition-pruning rule, then the scan exec) — cache by the
  // filters' canonicalized form
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[PartitionDirectory]]()

  private val partFields: Seq[StructField] = m.partCols.map(m.schema(_))

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def partitionSchema: StructType = StructType(partFields)

  // partition directories: flat tables are one anonymous directory;
  // a partitioned table groups entries by the manifest-recorded
  // partition value TUPLE (string-encoded stats → each column's type,
  // exact for the integral/string types partition columns are
  // restricted to)
  private val groups: Seq[(InternalRow, Seq[FileEntry])] =
    if (partFields.isEmpty) Seq((InternalRow.empty, m.entries))
    else m.entries
      .groupBy(e => ManifestTable.partValuesOf(m, e, tablePath))
      .toSeq.sortBy(_._1.mkString("\u0000")).map { case (vs, es) =>
        val vals = vs.zip(partFields).map { case (sv, f) =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(sv),
              StringType), f.dataType).eval(null)
        }
        (new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(vals.toArray[Any]): InternalRow) -> es
      }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val key = (partitionFilters ++ Seq(null) ++ dataFilters)
      .map(e => if (e == null) "|" else e.canonicalized.toString)
      .mkString("&")
    cache.computeIfAbsent(key, _ => {
      import org.apache.spark.sql.catalyst.{expressions => cexp}
      // partition pruning: evaluate the planner's partition filters
      // (static AND the DPP runtime filter — FileSourceScanExec hands
      // the materialized values here) directly against each
      // directory's value row. Unevaluable shapes keep everything.
      val keptGroups =
        if (partitionFilters.isEmpty || partFields.isEmpty) groups
        else scala.util.Try {
          // bind each partition attribute BY NAME to its ordinal in the
          // value row (a multi-column layout receives filters on any
          // subset of the levels, static and DPP alike)
          val bound = partitionFilters.reduce(cexp.And).transform {
            case a: cexp.AttributeReference =>
              val i = partFields.indexWhere(
                _.name.equalsIgnoreCase(a.name))
              if (i < 0) throw new IllegalStateException(
                s"partition filter references non-partition column " +
                a.name)
              cexp.BoundReference(i, partFields(i).dataType,
                nullable = false)
          }
          val pred = cexp.Predicate.create(bound)
          pred.initialize(0)
          groups.filter { case (row, _) => pred.eval(row) }
        }.getOrElse(groups)
      // then manifest-stats + bloom pruning from the data filters,
      // computed ONCE over the surviving entries and re-grouped
      val kept: Seq[(InternalRow, Seq[FileEntry])] =
        if (dataFilters.isEmpty) keptGroups
        else {
          val expr0 = dataFilters.reduce(cexp.And)
          val allRels = keptGroups.flatMap(_._2.map(_.relPath)).toSet
          val keep = BloomSkip.prune(spark, tablePath, m, expr0,
            ManifestTable.whereSetsExpr(spark, m, expr0)._1
              .filter(e => allRels(e.relPath)))
            .map(_.relPath).toSet
          keptGroups.map { case (row, es) =>
            row -> es.filter(e => keep(e.relPath))
          }.filter(_._2.nonEmpty)
        }
      kept.map { case (row, es) =>
        PartitionDirectory(row, es.map(e => statusOf(e.relPath)).toArray)
      }
    })
  }

  override def inputFiles: Array[String] =
    m.entries.map(e => ManifestTable.absOf(tablePath, e.relPath)).toArray

  override def refresh(): Unit = () // snapshot-pinned; see class doc

  override def sizeInBytes: Long = statusOf.values.map(_.getLen).sum
}

/** One file's deletion-vector scope: the sidecar holding its dead
  * (file, key) pairs and the relPath that scopes them. */
case class GraftDvScope(dvAbs: String, relScope: String)

/** [[ParquetFileFormat]] with the two manifest-level semantics a raw
  * parquet reader can't see, applied at the reader boundary:
  *
  *  - COLUMN MAPPING: data files hold immutable PHYSICAL names; the
  *    relation's schema holds LOGICAL ones. Both schemas handed to the
  *    parquet stack are renamed logical→physical before delegating —
  *    rows are positional, so nothing else changes; identity-mapped
  *    tables delegate untouched.
  *  - DELETION VECTORS: a file with a dv ref yields only rows whose
  *    merge key is not in its dead set. The dead set is loaded ON THE
  *    EXECUTOR from the sidecar, scoped to exactly this file's pairs
  *    (dv sidecars are per-commit and bounded by consolidation), and
  *    cached per (sidecar, file) — the Delta DV-filter shape, with
  *    key pairs in place of row-index bitmaps. When the projection
  *    didn't request the key, it is appended for the filter and
  *    stripped by an UnsafeProjection before rows leave the reader.
  *
  * Vectorized BATCH return is disabled only when a dv must be applied
  * (row-wise filtering; the vectorized reader still decodes — rows
  * surface through the batch's row iterator). Dv-free snapshots keep
  * full columnar batches end-to-end. */
class GraftParquetFileFormat(
    keyLogical: String,
    keyPhys: String,
    keyType: DataType,
    colMap: Seq[(String, String)],
    dvByUri: Map[String, GraftDvScope]) extends ParquetFileFormat {

  override def toString: String = "GraftParquet"

  override def supportBatch(sparkSession: SparkSession,
                            schema: StructType): Boolean =
    dvByUri.isEmpty && super.supportBatch(sparkSession, schema)

  /** SEALED: any Spark plan that tries to commit files into the table
    * through the HadoopFsRelation write machinery (e.g. `INSERT INTO t
    * PARTITION (...)`, which bypasses the InsertableRelation route)
    * would land parquet the manifest never learns about — silently
    * invisible data. Refuse at the one choke point every such plan
    * must pass. The supported writes: plain `INSERT INTO` / `INSERT
    * OVERWRITE` (no PARTITION clause — partition values travel in the
    * rows), `df.write.format("graft")`, and the [[ManifestTable]] API. */
  override def prepareWrite(sparkSession: SparkSession,
                            job: org.apache.hadoop.mapreduce.Job,
                            options: Map[String, String],
                            dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "graft tables accept no direct file-commit writes — the manifest " +
      "would never see the files. Use plain INSERT INTO / INSERT " +
      "OVERWRITE (no PARTITION clause), df.write.format(\"graft\"), or " +
      "the graft.io.ManifestTable API (merge / overwriteData / " +
      "deleteWhere / updateWhere / mergeInto)")

  private def toPhys(name: String): String =
    ManifestTable.physNameOf(colMap, name)

  private def renameSchema(s: StructType): StructType =
    if (colMap.isEmpty) s
    else StructType(s.fields.map(f => f.copy(name = toPhys(f.name))))

  // sources.Filter rename, logical→physical. Unknown shapes DROP
  // (None): pushed parquet filters are row-group hints — Spark keeps
  // the Filter node above the scan, so dropping one costs I/O, never
  // correctness. A misnamed filter, by contrast, would wrongly skip
  // row groups.
  private def renameFilter(f: Filter): Option[Filter] = f match {
    case sources.EqualTo(a, v) => Some(sources.EqualTo(toPhys(a), v))
    case sources.EqualNullSafe(a, v) => Some(sources.EqualNullSafe(toPhys(a), v))
    case sources.GreaterThan(a, v) => Some(sources.GreaterThan(toPhys(a), v))
    case sources.GreaterThanOrEqual(a, v) =>
      Some(sources.GreaterThanOrEqual(toPhys(a), v))
    case sources.LessThan(a, v) => Some(sources.LessThan(toPhys(a), v))
    case sources.LessThanOrEqual(a, v) =>
      Some(sources.LessThanOrEqual(toPhys(a), v))
    case sources.In(a, vs) => Some(sources.In(toPhys(a), vs))
    case sources.IsNull(a) => Some(sources.IsNull(toPhys(a)))
    case sources.IsNotNull(a) => Some(sources.IsNotNull(toPhys(a)))
    case sources.StringStartsWith(a, v) =>
      Some(sources.StringStartsWith(toPhys(a), v))
    case sources.StringEndsWith(a, v) =>
      Some(sources.StringEndsWith(toPhys(a), v))
    case sources.StringContains(a, v) =>
      Some(sources.StringContains(toPhys(a), v))
    case sources.And(l, r) =>
      for (a <- renameFilter(l); b <- renameFilter(r)) yield sources.And(a, b)
    case sources.Or(l, r) =>
      for (a <- renameFilter(l); b <- renameFilter(r)) yield sources.Or(a, b)
    case sources.Not(c) => renameFilter(c).map(sources.Not)
    case _ => None
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val needKey = dvByUri.nonEmpty &&
      !requiredSchema.fieldNames.contains(keyLogical)
    val reqPlusKey =
      if (needKey) requiredSchema.add(StructField(keyLogical, keyType))
      else requiredSchema
    val physFilters =
      if (colMap.isEmpty) filters else filters.flatMap(renameFilter)
    val base = super.buildReaderWithPartitionValues(
      sparkSession, renameSchema(dataSchema), partitionSchema,
      renameSchema(reqPlusKey), physFilters, options, hadoopConf)
    if (dvByUri.isEmpty) return base

    val dvMap = dvByUri
    val confSer = new GraftSerializableConf(hadoopConf)
    val kType = keyType
    val kIdx = reqPlusKey.fieldNames.indexOf(keyLogical)
    val reqLen = requiredSchema.length
    // full reader output = required(+key) fields then partition values
    val fullTypes = (reqPlusKey.fields.map(_.dataType) ++
      partitionSchema.fields.map(_.dataType)).toSeq

    (file: PartitionedFile) => {
      val it = base(file)
      val uriPath = file.toPath.toUri.getPath
      val filtered = dvMap.get(uriPath) match {
        case None => it
        case Some(scope) =>
          val dead = GraftDvCache.deadSet(confSer.value, scope, kType)
          if (dead.isEmpty) it
          else it.filter { row =>
            row.isNullAt(kIdx) || !dead.contains(
              GraftDvCache.keyOf(row, kIdx, kType))
          }
      }
      if (!needKey) filtered
      else {
        // strip the appended key column (always last among required)
        val keep = ((0 until reqLen) ++
          (reqLen + 1 until fullTypes.length))
        val proj = UnsafeProjection.create(
          keep.map(i => BoundReference(i, fullTypes(i), nullable = true)))
        filtered.map(proj)
      }
    }
  }
}

/** Executor-side dead-set loader: reads one dv sidecar through
  * parquet-hadoop's record API, scoped to one data file's pairs, and
  * caches the resulting key set per (sidecar, file) — task retries and
  * multiple splits of one file share the load. Keys normalize to Long
  * (all integral widths) or String, mirroring the sidecar writer's
  * cast-to-keyType contract. */
private[io] object GraftDvCache {
  private val MaxEntries = 64
  private val cache =
    new java.util.LinkedHashMap[(String, String), java.util.HashSet[Any]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), java.util.HashSet[Any]])
          : Boolean = size() > MaxEntries
    }

  def keyOf(row: InternalRow, i: Int, dt: DataType): Any = dt match {
    case LongType => row.getLong(i)
    case IntegerType => row.getInt(i).toLong
    case ShortType => row.getShort(i).toLong
    case ByteType => row.getByte(i).toLong
    case StringType => row.getUTF8String(i).toString
    case other => throw new IllegalStateException(
      s"graft: unsupported merge-key type ${other.simpleString}")
  }

  def deadSet(conf: Configuration, scope: GraftDvScope,
              keyType: DataType): java.util.HashSet[Any] = {
    val k = (scope.dvAbs, scope.relScope)
    cache.synchronized {
      val hit = cache.get(k)
      if (hit != null) return hit
    }
    val set = load(conf, scope, keyType)
    cache.synchronized { cache.put(k, set) }
    set
  }

  private def load(conf: Configuration, scope: GraftDvScope,
                   keyType: DataType): java.util.HashSet[Any] = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val set = new java.util.HashSet[Any]()
    val reader: ParquetReader[org.apache.parquet.example.data.Group] =
      ParquetReader.builder(new GroupReadSupport(),
        new Path(scope.dvAbs)).withConf(conf).build()
    try {
      var g = reader.read()
      while (g != null) {
        // a sidecar may carry pairs for OTHER files (per-commit
        // sidecars are shared); scope to this file's pairs only
        if (g.getFieldRepetitionCount("__f") > 0 &&
            g.getString("__f", 0) == scope.relScope &&
            g.getFieldRepetitionCount("__k") > 0) {
          // read __k by the SIDECAR FILE's physical type, not the
          // table's current key type: sidecars are written cast to the
          // key type AT COMMIT TIME, and widenColumn can widen the key
          // afterwards — a pre-widening sidecar physically stores
          // int32 under a now-long key. Normalize to the keyOf domain
          // (Long for all integral widths, String), mirroring the
          // programmatic read's defensive cast (deadPairsScoped).
          import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
          val prim = g.getType.getType("__k").asPrimitiveType()
            .getPrimitiveTypeName
          val v: Any = (keyType, prim) match {
            case (StringType, _) => g.getString("__k", 0)
            case (_, INT64) => g.getLong("__k", 0)
            case (_, INT32) => g.getInteger("__k", 0).toLong
            case (t, p) => throw new IllegalStateException(
              s"graft: dv sidecar ${scope.dvAbs} stores __k as $p but " +
              s"the merge key is ${t.simpleString}")
          }
          set.add(v)
        }
        g = reader.read()
      }
    } finally reader.close()
    set
  }
}

/** Hadoop Configuration with Java serialization — the standard wrapper
  * shape (Configuration is a Hadoop Writable, not java-serializable),
  * so the reader closure can carry the driver's filesystem settings to
  * executors for the sidecar reads. */
private[io] class GraftSerializableConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** The sink behind `writeStream.format("graft")`. The micro-batch
  * frame arrives as an incremental-execution plan that must not be
  * re-planned with new operators — the standard DSv1 sink shape is to
  * surface it once through its RDD and rebuild a batch frame (what
  * `foreachBatch` does internally), then hand it to the table's own
  * commit paths. Crash replay of the last uncommitted epoch re-lands
  * the same content; merge/dv/CDF application are all idempotent in
  * content, so the table converges (the at-least-once + idempotent-key
  * contract, executed for the mock-broker pipelines in
  * `StreamingUpsertJob`'s kill/recovery specs). */
private[io] class GraftStreamSink(path: String, key: Option[String],
                                  numFiles: Int, cdf: Boolean, dv: Boolean,
                                  partCol: Option[String] = None,
                                  mergeSchema: Boolean = false)
    extends org.apache.spark.sql.execution.streaming.Sink {
  import org.apache.spark.sql.functions.col

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // NOT data.rdd: that would re-analyze a plan that still carries the
    // streaming scan relation, which the batch checker rejects. toRdd
    // reuses the ALREADY-PLANNED incremental physical plan; its
    // InternalRows convert back to external rows for a plain batch frame
    val schema = data.schema
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(schema)
    val rows = data.queryExecution.toRdd
      .map(ir => conv(ir).asInstanceOf[org.apache.spark.sql.Row])
    val batch = spark.createDataFrame(rows, schema)
    // the commit paths run several actions over the batch (probe +
    // write); pin it so the micro-batch source is read once
    batch.persist()
    try {
      if (batch.isEmpty) return
      if (ManifestTable.latestVersion(spark, path).isEmpty) {
        val k = key.getOrElse(throw new IllegalArgumentException(
          "graft sink: option(\"key\", <mergeKeyColumn>) is required to " +
          s"bootstrap a table at $path"))
        val rows =
          if (cdf) batch.filter(col("_change_type")
            .isin("insert", "update_post")).drop("_change_type")
          else batch
        partCol match {
          case Some(pc) => ManifestTable.createPartitioned(
            rows, path, k, pc.split(",").map(_.trim).filter(_.nonEmpty)
              .toSeq, Seq.empty, None, 2, numFiles, Seq.empty)
          case None => ManifestTable.create(rows, path, k, numFiles)
        }
      } else {
        // option("mergeSchema","true") — additive evolution per batch,
        // the batch writer's Append contract: columns the batch carries
        // beyond the table schema are added first (metadata-only
        // commit; old files null-extend), then the batch applies.
        // Without it, an extra column refuses loudly downstream.
        val applied =
          if (mergeSchema) {
            val m = ManifestTable.readManifest(spark, path)
            // case-insensitive split + case-variant rename (see
            // alignMergeSchema); the CDF label column is the feed's,
            // never a table column
            val (aligned0, newCols0) = GraftSourceProvider
              .alignMergeSchema(m.schema, batch)
            val newCols = newCols0.filterNot(f =>
              cdf && f.name == "_change_type")
            if (newCols.nonEmpty)
              ManifestTable.evolveSchema(spark, path, StructType(newCols))
            aligned0
          } else batch
        if (cdf) ManifestTable.applyChanges(spark, path, applied, dv = dv)
        else if (dv) { ManifestTable.upsertDV(spark, path, applied); () }
        else { ManifestTable.merge(spark, path, applied); () }
      }
    } finally batch.unpersist()
  }

  override def toString: String = s"GraftSink[$path]"
}

/** The streaming CDF source: one table version = one offset. Each
  * micro-batch materializes `changesBetween(fromV, toV)` — computed by
  * the table's own distributed feed plan (dv-delta fast paths, scoped
  * sidecar reads) — and surfaces it through the bridge as a
  * streaming-tagged frame (a DSv1 `getBatch` contract). The schema is
  * pinned at stream start: a mid-stream rename/widen/drop on the
  * source table fails LOUDLY instead of silently mislabeling columns —
  * restart the stream to adopt the new schema (the Delta behavior).
  * A consumer lagging past the table's retention window fails loudly
  * in `readManifestAt` — widen `keepVersions` for slow consumers.
  *
  * RETENTION HEADROOM (operational requirement): the micro-batch
  * engine may REPLAY the last offset-logged batch after a restart (its
  * commit-log write races `stop()`), so the replay baseline can sit
  * TWO commits behind the table head the moment the next commit lands.
  * The table's `keepVersions` must therefore be at least the
  * consumer's worst-case lag + 2 — a streamed table on the default
  * `keepVersions = 2` retires the replay baseline after a single
  * source commit during downtime and the restart fails loudly. */
private[io] class GraftChangeFeedSource(
    spark: SparkSession, path: String, startV: Long,
    declared: StructType, maxVersionsPerTrigger: Option[Long] = None)
    extends org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.{Offset => SOffset}
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  require(maxVersionsPerTrigger.forall(_ >= 1L),
    s"graft: maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")

  override def schema: StructType = declared

  private def versionOf(o: SOffset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  // the highest version already OFFERED through getOffset — the rate
  // limit advances from here, not from the committed offset, so each
  // trigger takes the NEXT window during a long catch-up
  @volatile private var lastOffered: Long = startV

  override def getOffset: Option[SOffset] = {
    val cur = ManifestTable.latestVersion(spark, path).getOrElse(startV)
    // a lagging consumer catching up takes bounded windows: one giant
    // all-missed-versions batch would hold the whole backlog's diff in
    // a single micro-batch (memory/latency cliff at 100 TB churn)
    val capped = maxVersionsPerTrigger
      .map(mx => math.min(cur, math.max(lastOffered, startV) + mx))
      .getOrElse(cur)
    if (capped <= startV || capped <= lastOffered) None
    else { lastOffered = capped; Some(LongOffset(capped)) }
  }

  override def getBatch(start: Option[SOffset], end: SOffset)
      : org.apache.spark.sql.Dataset[org.apache.spark.sql.Row] = {
    val fromV = start.map(versionOf).getOrElse(startV)
    val toV = versionOf(end)
    // restart seeding for the rate limit: the engine replays the
    // restored offsets through getBatch before polling getOffset, so
    // the cap can never offer an offset BELOW the checkpointed one
    lastOffered = math.max(lastOffered, math.max(fromV, toV))
    val df =
      if (toV <= fromV)
        // replay edge (recovered offset already at the baseline):
        // an empty window is an empty feed, same schema
        ManifestTable.changesBetween(spark, path, toV, toV)
      else ManifestTable.changesBetween(spark, path, fromV, toV)
    require(df.schema.fields.map(f => (f.name, f.dataType)).sameElements(
        declared.fields.map(f => (f.name, f.dataType))),
      s"graft change-feed stream on $path: the table schema changed " +
      s"mid-stream (declared ${declared.simpleString}, feed is now " +
      s"${df.schema.simpleString}) — restart the stream to adopt it")
    org.apache.spark.sql.graftbridge.Bridge.internalDf(
      spark, df.queryExecution.toRdd, declared, isStreaming = true)
  }

  override def commit(end: SOffset): Unit = {
    lastOffered = math.max(lastOffered, versionOf(end))
  }
  override def stop(): Unit = ()
  override def toString: String = s"GraftChangeFeed[$path from v$startV]"
}

/** A small metadata relation (history, describe): the frame is
  * manifest-derived and file-count-sized, so a TableScan is the right
  * cost class — same shape as the CDF relation. */
class GraftLocalRelation(ctx: SQLContext, mk: () => DataFrame)
    extends BaseRelation with TableScan {
  private lazy val df: DataFrame = mk()
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}

/** The change-feed relation behind `option("readChangeFeed", "true")`:
  * [[ManifestTable.changesBetween]] as a scannable relation. Version
  * windows are retention-bounded (file-count-sized manifests, row
  * volume ∝ the window's actual churn), so a plan-level TableScan over
  * the computed feed is the right cost class — the heavy lifting
  * (dv-delta fast paths, scoped sidecar reads) happens inside
  * changesBetween's own distributed plan. */
class GraftChangeFeedRelation(ctx: SQLContext, path: String,
                              fromV: Long, toV: Long)
    extends BaseRelation with TableScan {
  private lazy val df: DataFrame =
    ManifestTable.changesBetween(ctx.sparkSession, path, fromV, toV)
  override def sqlContext: SQLContext = ctx
  override def schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
  override def needConversion: Boolean = true
}
