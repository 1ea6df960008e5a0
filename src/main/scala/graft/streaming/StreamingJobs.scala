package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.model.{DailyPrice, SensorReading}
import graft.ops.{Csv, Transforms}

/**
 * Streaming pipelines (SURVEY.md §2.7). Every transform here is a pure
 * DataFrame→DataFrame function, so the identical logical pipeline runs
 * bounded (spark.read) and unbounded (spark.readStream) — the Spark
 * mirror of the reference running one DataStream program in STREAMING or
 * BATCH runtime mode (T5).
 */
object StreamingJobs {

  /**
   * A1 (reference flinkStarter.scala:22-24): word count over a line
   * stream. The reference uses a 5 s processing-time tumbling window;
   * Spark has no processing-time window column, so the parity shape is
   * update-mode running counts emitted on a 5 s processing-time trigger —
   * per-trigger deltas ≈ per-window counts (§7.4 item 2; golden tests
   * assert per-key totals, which agree under both semantics).
   */
  def wordCount(lines: DataFrame): DataFrame = Transforms.wordCount(lines)

  /** A1 exact-window alternative: stamp ingest time as event time and use
    * a real 5 s tumbling window (alignment then matches wall clock). */
  def windowedWordCount(lines: DataFrame, window: String = "5 seconds"): DataFrame =
    Transforms.tokenize(lines)
      .withColumn("ingest_ts", current_timestamp())
      .groupBy(org.apache.spark.sql.functions.window(col("ingest_ts"), window), col("word"))
      .agg(count(lit(1)).as("cnt"))

  /**
   * A3 (reference flinkTableManipulation.scala:115): streaming grouped
   * min/max by (symbol, year) over CSV price lines — the changelog query.
   * Run with outputMode update (per-trigger revisions, like
   * toChangelogStream) or complete (console demos).
   */
  def minMaxBySymbolYear(csvLines: DataFrame): DataFrame =
    Csv.parse(csvLines, Csv.dailyPriceSchema)
      .groupBy(col("symbol"), year(to_date(col("trdate"), "yyyy-MM-dd")).as("yearr"))
      .agg(min("high").as("MIN_HIGH"), max("high").as("MAX_HIGH"))

  /**
   * Event-time tumbling window with watermark (extension over the
   * reference, which never uses event time — T2/T3): late data beyond
   * `lateness` is dropped and state is GC'd, which is what makes
   * unbounded streams safe at 100 TB/day scale.
   */
  def hourlyEventCounts(events: DataFrame, tsCol: String = "ts",
                        lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total_value"))

  /**
   * T7 stateful processing beyond windowed aggs: per-sensor running state
   * via mapGroupsWithState — the Spark shape for the reference's
   * accumulate-on-update JDBC semantics (sensor_temp += delta,
   * iteration += 1) kept inside the engine instead of the database.
   * Processing-time timeout bounds state lifetime.
   */
  final case class SensorState(sensorId: String, lastTs: Long,
                               tempSum: Double, iterations: Long)

  def sensorRunningState(readings: Dataset[SensorReading],
                         timeout: Option[String] = None): Dataset[SensorState] = {
    import readings.sparkSession.implicits._
    // Processing-time timeout bounds per-key state lifetime at scale; it
    // is opt-in because timeout checks make the engine schedule batches
    // continuously (so test harnesses using processAllAvailable never
    // quiesce). Production: pass Some("1 hour") (or move to an event-time
    // watermark timeout when readings carry event time).
    val mode = if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
               else GroupStateTimeout.NoTimeout
    readings
      .groupByKey(_.sensorId)
      .mapGroupsWithState[SensorState, SensorState](mode) {
        case (id, rows, state: GroupState[SensorState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s
          } else {
            val prev = state.getOption.getOrElse(SensorState(id, 0L, 0.0, 0L))
            val next = rows.foldLeft(prev) { (acc, r) =>
              SensorState(id, math.max(acc.lastTs, r.sensorTStamp),
                acc.tempSum + r.sensorTemp, acc.iterations + 1)
            }
            state.update(next)
            timeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /**
   * T7 on the modern API: the same per-sensor running state as
   * [[sensorRunningState]] but via `transformWithState` (Spark 4's
   * StatefulProcessor), which adds what mapGroupsWithState can't do:
   * multiple named state variables per key, per-state TTL, and timers —
   * the engine-native replacement for hand-rolled state bookkeeping.
   * Requires the RocksDB state store provider (set
   * `spark.sql.streaming.stateStore.providerClass` to
   * `...RocksDBStateStoreProvider`), which is also the provider you want
   * at 100 TB: state spills off-heap instead of living on the JVM heap.
   */
  class SensorStateProcessor(ttl: Option[java.time.Duration] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, SensorReading, SensorState] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}

    @transient private var state: ValueState[SensorState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      implicit val enc: Encoder[SensorState] = Encoders.product[SensorState]
      val ttlConf = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      state = getHandle.getValueState[SensorState]("sensor", enc, ttlConf)
    }

    override def handleInputRows(key: String, rows: Iterator[SensorReading],
                                 timerValues: TimerValues): Iterator[SensorState] = {
      val prev = Option(state.get()).getOrElse(SensorState(key, 0L, 0.0, 0L))
      val next = rows.foldLeft(prev) { (acc, r) =>
        SensorState(key, math.max(acc.lastTs, r.sensorTStamp),
          acc.tempSum + r.sensorTemp, acc.iterations + 1)
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  def sensorRunningStateTws(readings: Dataset[SensorReading],
                            ttl: Option[java.time.Duration] = None): Dataset[SensorState] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.sensorId)
      .transformWithState(new SensorStateProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /**
   * Streaming exact dedup: drop records whose content digest was already
   * seen. `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is
   * what bounds the seen-digest state: a state row is evicted once the
   * watermark passes its event time. Plain `dropDuplicates` keyed on a
   * non-event-time column keeps every key forever — the watermark alone
   * only drops late *input*, it never evicts dedup *state*. Dedup key is
   * the digest of `contentCols`, so state rows stay ~40 bytes regardless
   * of record size.
   */
  def streamingExactDedup(df: DataFrame, tsCol: String,
                          contentCols: Seq[String],
                          lateness: String = "1 hour"): DataFrame =
    df.withColumn("__digest",
      sha2(concat_ws("\u0000", contentCols.map(col): _*).cast("binary"), 256))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming near-dup-lite: dedup on the token fingerprint (word-order
    * sensitive, whitespace/punctuation insensitive) instead of raw bytes.
    * Same bounded-state eviction semantics as [[streamingExactDedup]]. */
  def streamingFingerprintDedup(df: DataFrame, tsCol: String,
                                textCol: String = "text",
                                lateness: String = "1 hour"): DataFrame =
    df.withColumn("__fp", graft.functions.GraftFunctions.fingerprint64(
        graft.functions.GraftFunctions.tokens_lc(col(textCol))))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /**
   * Stream-static dimension enrichment: join an unbounded stream against
   * a bounded dimension table. Spark re-plans the static side per
   * micro-batch (so dimension updates between batches are picked up) and
   * broadcasts it when small — no stream-side state at all, unlike a
   * stream-stream join. The completing piece of the join matrix next to
   * [[clickAttribution]]'s stream-stream join.
   */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /**
   * Streaming curation (T5/T9 twin of the batch `ext_pipeline_curate`
   * query): quality-score filter → watermark-bounded fingerprint
   * near-dedup → windowed per-language counts. Every stage is the same
   * pure column logic the batch path uses — the quality score and the
   * fingerprint kernel are identical expressions — so a corpus curated
   * incrementally converges to the batch answer, and dedup state is
   * evicted by the watermark (bounded on an unbounded stream).
   */
  def streamingCurate(docs: DataFrame, tsCol: String = "ts",
                      minQuality: Double = 0.75,
                      window: String = "1 hour",
                      lateness: String = "10 minutes"): DataFrame = {
    import graft.ext.TextAnalysis
    val good = docs
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .filter(TextAnalysis.qualityScoreOf(col("text"), col("__toks")) >= minQuality)
      .drop("__toks")
    // the watermark set inside the dedup stage carries downstream —
    // redefining it between chained stateful operators is disallowed
    streamingFingerprintDedup(good, tsCol, "text", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))
  }

  /**
   * Streaming sessionization: session windows (gap-based) per key under a
   * watermark — sessions close and emit once the watermark passes their
   * end (batch twin: the e5_sessionize query).
   */
  def sessionize(events: DataFrame, keyCol: String = "user_id",
                 tsCol: String = "ts", gap: String = "30 minutes",
                 lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n_events"))

  /**
   * Stream-stream inner join with watermarks and a time-range condition
   * (click attribution shape): each click joins impressions of the same
   * id seen up to `window` before it. The watermarks plus the range bound
   * both join-state buffers — without them stream-stream join state grows
   * forever.
   */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       window: String = "1 hour",
                       lateness: String = "10 minutes"): DataFrame =
    impressions.withWatermark("imp_ts", lateness)
      .join(clicks.withWatermark("click_ts", lateness),
        expr(s"imp_id = click_imp_id AND " +
          s"click_ts >= imp_ts AND click_ts <= imp_ts + interval $window"))

  /** Start helper: memory sink for tests, console for demos. */
  def startMemory(df: DataFrame, queryName: String, mode: OutputMode,
                  trigger: Trigger = Trigger.ProcessingTime(0L)) =
    df.writeStream.format("memory").queryName(queryName)
      .outputMode(mode).trigger(trigger).start()

  /**
   * Continuous incremental near-dedup against a persisted dedup index —
   * the streaming form of the weekly-crawl mode. Each micro-batch reuses
   * the BATCH operators through `foreachBatch` (the idiomatic bridge for
   * logic Structured Streaming's stateful operators can't express):
   *
   *  1. probe the batch against the stored MinHash band lists
   *     ([[graft.ext.Dedup.minhashLshPairsAgainstIndex]] — bands only the
   *     batch, never re-shingles the corpus);
   *  2. hand the flagged duplicate pairs to `onDupPairs` (write to a
   *     table, a metrics sink, …);
   *  3. drop the batch's duplicates — a doc drops if it pairs with an
   *     indexed doc (the index member was there first) or with a
   *     smaller-id doc of the SAME batch (keep-first tie-break) — and
   *     append the survivors to the index, so later batches dedup against
   *     earlier ones as well as the base corpus.
   *
   * State lives in the INDEX (bounded, queryable parquet), not in Spark's
   * state store — restarts resume from the checkpoint with the corpus
   * seen so far already persisted.
   *
   * Exactly-once: the append goes through
   * [[graft.ext.Dedup.appendToDedupIndexEpoch]] (stage → promote →
   * epoch marker, the filesystem analogue of
   * [[graft.io.Sinks.JdbcEpochIdempotent]]). A batch replayed after a
   * crash is detected by its marker: a fully-committed epoch is skipped
   * WHOLESALE — probing the index again after its own survivors were
   * appended would violate the probe's disjoint-ids contract and flag the
   * batch as a duplicate of itself — and a partially-committed epoch
   * converges (its partial promote is cleaned and redone). `onDupPairs`
   * is therefore exactly-once per committed epoch, at-least-once across
   * crashes that precede the commit — compose it with an idempotent sink
   * (keyed upsert / epoch marker) for end-to-end exactly-once, same as
   * every `foreachBatch` side effect.
   *
   * `autoCompactMaxFiles` > 0 turns on LSM maintenance: after an epoch
   * commits, compact the index when either component exceeds that many
   * files ([[graft.ext.Dedup.maybeCompactDedupIndex]]) — the compaction
   * runs inside the micro-batch, which owns the index (no concurrent
   * reader, the compactSorted contract).
   *
   * Contract: incoming ids are globally unique and disjoint from the
   * index (same as the probe).
   */
  def streamingIncrementalDedup(docs: DataFrame, indexPath: String,
                                threshold: Double = 0.8,
                                textCol: String = "text",
                                idCol: String = "doc_id",
                                onDupPairs: (DataFrame, Long) => Unit,
                                queryId: String = "sdedup",
                                autoCompactMaxFiles: Int = 0) =
    docs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      import graft.ext.Dedup
      val spark = batch.sparkSession
      if (!Dedup.epochCommitted(spark, indexPath, queryId, epoch)) {
        // BEFORE the probe: a crash between this epoch's promote and its
        // marker leaves partial files carrying the replayed batch's own
        // ids — probing across them would flag the batch as a duplicate
        // of itself and permanently drop it. No-op when nothing to clean.
        Dedup.cleanPartialEpoch(spark, indexPath, epoch, queryId)
        graft.ops.Caching.scoped {
          val pairs = Dedup
            .minhashLshPairsAgainstIndex(batch, indexPath, textCol, idCol,
              threshold)
            .transform(df => graft.ops.Caching.register(df)) // emit + drop set
          onDupPairs(pairs, epoch)
          val drops = Dedup.incrementalDropIds(pairs,
            batch.select(col(idCol)), idCol)
          val survivors = batch.join(drops, Seq(idCol), "left_anti")
          Dedup.appendToDedupIndexEpoch(survivors, indexPath, epoch, queryId,
            textCol, idCol)
        }
        if (autoCompactMaxFiles > 0) {
          Dedup.maybeCompactDedupIndex(spark, indexPath, autoCompactMaxFiles)
          ()
        }
      }
    }

  /**
   * Continuous embedding-store ingest — the ANN twin of
   * [[streamingIncrementalDedup]]: each micro-batch of (id, embedding)
   * rows probes the persisted IVF index for its nearest indexed
   * neighbor, vectors whose top-1 cosine reaches `threshold` are
   * recorded as near-dup hits (and NOT indexed — the index stays
   * deduplicated as it grows), and the novel vectors are appended
   * EXACTLY-ONCE ([[graft.ext.Similarity.appendToIvfIndexEpoch]] —
   * epoch marker commit; a crash-replayed batch is skipped wholesale,
   * and the pre-probe [[graft.ext.Similarity.cleanPartialAnnEpoch]]
   * keeps a half-promoted replay from matching its own vectors). The
   * hits record is idempotent when `onDupHits` overwrites a per-epoch
   * location. Near-dups WITHIN one micro-batch both index (batch-local
   * pairing belongs to the batch pipeline, [[graft.ext.Similarity]]
   * SemDeDup — at crawl cadence the cross-batch probe is the recall
   * that matters). The index must exist
   * ([[graft.ext.Similarity.buildIvfIndex]] bootstraps);
   * `autoCompactMaxFiles > 0` lets the stream run its own LSM
   * maintenance (compaction excludes uncommitted epochs, so it is safe
   * next to this stream's own crash-replay window).
   */
  def streamingEmbedIndexAppend(vecs: DataFrame, indexPath: String,
                                threshold: Double = 0.95,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding",
                                onDupHits: (DataFrame, Long) => Unit,
                                queryId: String = "embcrawl",
                                nprobe: Int = 4,
                                autoCompactMaxFiles: Int = 0) =
    vecs.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      import graft.ext.Similarity
      val spark = batch.sparkSession
      if (!Similarity.annEpochCommitted(spark, indexPath, queryId, epoch)) {
        // BEFORE the probe — a crash between promote and marker leaves
        // partial files carrying the replayed batch's own vectors
        Similarity.cleanPartialAnnEpoch(spark, indexPath, epoch, queryId)
        graft.ops.Caching.scoped {
          val hits = Similarity.ivfTopKFromIndex(spark, indexPath,
              batch, k = 1, nprobe, idCol, vecCol)
            .filter(col("score") >= threshold)
            .transform(df => graft.ops.Caching.register(df))
          onDupHits(hits, epoch)
          val novel = batch.join(
            hits.select(col("query_id").as(idCol)), Seq(idCol), "left_anti")
          Similarity.appendToIvfIndexEpoch(novel, indexPath, epoch, queryId,
            idCol, vecCol)
        }
        if (autoCompactMaxFiles > 0) {
          Similarity.maybeCompactIvfIndex(spark, indexPath,
            autoCompactMaxFiles)
          ()
        }
      }
    }

  /**
   * Continuously-maintained daily rollup — the bronze→silver
   * materialization a warehouse actually serves queries from: each
   * micro-batch of events lands in a RAW store exactly-once
   * ([[graft.io.EpochCommit]] marker protocol; day-sorted files so
   * day-range scans skip), then the rollup partitions for the batch's
   * AFFECTED DAYS are recomputed from raw and atomically replaced
   * (dynamic partition overwrite — untouched days keep their files).
   *
   * End-to-end delivery: raw is exactly-once (replayed batches skip via
   * their marker); the rollup refresh is IDEMPOTENT (recompute-from-raw,
   * same input → same partitions) and deliberately runs on EVERY epoch,
   * committed or not — a crash after the raw marker but before the
   * rollup write must still refresh on replay, and refreshing twice is
   * harmless. So the queryable rollup converges to exactly-once
   * semantics without transactional coordination between the two
   * stores.
   *
   * The affected-day set is a metadata-sized driver collect (days per
   * micro-batch are calendar-bounded); the recompute reads raw with a
   * pushed day filter, so a day's refresh cost tracks that day's volume,
   * not the store's. `tsCol` must be nanosecond-epoch longs (the
   * [[graft.Queries.events]] normalized shape).
   */
  def streamingDailyRollup(events: DataFrame, storePath: String,
                           tsCol: String = "ts",
                           typeCol: String = "event_type",
                           valueCol: String = "value",
                           queryId: String = "rollup",
                           rawFilesPerEpoch: Int = 2) =
    events.writeStream.foreachBatch { (batch: DataFrame, epoch: Long) =>
      import graft.io.{EpochCommit, Tables}
      val spark = batch.sparkSession
      val withDay = batch.withColumn("event_day",
        expr(s"$tsCol div 86400000000000"))
      if (!EpochCommit.committed(spark, storePath, queryId, epoch)) {
        EpochCommit.cleanPartial(spark, storePath, Seq("raw"), epoch,
          queryId)
        EpochCommit.append(spark, storePath, Seq("raw"), epoch, queryId) {
          staging =>
            withDay
              .repartitionByRange(rawFilesPerEpoch, col("event_day"))
              .sortWithinPartitions("event_day")
              .write.mode("overwrite").parquet(s"$staging/raw")
        }
        ()
      }
      // idempotent refresh of the affected days — OUTSIDE the committed
      // check on purpose (see scaladoc)
      val days = withDay.select("event_day").distinct()
        .collect().map(_.getLong(0)) // calendar-bounded, metadata-sized
      if (days.nonEmpty) {
        val raw = spark.read.parquet(
          Tables.resolveComponent(spark, s"$storePath/raw"))
          .filter(col("event_day").isin(days.map(Long.box): _*))
        raw.groupBy("event_day", typeCol)
          .agg(count(lit(1)).as("n_events"),
            count_distinct(col("user_id")).as("n_users"),
            sum(floor(col(valueCol) * 100 + 0.5).cast("long"))
              .as("value_cents"),
            // per-day exact n_users is NOT mergeable across days; the
            // persisted HLL sketch is — it makes any day-RANGE distinct
            // answerable from the rollup ([[rangeDistinctUsers]])
            // without touching raw
            hll_sketch_agg(col("user_id")).as("users_sketch"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("event_day")
          .parquet(s"$storePath/rollup")
      }
    }

  /** Distinct users over an arbitrary day range, answered from the
    * rollup's PERSISTED per-day HLL sketches — unioning the selected
    * days' kilobyte sketches instead of rescanning raw (the reason the
    * sketch is stored next to the exact per-day count, which cannot be
    * merged). Estimate rsd ≈ 1.6 % at the default lgK.
    *
    * Day partitions written by a PRE-SKETCH version of the rollup carry
    * no `users_sketch`; silently skipping them would undercount, so the
    * range is validated first (mergeSchema read + null check) and a
    * stale range fails loudly with the backfill remedy — re-drop or
    * recompute the affected days, which rewrites their partitions with
    * the sketch. */
  def rangeDistinctUsers(spark: org.apache.spark.sql.SparkSession,
                         storePath: String, fromDay: Long,
                         toDay: Long): Long = {
    val sel = spark.read.option("mergeSchema", "true")
      .parquet(s"$storePath/rollup")
      .filter(col("event_day") >= fromDay && col("event_day") <= toDay)
    if (!sel.columns.contains("users_sketch") ||
        !sel.filter(col("users_sketch").isNull).isEmpty)
      throw new IllegalStateException(
        s"rollup day(s) in [$fromDay, $toDay] predate the persisted " +
        "users_sketch column — recompute those days (re-drop their " +
        "events or rebuild the rollup) before range-distinct queries; " +
        "unioning around them would silently undercount")
    // hll_union_agg over zero rows yields NULL — a day range matching no
    // rollup rows must answer 0 distinct users, not throw an opaque NPE
    val r = sel.agg(hll_sketch_estimate(hll_union_agg(col("users_sketch"))))
      .head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /**
   * Continuous upserts into a [[graft.io.ManifestTable]] — CDC ingestion
   * for the mutable-table world: each micro-batch is either key-unique
   * upsert rows (default) or a change feed in the
   * [[graft.io.ManifestTable.changesBetween]] shape (`cdf = true`:
   * insert/update_post upsert, delete deletes, update_pre carries no
   * action). The first batch BOOTSTRAPS the table when none exists.
   *
   * Replay semantics: merge and applyChanges are CONTENT-idempotent —
   * a crash-replayed micro-batch re-merges the same rows to the same
   * values, burning only a table version (at most one per crash;
   * Structured Streaming replays only the last uncommitted epoch) — so
   * the table converges to exactly-once EFFECT without a marker
   * protocol. Each merge is copy-on-write, so a key-local batch stream
   * advances the table at cost ∝ the batch, and readers resolve
   * manifests concurrently throughout.
   */
  def streamingTableUpsert(batches: DataFrame, tablePath: String,
                           keyCol: String, numFiles: Int = 8,
                           cdf: Boolean = false, dv: Boolean = false) =
    batches.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      if (!batch.isEmpty) {
        if (graft.io.ManifestTable.latestVersion(spark, tablePath).isEmpty) {
          val rows =
            if (cdf) batch.filter(col("_change_type")
              .isin("insert", "update_post")).drop("_change_type")
            else batch
          graft.io.ManifestTable.create(rows, tablePath, keyCol, numFiles)
        } else if (cdf)
          // dv: apply the feed through the deletion-vector commit —
          // sidecar + append per micro-batch instead of rewriting the
          // touched files (replay still converges: re-marking dead keys
          // and re-appending the same upserts are both idempotent in
          // content, and compaction folds the accumulated fragments)
          graft.io.ManifestTable.applyChanges(spark, tablePath, batch,
            dv = dv)
        else if (dv) {
          graft.io.ManifestTable.upsertDV(spark, tablePath, batch)
          ()
        } else {
          graft.io.ManifestTable.merge(spark, tablePath, batch)
          ()
        }
      }
    }
}
