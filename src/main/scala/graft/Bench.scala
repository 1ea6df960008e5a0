package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs the headline queries against
 * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line
 * `{"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}`.
 *
 * Each query is forced end-to-end with a `noop` write (full computation,
 * no sink cost, no driver collect) — `count()` would let Catalyst prune
 * the work being measured. One untimed warmup query first to exclude
 * one-off JVM/codegen/parquet-footer costs from every measurement.
 */
object Bench {

  /** Headline set: the operators whose cost scales with the fact tables,
    * plus one representative from each extension family. Round 4 adds the
    * round-3 operators (sessionize, decontam, vocab rank, mixture sample)
    * so their plans are perf-tracked like everything else — cross-round
    * totals compare like-for-like on the shared 20-query prefix. */
  private val headline = Seq(
    "p1_csv_roundtrip", "p3_filter_symbols", "p5_filter_compound",
    "p6_enrich_project", "p7_wordcount", "a2_sum_group", "a3_minmax_year",
    "j1_join_dims", "j2_join_fact_dims", "j3_join_big", "s1_topn",
    "s2_window_rank", "s5_distinct_agg", "s8_percentiles",
    "e1_events_hourly", "e3_asof_join", "e4_range_join",
    "ext_dedup_minhash_pairs", "ext_ann_brute", "ext_text_quality",
    "e5_sessionize", "ext_ngram_decontam", "ext_vocab_rank",
    "ext_mixture_sample",
    // round 5: incremental dedup probe — the index builds once per session
    // (pass 1), so the median of 3 reports the steady-state probe cost,
    // which is this operator's 100 TB operating mode — and the BPE encode
    // kernel (shuffle-free corpus scan)
    "ext_dedup_incremental", "ext_bpe_encode",
    // round 5 curation layer: repeated-chunk strip (two corpus-wide
    // aggregations), Bloom-prefiltered decontam (filter-scan union),
    // SemDeDup (cluster-blocked pair join)
    "ext_chunk_dedup", "ext_bloom_decontam", "ext_semdedup_pairs",
    // round 5 selection layer: DSIR fit+score+Gumbel-top-k (model fit is
    // part of the measured cost — two bucket aggregations — scoring is a
    // zero-shuffle scan) and the Gopher rule-flag filter (narrow scan)
    "ext_dsir_select", "ext_gopher_flags",
    // round 5: IVF-PQ probe + exact re-rank (the index builds once per
    // session, like ext_dedup_incremental — steady-state = ADC probe over
    // 16-byte codes, shortlist re-rank, recall emitted as the result row)
    "ext_ann_pq_recall",
    // round 5 composition layer: per-source quality cap (WindowGroupLimit
    // around one exchange) and the deterministic training-order shard
    // (one shard exchange + per-shard row_number)
    "ext_source_cap", "ext_shuffle_shards",
    // round 5: probe-only decontamination against the persisted Bloom
    // index (the weekly-crawl steady state; the in-session twin
    // ext_bloom_decontam above measures build+probe)
    "ext_bloom_decontam_indexed",
    // round 7: time-sliced event scan — the cost tracked here is the
    // pushed-bound scan + narrow agg (row-group skipping path)
    "e6_events_window",
    // round 8: index MAINTENANCE — full LSM compaction of the 8×-appended
    // dedup index (read → range-sort → versioned swap), so maintenance
    // regressions surface in the bench like query regressions (the
    // one-time build+appends ride in pass 1 via sessionIndex; the median
    // reports the steady-state rewrite)
    "ext_index_compact",
    // round 8: the two layout-driven join paths — co-located bucketed
    // fact-fact join (zero join exchanges; layout builds once per session)
    // and dynamic-partition-pruned scan over the day-partitioned event
    // store (reads ~9/30 day directories). Medians report the steady-state
    // read path; the one-time layout writes ride in pass 1.
    "j4_join_bucketed", "e7_events_dpp",
    // round 8: point lookup through the hash-clustered parquet-bloom
    // layout (the "fetch one id out of 100 TB" read path; the one-time
    // layout write rides in pass 1, the median reports the bloom-skipped
    // probe)
    "e8_event_lookup",
    // round 8: semi-structured extraction — per-row JSON parse of the
    // props bag in the scan projection (tracks JSON-parse throughput,
    // the dominant cost of real event pipelines)
    "e9_events_json",
    // round 8 (fixture shaved round 9): copy-on-write MERGE through the
    // file-list-manifest table — the table builds once per session (like
    // the dedup/ANN indexes), so each pass pays the range-pruned upsert +
    // rollup read, the operator being tracked (the create-included number
    // lives in BASELINE.md; the touch-set bound itself is pinned in
    // ManifestTableSpec)
    "m1_merge_upsert",
    // round 9: incremental view maintenance round trip — merge + CDF
    // fold into the AggView, then restore + fold back (two real diffs,
    // two per-group delta applications per pass, deterministic end
    // state), so a full-recompute regression in AggView.sync surfaces
    // as a timing jump here rather than staying silently correct
    "m9_view_maintain",
    // round 8: the Misra–Gries heavy-hitters sketch — one tokenize scan
    // with k-counter partial aggregation (tracks the custom
    // TypedImperativeAggregate's per-row cost; the exact twin it is
    // verdict-checked against is the ext_vocab_rank machinery)
    "ext_heavy_hitters",
    // round 11: the deletion-vector lifecycle, CREATE-INCLUDED by
    // design — the dv delete + dv upsert commits are the cheap part
    // being demonstrated (sidecar-sized writes), so the entry tracks
    // that the whole create → delete-dv → upsert-dv → rollup loop
    // stays bounded by the create, not the mutations
    "m16_dv_merge",
    // round 12: the dv STEADY STATE — one combined upsert+delete dv
    // tick against the session-fixture table (m1/m9 pattern: the
    // create rides pass 1, the median reports the per-tick commit +
    // post-tick rollup + restore), the operating point a 100 TB
    // CDC-fed table lives at
    "m19_dv_steady",
    // round 13: the predicate DML pair, create-included like m16 —
    // deleteWhere's metadata-drop + boundary-dv tiers and
    // updateWhere's pruned-read + dv-commit loop must both stay
    // bounded by their create
    "m22_delete_where",
    "m23_update_where",
    // round 14: the lifecycle torture chain (clone fork -> rename ->
    // widen -> deleteWhere -> merge -> maintain), create-included like
    // m16/m22 — tracks that feature COMPOSITION stays bounded by its
    // creates, since each step is individually metadata-/sidecar-sized
    "m26_lifecycle",
    // round 14: the table-format connector — create + dv + rename,
    // then the scan through spark.read.format("graft") with
    // manifest-FileIndex pruning and the reader-boundary dv filter;
    // tracks that connector overhead stays within the programmatic
    // read's cost class
    "m27_connector_scan",
    // round 14: bloom file-skipping — create + index build + dv
    // delete + two bloom-routed point lookups; tracks that the index
    // build stays one column-pruned pass and probes stay
    // file-count-sized
    "m28_bloom_lookup",
    // round 14: connector DPP — partitioned create + dim write + the
    // runtime-pruned join; tracks that partition-directory planning
    // stays manifest-sized
    "m29_connector_dpp",
    // round 15: the SQL DML chain (CREATE TABLE / DELETE / UPDATE /
    // INSERT / MERGE through the catalog) — create-included; tracks
    // that statement routing + per-statement commits stay bounded by
    // the same dv/CoW costs as their programmatic twins (m23/m7)
    "m30_sql_dml",
    // round 15: two-level partitioning — create + metadata-only
    // leading-slice drop (+ r16: a second-level value drop) +
    // static+DPP two-level pruned read; create-included (the read
    // itself is a cell-count-sized scan)
    "m31_multilevel_part",
    // round 16: SQL DML ROUTING COST, session-fixture split of m30
    // (the m1 r9 precedent) — registration + 4 routed statements +
    // rollup per pass, every statement idempotent on the fixture
    // table, so a routing regression shows here without m30's create
    // noise masking it
    "m33_sql_routed")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // custom SQL functions + the SQL DML routing rule (m30 runs
      // DELETE/UPDATE/MERGE statements through the catalog)
      .withExtensions(GraftExtensions.inject)
      .getOrCreate()
    // ERROR, not WARN: WindowExec's metadata-sized "No Partition Defined"
    // advisories (all adjudicated aggregate-fed, PlanSpec-guarded) spam
    // dozens of lines and bury real problems in the bench log.
    spark.sparkContext.setLogLevel("ERROR")

    // Self-qualification probes: OS load at pass start and JVM GC time
    // accumulated during each pass, so a slow pass is attributable from
    // the artifact alone (loaded window vs heap pressure vs regression).
    def loadavg: Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      // scoped: operator-internal persists release per run, so pass 2/3
      // measure the same cold-cache plan as pass 1 (and the 3×24-query
      // sweep never accumulates pinned storage)
      graft.ops.Caching.scoped {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Load gate: a loaded start window inflates every pass roughly
    // uniformly, so the pass-agreement `stable` check below cannot catch
    // it (rounds 9/10 recorded start loads of 2.7–4.7 with stable:true —
    // r10's numbers ran +26..135 % over the idle-window figures). Wait,
    // bounded, for the 1-min loadavg to decay below the gate before the
    // warmup; if it never clears, stamp the artifact `contaminated` and
    // force stable:false so the numbers are never compared across rounds.
    // Only the PRE-warmup sample is attributable to external load — the
    // bench itself drives loadavg up once 32 threads go hot, so per-pass
    // samples after pass 1 measure us, not the window.
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_GATE", "1.5").toDouble
    val maxWaitSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_WAIT", "300").toInt
    val waitT0 = System.nanoTime()
    var loadStart = loadavg
    while (loadStart > loadGate &&
        (System.nanoTime() - waitT0) / 1e9 < maxWaitSec) {
      Thread.sleep(10000)
      loadStart = loadavg
    }
    val loadWaitSec = (System.nanoTime() - waitT0) / 1e9
    // loadavg may be unreported (-1) on some JVMs — treat unknown as clean
    val loadContaminated = loadStart > loadGate

    def medianOf(vs: Seq[Double]): Double = {
      val ok = vs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      // even survivor count (a failed pass): mean of the two middle
      // values — taking ok(size/2) would report the LARGER one, a small
      // upward bias versus true median semantics
      else if (ok.size % 2 == 0) (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2.0
      else ok(ok.size / 2)
    }

    runOnce("a3_minmax_year") // warmup (untimed)

    // CALIBRATION probe (round 14): loadavg misses page-cache eviction
    // and phantom microVM load — all four round-13 recordings were
    // degraded-window despite passing the load gate above. So after the
    // warmup, time a fixed cheap pair (p1+p3: one CSV round-trip, one
    // pushed-filter scan — I/O-light, shuffle-light, five rounds
    // unchanged) whose IDLE cost on this box is committed, and stamp the
    // artifact contaminated when the window runs >1.25x of it. The
    // baseline is sf0.1-specific (the figure-of-record SF); other SFs
    // record calib_ms for attribution but never stamp.
    // 320 ms = this exact protocol (pair-warmed median of 3) measured
    // twice in a clean r14 window (306/330 ms; clean-window p1/p3 match
    // the r12 idle figures) — the r13 degraded windows read ~1.44x
    val calibBaselineMs =
      sys.env.getOrElse("SPARK_GRAFT_CALIB_BASELINE_MS", "320").toDouble
    val calibThreshold =
      sys.env.getOrElse("SPARK_GRAFT_CALIB_THRESHOLD", "1.25").toDouble
    def calibPairMs(): Double = medianOf((1 to 3).map { _ =>
      (runOnce("p1_csv_roundtrip") + runOnce("p3_filter_symbols")) * 1000.0
    })
    val calibApplies = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    // the pair itself needs its codegen/write-path JIT warm before the
    // timed runs, or a clean window reads hot purely from first-run cost
    calibPairMs()
    var calibMs = calibPairMs()
    // a transiently hot window may clear: re-probe within the same wait
    // budget the load gate uses before declaring the recording tainted
    val calibT0 = System.nanoTime()
    while (calibApplies && calibMs > calibBaselineMs * calibThreshold &&
        (System.nanoTime() - calibT0) / 1e9 < maxWaitSec) {
      Thread.sleep(20000)
      calibMs = calibPairMs()
    }
    val calibContaminated =
      calibApplies && calibMs > calibBaselineMs * calibThreshold
    val contaminated = loadContaminated || calibContaminated

    // 3 passes over the whole set, report the per-query MEDIAN: single
    // runs carry ±20 % machine-load noise that made round-over-round
    // comparison unreadable; the median of 3 interleaved passes is stable
    // while still charging each query its steady-state cost.
    // Dev-only subset filter (comma-separated names, or "prefix20" for the
    // cross-round 20-query baseline prefix): lets a profiling run time the
    // prefix WITHOUT the session-index builds and extension queries in the
    // same JVM, to attribute cross-round drift to session state vs code.
    // The driver never sets this; default = full headline set.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some("prefix20") => headline.take(20).toSet
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSet
      case None => Set.empty
    }
    val names = headline.filter(SparkEntry.queries.contains)
      .filter(n => only.isEmpty || only(n))
    case class Pass(times: Map[String, Double], load: Double, gcSec: Double)
    def runPass(): Pass = {
      val load0 = loadavg
      val gc0 = gcMillis
      val times = names.map { name =>
        name -> (try runOnce(name) catch { case _: Throwable => -1.0 })
      }.toMap
      Pass(times, load0, (gcMillis - gc0) / 1e3)
    }
    var passes = (1 to 3).map(_ => runPass())
    // Machine-load guard: the median of 3 protects against one bad pass,
    // not a bad WINDOW (round 4 recorded all three passes inflated ~2×).
    // If the steady-state pass totals disagree by >1.5× — pass 1 is
    // excluded, it legitimately pays the one-time index builds — the
    // window was contended: run up to 2 extra passes so the per-query
    // median reflects steady state.
    // totals restricted to queries that succeeded in EVERY steady pass —
    // a query failing in just one pass would otherwise skew that pass's
    // total by its whole runtime and false-trigger the guard
    def steadyTotals = {
      val steady = passes.drop(1)
      val common = names.filter(n => steady.forall(_.times(n) >= 0))
      steady.map(p => common.map(p.times).sum)
    }
    while (passes.size < 5 && steadyTotals.min > 0 &&
        steadyTotals.max > steadyTotals.min * 1.5) {
      passes = passes :+ runPass()
    }
    // stable = the steady-state passes finally agreed within 1.5×; false
    // means even the extra passes disagreed — treat the numbers as
    // load-contaminated and re-run, don't compare them across rounds.
    val stable = !contaminated && steadyTotals.min > 0 &&
      steadyTotals.max <= steadyTotals.min * 1.5
    val results = names.map(n => n -> medianOf(passes.map(_.times(n))))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val runs = passes
      .map(p => f"${p.times.values.filter(_ >= 0).sum}%.3f")
      .mkString("[", ",", "]")
    val passMeta = passes.map(p =>
      f"""{"total":${p.times.values.filter(_ >= 0).sum}%.3f,"loadavg":${p.load}%.2f,"gc_sec":${p.gcSec}%.2f}""")
      .mkString("[", ",", "]")
    val json =
      f"""{"metric":"headline_total","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$runs,"passes":$passMeta,"stable":$stable,"contaminated":$contaminated,"load_start":$loadStart%.2f,"load_wait_sec":$loadWaitSec%.0f,"calib_ms":$calibMs%.0f,"calib_baseline_ms":$calibBaselineMs%.0f,"calib_contaminated":$calibContaminated,"sf":"$sfDir"}"""
    // The bare JSON goes to stdout (unprefixed: run/outputStrategy is
    // StdoutOutput) AND to a file whose entire content is the one line,
    // so the driver can parse either.
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
