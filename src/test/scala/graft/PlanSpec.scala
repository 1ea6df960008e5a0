package graft

/** Structural guards on the physical plans of key queries — the scale
  * properties (pushdown, broadcast, bounded top-k, group-limit) must not
  * silently regress when queries are refactored. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Node-level plan for `collect`-based guards: AdaptiveSparkPlanExec is
    * a LEAF node (its tree only prints), so pattern-matching collects must
    * unwrap it or they match nothing and pass vacuously. */
  private def planTree(name: String): org.apache.spark.sql.execution.SparkPlan =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("p3: the set filter reaches the parquet scan") {
    val p = plan("p3_filter_symbols")
    assert(p.contains("PushedFilters: [In(l_returnflag"), p)
  }

  test("p3: the scan reads only the projected columns") {
    val p = plan("p3_filter_symbols")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_returnflag:string>"), p)
  }

  test("a2: aggregation is partial+final around one exchange") {
    val p = plan("a2_sum_group")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("j1: dimension joins broadcast (no sort-merge shuffle)") {
    val p = plan("j1_join_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("s1: top-N is TakeOrderedAndProject, not a full sort") {
    val p = plan("s1_topn")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("s2: rank filter plans as WindowGroupLimit before and after the shuffle") {
    val p = plan("s2_window_rank")
    assert("WindowGroupLimit".r.findAllIn(p).size == 2, p)
  }

  test("s13: anti-join broadcasts the filtered build side") {
    val p = plan("s13_antijoin")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"), p)
  }

  test("s18: unpivot is a single Expand, no shuffle") {
    val p = plan("s18_unpivot")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("s15: correlated subquery decorrelates to aggregate + join") {
    val p = plan("s15_corr_subquery")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial+final max
    assert(p.contains("Join"), p)
    assert(!p.toLowerCase.contains("subquery"), p) // no per-row execution
  }

  test("ext_pack_bins: per-row window partitions on (lang, sub); offset join broadcasts") {
    val p = plan("ext_pack_bins")
    // the row-level prefix-sum sort must carry BOTH partition keys — a
    // lang-only window would serialize the dominant language at scale
    assert("Sort \\[lang[^\\]]*ASC NULLS FIRST, sub[^\\]]*ASC NULLS FIRST, doc_id"
      .r.findAllIn(p).nonEmpty, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("text ops are shuffle-free narrow scans reading only (doc_id, text)") {
    Seq("ext_scrub_pii", "ext_chunk_docs", "ext_repetition",
        "ext_gopher_flags").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q:\n$p")
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), s"$q:\n$p")
    }
  }

  test("dsir: scoring is a zero-shuffle narrow scan (λ-table baked into " +
    "the projection); selection is a distributed TakeOrdered") {
    val p = plan("ext_dsir_score")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    val ps = plan("ext_dsir_select")
    assert(ps.contains("TakeOrderedAndProject"), ps)
    assert(!ps.contains("SortMergeJoin"), ps)
  }

  test("qclf: fixed-model scoring is a zero-shuffle narrow scan (weight " +
    "table baked into the projection)") {
    val p = plan("ext_qclf_score")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("indexed bloom decontam: the stored bitset probes as a literal " +
    "codegen predicate and the verify branch joins the stored digests") {
    val p = plan("ext_bloom_decontam_indexed")
    assert(p.contains("might_contain"), p)
    // the verify branch anti-joins the stored digest table (its scan
    // reads exactly the one digest column; tmp paths truncate in plan
    // strings, so pin the schema, not the location)
    assert(p.contains("ReadSchema: struct<digest:string>"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("corpus diff: digest compare joins on the id key — no raw-text " +
    "join key anywhere in the plan") {
    val p = plan("ext_corpus_diff")
    assert(p.contains("FullOuter"), p)
    // join keys are doc_id, payloads are the 32-byte sha2 digests
    assert(!p.toLowerCase.contains("join [text"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("source cap: rank filter plans as WindowGroupLimit on both sides " +
    "of the one source exchange — no whole-domain materialization") {
    val p = plan("ext_source_cap")
    assert("WindowGroupLimit".r.findAllIn(p).size == 2, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("temperature mixture: metadata-sized rates broadcast back; the " +
    "data path never sort-merges") {
    val p = plan("ext_temp_mixture")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("shuffle shards: the only row-level exchange is the shard " +
    "partition itself") {
    val p = plan("ext_shuffle_shards")
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).size == 1, p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  test("stratified sample: one hash exchange (the per-lang window), pruned scan") {
    val p = plan("ext_sample_stratified")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
  }

  test("s19: global ranks shard — no row-level single-partition exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val exec = planTree("s19_distribution")
    // a SinglePartition shuffle is only legitimate over pre-aggregated
    // (one-row-per-bucket) data — never over row-level table data
    val offenders = exec.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
        !e.child.toString.contains("HashAggregate") => e
    }
    assert(offenders.isEmpty, exec.toString)
    // the row-level window must partition on the price bucket
    assert("Sort \\[__b".r.findAllIn(exec.toString).nonEmpty, exec.toString)
  }

  test("e6: the time-range bound pushes to the events scan in the file's " +
    "raw representation (row-group skipping at 100 TB)") {
    val p = plan("e6_events_window")
    // both physical layouts must push BOTH bounds on ts: ns files as plain
    // longs, µs-timestamp files as folded timestamp literals
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts,".r
      .findAllIn(p).nonEmpty, p)
    assert("PushedFilters: \\[[^\\]]*LessThan\\(ts,".r.findAllIn(p).nonEmpty, p)
    // and the scan reads only the four referenced columns
    assert(!p.contains("props"), p)
  }

  test("j4: same-bucketed fact tables sort-merge join with NO shuffle on " +
    "either side (the only exchange is the final small-group agg)") {
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(c => c -> spark.conf.getOption(c))
    try {
      confs.foreach(spark.conf.set(_, "-1"))
      val p = plan("j4_join_bucketed")
      assert(p.contains("SortMergeJoin"), p)
      // one hash exchange total: the post-join aggregation. The join
      // itself rides the bucket layout — a second exchange would mean the
      // co-location regressed and both facts re-shuffle at every join.
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
      assert(!p.contains("BroadcastExchange"), p)
      // both sides scan as bucketed (SelectedBucketsCount in the scan)
      assert("SelectedBucketsCount: 8 out of 8".r.findAllIn(p).size == 2, p)
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None)    => spark.conf.unset(c)
    }
  }

  test("e7: the day-partitioned fact scan carries a dynamicpruningexpression " +
    "— only calendar-selected day directories are read") {
    val p = plan("e7_events_dpp")
    assert(p.contains("dynamicpruningexpression"), p)
    // and the pruning lands in PartitionFilters (directory-level), not a
    // post-scan data filter
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r.findAllIn(p).nonEmpty, p)
  }

  test("e3: with no hot keys the adaptive asof short-circuits to the " +
    "plain single-window plan (no salted machinery, no semi/anti routing)") {
    val p = plan("e3_asof_join")
    assert(!p.contains("__b"), p)
    assert(!p.contains("__hk"), p)
    assert("Sort \\[user_id[^\\]]*ASC NULLS FIRST, __t".r.findAllIn(p).nonEmpty, p)
  }

  test("asof hot path: the salted row-level window partitions on " +
    "(key, time bucket) — a hot key parallelizes across its buckets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = Seq(("a", 10L, 1L), ("a", 20L, 2L)).toDF("k", "lt", "lid")
    val r = Seq(("a", 5L, 7L)).toDF("k", "rt", "rid")
    // threshold 0: every key routes hot → the salted branch must window
    // on (k, __b), never on k alone
    val p = graft.ops.AsofJoin.asofJoinAdaptive(l, r, "k", col("lt"),
      col("rt"), Seq("rid"), rightOrd = col("rid"), hotThreshold = 0L)(
      t => floor(t / 7).cast("long"))
      .queryExecution.executedPlan.toString
    assert("Sort \\[k[^\\]]*ASC NULLS FIRST, __b".r.findAllIn(p).nonEmpty, p)
  }

  test("ngram decontam: no forced broadcast — AQE picks broadcast only " +
    "because the held-out side is actually small") {
    val df = SparkEntry.queries("ext_ngram_decontam")(spark, dir)
    df.collect() // let AQE finalize the plan from runtime shuffle stats
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    // at sf0.001 the held-out shingle-hash set IS small → AQE converts
    // the shuffle semi-join to broadcast at runtime
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    // the join key must be the fixed-width shingle hash, not raw text
    assert(p.contains("shk"), p)
  }

  test("ngram decontam degrades to a shuffle semi-join when broadcast is " +
    "off (the huge-held-out shape), with identical results") {
    val run = () => SparkEntry.queries("ext_ngram_decontam")(spark, dir)
    val expected = run().collect().toSet
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(c => c -> spark.conf.getOption(c))
    try {
      confs.foreach(spark.conf.set(_, "-1"))
      val df = run()
      val got = df.collect().toSet
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") && p.contains("LeftSemi"), p)
      assert(got == expected)
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None)    => spark.conf.unset(c)
    }
  }

  test("AQE skew-join: a forced-skew key (one key = half the rows) is " +
    "split at runtime (skew=true in the final plan) with results " +
    "identical to the unsplit join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // left: 40k rows, HALF on key 0, ~192 B of hash text per row so the
    // skewed shuffle partition dwarfs the median; right: small enough to
    // be broadcast normally, so broadcast is forced off to get the
    // sort-merge shape whose skew handling the fact-fact joins (j3,
    // ext_salient_terms df join) rely on at scale
    def left = spark.range(40000).select(
      when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("k"),
      concat(sha2(col("id").cast("string"), 256),
        sha2((col("id") + 1).cast("string"), 256),
        sha2((col("id") + 2).cast("string"), 256)).as("pay"))
    def right = spark.range(200).select(col("id").as("k"), (col("id") * 7).as("v"))
    // order-independent full-content checksum of the join output
    def run() = left.join(right, Seq("k")).agg(
      count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(k, pay, v))").as("h"))

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB")
    val toggles = confs.map(_._1) :+ "spark.sql.adaptive.skewJoin.enabled"
    val saved = toggles.map(c => c -> spark.conf.getOption(c))
    try {
      confs.foreach { case (c, v) => spark.conf.set(c, v) }

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val skewed = run()
      // collect on the SAME Dataset whose plan is inspected (a typed .as
      // copy would execute its own QueryExecution, leaving this one
      // un-finalized)
      val skewedResult = skewed.collect().head.toSeq
      val p = skewed.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"),
        s"skew-join split did not activate on a 50%-of-rows key:\n$p")

      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = run()
      val plainResult = plain.collect().head.toSeq
      assert(!plain.queryExecution.executedPlan.toString.contains("skew=true"))
      assert(skewedResult == plainResult,
        s"skew split changed the join result: $skewedResult vs $plainResult")
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None)    => spark.conf.unset(c)
    }
  }

  test("weighted sample is a shuffle-free narrow scan") {
    val p = plan("ext_sample_weighted")
    assert(!p.contains("Exchange"), p)
  }

  test("mixture sample: one metadata aggregate, broadcast back, no sort-merge") {
    val p = plan("ext_mixture_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("vocab rank: row-level window partitions on the count bucket") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val exec = planTree("ext_vocab_rank")
    val offenders = exec.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
        !e.child.toString.contains("HashAggregate") => e
    }
    assert(offenders.isEmpty, exec.toString)
  }

  test("vocab rank: the ranked input is threshold-pre-filtered — no " +
    "window over the full vocabulary") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = planTree("ext_vocab_rank")
    // the row-level (__b-partitioned) window must sit ABOVE the
    // one-row-threshold join (a BroadcastNestedLoopJoin on cnt >= __thr):
    // without the pre-cut, the Zipf cnt=1 bucket funnels most of the
    // vocabulary through one window task
    val rowWindows = exec.collect {
      case w: WindowExec if w.partitionSpec.exists(_.toString.contains("__b")) => w
    }
    assert(rowWindows.nonEmpty, exec.toString)
    rowWindows.foreach { w =>
      assert(w.child.toString.contains("BroadcastNestedLoopJoin"),
        s"row-level window not fed by the threshold pre-filter:\n$w")
    }
  }

  test("incremental dedup: signatures are computed over the NEW docs only " +
    "and the stored band lists are semi-join-filtered before pair " +
    "enumeration — the corpus is never re-shingled") {
    val p = plan("ext_dedup_incremental")
    // every documents scan in the probe carries the new-docs filter — a
    // scan without it would mean the full corpus is being re-signed
    val docScans = p.linesIterator
      .filter(_.contains("documents.parquet")).toSeq
    assert(docScans.nonEmpty, p)
    docScans.foreach(l => assert(l.contains("% 5"), l))
    // the stored lists come from the persisted index and pass through a
    // semi join on the new docs' band keys (AQE broadcasts the key set
    // when the crawl is small)
    assert(p.contains("/bands"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("ivf-pq probe: stored codes stream into a broadcast join with the " +
    "probe side (no code-table shuffle before scoring) and the re-rank " +
    "fetch is an equi-join with the shortlist broadcast") {
    val p = plan("ext_ann_pq_recall")
    // the ADC scan: codes parquet joins the broadcast probes on bucket —
    // the code table must never be exchanged ahead of its join
    assert(p.contains("/codes"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    // re-rank + recall: embeddings rejoin by id; nothing plans a cartesian
    assert(!p.contains("CartesianProduct"), p)
    // bounded shortlist: the top-k aggregate runs partial before any
    // exchange of scored candidates
    assert(p.toLowerCase.contains("topkbyscore"), p)
  }

  test("bpe encode is a shuffle-free projection (tokenize + canonical " +
    "encode stay in one scan)") {
    val p = plan("ext_bpe_encode")
    assert(!p.contains("Exchange"), p)
    assert(p.toLowerCase.contains("bpeencode"), p)
  }

  test("incremental dedup degrades to shuffle joins when broadcast is " +
    "off (the huge-crawl shape), with identical results") {
    val run = () => SparkEntry.queries("ext_dedup_incremental")(spark, dir)
    val expected = graft.ops.Caching.scoped { run().collect().toSet }
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(c => c -> spark.conf.getOption(c))
    try {
      confs.foreach(spark.conf.set(_, "-1"))
      val df = run()
      val got = graft.ops.Caching.scoped { df.collect().toSet }
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p) // no forced broadcast anywhere
      assert(got == expected)
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None)    => spark.conf.unset(c)
    }
  }

  test("embed decontam: the held-out side broadcasts and the corpus is " +
    "never shuffled (one scan, exact cosine, anti join)") {
    val p = plan("ext_embed_decontam")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("minhash candidates: bucket cap is a partial (map-side) bounded aggregate") {
    val p = plan("ext_dedup_minhash_pairs").toLowerCase
    // partial + final boundedminids around the bucket shuffle — at most
    // maxBucket ids per bucket per partition ever cross the wire
    assert("partial_boundedminids|boundedminids".r.findAllIn(p).size >= 2, p)
  }

  test("ann brute: bounded top-k aggregates partially before the shuffle") {
    val p = plan("ext_ann_brute")
    assert(p.contains("ObjectHashAggregate"), p)
    assert("partial_topkbyscore|partial.*TopKByScore|topkbyscore".r
      .findAllIn(p.toLowerCase).nonEmpty, p)
  }

  test("bloom decontam: corpus probes a literal bitset — the clean branch " +
    "is a pure filter scan with no shuffle at all") {
    val p = plan("ext_bloom_decontam")
    assert(p.contains("might_contain"), p)
    // the non-candidate branch of the union: a filtered parquet scan with
    // the negated bloom probe and NO exchange between scan and union
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 0)
    val heldOut = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    val clean = graft.ext.Curation.bloomDecontaminate(docs, heldOut,
      expectedItems = 1000L)
    val branch = clean.queryExecution.executedPlan.toString
    // exactly one exchange pair in the whole query — the verify join of
    // the candidate branch; the clean branch contributes none
    assert(!branch.substring(0, branch.indexOf("might_contain"))
      .contains("Exchange hashpartitioning"), branch)
  }

  test("chunk dedup: frequency join is on the fixed-width chunk hash and " +
    "nothing plans a cartesian or row-level global window") {
    val p = plan("ext_chunk_dedup")
    assert(p.contains("xxhash64"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p) // reassembly is a groupBy, not a sort window
  }

  test("semdedup: the pair join is keyed by cluster (blocked), never a " +
    "corpus-wide cartesian") {
    val p = plan("ext_semdedup_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).nonEmpty, p)
    assert(p.contains("cluster"), p)
  }

  test("bigram lm score: model and corpus join on the fixed-width bigram " +
    "hash; per-doc reduction is partial-aggregable") {
    val p = plan("ext_bigram_lm_score")
    assert(p.contains("xxhash64"), p)
    assert(!p.contains("CartesianProduct"), p)
    // partial + final aggregate around the doc_id shuffle
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("e9: JSON extraction runs below the exchange (raw props never " +
    "shuffle) and the scan reads only the two referenced columns") {
    val p = plan("e9_events_json")
    // plan strings print top-down, so the map-side parse appears AFTER
    // (below) the first exchange in the text
    val ex = p.indexOf("Exchange hashpartitioning")
    assert(ex >= 0, p)
    assert(p.indexOf("from_json", ex) >= 0, p)
    // column pruning reached the scan: no ts/user_id/value/event_id read
    assert(p.contains("event_type:string,props:string"), p)
    assert(!p.contains("user_id"), p)
  }

  test("heavy hitters: Misra–Gries aggregates partially per partition — " +
    "k counters, not the token stream, cross the shuffle") {
    val p = plan("ext_heavy_hitters").toLowerCase
    assert(p.contains("objecthashaggregate"), p)
    assert("partial_misragrieshh|misragrieshh".r.findAllIn(p).size >= 2, p)
  }

  test("e10: HLL sketches aggregate partially per partition — kilobyte " +
    "sketches, not user ids, cross both shuffles") {
    val p = plan("e10_sketch_users").toLowerCase
    assert(p.contains("objecthashaggregate"), p)
    assert("hll_sketch_agg".r.findAllIn(p).size >= 2, p)
    assert("hll_union_agg".r.findAllIn(p).size >= 2, p)
  }

  test("manifest table: the write-time stats pass reads ONLY the key " +
    "column of the new batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_mtplan")
    val path = s"$root/t"
    try {
      import spark.implicits._
      graft.io.ManifestTable.create(
        (0L to 99L).map(i => (i, s"v$i", i % 3)).toDF("id", "payload", "grp"),
        path, "id", numFiles = 2)
      // the stats scan shape: same read the library issues internally —
      // key + file metadata, grouped by file. Assert Spark prunes the
      // payload columns out of the parquet read.
      val stats = spark.read
        .schema(graft.io.ManifestTable.readManifest(spark, path).schema)
        .parquet(s"$path/data/txn-1")
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("_metadata.file_path"))
        .groupBy("file_path")
        .agg(org.apache.spark.sql.functions.min("id"))
      val ps = stats.queryExecution.executedPlan.toString
      assert(ps.contains("ReadSchema: struct<id:bigint>"), ps)
      assert(!ps.contains("payload"), ps)
    } finally graft.io.Fs.deleteRecursively(root)
  }

  test("routed subquery DELETE: the matched-rows plan is a JOIN (semi/" +
    "anti via Spark's subquery rewrite) — distributed, never a driver " +
    "loop or a nested per-row subquery") {
    val root = java.nio.file.Files.createTempDirectory("graft_sqplan")
    val path = s"$root/t"
    try {
      import spark.implicits._
      graft.io.ManifestTable.create(
        (0L to 999L).map(i => (i, i % 7)).toDF("id", "b"), path, "id",
        numFiles = 4)
      spark.sql(s"CREATE TABLE sqplan_t USING graft " +
        s"OPTIONS (path '$path', key 'id')")
      try {
        (0L to 99L).map(Tuple1(_)).toDF("k")
          .createOrReplaceTempView("sqplan_refs")
        // the exact frame GraftSubqueryDeleteCommand materializes:
        // Filter(cond-with-subquery, target) — assert its OPTIMIZED
        // form is a semi join over the scan
        val matched = spark.table("sqplan_t")
          .filter("id IN (SELECT k FROM sqplan_refs)")
        val p = matched.queryExecution.executedPlan.toString.toLowerCase
        assert(p.contains("leftsemi") || p.contains("left semi"), p)
        assert(!p.contains("insubquery"),
          s"the IN must be rewritten to a join, not evaluated per row: $p")
        // and the routed statement lands the delete end to end
        val res = spark.sql("DELETE FROM sqplan_t WHERE id IN " +
          "(SELECT k FROM sqplan_refs)")
        assert(res.as[Long].head() == 100L)
        assert(spark.table("sqplan_t").count() == 900L)
      } finally spark.sql("DROP TABLE IF EXISTS sqplan_t")
    } finally graft.io.Fs.deleteRecursively(root)
  }
}
