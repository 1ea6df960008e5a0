package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PqFunctions._

/** Product quantization: kernel exactness vs an in-memory mirror, recall
  * pins for the re-ranked search paths, index round-trip, degenerate
  * inputs. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb: DataFrame = spark.read.parquet(sf("embeddings"))

  /** In-memory mirror of PqKernel's arithmetic: same normalize, same
    * subscript-order double accumulation, same float cast points. */
  private object Ref {
    def unit(v: Array[Float]): Array[Double] = {
      val out = v.map(_.toDouble)
      var n2 = 0.0
      out.foreach(x => n2 += x * x)
      if (n2 > 0.0) {
        val inv = 1.0 / math.sqrt(n2)
        out.indices.foreach(i => out(i) *= inv)
      }
      out
    }
    def assign(vec: Array[Float], cb: Array[Float], dim: Int, m: Int,
               ksub: Int): Array[Int] = {
      if (vec.length != dim || vec.forall(_ == 0.0f)) return Array.empty
      val v = unit(vec)
      val dsub = dim / m
      Array.tabulate(m) { sub =>
        var best = 0
        var bestD = Double.MaxValue
        for (c <- 0 until ksub) {
          var d = 0.0
          for (t <- 0 until dsub) {
            val diff = v(sub * dsub + t) -
              cb(sub * ksub * dsub + c * dsub + t).toDouble
            d += diff * diff
          }
          if (d < bestD) { bestD = d; best = c }
        }
        best
      }
    }
    def distTable(vec: Array[Float], cb: Array[Float], dim: Int, m: Int,
                  ksub: Int): Array[Float] = {
      if (vec.length != dim || vec.forall(_ == 0.0f)) return Array.empty
      val v = unit(vec)
      val dsub = dim / m
      val out = new Array[Float](m * ksub)
      for (sub <- 0 until m; c <- 0 until ksub) {
        var d = 0.0
        for (t <- 0 until dsub) {
          val diff = v(sub * dsub + t) -
            cb(sub * ksub * dsub + c * dsub + t).toDouble
          d += diff * diff
        }
        out(sub * ksub + c) = d.toFloat
      }
      out
    }
    def adc(table: Array[Float], code: Array[Byte]): Double = {
      val m = code.length
      if (m == 0 || table.length == 0 || table.length % m != 0) return -1.0
      val ksub = table.length / m
      var d2 = 0.0
      for (sub <- 0 until m) d2 += table(sub * ksub + (code(sub) & 0xff)).toDouble
      1.0 - d2 / 2.0
    }
  }

  test("fuzz: assign/encode/dist-table/ADC kernels match the in-memory " +
    "mirror bit-for-bit on random vectors and codebooks") {
    val rnd = new scala.util.Random(4711)
    val dim = 16; val m = 4; val ksub = 8
    val cb = Array.fill(m * ksub * (dim / m))((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = (0 until 40).map { i =>
      val v =
        if (i == 0) Array.fill(dim)(0.0f) // zero vector
        else Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      (i.toLong, v.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(3)
    val got = df.select(col("vec_id"),
        pq_assign(col("embedding"), cb, dim, m, ksub).as("idx"),
        pq_encode(col("embedding"), cb, dim, m, ksub).as("code"),
        pq_dist_table(col("embedding"), cb, dim, m, ksub).as("tbl"))
      .as[(Long, Seq[Int], Array[Byte], Seq[Float])].collect()
      .map(r => r._1 -> r).toMap
    vecs.foreach { case (id, v) =>
      val va = v.toArray
      val refIdx = Ref.assign(va, cb, dim, m, ksub)
      val (_, gotIdx, gotCode, gotTbl) = got(id)
      assert(gotIdx == refIdx.toSeq, s"assign, vec $id")
      assert(gotCode.toSeq == refIdx.map(c => (c & 0xff).toByte).toSeq,
        s"encode, vec $id")
      assert(gotTbl == Ref.distTable(va, cb, dim, m, ksub).toSeq,
        s"dist table, vec $id")
    }
    // ADC: score every (query, candidate) pair through the expression and
    // the mirror
    val q = df.select(col("vec_id").as("qid"),
      pq_dist_table(col("embedding"), cb, dim, m, ksub).as("tbl"))
    val c = df.select(col("vec_id").as("cid"),
      pq_encode(col("embedding"), cb, dim, m, ksub).as("code"))
    val scores = c.crossJoin(q)
      .select(col("qid"), col("cid"), pq_adc(col("tbl"), col("code")).as("s"))
      .as[(Long, Long, Double)].collect()
    val codeOf = vecs.map { case (id, v) =>
      id -> Ref.assign(v.toArray, cb, dim, m, ksub).map(x => (x & 0xff).toByte)
    }.toMap
    val tblOf = vecs.map { case (id, v) =>
      id -> Ref.distTable(v.toArray, cb, dim, m, ksub)
    }.toMap
    scores.foreach { case (qid, cid, s) =>
      assert(s == Ref.adc(tblOf(qid), codeOf(cid)), s"adc q=$qid c=$cid")
    }
  }

  test("degenerate inputs: wrong-dim AND all-zero vectors get empty " +
    "codes/tables so bare ADC pins them to -1, like CosineSimilarity") {
    val dim = 8; val m = 2; val ksub = 4
    val cb = Array.fill(m * ksub * (dim / m))(0.5f)
    val df = Seq(
      (0L, Seq.fill(dim)(1.0f)),   // fine
      (1L, Seq.fill(3)(1.0f)),     // wrong dim
      (2L, Seq.fill(dim)(0.0f))    // zero vector — no direction
    ).toDF("vec_id", "embedding")
    val rows = df.select(col("vec_id"),
        pq_encode(col("embedding"), cb, dim, m, ksub).as("code"))
      .as[(Long, Array[Byte])].collect().map(r => r._1 -> r._2).toMap
    assert(rows(0L).length == m)
    assert(rows(1L).length == 0)
    assert(rows(2L).length == 0) // zero vector: empty code, never a neighbor
    val tbl = df.filter(col("vec_id") === 0L)
      .select(pq_dist_table(col("embedding"), cb, dim, m, ksub))
      .as[Seq[Float]].head()
    assert(Ref.adc(tbl.toArray, rows(1L)) == -1.0)
    assert(Ref.adc(tbl.toArray, rows(2L)) == -1.0)
    // a zero QUERY likewise gets an empty table → every candidate -1
    val ztbl = df.filter(col("vec_id") === 2L)
      .select(pq_dist_table(col("embedding"), cb, dim, m, ksub))
      .as[Seq[Float]].head()
    assert(ztbl.isEmpty && Ref.adc(ztbl.toArray, rows(0L)) == -1.0)
  }

  test("PQ flat search with exact re-rank reaches recall@5 >= 0.9 vs " +
    "brute force (config of record: m=16 ksub=64 rr=20, tools/ProbePq)") {
    val qs = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, qs, 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopKRerank(emb, qs, 5, rerank = 20, m = 16,
      ksub = 64).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
    val recall = pq.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.9, s"flat PQ+rerank recall@5 = $recall")
  }

  test("persisted IVF-PQ index: reloaded codebooks/codes reach recall@5 " +
    ">= 0.9 with re-rank, and stored codes equal a direct encode of the " +
    "corpus (the index is a faithful compression)") {
    val qs = emb.filter(col("vec_id") < 10)
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_idx")
    try {
      Similarity.buildPqIndex(emb, idx.toString, numCentroids = 8,
        m = 16, ksub = 64)
      val brute = Similarity.bruteForceTopK(emb, qs, 5)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val pq = Similarity.pqTopKFromIndexRerank(spark, idx.toString, emb,
        qs, 5, rerank = 20, nprobe = 7)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      val recall = pq.count(brute.contains).toDouble / brute.size
      assert(recall >= 0.9, s"IVF-PQ recall@5 from reloaded index = $recall")

      // faithful compression: stored codes == direct pq_encode under the
      // reloaded codebooks, for every vector
      val (cb, m, ksub, dsub) = Similarity.loadPqCodebooks(spark, idx.toString)
      assert(m == 16 && ksub == 64 && dsub == 4)
      val stored = spark.read.parquet(s"$idx/codes")
        .select(col("cand_id"), col("code"))
        .as[(Long, Array[Byte])].collect().map(r => r._1 -> r._2.toSeq).toMap
      val direct2 = emb.select(col("vec_id"),
          pq_encode(col("embedding"), cb, 64, m, ksub).as("c"))
        .as[(Long, Array[Byte])].collect().map(r => r._1 -> r._2.toSeq).toMap
      assert(stored.size == direct2.size)
      stored.foreach { case (id, code) => assert(code == direct2(id), s"vec $id") }
    } finally {
      graft.io.Fs.deleteRecursively(idx)
    }
  }

  test("fuzz: residual encode and residual dist-table kernels match an " +
    "in-memory mirror bit-for-bit (cell choice ≡ NearestCentroids)") {
    val rnd = new scala.util.Random(9182)
    val dim = 16; val m = 4; val ksub = 8; val nc = 4
    val cents = Array.fill(nc * dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val cb = Array.fill(m * ksub * (dim / m))((rnd.nextDouble() * 0.5 - 0.25).toFloat)
    def refCell(v: Array[Double]): Int = {
      // cosine argmax, ties toward the lowest index — the
      // NearestCentroidsKernel contract
      var vn = 0.0; v.foreach(x => vn += x * x)
      var best = 0; var bestS = Double.NegativeInfinity
      for (c <- 0 until nc) {
        var dot = 0.0; var cn = 0.0
        for (j <- 0 until dim) {
          dot += v(j) * cents(c * dim + j).toDouble
          cn += cents(c * dim + j).toDouble * cents(c * dim + j).toDouble
        }
        val s = if (vn == 0.0 || cn == 0.0) Double.NegativeInfinity
                else dot / (math.sqrt(vn) * math.sqrt(cn))
        if (s > bestS) { bestS = s; best = c }
      }
      best
    }
    def refResidual(raw: Array[Float]): Array[Double] = {
      val v = Ref.unit(raw)
      val cell = refCell(raw.map(_.toDouble))
      Array.tabulate(dim)(i => v(i) - cents(cell * dim + i).toDouble)
    }
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(3)
    val got = df.select(col("vec_id"),
        pq_encode_res(col("embedding"), cents, cb, dim, m, ksub).as("code"),
        pq_dist_table_res(col("embedding"),
          lit(2), cents, cb, dim, m, ksub).as("tbl"))
      .as[(Long, Array[Byte], Seq[Float])].collect()
      .map(r => r._1 -> (r._2.toSeq, r._3)).toMap
    val dsub = dim / m
    vecs.foreach { case (id, v) =>
      val r = refResidual(v.toArray)
      // reference residual-encode: plain argmin L2 per subspace
      val refCode = Array.tabulate(m) { sub =>
        var best = 0; var bestD = Double.MaxValue
        for (c <- 0 until ksub) {
          var d = 0.0
          for (t <- 0 until dsub) {
            val diff = r(sub * dsub + t) -
              cb(sub * ksub * dsub + c * dsub + t).toDouble
            d += diff * diff
          }
          if (d < bestD) { bestD = d; best = c }
        }
        (best & 0xff).toByte
      }
      assert(got(id)._1 == refCode.toSeq, s"residual code, vec $id")
      // reference residual table vs FIXED bucket 2
      val vu = Ref.unit(v.toArray)
      val refTbl = new Array[Float](m * ksub)
      for (sub <- 0 until m; c <- 0 until ksub) {
        var d = 0.0
        for (t <- 0 until dsub) {
          val i = sub * dsub + t
          val diff = (vu(i) - cents(2 * dim + i).toDouble) -
            cb(sub * ksub * dsub + c * dsub + t).toDouble
          d += diff * diff
        }
        refTbl(sub * ksub + c) = d.toFloat
      }
      assert(got(id)._2 == refTbl.toSeq, s"residual table, vec $id")
    }
  }

  test("residual-mode index: stored codes ≡ direct residual encode, the " +
    "mode flag survives reload (appends stay residual), and recall@5 " +
    "≥ 0.9 with re-rank") {
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val extra = emb.filter(col("vec_id") % 4 === 0)
    val qs = emb.filter(col("vec_id") < 10)
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_res")
    try {
      Similarity.buildPqIndex(base, idx.toString, numCentroids = 8,
        m = 16, ksub = 64, residual = true)
      Similarity.appendToPqIndex(extra, idx.toString)
      val (cents, dim) = Similarity.loadIvfCentroids(spark, idx.toString)
      val (cb, m, ksub, _) = Similarity.loadPqCodebooks(spark, idx.toString)
      val stored = spark.read.parquet(s"$idx/codes")
        .select("cand_id", "code").as[(Long, Array[Byte])]
        .collect().map(r => r._1 -> r._2.toSeq).toMap
      val direct = emb.select(col("vec_id"),
          pq_encode_res(col("embedding"), cents, cb, dim, m, ksub).as("c"))
        .as[(Long, Array[Byte])].collect().map(r => r._1 -> r._2.toSeq).toMap
      assert(stored == direct) // appended rows included → flag respected
      val brute = Similarity.bruteForceTopK(emb, qs, 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val pq = Similarity.pqTopKFromIndexRerank(spark, idx.toString, emb,
        qs, 5, rerank = 20, nprobe = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      val recall = pq.count(brute.contains).toDouble / brute.size
      assert(recall >= 0.9, s"residual IVF-PQ recall@5 = $recall")

      // compaction rewrites the append-fragmented code lists without
      // changing a single row, and the probe result is identical
      Similarity.compactPqIndex(spark, idx.toString, indexFiles = 3)
      val storedAfter = spark.read.parquet(s"$idx/codes")
        .select("cand_id", "code").as[(Long, Array[Byte])]
        .collect().map(r => r._1 -> r._2.toSeq).toMap
      assert(storedAfter == stored)
      val pq2 = Similarity.pqTopKFromIndexRerank(spark, idx.toString, emb,
        qs, 5, rerank = 20, nprobe = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      assert(pq2.toSet == pq.toSet)
    } finally {
      graft.io.Fs.deleteRecursively(idx)
    }
  }

  test("appendToPqIndex encodes with the STORED models: probes find the " +
    "appended vectors and their codes equal a direct encode under the " +
    "reloaded codebooks") {
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val extra = emb.filter(col("vec_id") % 4 === 0)
    val qs = emb.filter(col("vec_id") < 10)
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_app")
    try {
      Similarity.buildPqIndex(base, idx.toString, numCentroids = 8,
        m = 16, ksub = 64)
      Similarity.appendToPqIndex(extra, idx.toString)
      // the appended codes are byte-identical to a direct encode under
      // the reloaded codebooks (appends never retrain)
      val (cb, m, ksub, _) = Similarity.loadPqCodebooks(spark, idx.toString)
      val stored = spark.read.parquet(s"$idx/codes")
        .as[(Long, Array[Byte], Int)]
        .collect().map(r => r._1 -> r._2.toSeq).toMap
      assert(stored.size == emb.count())
      val direct = extra.select(col("vec_id"),
          pq_encode(col("embedding"), cb, 64, m, ksub).as("c"))
        .as[(Long, Array[Byte])].collect()
      direct.foreach { case (id, code) =>
        assert(stored(id) == code.toSeq, s"vec $id")
      }
      // and the appended index still clears the recall pin. This test
      // pins INDEX INTEGRITY, not cell pruning (that's the build test):
      // probe every cell so a lost appended vector — not an unprobed
      // cell — is the only thing that could cost recall.
      val brute = Similarity.bruteForceTopK(emb, qs, 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val pq = Similarity.pqTopKFromIndexRerank(spark, idx.toString, emb,
        qs, 5, rerank = 30, nprobe = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      val recall = pq.count(brute.contains).toDouble / brute.size
      assert(recall >= 0.9, s"recall@5 after append = $recall")
    } finally {
      graft.io.Fs.deleteRecursively(idx)
    }
  }

  test("ADC shortlist ordering is deterministic: two runs of the same " +
    "query batch return identical rows") {
    val qs = emb.filter(col("vec_id") < 5)
    def run(): Seq[(Long, Long, Double)] =
      Similarity.pqTopKRerank(emb, qs, 5, rerank = 10, m = 8, ksub = 16)
        .orderBy("query_id", "neighbor_id")
        .as[(Long, Long, Double)].collect().toSeq
    assert(run() == run())
  }

  test("PQ index deletion: tombstoned ids never reach the ADC shortlist; " +
    "compaction removes their codes physically") {
    val qs = emb.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_del")
    try {
      Similarity.buildPqIndex(emb, idx.toString, numCentroids = 8,
        m = 16, ksub = 64)
      def top() = Similarity.pqTopKFromIndexRerank(spark, idx.toString, emb,
        qs, 5, rerank = 20, nprobe = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val dead = top().filter(_._1 == 0L).map(_._2).toSeq
      assert(dead.nonEmpty)
      Similarity.deleteFromAnnIndex(dead.toDF("vec_id"), idx.toString)
      val after = top()
      assert(after.forall(r => !dead.contains(r._2)),
        "deleted ids still reach the shortlist")
      Similarity.compactPqIndex(spark, idx.toString, indexFiles = 2)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$idx/tombstones")))
      val stored = spark.read.parquet(graft.io.Tables.resolveComponent(
        spark, s"$idx/codes")).select("cand_id").as[Long].collect().toSet
      assert(dead.forall(!stored.contains(_)))
      assert(top() == after)
    } finally {
      graft.io.Fs.deleteRecursively(idx)
    }
  }
}
