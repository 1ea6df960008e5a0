package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CHECK constraints on manifest tables (the Delta `ADD CONSTRAINT`
  * parity): declared once, enforced on every mutating write INSIDE the
  * write job (observed metrics — zero extra passes over the data), a
  * violating commit refused with the table untouched. The suite pins
  * the refusal semantics (no version burned, content unchanged), the
  * SQL NULL-passes rule, existing-data validation at add time,
  * enforcement across every mutation family (copy-on-write merge,
  * deletion-vector upsert, partition overwrite), persistence across
  * unrelated commits and restore, and the concurrency story — a
  * constraint added mid-flight forces the losing writer to re-drive
  * and re-validate. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ck").toString + "/t"

  private def base(n: Int = 1000): DataFrame =
    (0 until n).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")

  private def content(df: DataFrame): Set[(Long, String, Int)] =
    df.select("id", "name", "grp").as[(Long, String, Int)].collect().toSet

  test("a violating merge is refused: constraint named in the error, " +
    "no version burned, content unchanged; a valid merge passes") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      ManifestTable.addCheckConstraint(spark, path, "grp_range",
        "grp >= 0 AND grp < 7")
      val v = ManifestTable.readManifest(spark, path).version

      val e = intercept[IllegalStateException] {
        ManifestTable.merge(spark, path,
          Seq((5000L, "bad", 99)).toDF("id", "name", "grp"))
      }
      assert(e.getMessage.contains("grp_range") &&
        e.getMessage.contains("violated by 1 row"))
      assert(ManifestTable.readManifest(spark, path).version == v,
        "refused commit must burn no version")
      assert(content(ManifestTable.read(spark, path)) == content(base()))

      ManifestTable.merge(spark, path,
        Seq((5000L, "ok", 6)).toDF("id", "name", "grp"))
      assert(content(ManifestTable.read(spark, path)) ==
        content(base()) + ((5000L, "ok", 6)))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("SQL CHECK semantics: a NULL predicate passes (violated only " +
    "when definitely false)") {
    val path = tmp()
    try {
      val df = (0 until 10).map(i => (i.toLong, s"n_$i", i))
        .toDF("id", "name", "grp")
      ManifestTable.create(df, path, "id", numFiles = 1)
      ManifestTable.addCheckConstraint(spark, path, "name_long",
        "length(name) > 1")
      // a NULL name makes the predicate UNKNOWN — standard SQL passes it
      ManifestTable.merge(spark, path,
        Seq((100L, null.asInstanceOf[String], 1)).toDF("id", "name", "grp"))
      assert(ManifestTable.read(spark, path).count() == 11)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("adding a constraint the EXISTING content violates is refused; " +
    "duplicate add and missing drop are refused") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      val e = intercept[IllegalArgumentException] {
        ManifestTable.addCheckConstraint(spark, path, "grp_small", "grp < 3")
      }
      assert(e.getMessage.contains("existing rows violate"))
      ManifestTable.addCheckConstraint(spark, path, "grp_ok", "grp < 7")
      intercept[IllegalArgumentException] {
        ManifestTable.addCheckConstraint(spark, path, "grp_ok", "grp < 9")
      }
      intercept[IllegalArgumentException] {
        ManifestTable.dropCheckConstraint(spark, path, "nope")
      }
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("deletion-vector upsert is gated too: violating batch refused " +
    "(table untouched), valid batch appends") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      ManifestTable.addCheckConstraint(spark, path, "grp_range", "grp < 7")
      val v = ManifestTable.readManifest(spark, path).version
      val e = intercept[IllegalStateException] {
        ManifestTable.upsertDV(spark, path,
          Seq((10L, "bad", 42)).toDF("id", "name", "grp"))
      }
      assert(e.getMessage.contains("grp_range"))
      assert(ManifestTable.readManifest(spark, path).version == v)
      assert(content(ManifestTable.read(spark, path)) == content(base()))
      ManifestTable.upsertDV(spark, path,
        Seq((10L, "upd", 3)).toDF("id", "name", "grp"))
      assert(content(ManifestTable.read(spark, path)) ==
        content(base()).filterNot(_._1 == 10L) + ((10L, "upd", 3)))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("partition overwrite is gated; drop lifts the gate; the set " +
    "survives unrelated commits and restore") {
    val path = tmp()
    try {
      val df = (0 until 300).map(i => (i.toLong, s"p${i % 3}", i % 7))
        .toDF("id", "pt", "grp")
      ManifestTable.createPartitioned(df, path, "id", "pt", numFiles = 3)
      ManifestTable.addCheckConstraint(spark, path, "grp_range", "grp < 7")
      val bad = (0 until 10).map(i => (i.toLong, "p1", 50))
        .toDF("id", "pt", "grp")
      val e = intercept[IllegalStateException] {
        ManifestTable.overwritePartitions(spark, path, bad)
      }
      assert(e.getMessage.contains("grp_range"))

      // unrelated commit carries the set forward
      ManifestTable.merge(spark, path,
        Seq((1000L, "p1", 3)).toDF("id", "pt", "grp"))
      assert(ManifestTable.readManifest(spark, path)
        .constraints.map(_._1) == Seq("grp_range"))
      // restore keeps the CURRENT policy while re-pointing data
      val vNow = ManifestTable.readManifest(spark, path).version
      ManifestTable.restoreVersion(spark, path, vNow - 1)
      assert(ManifestTable.readManifest(spark, path)
        .constraints.map(_._1) == Seq("grp_range"))

      ManifestTable.dropCheckConstraint(spark, path, "grp_range")
      ManifestTable.overwritePartitions(spark, path, bad)
      assert(ManifestTable.readPartitions(spark, path, Seq("p1"))
        .count() == 10)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("enforcement costs ZERO extra Spark jobs: a gated merge runs " +
    "the same job count as an ungated one (observed metrics ride the " +
    "write job)") {
    val pathA = tmp(); val pathB = tmp()
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    try {
      ManifestTable.create(base(), pathA, "id", numFiles = 4)
      ManifestTable.create(base(), pathB, "id", numFiles = 4)
      ManifestTable.addCheckConstraint(spark, pathB, "grp_range", "grp < 7")
      val batch = Seq((10L, "upd", 3), (5000L, "ins", 4))
        .toDF("id", "name", "grp")
      def jobsOf(f: => Unit): Int = {
        spark.sparkContext.addSparkListener(listener)
        try {
          counter.set(0); f
          // listenerBus is private[spark]; the events of a completed
          // synchronous action drain within a beat
          Thread.sleep(300)
          counter.get()
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      val ungated = jobsOf(ManifestTable.merge(spark, pathA, batch))
      val gated = jobsOf(ManifestTable.merge(spark, pathB, batch))
      assert(gated == ungated,
        s"constraint gating must ride the write job: $gated jobs gated " +
        s"vs $ungated ungated")
    } finally {
      Fs.deleteRecursively(java.nio.file.Paths.get(pathA).getParent)
      Fs.deleteRecursively(java.nio.file.Paths.get(pathB).getParent)
    }
  }

  test("constraints declared AT CREATE validate the incoming content " +
    "inside the create write (refused create commits no manifest) and " +
    "gate later mutations") {
    val path = tmp()
    try {
      val e = intercept[IllegalStateException] {
        ManifestTable.create(base(), path, "id", numFiles = 2,
          checkConstraints = Seq("grp_small" -> "grp < 3"))
      }
      assert(e.getMessage.contains("grp_small"))
      assert(ManifestTable.latestVersion(spark, path).isEmpty,
        "a refused create must leave no committed table")

      ManifestTable.create(base(), path, "id", numFiles = 2,
        checkConstraints = Seq("grp_range" -> "grp < 7"))
      assert(ManifestTable.readManifest(spark, path)
        .constraints == Seq("grp_range" -> "grp < 7"))
      intercept[IllegalStateException] {
        ManifestTable.merge(spark, path,
          Seq((5000L, "bad", 42)).toDF("id", "name", "grp"))
      }
      assert(content(ManifestTable.read(spark, path)) == content(base()))
      // duplicate names refused before anything is destroyed or written
      intercept[IllegalArgumentException] {
        ManifestTable.create(base(), tmp(), "id", numFiles = 1,
          checkConstraints = Seq("a" -> "grp < 7", "a" -> "grp > -1"))
      }
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("a VIEW's constraint gates the incremental sync swap: a fold " +
    "that would violate it is refused, the cursor does not advance, " +
    "and the retried sync converges once the constraint is dropped") {
    val root = java.nio.file.Files.createTempDirectory("graft_ckv")
    val src = s"$root/src"; val view = s"$root/view"
    try {
      val b = (0 until 100).map(i => (i.toLong, s"g${i % 4}", 10L))
        .toDF("id", "grp", "v")
      ManifestTable.create(b, src, "id", numFiles = 2)
      AggView.bootstrap(spark, src, view, "grp", "v")
      // per-group totals are 250; cap them below what the merge drives
      ManifestTable.addCheckConstraint(spark, view, "total_cap",
        "total < 100000")
      val tagBefore = ManifestTable.readManifest(spark, view).tag
      val viewBefore = ManifestTable.read(spark, view).collect().toSet

      ManifestTable.merge(spark, src,
        Seq((1000L, "g0", 1000000L)).toDF("id", "grp", "v"))
      val e = intercept[IllegalStateException] {
        AggView.sync(spark, src, view, "grp", "v")
      }
      assert(e.getMessage.contains("total_cap"),
        s"the fold must be refused by the view's constraint: $e")
      val m = ManifestTable.readManifest(spark, view)
      assert(m.tag == tagBefore,
        "a refused sync must not advance the cursor")
      assert(ManifestTable.read(spark, view).collect().toSet == viewBefore)

      // dropped: the SAME window replays and converges
      ManifestTable.dropCheckConstraint(spark, view, "total_cap")
      assert(AggView.sync(spark, src, view, "grp", "v").isDefined)
      val g0 = ManifestTable.read(spark, view)
        .filter(col("grp") === "g0").select("total")
        .as[Long].collect().head
      assert(g0 == 250L + 1000000L)
    } finally Fs.deleteRecursively(root)
  }

  test("a constraint added by a RACING writer forces the loser to " +
    "re-drive and re-validate (rebase refused on a changed set)") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 4)
      // the fence fires between the loser's data write and its manifest
      // claim: the winner lands add-constraint first, so the loser's
      // claim conflicts, the rebase check sees a changed constraint set,
      // and the re-drive must refuse the (now-violating) batch
      var fired = false
      ManifestTable.commitFence = () => {
        if (!fired) {
          fired = true
          ManifestTable.addCheckConstraint(spark, path, "grp_range",
            "grp < 7")
        }
      }
      try {
        val e = intercept[IllegalStateException] {
          ManifestTable.merge(spark, path,
            Seq((5000L, "bad", 99)).toDF("id", "name", "grp"))
        }
        assert(e.getMessage.contains("grp_range"),
          s"the re-driven merge must be gated by the racing constraint: $e")
      } finally ManifestTable.commitFence = () => ()
      assert(content(ManifestTable.read(spark, path)) == content(base()))
      assert(ManifestTable.readManifest(spark, path)
        .constraints.map(_._1) == Seq("grp_range"))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }
}
