package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimistic concurrency on the manifest table: a loser of the atomic
  * version claim must REBASE when the winner's commit is disjoint from
  * its batch (same files committed on top, zero recompute), RE-DRIVE the
  * whole operation when it overlaps (serial-equivalent result), and fail
  * loudly once retries are exhausted — while retention's orphan grace
  * keeps the loser's in-flight files alive through the winner's sweep.
  * The race window is entered deterministically via
  * [[ManifestTable.commitFence]] (invoked between an attempt's data
  * write and its manifest claim); each installed fence DISARMS itself
  * before running its competing commit, so the competitor commits with
  * a no-op fence. */
class ManifestConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mcc").toString + "/t"

  private def base(n: Int = 1000): DataFrame =
    (0 until n).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")

  private def content(df: DataFrame): Set[(Long, String, Int)] =
    df.select("id", "name", "grp").as[(Long, String, Int)].collect().toSet

  /** Arm the fence to run `competitor` exactly once, self-disarming
    * first so the competitor's own commit does not recurse. */
  private def fenceOnce(competitor: => Unit): Unit = {
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    ManifestTable.commitFence = () =>
      if (armed.getAndSet(false)) {
        ManifestTable.commitFence = () => ()
        competitor
      }
  }

  private def txnDirs(path: String, prefix: String): Seq[String] = {
    val data = new java.io.File(path, "data")
    Option(data.list()).fold(Seq.empty[String])(_.toSeq)
      .filter(_.startsWith(prefix))
  }

  test("key-disjoint race: the loser REBASES — both commits land, the " +
    "result is serial-equivalent, and the loser's already-written files " +
    "are committed as-is (no third-version recompute dir)") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      // winner updates the TOP of the key space; loser the bottom —
      // different files, disjoint keys
      fenceOnce {
        ManifestTable.merge(spark, path,
          (900L to 909L).map(i => (i, s"win_$i", 50)).toDF("id", "name", "grp"))
        ()
      }
      val st = ManifestTable.merge(spark, path,
        (100L to 109L).map(i => (i, s"lose_$i", 60)).toDF("id", "name", "grp"))
      assert(st.version == 3L, s"loser must land on top of the winner: $st")
      assert(ManifestTable.latestVersion(spark, path).contains(3L))
      val expect = content(base())
        .filterNot(r => (r._1 >= 900 && r._1 <= 909) ||
          (r._1 >= 100 && r._1 <= 109)) ++
        (900L to 909L).map(i => (i, s"win_$i", 50)) ++
        (100L to 109L).map(i => (i, s"lose_$i", 60))
      assert(content(ManifestTable.read(spark, path)) == expect,
        "serial-equivalent: both batches applied")
      // rebase proof: both attempts wrote dirs named for intended v2;
      // a full re-drive would have written a txn-3-* dir
      assert(txnDirs(path, "txn-3-").isEmpty,
        "disjoint conflict must rebase the written files, not recompute")
      assert(txnDirs(path, "txn-2-").size == 2,
        "winner's and loser's attempt dirs both live")
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("overlapping race: the loser RE-DRIVES against the winner's " +
    "state — last writer wins per key, serial-equivalent to " +
    "winner-then-loser") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      fenceOnce {
        ManifestTable.merge(spark, path,
          Seq((100L, "winner", 1)).toDF("id", "name", "grp"))
        ()
      }
      val st = ManifestTable.merge(spark, path,
        Seq((100L, "loser", 2), (101L, "loser", 2)).toDF("id", "name", "grp"))
      assert(st.version == 3L)
      // the re-drive wrote a fresh attempt dir for version 3
      assert(txnDirs(path, "txn-3-").size == 1,
        "overlapping conflict must recompute against the winner's state")
      val got = content(ManifestTable.read(spark, path))
      assert(got.contains((100L, "loser", 2)) &&
        got.contains((101L, "loser", 2)),
        "serial-equivalent: the loser's values supersede the winner's on " +
        s"the contended key; got ${got.filter(r => r._1 == 100L || r._1 == 101L)}")
      assert(got.size == 1000)
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("maxRetries = 0: an overlapping race is refused loudly instead " +
    "of rebased (the unsafe cheap path must never run on overlap)") {
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2)
      fenceOnce {
        ManifestTable.merge(spark, path,
          Seq((5L, "winner", 1)).toDF("id", "name", "grp"))
        ()
      }
      val e = intercept[IllegalStateException] {
        ManifestTable.merge(spark, path,
          Seq((5L, "loser", 2)).toDF("id", "name", "grp"), maxRetries = 0)
      }
      assert(e.getMessage.contains("commit conflict"))
      // the winner's commit is intact
      assert(content(ManifestTable.read(spark, path))
        .contains((5L, "winner", 1)))
      assert(ManifestTable.latestVersion(spark, path).contains(2L))
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("a compaction racing a merge re-drives and folds the merge in " +
    "(a compaction's touch set is everything — it can never rebase)") {
    val path = tmp()
    try {
      ManifestTable.create(base(200), path, "id", numFiles = 4)
      fenceOnce {
        ManifestTable.merge(spark, path,
          Seq((7L, "merged", 9), (950L, "ins", 9)).toDF("id", "name", "grp"))
        ()
      }
      ManifestTable.compactTable(spark, path, numFiles = 2)
      val m = ManifestTable.readManifest(spark, path)
      assert(m.version == 3L && m.entries.size == 2)
      val got = content(ManifestTable.read(spark, path))
      assert(got.contains((7L, "merged", 9)) && got.contains((950L, "ins", 9)),
        "the re-driven compaction must include the winner merge's rows")
      assert(got.size == 201)
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("stress: four uncoordinated writers on disjoint key bands all " +
    "land through rebase/re-drive; content equals all batches applied") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      // four writers, each updating its own 25-key band + inserting one
      // key beyond the key space — no fence: real scheduling races,
      // every interleaving must serialize through the claim protocol
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 4).map { w =>
        new Thread(() =>
          try ManifestTable.merge(spark, path,
            ((w * 250L until w * 250L + 25L).map(i => (i, s"w${w}_$i", w)) :+
              ((2000L + w, s"ins_$w", w))).toDF("id", "name", "grp"),
            maxRetries = 10)
          catch { case e: Throwable => errs.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join(180000))
      assert(threads.forall(!_.isAlive) && errs.isEmpty,
        s"all writers must land: $errs")
      assert(ManifestTable.latestVersion(spark, path).contains(5L),
        "four commits on top of the create")
      val got = content(ManifestTable.read(spark, path))
      (0 until 4).foreach { w =>
        (w * 250L until w * 250L + 25L).foreach(i =>
          assert(got.contains((i, s"w${w}_$i", w)), s"lost update $w/$i"))
        assert(got.contains((2000L + w, s"ins_$w", w)), s"lost insert $w")
      }
      assert(got.size == 1004)
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("mergeInto RE-RESOLVES clauses against an overlapping winner's " +
    "state — post-images computed from a superseded snapshot never " +
    "commit") {
    import ManifestTable.{WhenMatched, UpdateSet}
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 2)
      // the winner lands grp=100 on the contended key INSIDE the
      // loser's race window; the loser's post-image (t.grp + 1) was
      // resolved against grp = 5 % 7 = 5 — committing it would yield 6
      // and silently erase the winner. Serial order demands 101.
      fenceOnce {
        ManifestTable.merge(spark, path,
          Seq((5L, "winner", 100)).toDF("id", "name", "grp"))
        ()
      }
      val st = ManifestTable.mergeInto(spark, path,
        Seq((5L, "src")).toDF("id", "tagv"),
        Seq(WhenMatched(None,
          UpdateSet(Map("grp" -> (col("t.grp") + 1).cast("int"))))),
        insertUnmatched = false)
      assert(st.version == 3L)
      val got = content(ManifestTable.read(spark, path))
      assert(got.contains((5L, "winner", 101)),
        s"post-image must be re-resolved on the winner's row: " +
        s"${got.find(_._1 == 5L)}")
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("mergeInto's rebase guard covers ALL matched keys: a winner " +
    "changing a matched-but-no-clause-fired row forces re-resolution " +
    "(conditions re-evaluate on the winner's values)") {
    import ManifestTable.{WhenMatched, UpdateSet}
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      // source matches keys 98 (grp 0 — clause fires) and 900 (grp 4 —
      // clause silent), so the POST-IMAGE keys are {98} only and the
      // files around 900 look disjoint to the narrow check. The winner
      // flips 900's grp to 0 in exactly those files: serial order
      // demands the clause now fire for 900 too.
      fenceOnce {
        ManifestTable.merge(spark, path,
          Seq((900L, "w", 0)).toDF("id", "name", "grp"))
        ()
      }
      ManifestTable.mergeInto(spark, path,
        Seq((98L, "X98"), (900L, "X900")).toDF("id", "tagv"),
        Seq(WhenMatched(Some(col("t.grp") === 0),
          UpdateSet(Map("name" -> col("s.tagv"))))),
        insertUnmatched = false)
      val got = content(ManifestTable.read(spark, path))
      assert(got.contains((98L, "X98", 0)))
      assert(got.contains((900L, "X900", 0)),
        s"the re-resolved clause must fire on the winner's value: " +
        s"${got.find(_._1 == 900L)}")
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("NOT MATCHED BY SOURCE disables the cheap rebase: a winner's " +
    "INSERT of a source-unmatched key re-resolves and the nms clause " +
    "processes the winner's row (serial-equivalence)") {
    import ManifestTable.{DeleteMatched, WhenMatched, UpdateSet}
    val path = tmp()
    try {
      ManifestTable.create(base(100), path, "id", numFiles = 4)
      // the winner lands a NEW key (5000) OUTSIDE the source's key set
      // and outside the loser's batch ranges — file/key-DISJOINT, so a
      // plain merge would rebase right past it. NMS semantics make that
      // wrong: serial winner-then-merge demands 5000 be swept too.
      fenceOnce {
        ManifestTable.merge(spark, path,
          Seq((5000L, "w", 3)).toDF("id", "name", "grp"))
        ()
      }
      ManifestTable.mergeInto(spark, path,
        (0 until 50).map(i => (i.toLong, s"U$i")).toDF("id", "tagv"),
        Seq(WhenMatched(None, UpdateSet(Map("name" -> col("s.tagv"))))),
        insertUnmatched = false,
        whenNotMatchedBySource = Seq(WhenMatched(None, DeleteMatched)))
      val got = content(ManifestTable.read(spark, path))
      assert(!got.exists(_._1 == 5000L),
        s"the winner's unmatched row must be swept by the re-resolved " +
        s"NMS clause: ${got.find(_._1 == 5000L)}")
      assert(got.size == 50 && got.forall(r => r._2 == s"U${r._1}"),
        s"matched rows updated, unmatched target rows deleted: $got")
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("a mergeInto whose clauses match nothing burns NO version " +
    "(row-empty outputs take the metadata-only path)") {
    import ManifestTable.{WhenMatched, UpdateSet}
    val path = tmp()
    try {
      ManifestTable.create(base(50), path, "id", numFiles = 2)
      val st = ManifestTable.mergeInto(spark, path,
        Seq((3L, 0L)).toDF("id", "delta"),
        Seq(WhenMatched(Some(col("s.delta") > 100L),
          UpdateSet(Map("grp" -> lit(9))))),
        insertUnmatched = false)
      assert(ManifestTable.latestVersion(spark, path).contains(1L),
        "no data change must not consume the retention window")
      assert(st.filesRewritten == 0 && st.filesWritten == 0)
      assert(content(ManifestTable.read(spark, path)) == content(base(50)))
      // a requested tag still lands, metadata-only
      ManifestTable.mergeInto(spark, path,
        Seq((3L, 0L)).toDF("id", "delta"),
        Seq(WhenMatched(Some(col("s.delta") > 100L),
          UpdateSet(Map("grp" -> lit(9))))),
        insertUnmatched = false, setTag = Some("77"))
      assert(ManifestTable.readTag(spark, path).contains("77"))
      assert(ManifestTable.latestVersion(spark, path).contains(2L))
    } finally Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
  }

  test("two real threads through the race window: both land, " +
    "serial-equivalent result") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      val loserInWindow = new java.util.concurrent.CountDownLatch(1)
      val winnerDone = new java.util.concurrent.CountDownLatch(1)
      // the loser thread enters the fence first (fence disarms itself, so
      // the winner — committing after — runs with a no-op fence), parks
      // until the winner's commit has landed, then claims and loses
      val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
      ManifestTable.commitFence = () =>
        if (armed.getAndSet(false)) {
          ManifestTable.commitFence = () => ()
          loserInWindow.countDown()
          winnerDone.await()
        }
      @volatile var loserStats: ManifestTable.MergeStats = null
      @volatile var loserErr: Throwable = null
      val t = new Thread(() =>
        try loserStats = ManifestTable.merge(spark, path,
          (100L to 104L).map(i => (i, s"t_$i", 1)).toDF("id", "name", "grp"))
        catch { case e: Throwable => loserErr = e })
      t.start()
      assert(loserInWindow.await(60, java.util.concurrent.TimeUnit.SECONDS))
      ManifestTable.merge(spark, path,
        (900L to 904L).map(i => (i, s"m_$i", 2)).toDF("id", "name", "grp"))
      winnerDone.countDown()
      t.join(120000)
      assert(!t.isAlive && loserErr == null, s"loser failed: $loserErr")
      assert(loserStats.version == 3L)
      val got = content(ManifestTable.read(spark, path))
      assert((100L to 104L).forall(i => got.contains((i, s"t_$i", 1))) &&
        (900L to 904L).forall(i => got.contains((i, s"m_$i", 2))))
      assert(got.size == 1000)
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("dv delete loses the claim to a CoW merge: the dv commit " +
    "re-drives against the winner's rewritten files") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      // winner REWRITES the file holding key 105 while the dv delete of
      // {105, 500} is in flight — the re-drive must find 105 in the
      // winner's fresh file and mark it there
      fenceOnce {
        ManifestTable.merge(spark, path,
          (100L to 109L).map(i => (i, s"win_$i", 50))
            .toDF("id", "name", "grp"))
        ()
      }
      val st = ManifestTable.deleteKeysDV(spark, path,
        Seq(105L, 500L).toDF("id"))
      assert(st.version == 3L && st.deadMarked == 2L)
      val got = content(ManifestTable.read(spark, path))
      assert(!got.exists(r => r._1 == 105L || r._1 == 500L))
      assert(got.contains((104L, "win_104", 50)), "winner's merge kept")
      assert(got.size == 998)
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("CoW merge loses the claim to a dv delete that re-pointed a file " +
    "it read: the loser must RE-DRIVE (a rebase would resurrect the " +
    "winner's dead rows)") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      // winner dv-deletes key 105; loser's merge of key 100 READ the
      // same file (same range) without the winner's vector — touch sets
      // match by relPath, so only the entry-identity check forces the
      // re-drive
      fenceOnce {
        ManifestTable.deleteKeysDV(spark, path, Seq(105L).toDF("id"))
        ()
      }
      ManifestTable.merge(spark, path,
        Seq((100L, "upd_100", 50)).toDF("id", "name", "grp"))
      val got = content(ManifestTable.read(spark, path))
      assert(!got.exists(_._1 == 105L),
        "rebase over a dv winner resurrected its dead row")
      assert(got.contains((100L, "upd_100", 50)))
      assert(got.size == 999)
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }

  test("deleteWhere loses the claim to a merge that changed matching " +
    "rows: the retry RE-DERIVES its row set against the winner's state " +
    "(serial-equivalent to merge-then-delete)") {
    val path = tmp()
    try {
      ManifestTable.create(base(), path, "id", numFiles = 8)
      // winner re-prices keys 100-109 (all inside the delete range) and
      // inserts 2000-2004 (outside it) between the loser's read and its
      // claim; a stale loser would miss the winner's rewritten files
      fenceOnce {
        ManifestTable.merge(spark, path,
          ((100L to 109L).map(i => (i, s"win_$i", 50)) ++
            (2000L to 2004L).map(i => (i, s"new_$i", 60)))
            .toDF("id", "name", "grp"))
        ()
      }
      val st = ManifestTable.deleteWhere(spark, path, col("id") < 500L)
      assert(st.version == 3L, s"retry must land on the winner: $st")
      assert(st.deadMarked == 500L,
        "the re-derived delete covers the winner's rewritten rows too")
      val got = content(ManifestTable.read(spark, path))
      assert(got ==
        content(base()).filter(_._1 >= 500L) ++
          (2000L to 2004L).map(i => (i, s"new_$i", 60)),
        "serial-equivalent: merge then delete")
    } finally {
      ManifestTable.commitFence = () => ()
      Fs.deleteRecursively(java.nio.file.Paths.get(path).getParent)
    }
  }
}
