package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join equals the naive range join, each pair once") {
    val left = (1L to 200L).map(i => ("u" + i % 5, i * 10)).toDF("key", "lt")
    val right = (1L to 300L).map(i => ("u" + i % 7, i * 7)).toDF("key", "rt")

    val naive = left.join(right, Seq("key"))
      .filter($"rt" >= $"lt" - 50 && $"rt" <= $"lt" + 30)
    val banded = RangeJoin.rangeJoin(left, right, "key", "lt", "rt",
      lower = -50, upper = 30)

    assert(banded.count() == naive.count()) // exact multiset: no dup pairs
    assert(banded.except(naive).isEmpty && naive.except(banded).isEmpty)
  }

  test("degenerate window (lower == upper) matches equality on time offset") {
    val left = Seq(("a", 100L)).toDF("key", "lt")
    val right = Seq(("a", 110L), ("a", 100L), ("a", 90L)).toDF("key", "rt")
    val out = RangeJoin.rangeJoin(left, right, "key", "lt", "rt", 10, 10)
      .select("rt").as[Long].collect()
    assert(out.toSeq == Seq(110L))
  }
}
