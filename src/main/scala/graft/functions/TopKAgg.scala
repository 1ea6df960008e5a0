package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Bounded top-k buffer: a size-k min-heap of (score, id). This is the
 * scale-correct shape for top-k-per-group: each partition keeps at most k
 * candidates (partial aggregation / map-side combine), and only k rows per
 * group cross the shuffle — vs `collect_list` + sort which ships the whole
 * group. At 100 TB, that is the difference between O(k) and O(|group|)
 * shuffle bytes per group.
 */
final class TopKBuffer(val k: Int) {
  // min-heap on (score asc, id desc): root = weakest kept candidate.
  // The id tie-break makes RETENTION deterministic — under score ties the
  // kept set is always the k smallest ids, independent of arrival order
  // across partitions (else results vary with partitioning).
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true iff candidate (i) ranks weaker than (j): lower score, or same
    * score with larger id. */
  @inline private def weaker(si: Double, ii: Long, sj: Double, ij: Long): Boolean =
    si < sj || (si == sj && ii > ij)

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (weaker(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (!weaker(scores(i), ids(i), scores(p), ids(p))) return
      swap(i, p); i = p
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  /** Descending by score; ties broken by ascending id for determinism. */
  def sortedDesc: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortBy { case (s, id) => (-s, id) }
}

/**
 * top_k_by(score double, id long, k) -> array<struct<score double, id long>>
 * sorted by score desc (id asc on ties). TypedImperativeAggregate → Spark
 * plans it as partial + final around the shuffle automatically.
 */
case class TopKByScore(
    left: Expression,   // score: double
    right: Expression,  // id: long
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0 && k <= 65536, "k in (0, 65536]")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) {
      val score = s.asInstanceOf[Double]
      if (!score.isNaN) buf.insert(score, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sortedDesc.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id)): InternalRow
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKByScore =
    copy(left = l, right = r)
}

object TopKByScore {
  /** Column API: `df.groupBy(...).agg(top_k_by(score, id, 5))`. */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score),
        Bridge.expression(id), k).toAggregateExpression())
}
