package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Bounded smallest-k id collector: a size-k MAX-heap of ids plus an exact
 * element count. This is the scale-correct shape for capped bucket
 * collection (LSH candidate generation): `collect_list` + slice caps the
 * output but only AFTER the whole bucket is buffered in one task — a
 * pathological hot bucket (billions of near-identical docs) would OOM
 * the task before the cap applies. As a TypedImperativeAggregate, Spark
 * plans this partial+final around the shuffle: every partition keeps at
 * most k ids per bucket, at most k ids per bucket cross the wire, and
 * the exact `total` still counts every element, so the cap stays
 * observable (dropped = total - kept).
 */
final class MinIdsBuffer(val k: Int) {
  // max-heap: root = largest kept id → evicted first; keeps the k SMALLEST
  val ids = new Array[Long](k)
  var size = 0
  var total = 0L

  def insert(id: Long): Unit = {
    total += 1
    if (size < k) {
      ids(size) = id; size += 1
      var i = size - 1
      var done = false
      while (i > 0 && !done) {
        val p = (i - 1) >> 1
        if (ids(i) > ids(p)) {
          val t = ids(i); ids(i) = ids(p); ids(p) = t; i = p
        } else done = true
      }
    } else if (id < ids(0)) {
      ids(0) = id
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && ids(l) > ids(m)) m = l
        if (r < size && ids(r) > ids(m)) m = r
        if (m == i) return
        val t = ids(i); ids(i) = ids(m); ids(m) = t; i = m
      }
    }
  }

  /** Ascending ids — the k smallest seen. */
  def sortedAsc: Array[Long] = java.util.Arrays.copyOf(ids, size).sorted
}

/**
 * bounded_min_ids(id long, k) -> struct<ids array<long> (asc, the k
 * smallest), total long (exact count)>.
 */
case class BoundedMinIds(
    child: Expression, // id: long
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinIdsBuffer] with UnaryLike[Expression] {

  require(k > 0 && k <= 65536, "k in (0, 65536]")

  override def createAggregationBuffer(): MinIdsBuffer = new MinIdsBuffer(k)

  override def update(buf: MinIdsBuffer, input: InternalRow): MinIdsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: MinIdsBuffer, b: MinIdsBuffer): MinIdsBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.ids(i)); i += 1 }
    a.total += b.total - b.size // insert() already counted b's kept ids
    a
  }

  override def eval(buf: MinIdsBuffer): Any =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(buf.sortedAsc), buf.total))

  override def serialize(buf: MinIdsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + buf.size * 8)
    bb.putInt(buf.size)
    bb.putLong(buf.total)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinIdsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val total = bb.getLong
    val buf = new MinIdsBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf.total = total
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType, containsNull = false)),
    StructField("total", LongType)))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): BoundedMinIds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMinIds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BoundedMinIds =
    copy(child = c)
}

object BoundedMinIds {
  /** Column API: `df.groupBy(...).agg(bounded_min_ids(col("id"), 1000))`. */
  def bounded_min_ids(id: Column, k: Int): Column =
    Bridge.column(
      BoundedMinIds(Bridge.expression(id), k).toAggregateExpression())
}
