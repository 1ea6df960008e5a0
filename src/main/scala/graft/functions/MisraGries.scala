package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitters summary: at most k counters per buffer, so a
 * frequency sweep over 100 TB of tokens ships k rows per partition across
 * the shuffle instead of the vocabulary — the approximate counterpart to
 * the exact two-level rank behind `ext_vocab_rank`, for when only the
 * heavy tail matters (stopword discovery, hot-key detection, skew
 * monitoring before a join).
 *
 * Guarantees (Misra & Gries 1982; merge rule and its proof from Agarwal
 * et al., "Mergeable Summaries", PODS 2012), independent of partitioning
 * and merge order — which is what makes a verdict over the sketch
 * hash-stable in the declared query:
 *   - estimates never exceed the true count (decrement-only errors);
 *   - true − est ≤ n/(k+1), n = total items aggregated;
 *   - any item with true count > n/(k+1) is PRESENT in the summary.
 *
 * Per-arrival work is O(1) amortized (each decrement cancels one prior
 * increment); merge is pointwise add, then one (k+1)-th-largest subtract
 * to shrink back to k counters.
 */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)

  /** One unweighted arrival. */
  def insert1(w: String): Unit = {
    val cur = counts.get(w)
    if (cur > 0L) counts.put(w, cur + 1L)
    else if (counts.size < k) counts.put(w, 1L)
    else { // full and absent: decrement-all, dropping zeros
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Pointwise add, then shrink to k by subtracting the (k+1)-th largest
    * count from every counter (the mergeable-summaries rule). */
  def mergeIn(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= cut) ei.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** (word, est) sorted est desc, word asc — deterministic given the
    * counter STATE (the state itself depends on merge order; consumers
    * must rely only on the guarantees above). */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    arr.sortBy { case (w, c) => (-c, w) }
  }
}

/**
 * heavy_hitters(item string, k) -> array<struct<word string, est long>>.
 * TypedImperativeAggregate → partial per partition + final merge around
 * one k-row-per-partition shuffle.
 */
case class MisraGriesHH(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(k > 0 && k <= 65536, "k in (0, 65536]")

  // fail at analysis time on a non-string item column, not with an
  // executor-side ClassCastException mid-scan
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires a STRING item column, got ${child.dataType}")

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val w = child.eval(input)
    if (w != null) buf.insert1(w.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = { a.mergeIn(b); a }

  override def eval(buf: MgBuffer): Any = {
    val rows = buf.sorted.map { case (w, c) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(w), c)): InternalRow
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = buf.sorted.map { case (w, c) => (w.getBytes(UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._1.length).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.counts.put(new String(b, UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("word", StringType),
      StructField("est", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesHH =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesHH =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesHH =
    copy(child = c)
}

object MisraGriesHH {
  /** Column API: `df.agg(heavy_hitters(col("word"), 24))`. */
  def heavy_hitters(item: Column, k: Int): Column =
    Bridge.column(
      MisraGriesHH(Bridge.expression(item), k).toAggregateExpression())
}
