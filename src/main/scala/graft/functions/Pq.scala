package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels (Jégou, Douze, Schmid, "Product
 * Quantization for Nearest Neighbor Search", TPAMI 2011): compress a
 * `dim`-float vector into `m` byte codes (one sub-quantizer index per
 * `dsub = dim / m` subspace) and score compressed candidates against an
 * uncompressed query with an asymmetric distance computation (ADC) —
 * `m` table lookups per candidate instead of `dim` multiplies.
 *
 * Cosine via L2: vectors are L2-NORMALIZED inside the kernels, so
 * squared L2 distance and cosine are affinely related
 * (`cos = 1 - d²/2` on unit vectors) and the standard L2 PQ machinery
 * ranks by cosine. All-zero vectors have no direction, so the
 * normalizing kernels treat them like wrong-length inputs: empty
 * code / empty table, which pins `adcScore` to -1 (sorted last,
 * matching `CosineSimilarity`'s degenerate handling) on BARE-ADC paths
 * too, not just after exact re-rank. The `normalize = false` residual
 * path keeps real codes for zero RESIDUALS — a vector sitting exactly
 * on its coarse centroid is a legitimate, maximally-typical point.
 *
 * Arithmetic is fixed-order double accumulation in subscript order —
 * deterministic across partitioning, so codes and scores are stable
 * under any cluster layout.
 *
 * Codebook layout: flat row-major `m × ksub × dsub`
 * (`codebooks(sub*ksub*dsub + c*dsub + t)`), model state baked into the
 * plan exactly like [[NearestCentroidsKernel]]'s centroid matrix.
 */
object PqKernel {

  /** True when every component is zero — the vector has no direction
    * and no meaningful cosine neighbor. */
  private def isZero(vec: ArrayData, dim: Int): Boolean = {
    var i = 0
    while (i < dim) { if (vec.getFloat(i) != 0.0f) return false; i += 1 }
    true
  }

  /** Normalized copy of `vec` as doubles (zero vector stays zero). */
  private def unit(vec: ArrayData, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    var n2 = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i).toDouble; v(i) = x; n2 += x * x; i += 1 }
    if (n2 > 0.0) {
      val inv = 1.0 / math.sqrt(n2)
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** Per-subspace nearest sub-centroid indices (argmin squared L2, ties
    * toward the lowest index). Empty array when the vector's length
    * disagrees with `dim`, or — on the normalizing path only — when the
    * vector is all-zero (no direction → no code; ADC then pins to -1).
    * `normalize = false` treats the input as already in code space (the
    * residual-training path — residuals must NOT be re-normalized, and a
    * zero residual is a real point that keeps a real code). */
  def assign(vec: ArrayData, codebooks: Array[Float], dim: Int, m: Int,
             ksub: Int, normalize: Boolean): ArrayData = {
    if (vec.numElements() != dim) return new GenericArrayData(new Array[Int](0))
    if (normalize && isZero(vec, dim)) return new GenericArrayData(new Array[Int](0))
    val v = if (normalize) unit(vec, dim) else {
      val raw = new Array[Double](dim)
      var i = 0
      while (i < dim) { raw(i) = vec.getFloat(i).toDouble; i += 1 }
      raw
    }
    val dsub = dim / m
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val base = sub * ksub * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = base + c * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v(sub * dsub + t) - codebooks(off + t).toDouble
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(sub) = best
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** Byte-packed PQ code: [[assign]] with each index stored in one byte
    * (`ksub` ≤ 256, indices 0-255 as unsigned). Empty code on length
    * mismatch. */
  def encode(vec: ArrayData, codebooks: Array[Float], dim: Int, m: Int,
             ksub: Int): Array[Byte] = {
    val idx = assign(vec, codebooks, dim, m, ksub, true)
    pack(idx)
  }

  private def pack(idx: ArrayData): Array[Byte] = {
    val n = idx.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (idx.getInt(i) & 0xff).toByte; i += 1 }
    out
  }

  /** Normalized residual to the nearest coarse centroid (cosine-nearest,
    * ties to the lowest cell — IDENTICAL cell choice to
    * [[NearestCentroidsKernel.nearest]] with nprobe 1, so stored bucket
    * and encoded residual always agree): `v̂ - centroid(cell)`. Empty on
    * length mismatch. */
  def residual(vec: ArrayData, cents: Array[Float], dim: Int): Array[Double] = {
    val v = unit(vec, dim)
    val cell = NearestCentroidsKernel
      .nearest(vec, cents, dim, 1).getInt(0)
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = v(i) - cents(cell * dim + i).toDouble; i += 1 }
    out
  }

  /** Residual as a float array column (the residual-codebook TRAINING
    * input — downstream assign/encode must not re-normalize it). All-zero
    * inputs get the empty array: they carry no direction, are never
    * encoded (see [[encodeResidualWithBucket]]), and must not pull the
    * residual codebooks toward `-centroid`. */
  def residualVec(vec: ArrayData, cents: Array[Float], dim: Int): ArrayData = {
    if (vec.numElements() != dim || isZero(vec, dim))
      return new GenericArrayData(new Array[Float](0))
    val r = residual(vec, cents, dim)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) { out(i) = r(i).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  /** Residual-encoded PQ code (the TPAMI IVFADC form): quantize
    * `v̂ - centroid(cell)` — residuals are small, so the same codebook
    * budget spends its resolution near the data. One kernel does
    * normalize → cell → residual → assign, so nothing double-normalizes. */
  def encodeResidual(vec: ArrayData, cents: Array[Float],
                     codebooks: Array[Float], dim: Int, m: Int,
                     ksub: Int): Array[Byte] =
    encodeResidualWithBucket(vec, cents, codebooks, dim, m, ksub)
      .getBinary(1)

  /** [[encodeResidual]] plus the coarse cell it used, as one struct —
    * the index-build projection needs BOTH, and returning them together
    * lets codegen's subexpression elimination run the coarse
    * `numCentroids × dim` scan ONCE per row instead of once for the
    * bucket column and again inside the encode (the dominant per-row
    * cost of a residual index build). Wrong-length and all-zero vectors
    * get (bucket = -1, empty code) — a bucket no probe ever matches. */
  def encodeResidualWithBucket(vec: ArrayData, cents: Array[Float],
                               codebooks: Array[Float], dim: Int, m: Int,
                               ksub: Int): InternalRow = {
    if (vec.numElements() != dim || isZero(vec, dim))
      return InternalRow(-1, new Array[Byte](0))
    val v = unit(vec, dim)
    val cell = NearestCentroidsKernel.nearest(vec, cents, dim, 1).getInt(0)
    val r = new Array[Double](dim)
    var i = 0
    while (i < dim) { r(i) = v(i) - cents(cell * dim + i).toDouble; i += 1 }
    val dsub = dim / m
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      val base = sub * ksub * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = base + c * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = r(sub * dsub + t) - codebooks(off + t).toDouble
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(sub) = (best & 0xff).toByte
      sub += 1
    }
    InternalRow(cell, out)
  }

  /** ADC table for one (query, probed cell) pair under residual codes:
    * distances from the QUERY's residual to that cell
    * (`q̂ - centroid(bucket)`) to every sub-centroid. Exact identity
    * `‖q̂-x̂‖² = ‖(q̂-c) - (x̂-c)‖²` keeps the score meaning unchanged. */
  def distTableResidual(vec: ArrayData, bucket: Int, cents: Array[Float],
                        codebooks: Array[Float], dim: Int, m: Int,
                        ksub: Int): ArrayData = {
    if (vec.numElements() != dim || bucket < 0 || isZero(vec, dim))
      return new GenericArrayData(new Array[Float](0))
    val v = unit(vec, dim)
    val dsub = dim / m
    val out = new Array[Float](m * ksub)
    var sub = 0
    while (sub < m) {
      val base = sub * ksub * dsub
      var c = 0
      while (c < ksub) {
        val off = base + c * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val i = sub * dsub + t
          val diff = (v(i) - cents(bucket * dim + i).toDouble) -
            codebooks(off + t).toDouble
          d += diff * diff
          t += 1
        }
        out(sub * ksub + c) = d.toFloat
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup table for one query: `m × ksub` floats where
    * `table(sub*ksub + c)` = squared L2 distance from the normalized
    * query's subvector to sub-centroid `c`. Computed once per query row
    * (the broadcast small side); every candidate then costs `m` lookups. */
  def distTable(vec: ArrayData, codebooks: Array[Float], dim: Int, m: Int,
                ksub: Int): ArrayData = {
    if (vec.numElements() != dim || isZero(vec, dim))
      return new GenericArrayData(new Array[Float](0))
    val v = unit(vec, dim)
    val dsub = dim / m
    val out = new Array[Float](m * ksub)
    var sub = 0
    while (sub < m) {
      val base = sub * ksub * dsub
      var c = 0
      while (c < ksub) {
        val off = base + c * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v(sub * dsub + t) - codebooks(off + t).toDouble
          d += diff * diff
          t += 1
        }
        out(sub * ksub + c) = d.toFloat
        c += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: approximate cosine `1 - d²/2` where `d²` is the summed
    * table distance of the candidate's code. `ksub` is table.len / m.
    * Degenerate inputs (empty code or table) pin to -1.0 — sorted last,
    * like a zero vector under [[ExprKernels.cosineFloat]]. */
  def adcScore(table: ArrayData, code: Array[Byte]): Double = {
    val m = code.length
    if (m == 0 || table.numElements() == 0 || table.numElements() % m != 0)
      return -1.0
    val ksub = table.numElements() / m
    var d2 = 0.0
    var sub = 0
    while (sub < m) {
      d2 += table.getFloat(sub * ksub + (code(sub) & 0xff)).toDouble
      sub += 1
    }
    1.0 - d2 / 2.0
  }
}

/** pq_assign(vec) -> array<int>: per-subspace sub-centroid indices.
  * `normalize = false` is the residual-training path (input already in
  * code space). */
case class PqAssign(child: Expression, codebooks: Array[Float], dim: Int,
                    m: Int, ksub: Int, normalize: Boolean = true)
    extends UnaryExpression {
  require(m > 0 && dim % m == 0, "dim must be a multiple of m")
  require(ksub > 0 && ksub <= 256, "ksub in (0, 256]")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqKernel.assign(v.asInstanceOf[ArrayData], codebooks, dim, m, ksub, normalize)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.assign($c, $ref, $dim, $m, $ksub, $normalize)")
  }
  override protected def withNewChildInternal(c: Expression): PqAssign =
    copy(child = c)
}

/** residual_vec(vec) -> array<float>: v̂ minus its nearest coarse
  * centroid (residual-codebook training input). */
case class ResidualVec(child: Expression, cents: Array[Float], dim: Int)
    extends UnaryExpression {
  require(dim > 0, "dim must be positive")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqKernel.residualVec(v.asInstanceOf[ArrayData], cents, dim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("coarseCents", cents, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.residualVec($c, $ref, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): ResidualVec =
    copy(child = c)
}

/** pq_encode_res(vec) -> binary: residual-encoded m-byte PQ code. */
case class PqEncodeRes(child: Expression, cents: Array[Float],
                       codebooks: Array[Float], dim: Int, m: Int, ksub: Int)
    extends UnaryExpression {
  require(m > 0 && dim % m == 0, "dim must be a multiple of m")
  require(ksub > 0 && ksub <= 256, "ksub in (0, 256]")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    PqKernel.encodeResidual(v.asInstanceOf[ArrayData], cents, codebooks,
      dim, m, ksub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("coarseCents", cents, "float[]")
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.encodeResidual($c, $cref, $ref, $dim, $m, $ksub)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeRes =
    copy(child = c)
}

/** pq_encode_res_row(vec) -> struct<bucket:int, code:binary>: residual
  * code plus its coarse cell from ONE kernel call — extract both fields
  * and subexpression elimination runs the coarse scan once per row. */
case class PqEncodeResRow(child: Expression, cents: Array[Float],
                          codebooks: Array[Float], dim: Int, m: Int,
                          ksub: Int) extends UnaryExpression {
  require(m > 0 && dim % m == 0, "dim must be a multiple of m")
  require(ksub > 0 && ksub <= 256, "ksub in (0, 256]")
  override def dataType: DataType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("code", BinaryType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    PqKernel.encodeResidualWithBucket(v.asInstanceOf[ArrayData], cents,
      codebooks, dim, m, ksub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("coarseCents", cents, "float[]")
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.encodeResidualWithBucket($c, $cref, $ref, $dim, $m, $ksub)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeResRow =
    copy(child = c)
}

/** pq_dist_table_res(vec, bucket) -> array<float>: per-(query, probed
  * cell) ADC table under residual codes. */
case class PqDistTableRes(left: Expression, right: Expression,
                          cents: Array[Float], codebooks: Array[Float],
                          dim: Int, m: Int, ksub: Int)
    extends BinaryExpression {
  require(m > 0 && dim % m == 0, "dim must be a multiple of m")
  require(ksub > 0 && ksub <= 256, "ksub in (0, 256]")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any, b: Any): Any =
    PqKernel.distTableResidual(v.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], cents, codebooks, dim, m, ksub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("coarseCents", cents, "float[]")
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, (v, b) =>
      s"graft.functions.PqKernel.distTableResidual($v, $b, $cref, $ref, $dim, $m, $ksub)")
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqDistTableRes = copy(left = l, right = r)
}

/** pq_encode(vec) -> binary: m-byte PQ code. */
case class PqEncode(child: Expression, codebooks: Array[Float], dim: Int,
                    m: Int, ksub: Int) extends UnaryExpression {
  require(m > 0 && dim % m == 0, "dim must be a multiple of m")
  require(ksub > 0 && ksub <= 256, "ksub in (0, 256]")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], codebooks, dim, m, ksub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.encode($c, $ref, $dim, $m, $ksub)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** pq_dist_table(vec) -> array<float>: the query-side ADC table. */
case class PqDistTable(child: Expression, codebooks: Array[Float], dim: Int,
                       m: Int, ksub: Int) extends UnaryExpression {
  require(m > 0 && dim % m == 0, "dim must be a multiple of m")
  require(ksub > 0 && ksub <= 256, "ksub in (0, 256]")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    PqKernel.distTable(v.asInstanceOf[ArrayData], codebooks, dim, m, ksub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.distTable($c, $ref, $dim, $m, $ksub)")
  }
  override protected def withNewChildInternal(c: Expression): PqDistTable =
    copy(child = c)
}

/** pq_adc(table, code) -> double: approximate cosine of a compressed
  * candidate against an uncompressed query. */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(t: Any, c: Any): Any =
    PqKernel.adcScore(t.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) =>
      s"graft.functions.PqKernel.adcScore($t, $c)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcScore = copy(left = l, right = r)
}

/** Column-level API for the PQ expressions. */
object PqFunctions {
  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  def pq_assign(vec: Column, codebooks: Array[Float], dim: Int, m: Int,
                ksub: Int, normalize: Boolean = true): Column =
    col(PqAssign(ex(vec), codebooks, dim, m, ksub, normalize))
  def residual_vec(vec: Column, cents: Array[Float], dim: Int): Column =
    col(ResidualVec(ex(vec), cents, dim))
  def pq_encode_res(vec: Column, cents: Array[Float], codebooks: Array[Float],
                    dim: Int, m: Int, ksub: Int): Column =
    col(PqEncodeRes(ex(vec), cents, codebooks, dim, m, ksub))
  def pq_encode_res_row(vec: Column, cents: Array[Float],
                        codebooks: Array[Float], dim: Int, m: Int,
                        ksub: Int): Column =
    col(PqEncodeResRow(ex(vec), cents, codebooks, dim, m, ksub))
  def pq_dist_table_res(vec: Column, bucket: Column, cents: Array[Float],
                        codebooks: Array[Float], dim: Int, m: Int,
                        ksub: Int): Column =
    col(PqDistTableRes(ex(vec), ex(bucket), cents, codebooks, dim, m, ksub))
  def pq_encode(vec: Column, codebooks: Array[Float], dim: Int, m: Int,
                ksub: Int): Column = col(PqEncode(ex(vec), codebooks, dim, m, ksub))
  def pq_dist_table(vec: Column, codebooks: Array[Float], dim: Int, m: Int,
                    ksub: Int): Column =
    col(PqDistTable(ex(vec), codebooks, dim, m, ksub))
  def pq_adc(table: Column, code: Column): Column =
    col(PqAdcScore(ex(table), ex(code)))
}
