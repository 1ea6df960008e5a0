package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Static (Java-callable) kernels for the custom expressions below, so
 * `doGenCode` can emit a single static call and stay inside whole-stage
 * codegen — per the preference order "custom Expression with doGenCode
 * beats a Scala UDF".
 */
object ExprKernels {
  import HashFns._

  /** SimHash-64 over an array of tokens (Charikar, STOC 2002): per token,
    * a 64-bit hash votes +1/-1 on each bit; the sign of each bit-sum forms
    * the fingerprint. One pass, O(tokens * 64) bit ops. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = mix64(fnv1a(tokens.getUTF8String(i).getBytes))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** MinHash signature (Broder, SEQUENCES 1997): H per-seed minima over the
    * shingle set. One FNV pass per shingle, then H cheap mixes — O(S + S*H)
    * word ops with no per-seed re-hash of the bytes. */
  def minhashSignature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = fnv1a(shingles.getUTF8String(i).getBytes)
        var h = 0
        while (h < numHashes) {
          val v = hashSeeded(base, h.toLong)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Cosine similarity of two float vectors; NaN on length mismatch or zero
    * norm (NaN, not null, keeps nullSafeCodeGen applicable). */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /**
   * Lowercase alphanumeric tokens in one pass — semantics identical to
   * `filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")` (the
   * TextAnalysis.tokens column algebra) but ~10× faster: Catalyst
   * higher-order-function lambdas are interpreted per element, this is one
   * static call inside whole-stage codegen.
   */
  def tokensLc(text: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    tokensLc(text, false)

  /** `keepUnderscore = true` reproduces `split(lower(text), "\\W+")`
    * (Java \W treats '_' as a word char); false is the stricter
    * `[^a-z0-9]+` split the dedup/quality layer uses. */
  def tokensLc(text: org.apache.spark.unsafe.types.UTF8String,
               keepUnderscore: Boolean): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new java.util.ArrayList[AnyRef]()
    val n = s.length
    var i = 0
    var start = -1
    while (i <= n) {
      val alnum = i < n && {
        val c = s.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          (keepUnderscore && c == '_')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(org.apache.spark.unsafe.types.UTF8String.fromString(s.substring(start, i)))
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct word k-shingles (space-joined) in one pass — equals
    * `array_distinct(wordShingles(tokens, k))`; set semantics, so element
    * order is irrelevant downstream (min-hash, set intersections). */
  def shingleSet(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val words = new Array[String](n)
    var i = 0
    while (i < n) {
      words(i) = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit content fingerprint of a token array: positional polynomial
    * rolling hash (Karp-Rabin style) finalized with SplitMix64. */
  def fingerprint64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var h = FnvOffset
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) 0L else fnv1a(tokens.getUTF8String(i).getBytes)
      h = h * 0x9e3779b97f4a7c15L + t // polynomial in an odd multiplier
      i += 1
    }
    mix64(h)
  }

  private def fnvContinue(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /**
   * Hashes of every word k-gram for k = 1..n (the hashed bag-of-ngrams
   * feature map of DSIR, Xie et al. 2023): the k-gram starting at i is the
   * space-joined `tokens[i..i+k)`, hashed as mix64(fnv1a(bytes)) — exactly
   * the hash a caller would get from the joined string, but computed by
   * CONTINUING the FNV state across ' ' + next token, so an n-gram sweep
   * is one pass over the bytes instead of building n(n+1)/2 strings.
   * Null tokens hash as empty strings (cannot occur from tokens_lc).
   */
  def ngramHash64(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    var total = 0
    var i = 0
    while (i < m) { total += math.min(n, m - i); i += 1 }
    val out = new Array[Long](total)
    var idx = 0
    i = 0
    while (i < m) {
      var h = FnvOffset
      var j = i
      val jEnd = math.min(i + n, m)
      while (j < jEnd) {
        if (j > i) { h ^= ' '.toLong; h *= FnvPrime }
        if (!tokens.isNullAt(j)) h = fnvContinue(h, tokens.getUTF8String(j).getBytes)
        out(idx) = mix64(h)
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Feature-hash bucket ids for an array of 64-bit hashes: bucket =
   * hash mod 2^k (the low k bits — two's complement makes this identical
   * for the signed and unsigned readings of the hash, which is what lets
   * the DuckDB oracle mirror it as `h % buckets` in the unsigned domain).
   * `distinct = true` returns each bucket once, ascending (presence
   * features, classifier-style); false keeps multiplicity (count
   * features, DSIR-style).
   */
  def hashBuckets(hashes: ArrayData, buckets: Int, distinct: Boolean): ArrayData = {
    val mask = buckets - 1
    val n = hashes.numElements()
    if (!distinct) {
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = if (hashes.isNullAt(i)) 0 else (hashes.getLong(i) & mask).toInt
        i += 1
      }
      new GenericArrayData(out)
    } else if (buckets <= 4096) {
      // dense presence bitmap: O(buckets) zero+sweep is cheap at this size
      // and beats sorting when rows carry many features
      val seen = new Array[Boolean](buckets)
      var cnt = 0
      var i = 0
      while (i < n) {
        val b = if (hashes.isNullAt(i)) 0 else (hashes.getLong(i) & mask).toInt
        if (!seen(b)) { seen(b) = true; cnt += 1 }
        i += 1
      }
      val out = new Array[Int](cnt)
      var b = 0
      var k = 0
      while (b < buckets) {
        if (seen(b)) { out(k) = b; k += 1 }
        b += 1
      }
      new GenericArrayData(out)
    } else {
      // large bucket domains (cap 2^24): a dense seen[] would zero and
      // sweep 16M slots per ROW regardless of how few features the row
      // has. Sort the (few) ids and drop adjacent repeats instead —
      // O(n log n) in the row's feature count, independent of `buckets`,
      // same ascending-distinct output as the dense path.
      val ids = new Array[Int](n)
      var i = 0
      while (i < n) {
        ids(i) = if (hashes.isNullAt(i)) 0 else (hashes.getLong(i) & mask).toInt
        i += 1
      }
      java.util.Arrays.sort(ids)
      var cnt = 0
      i = 0
      while (i < n) {
        if (i == 0 || ids(i) != ids(i - 1)) cnt += 1
        i += 1
      }
      val out = new Array[Int](cnt)
      var k = 0
      i = 0
      while (i < n) {
        if (i == 0 || ids(i) != ids(i - 1)) { out(k) = ids(i); k += 1 }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Integer dot product of bucket-id features against a baked model
    * table: sum of `table(id)` over the ids (ids out of range contribute
    * 0, defensively). Model state lives in the plan like the IVF coarse
    * quantizer — scoring is a pure projection: no join, no shuffle. */
  def bucketDot(ids: ArrayData, table: Array[Long]): Long = {
    val n = ids.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (!ids.isNullAt(i)) {
        val b = ids.getInt(i)
        if (b >= 0 && b < table.length) s += table(b)
      }
      i += 1
    }
    s
  }
}

object SrpKernel {
  import HashFns._

  /** Signed-random-projection sign bits (Charikar, STOC 2002): bit j is
    * the sign of a seeded pseudo-random linear combination of the vector.
    * Weights come from the deterministic seeded hash, so signatures are
    * stable across JVMs/partitions (shuffle-key safe). */
  def srpSign(vec: ArrayData, bits: Int): Long = {
    val n = vec.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val w = (hashSeeded(mix64(i.toLong), j.toLong) % 1000L) / 1000.0
        acc += vec.getFloat(i).toDouble * w
        i += 1
      }
      if (acc > 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** srp_sign(array<float>, bits) -> long: SRP-LSH sign-bit signature. */
case class SrpSign(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 64, "bits in (0, 64]")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SrpKernel.srpSign(v.asInstanceOf[ArrayData], bits)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SrpKernel.srpSign($c, $bits)")
  override protected def withNewChildInternal(c: Expression): SrpSign = copy(child = c)
}

object NearestCentroidsKernel {
  /**
   * Top-`nprobe` centroid indices for `vec` by cosine, ties by ascending
   * index. `centroids` is a flattened row-major (C × dim) matrix — model
   * state baked into the plan (the IVF coarse quantizer), so cell
   * assignment is a pure projection: no join, no shuffle.
   */
  def nearest(vec: ArrayData, centroids: Array[Float], dim: Int,
              nprobe: Int): ArrayData = {
    val n = vec.numElements()
    val c = if (dim > 0) centroids.length / dim else 0
    if (n != dim || c == 0) return new GenericArrayData(new Array[Int](0))
    var vn = 0.0
    var i = 0
    while (i < n) { val x = vec.getFloat(i).toDouble; vn += x * x; i += 1 }
    val scores = new Array[Double](c)
    var ci = 0
    while (ci < c) {
      var dot = 0.0; var cn = 0.0
      val off = ci * dim
      var j = 0
      while (j < dim) {
        val x = vec.getFloat(j).toDouble
        val y = centroids(off + j).toDouble
        dot += x * y; cn += y * y
        j += 1
      }
      scores(ci) = if (vn == 0.0 || cn == 0.0) Double.NegativeInfinity
                   else dot / (math.sqrt(vn) * math.sqrt(cn))
      ci += 1
    }
    val k = math.min(nprobe, c)
    val idx = Array.range(0, c).sortBy(i => (-scores(i), i)).take(k)
    new GenericArrayData(idx)
  }
}

/** nearest_centroids(vec) -> array<int>: top-nprobe IVF cell indices. */
case class NearestCentroids(child: Expression, centroids: Array[Float],
                            dim: Int, nprobe: Int)
    extends UnaryExpression {
  require(dim > 0 && nprobe > 0, "dim and nprobe must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    NearestCentroidsKernel.nearest(v.asInstanceOf[ArrayData], centroids, dim, nprobe)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroidsKernel.nearest($c, $ref, $dim, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}

/** tokens_lc(string) -> array<string>: lowercase alphanumeric tokens. */
case class TokensLc(child: Expression, keepUnderscore: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExprKernels.tokensLc(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], keepUnderscore)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprKernels.tokensLc($c, $keepUnderscore)")
  override protected def withNewChildInternal(c: Expression): TokensLc = copy(child = c)
}

/** shingle_set(array<string>, k) -> array<string>: distinct word k-shingles. */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 64, "k in (0, 64]")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExprKernels.shingleSet(v.asInstanceOf[ArrayData], k)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.shingleSet($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
}

/** simhash64(array<string>) -> long */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ExprKernels.simhash64(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** minhash_sig(array<string>, H) -> array<long> (length H) */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 1024, "numHashes in (0, 1024]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExprKernels.minhashSignature(v.asInstanceOf[ArrayData], numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprKernels.minhashSignature($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** cosine_sim(array<float>, array<float>) -> double (NaN on mismatch) */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprKernels.cosineFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** fingerprint64(array<string>) -> long */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ExprKernels.fingerprint64(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.fingerprint64($c)")
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)
}

/** ngram_hash64(array<string>, n) -> array<long>: mix64∘fnv1a of every
  * space-joined word k-gram, k = 1..n (hashed bag-of-ngrams features). */
case class NgramHash64(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 8, "n in (0, 8]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExprKernels.ngramHash64(v.asInstanceOf[ArrayData], n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.ngramHash64($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramHash64 = copy(child = c)
}

/** hash_buckets(array<long>, buckets, distinct) -> array<int>: feature-hash
  * bucket ids (hash mod 2^k). Power-of-two bucket counts only, so the
  * signed/unsigned readings agree and the SQL mirror is a plain `%`. */
case class HashBuckets(child: Expression, buckets: Int, distinct: Boolean)
    extends UnaryExpression {
  require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 24),
    "buckets must be a power of two in (0, 2^24]")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExprKernels.hashBuckets(v.asInstanceOf[ArrayData], buckets, distinct)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprKernels.hashBuckets($c, $buckets, $distinct)")
  override protected def withNewChildInternal(c: Expression): HashBuckets = copy(child = c)
}

/** bucket_dot(array<int>) -> long: integer dot product of bucket-id
  * features against a model table baked into the plan (the DSIR λ-table /
  * classifier weight vector) — scoring is a narrow projection. */
case class BucketDot(child: Expression, table: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ExprKernels.bucketDot(v.asInstanceOf[ArrayData], table)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("table", table, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.bucketDot($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BucketDot = copy(child = c)
}

object BpeKernel {
  import org.apache.spark.unsafe.types.UTF8String

  /** Merge-rank lookup key for an adjacent symbol pair. NUL can't occur in
    * symbols (they come from [a-z0-9] tokens), so the key is injective. */
  def pairKey(a: String, b: String): String = a + "\u0000" + b

  /** Rank map for [[bpeEncode]] from an ordered merge list (rank = learn
    * order; lower merges first) — built once per plan and baked into the
    * expression as model state, like the IVF centroid matrix. */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(pairKey(a, b), i) }
    m
  }

  /** One BPE training step applied to one word's symbol array: merge every
    * occurrence of the adjacent pair (a, b) into a+b, leftmost-first,
    * non-overlapping (the Sennrich 2016 update; "aaa" under (a,a) →
    * ["aa", "a"]). */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return syms
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      // null elements (possible via the SQL-registered form) are skipped,
      // matching encodeTokens — the declared element type is non-null
      if (syms.isNullAt(i)) { i += 1 }
      else if (i < n - 1 && !syms.isNullAt(i + 1) &&
          syms.getUTF8String(i).equals(a) &&
          syms.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(syms.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Canonical BPE encode of one word (chars → subwords): repeatedly find
    * the LOWEST-rank adjacent pair present and merge all its occurrences
    * (leftmost-first), until no learned pair applies — the standard
    * inference loop of subword tokenizers. */
  def encodeWordInto(w: String, ranks: java.util.HashMap[String, Integer],
                     out: java.util.ArrayList[UTF8String]): Unit = {
    var parts = new Array[String](w.length)
    var c = 0
    while (c < w.length) { parts(c) = String.valueOf(w.charAt(c)); c += 1 }
    var done = parts.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.get(pairKey(parts(i), parts(i + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val a = parts(bestAt)
        val b = parts(bestAt + 1)
        val merged = new java.util.ArrayList[String](parts.length)
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
            merged.add(a + b); j += 2
          } else { merged.add(parts(j)); j += 1 }
        }
        parts = merged.toArray(new Array[String](merged.size()))
        done = parts.length < 2
      }
    }
    var k = 0
    while (k < parts.length) { out.add(UTF8String.fromString(parts(k))); k += 1 }
  }

  /** Encode every token of a document and concatenate the subword streams
    * — one doc-level array in, one subword array out, shuffle-free. */
  def encodeTokens(tokens: ArrayData,
                   ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n * 2)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i))
        encodeWordInto(tokens.getUTF8String(i).toString, ranks, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** bpe_merge_pair(array<string>) -> array<string>: one training-step merge
  * of the constant pair (a, b), leftmost-first non-overlapping. */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String
  private lazy val ua = UTF8String.fromString(a)
  private lazy val ub = UTF8String.fromString(b)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BpeKernel.mergePair(v.asInstanceOf[ArrayData], ua, ub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("bpeA", ua, "org.apache.spark.unsafe.types.UTF8String")
    val refB = ctx.addReferenceObj("bpeB", ub, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.mergePair($c, $refA, $refB)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMergePair =
    copy(child = c)
}

/** bpe_encode(array<string>) -> array<string>: canonical BPE inference
  * with the learned merge table baked in as model state. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  private lazy val ranks = BpeKernel.ranksOf(merges)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    BpeKernel.encodeTokens(v.asInstanceOf[ArrayData], ranks)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernel.encodeTokens($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

/** Column-level API for the custom expressions + SQL registration. */
object GraftFunctions {
  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  def srp_sign(vec: Column, bits: Int): Column = col(SrpSign(ex(vec), bits))
  def nearest_centroids(vec: Column, centroids: Array[Float], dim: Int,
                        nprobe: Int): Column =
    col(NearestCentroids(ex(vec), centroids, dim, nprobe))
  def tokens_lc(text: Column): Column = col(TokensLc(ex(text)))
  /** \W+-compatible tokenization (underscore is a word char). */
  def tokens_word(text: Column): Column = col(TokensLc(ex(text), keepUnderscore = true))
  def shingle_set(tokens: Column, k: Int): Column = col(ShingleSet(ex(tokens), k))
  def simhash64(tokens: Column): Column = col(SimHash64(ex(tokens)))
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    col(MinHashSignature(ex(shingles), numHashes))
  def cosine_sim(a: Column, b: Column): Column =
    col(CosineSimilarity(ex(a), ex(b)))
  def fingerprint64(tokens: Column): Column = col(Fingerprint64(ex(tokens)))
  def ngram_hash64(tokens: Column, n: Int): Column = col(NgramHash64(ex(tokens), n))
  def hash_buckets(hashes: Column, buckets: Int, distinct: Boolean = false): Column =
    col(HashBuckets(ex(hashes), buckets, distinct))
  def bucket_dot(ids: Column, table: Array[Long]): Column =
    col(BucketDot(ex(ids), table))
  def bpe_merge_pair(syms: Column, a: String, b: String): Column =
    col(BpeMergePair(ex(syms), a, b))
  def bpe_encode(tokens: Column, merges: Seq[(String, String)]): Column =
    col(BpeEncode(ex(tokens), merges))

  /** Register SQL names so `spark.sql("SELECT simhash64(...)")` works on
    * an already-created session (the extension path is
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
