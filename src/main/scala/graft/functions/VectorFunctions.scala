package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expressions for the hot inner loops of the dedup/ANN
  * operators. The composable higher-order-function versions (`transform` /
  * `aggregate` lambdas) are interpreted per element per row; these run one
  * tight JVM loop per row and allocate only the output array. Registered
  * as SQL functions by [[graft.plans.GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * All parameters are compile-time constants baked into the expression,
  * so results are reproducible across runs, executors, and cluster sizes.
  */
object VectorFunctions {

  /** Affine minhash permutation parameters (a, b) over prime p = 2^31-1.
    * Must stay in sync with [[graft.ops.Dedup.minHashParams]].
    */
  val MinHashPrime: Long = 2147483647L
  def params(k: Int): Array[(Long, Long)] =
    Array.tabulate(k)(i => (2L * i + 1, (i.toLong * 104729 + 12345) % MinHashPrime))

  /** Analysis-time input check shared by the expressions below: a wrong
    * argument type fails with a clear message at analysis rather than an
    * executor-side ClassCastException.
    */
  private[functions] def requireInput(fn: String, dt: DataType,
                                      want: String)
                                     (ok: DataType => Boolean): TypeCheckResult =
    if (ok(dt)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires $want, got ${dt.catalogString}")

  private[functions] def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private[functions] def isFloatVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Engine-portable hashing for expressions whose OUTPUT must be
    * reproducible by the DuckDB oracle: the first bytes of md5 equal the
    * leading hex digits of `md5()` in any engine, so
    * `CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)` is an exact SQL twin
    * (murmur3 seeds are Spark-private and unverifiable). ThreadLocal —
    * expression instances can be shared across local-mode task threads.
    */
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as an unsigned 32-bit value in a Long. */
  private[functions] def md5Prefix32(bytes: Array[Byte]): Long = {
    val d = md5Digest.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** First 8 md5 bytes as a big-endian Long (= hex digits 1-16). */
  private[functions] def md5Prefix64(bytes: Array[Byte]): Long = {
    val d = md5Digest.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v
  }
}

/** `graft_minhash(shingles, k)`: k-permutation minhash signature of a
  * string array — single pass over shingles, k running minimums.
  * Hash = murmur3(bytes, seed 42), matching the built-in `hash()`.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_minhash", child.dataType,
      "array<string>")(VectorFunctions.isStringArray)

  @transient private lazy val ab = VectorFunctions.params(numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = math.abs(Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong)
      var k = 0
      while (k < numHashes) {
        val v = (ab(k)._1 * h + ab(k)._2) % VectorFunctions.MinHashPrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingles(text, n)`: distinct word n-gram shingles, one pass.
  *
  * Tokenization is `trim(text).split("\\s+")` — Java regex semantics,
  * identical to the built-in `split(trim(text), '\\s+')` and DuckDB's
  * `string_split_regex(trim(text), '\s+')` — then n-grams joined with a
  * single space, first-occurrence-distinct. Replaces a
  * transform/sequence/element_at lambda pipeline in which projection
  * collapse re-evaluated the tokenizing split for every element_at call
  * (~50x the work per document).
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_shingles", child.dataType,
      "string")(_ == StringType)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash(tokens)`: 64-bit simhash over md5-prefix token hashes —
  * bit i of the result is set when more tokens have bit i set than clear.
  * Single pass, 64 counters; tokens should be pre-deduplicated upstream
  * when set semantics are wanted.
  *
  * Token hash = first 8 md5 bytes, making the signature engine-portable:
  * the DuckDB oracle rebuilds the identical bits from
  * `substr(md5(token), 1, 8)` / `(9, 8)` as the hi/lo 32-bit halves, so
  * the pair set (exhaustive for hamming<=3 by the 4-chunk pigeonhole) is
  * exactly verifiable.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_simhash", child.dataType,
      "array<string>")(VectorFunctions.isStringArray)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = VectorFunctions.md5Prefix64(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_ngrams(text, n)`: ALL word n-grams in order (non-distinct) —
  * the counting companion to [[WordShingles]] for repetition statistics,
  * where duplicate n-grams are the signal, not noise.
  */
case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_ngrams", child.dataType,
      "string")(_ == StringType)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bandbuckets(sig, bands)`: LSH band bucket ids from a minhash
  * signature — band b's bucket is a mixed hash of its signature slice,
  * computed long-to-long in one pass (the `transform`/`slice`/`concat_ws`
  * formulation built 8 strings per row and hashed their bytes).
  * Exact-slice-equality semantics: two signatures land in the same bucket
  * for band b iff their slices match (modulo 64-bit mix collisions).
  */
case class BandBuckets(child: Expression, bands: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_bandbuckets", child.dataType,
      "array<bigint>")(dt => dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    })

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    if (bands <= 0 || k % bands != 0)
      throw new IllegalArgumentException(
        s"graft_bandbuckets: signature length $k is not divisible into " +
          s"$bands bands; trailing elements would be silently ignored")
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix(b.toLong) // band seed so identical slices in different bands differ
      var i = b * rows
      val end = i + rows
      while (i < end) { h = mix(h ^ arr.getLong(i)); i += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_eqfrac(a, b)`: fraction of positions where two bigint arrays
  * agree — the minhash Jaccard estimate, one tight loop per candidate
  * pair instead of an interpreted `zip_with` + `filter` lambda chain.
  */
case class LongArrayAgreement(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val l = VectorFunctions.requireInput("graft_eqfrac", left.dataType,
      "array<bigint>")(ok)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorFunctions.requireInput("graft_eqfrac", right.dataType,
      "array<bigint>")(ok)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n.toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_repstats(text, n)`: per-document n-gram repetition statistics
  * in one pass — struct(n_ngrams, top_count, n_distinct), null when the
  * document has fewer than n tokens. Replaces an explode + two-level
  * aggregation (a shuffle of every gram occurrence) with a narrow
  * projection: at corpus scale the repetition filter runs at scan speed.
  */
case class RepetitionStats(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_repstats", child.dataType,
      "string")(_ == StringType)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.split("\\s+")
    val total = toks.length - n + 1
    if (total <= 0) return null
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total.toLong, top.toLong, counts.size.toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_tokstats(text, stopCsv)`: whitespace-token statistics in one
  * pass — struct(n_tokens, n_stop, n_distinct), where n_stop counts token
  * occurrences in the comma-separated `stopCsv` list (empty list → 0).
  * Tokenization matches `split(trim(text), '\s+')` (empty text → one
  * empty token), so ratios derived from the struct hash-match the DuckDB
  * `string_split_regex` oracles. Replaces interpreted
  * `filter(toks, x -> x IN (...))` lambdas in the quality/langid hot
  * paths — and, being a non-cheap struct producer, is never duplicated
  * by CollapseProject, so the document is tokenized exactly once however
  * many fields downstream projections extract.
  */
case class TokenStats(child: Expression, stopCsv: String)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_tokstats", child.dataType,
      "string")(_ == StringType)

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopCsv.split(",").foreach(t => if (t.nonEmpty) s.add(t))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.split("\\s+")
    val distinct = new java.util.HashSet[String](toks.length * 2)
    var stop = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!stopSet.isEmpty && stopSet.contains(t)) stop += 1
      distinct.add(t)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, stop, distinct.size.toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_winnow(text, k, w)`: winnowing document fingerprints
  * (Schleimer et al., SIGMOD'03 — the MOSS local fingerprinting
  * algorithm): hash all word k-grams, slide a window of w consecutive
  * hashes, record each window's minimum (rightmost on ties). Guarantees
  * any shared run of >= w+k-1 tokens between two documents yields a
  * shared fingerprint, at ~2/(w+1) sampling density. Returns the
  * distinct selected hashes, sorted ascending.
  *
  * K-gram hash = first 4 md5 bytes (unsigned 32-bit), so the DuckDB
  * oracle reproduces fingerprints exactly via
  * `CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)` + a sliding window
  * min. Rightmost-on-ties only affects WHICH index is selected, never the
  * selected VALUE, so the distinct value set equals the distinct
  * window-min set — SQL-expressible without the tie-break.
  */
case class Winnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_winnow", child.dataType,
      "string")(_ == StringType)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.split("\\s+")
    val nGrams = toks.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      hashes(i) = VectorFunctions.md5Prefix32(bytes)
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    val lastStart = math.max(nGrams - w, 0)
    while (start <= lastStart) {
      val end = math.min(start + w, nGrams)
      var minIdx = start
      var j = start + 1
      while (j < end) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost minimum
        j += 1
      }
      selected.add(hashes(minIdx))
      start += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_signbuckets(embedding, bands, bitsPerBand)`: sign-random-
  * projection LSH band buckets. The Rademacher plane matrix is derived
  * once per expression instance from a fixed seed (never per row — the
  * HOF formulation recomputed bands*bits*dims hashes per row).
  */
case class SignBuckets(child: Expression, bands: Int, bitsPerBand: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_signbuckets", child.dataType,
      "array<float> or array<double>")(VectorFunctions.isFloatVector)

  private val planes = bands * bitsPerBand

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // signs(p)(j) lazily grown to the widest row seen; values depend only on
  // (p, j) so late growth is consistent across partitions
  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()

  private def signRow(p: Int, dims: Int): Array[Double] = {
    val cached = signCache.get(p)
    if (cached != null && cached.length >= dims) cached
    else {
      val row = Array.tabulate(math.max(dims, 64)) { j =>
        // xxhash-free deterministic Rademacher: splitmix64 of (p, j)
        var z = p.toLong * 131 + j + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (((z >>> 7) & 1L) == 1L) 1.0 else -1.0
      }
      signCache.put(p, row)
      row
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val bits = new Array[Boolean](planes)
    var p = 0
    while (p < planes) {
      val signs = signRow(p, dims)
      var acc = 0.0
      var j = 0
      while (j < dims) {
        val v = if (elementIsFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        acc += v * signs(j)
        j += 1
      }
      bits(p) = acc >= 0
      p += 1
    }
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var v = 0L
      var i = 0
      while (i < bitsPerBand) {
        if (bits(b * bitsPerBand + i)) v |= (1L << i)
        i += 1
      }
      buckets(b) = v
      b += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_adc(codes, lut, ksub)`: product-quantization asymmetric
  * distance — sum over blocks b of `lut[b*ksub + codes[b]]` (0-based),
  * accumulated left-to-right in double, so results are bit-identical to
  * the interpreted `aggregate(transform(codes, (c, b) ->
  * element_at(lut, b*ksub + c + 1)), 0D, (a, x) -> a + x)` chain it
  * replaces — but one tight array walk per (code row × query LUT) pair
  * instead of per-element interpreted lambdas on the hottest scan of the
  * PQ path ([[graft.ops.Similarity.pqTopK]]).
  */
case class AdcDistance(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorFunctions.requireInput("graft_adc", left.dataType,
      "array<int>")(dt => dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorFunctions.requireInput("graft_adc", right.dataType,
      "array<double>")(dt => dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var b = 0
    while (b < m) {
      acc += lut.getDouble(b * ksub + codes.getInt(b))
      b += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_outerprod(vec, scale)`: upper-triangle outer product of a
  * vector with itself as (i, j, v) cells, v = floor(x_i * x_j * scale) —
  * the per-row contribution to an ORDER-FREE integer gram matrix.
  * Flooring each cell before the sum (the repo's scaled-sum recipe)
  * makes the aggregate exact and engine-portable: float→double widening,
  * the double product, the scale multiply, and floor are all
  * IEEE-deterministic, so DuckDB reproduces every cell bit-for-bit.
  * One tight d²/2 loop per row; downstream partial aggregation collapses
  * the explode to d(d+1)/2 cells per partition before any shuffle.
  */
case class OuterProduct(child: Expression, scale: Double)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_outerprod", child.dataType,
      "array<float> or array<double>")(VectorFunctions.isFloatVector)

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val d = a.numElements()
    val xs = new Array[Double](d)
    var t = 0
    while (t < d) {
      xs(t) = if (isFloat) a.getFloat(t).toDouble else a.getDouble(t)
      t += 1
    }
    val out = new Array[Any](d * (d + 1) / 2)
    var z = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(z) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, j, math.floor(xs(i) * xs(j) * scale).toLong))
        z += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_matveccenter(vec, flat)`: centered matrix-vector product —
  * y_c = Σ_d M[c·dim + d] · (x_d − mean_d), with `flat` laid out as the
  * row-major k×dim matrix followed by the dim-length mean vector
  * (flat.length = (k+1)·dim). One tight k·dim loop per row — the
  * projection step of PCA whitening over a broadcast-literal matrix,
  * replacing a per-row interpreted transform/aggregate lambda chain.
  */
case class MatVecCenter(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorFunctions.requireInput("graft_matveccenter", left.dataType,
      "array<float> or array<double>")(VectorFunctions.isFloatVector)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorFunctions.requireInput("graft_matveccenter", right.dataType,
      "array<double>")(dt => dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
  }

  @transient private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val flat = r.asInstanceOf[ArrayData]
    val dim = x.numElements()
    require(flat.numElements() % dim == 0 && flat.numElements() >= 2 * dim,
      s"graft_matveccenter: flat length ${flat.numElements()} is not (k+1)*$dim")
    val k = flat.numElements() / dim - 1
    val meanOff = k * dim
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val xd = if (leftIsFloat) x.getFloat(d).toDouble else x.getDouble(d)
        acc += flat.getDouble(c * dim + d) * (xd - flat.getDouble(meanOff + d))
        d += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot(a, b)`: sequential-fold double dot product of two numeric
  * arrays — bit-identical to the `aggregate(zip_with(...))` formulation
  * (left-to-right double accumulation) but one tight loop per row.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorFunctions.requireInput("graft_dot", left.dataType,
      "array<float> or array<double>")(VectorFunctions.isFloatVector)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorFunctions.requireInput("graft_dot", right.dataType,
      "array<float> or array<double>")(VectorFunctions.isFloatVector)
  }

  @transient private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_rproject(vec, dOut)`: Johnson-Lindenstrauss sign random
  * projection to `dOut` dims as exact BIGINT sums —
  * `out_j = sum_i s(j,i) * floor(v_i * 10^6)` with the +-1 sign drawn
  * from an md5 recipe both engines can derive independently:
  * `s(j,i) = +1 iff` the first hex nibble of `md5("rp:j:i")` is `< 8`.
  * Flooring each cell BEFORE the sum makes the result
  * reduction-order-free (the r5 gram-matrix recipe); the caller divides
  * the BIGINT once by `10^6 * sqrt(dOut)` for the unbiased estimate, so
  * the only float op is one final portable division. The sign matrix is
  * dOut x dim constants — computed once per (instance, dim) and cached,
  * never per row.
  */
case class SignedProjection(child: Expression, dOut: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.requireInput("graft_rproject", child.dataType,
      "array<float> or array<double>")(VectorFunctions.isFloatVector)

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private var signDim: Int = -1
  @transient private var signs: Array[Array[Int]] = _

  private def signMatrix(dim: Int): Array[Array[Int]] = {
    if (signDim != dim) {
      signs = Array.tabulate(dOut, dim) { (j, i) =>
        val nib = (VectorFunctions.md5Prefix32(
          s"rp:$j:$i".getBytes("UTF-8")) >>> 28) & 0xfL
        if (nib < 8) 1 else -1
      }
      signDim = dim
    }
    signs
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val s = signMatrix(dim)
    val out = new Array[Long](dOut)
    var i = 0
    while (i < dim) {
      val cell = math.floor(
        (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) * 1e6).toLong
      var j = 0
      while (j < dOut) {
        out(j) += s(j)(i) * cell
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
