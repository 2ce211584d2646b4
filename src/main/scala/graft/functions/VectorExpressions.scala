package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.sql.graft.Bridge

/** Native vector kernels for the similarity/dedup hot paths.
  *
  * The composable `zip_with`/`aggregate` formulation is correct but
  * allocates an intermediate array per pair — at 25M candidate pairs the
  * allocation dominates. These expressions evaluate directly over
  * `ArrayData` in a tight loop, stay inside whole-stage codegen via a
  * static-method call, and turned the sf0.1 embedding-dedup pass from
  * ~64 s to seconds. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Called from generated code. Arrays must be array<double> of equal
    * length — a silent min-length truncation would let corrupted vectors
    * produce plausible-but-wrong scores. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"dot_product dimensionality mismatch: $n vs ${b.numElements()}")
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}

/** Integer dot product over int8-quantized vectors (array<byte>) — the
  * memory-scale ANN kernel: 8× smaller resident vectors than
  * array<double> with exact integer accumulation (max 127·127·dims per
  * pair, nowhere near Long overflow), so the quantized score is
  * bit-deterministic across engines and partitionings. */
case class ByteDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    ByteDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ByteDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDot =
    copy(left = newLeft, right = newRight)
}

object ByteDot {
  /** Called from generated code. Arrays must be array<byte> of equal
    * length (same no-truncation contract as [[DotProduct.dot]]). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"byte_dot dimensionality mismatch: $n vs ${b.numElements()}")
    }
    var s = 0L
    var i = 0
    while (i < n) { s += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    s
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(ByteDot(Bridge.expression(a), Bridge.expression(b)))
}

/** Intersection count of two SORTED-ASCENDING distinct `array<long>`
  * sets in one two-pointer pass — the r3 "sorted-kernel verify" shape,
  * resurrected (r13 verdict #5) behind [[graft.dedup.Dedup]]'s
  * corpus-size switch: at locally testable scales the per-doc
  * `array_sort` this kernel requires was MEASURED to cost more than the
  * per-pair `array_intersect` it replaces (r3 dead-end note — when
  * candidates ≈ O(docs) the sort of big shingle arrays dominates), but
  * on a candidate-pruned verify side (candidates ≪ corpus, the 100 TB
  * regime) each doc is sorted once and every pair it appears in pays a
  * primitive-long merge with no per-pair set allocation. Count-equal to
  * `size(array_intersect(a, b))` on distinct inputs (spec-asserted). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Called from generated code. Both arrays must be ascending long
    * arrays with distinct elements. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var c = 0L
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val xa = a.getLong(i)
      val xb = b.getLong(j)
      if (xa == xb) { c += 1L; i += 1; j += 1 }
      else if (xa < xb) i += 1
      else j += 1
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a),
      Bridge.expression(b)))
}

/** Sparse dot product + intersection count over two sparse vectors in
  * PARALLEL-ARRAY layout: (aKeys, aW, bKeys, bW), keys ascending,
  * all `array<long>`. One two-pointer merge per pair over primitive
  * longs — no per-element struct wrappers, no string compares, no
  * per-pair allocation beyond the 2-element result — inside
  * whole-stage codegen. Exists because the equivalent formulations are
  * measured r12 dead weight on doc_similar at sf0.1: (a) explode +
  * term equijoin + per-pair re-aggregation pushes Σ_term df² partials
  * (5.7·10⁷ rows) through a 3.2M-group hash aggregate = 24–32 s of a
  * 35 s query; (b) a struct-array merge kernel
  * (array<struct<term,w>>, UTF8String compares) still pays an
  * InternalRow wrapper PER ELEMENT touched — 2·10⁸ allocations, ~11 s.
  * KEY CONTRACT: keys are 64-bit term hashes (xxhash64(lang, term) —
  * lang-salted so the collision domain is one language's banded
  * vocabulary, the same domain the pair join blocks on), and the
  * kernel REQUIRES them injective over that domain: a collision would
  * merge two terms' contributions Spark-side only, and since the
  * DuckDB oracle joins exact terms it would land as a hash-gate
  * mismatch rather than a documented approximation. Callers therefore
  * verify injectivity outright before building keys
  * (TextOps.requireInjectiveTermHash — a vocab-sized aggregate that
  * turns the ~10⁻¹⁵ event into a loud, named error; spec-proven to
  * fire on a planted colliding hash). Returns `[dot, n_common]` as
  * array<long>. */
case class SparseDotCounts(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sparse_dot_counts"

  override def nullSafeEval(ak: Any, aw: Any, bk: Any, bw: Any): Any =
    SparseDotCounts.merge(ak.asInstanceOf[ArrayData],
      aw.asInstanceOf[ArrayData], bk.asInstanceOf[ArrayData],
      bw.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ak, aw, bk, bw) =>
      s"graft.functions.SparseDotCounts.merge($ak, $aw, $bk, $bw)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SparseDotCounts =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object SparseDotCounts {
  /** Called from generated code. Keys must be ascending; aK/aW and
    * bK/bW must be same-length parallel arrays (same no-truncation
    * contract as [[DotProduct.dot]]). */
  def merge(aK: ArrayData, aW: ArrayData, bK: ArrayData,
      bW: ArrayData): ArrayData = {
    val na = aK.numElements()
    val nb = bK.numElements()
    if (aW.numElements() != na || bW.numElements() != nb) {
      throw new IllegalArgumentException(
        s"sparse_dot_counts parallel-array mismatch: " +
          s"$na/${aW.numElements()} vs $nb/${bW.numElements()}")
    }
    var dot = 0L
    var common = 0L
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val ka = aK.getLong(i)
      val kb = bK.getLong(j)
      if (ka == kb) {
        dot += aW.getLong(i) * bW.getLong(j)
        common += 1L
        i += 1; j += 1
      } else if (ka < kb) i += 1
      else j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(dot, common))
  }

  def apply(aK: Column, aW: Column, bK: Column, bW: Column): Column =
    Bridge.column(SparseDotCounts(Bridge.expression(aK),
      Bridge.expression(aW), Bridge.expression(bK), Bridge.expression(bW)))
}

/** Int8 symmetric scalar quantization of a double vector in ONE linear
  * pass: `q_i = floor(v_i · 127 / max_j|v_j| + 0.5)` (half-up via
  * floor — engine-identical, unlike round()), zero/empty vectors → all
  * zeros. Exists because the SQL formulation
  * (`transform(v, x -> floor(x*127/mx + 0.5))` over an `mx` alias) gets
  * its `array_max(transform(v, abs))` subexpression INLINED into the
  * per-element lambda by alias substitution — predicate pushdown of a
  * `qnrm > 0` filter then re-derives the whole chain inside the filter
  * condition, turning the encode into O(dim²) work per row evaluated
  * several times per row (measured r12: knn_quantized 0.57 s → 3–4.7 s
  * at sf0.1). The kernel computes the max and the codes in two tight
  * loops, allocates once, and stays in whole-stage codegen. The double
  * arithmetic is the IDENTICAL IEEE expression sequence
  * ((x·127)/mx + 0.5, floor) as the SQL/DuckDB oracle formulation, so
  * the codes remain oracle-reproducible bit-exactly. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.ByteType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeInt8.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Called from generated code. Input must be array<double>. */
  def encode(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > mx) mx = a
      i += 1
    }
    if (mx != 0.0) {
      i = 0
      while (i < n) {
        // same IEEE op order as the oracle SQL: (x*127.0)/mx + 0.5, floor
        out(i) = math.floor(v.getDouble(i) * 127.0 / mx + 0.5).toLong.toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(c: Column): Column =
    Bridge.column(QuantizeInt8(Bridge.expression(c)))
}

/** 64-bit SimHash over an array of 64-bit token hashes: majority vote per
  * bit position (Charikar '02). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Character bigrams of a string as packed int codes
  * `(char[i] << 16) | char[i+1]` — one linear pass. The SQL formulations
  * (`substring(text, i, 2)` per position = O(n²) UTF8 scans; `split` on
  * the empty pattern = regex per char) are both quadratic-or-worse on
  * long documents. */
case class CharBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "char_bigrams"

  override def nullSafeEval(input: Any): Any =
    CharBigrams.bigrams(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharBigrams.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}

object CharBigrams {
  /** Called from generated code. */
  def bigrams(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = s.toString
    val n = math.max(str.length - 1, 0)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (str.charAt(i) << 16) | str.charAt(i + 1)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(c: Column): Column =
    Bridge.column(CharBigrams(Bridge.expression(c)))
}

/** 64-bit hashes of all character n-grams of a string, one linear pass
  * with a rolling window (splitmix64-finalized). The char-level analogue
  * of word shingling for near-dup detection on languages without
  * whitespace tokenization. */
case class CharNGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    CharNGramHashes.hashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNGramHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNGramHashes =
    copy(child = newChild)
}

object CharNGramHashes {
  /** Called from generated code. */
  def hashes(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val count = math.max(str.length - n + 1, 0)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0L
      var j = 0
      while (j < n) { h = h * 131 + str.charAt(i + j); j += 1 }
      // splitmix64 finalizer for avalanche
      h += 0x9E3779B97F4A7C15L
      h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
      h ^= (h >>> 27); h *= 0x94D049BB133111EBL
      h ^= (h >>> 31)
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(CharNGramHashes(Bridge.expression(c), n))
}

/** MinHash signature over an array of 64-bit shingle hashes: for each of
  * `numHashes` virtual permutations i, the minimum of splitmix64(h, i)
  * over all shingles (Broder '97 minwise hashing with seeded mixing
  * instead of true permutations). One pass over the shingles, no
  * re-hashing of the shingle strings per permutation. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private final val Golden = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer over (h + (i+1)*golden). */
  private def mix(h: Long, i: Int): Long = {
    var x = h + (i + 1).toLong * Golden
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    x
  }

  /** Called from generated code. Input must be array<long>. */
  def signature(hashes: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < k) {
        val m = mix(h, i)
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  def apply(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), numHashes))
}

/** Random-hyperplane LSH bucket of a double vector: bit p of the result
  * is the sign of the projection onto pseudo-random hyperplane
  * `planeOffset + p`, whose weights are splitmix64-derived from
  * (plane, dim) — deterministic, executor-side, no driver randomness, no
  * per-vector weight materialization. Replaces the
  * `aggregate(zip_with(transform(...)))` formulation, which allocated two
  * arrays per (vector, plane). `planeOffset` selects a disjoint plane
  * range so multiple independent hash tables (OR-construction) share one
  * kernel. */
case class HyperplaneBucket(child: Expression, planes: Int,
    planeOffset: Int = 0) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucket.bucket(input.asInstanceOf[ArrayData], planes, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBucket.bucket($c, $planes, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  private final val Golden = 0x9E3779B97F4A7C15L

  private def mix(p: Int, d: Int): Long = {
    var x = (p.toLong << 32 | (d.toLong & 0xffffffffL)) + Golden
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    x
  }

  /** Called from generated code. Input must be array<double>. */
  def bucket(v: ArrayData, planes: Int, planeOffset: Int): Long = {
    val n = v.numElements()
    var out = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < n) {
        // Java % keeps the dividend's sign → weight in (-2.0, 2.0),
        // symmetric around 0 with ~1e-3 resolution; only the sign of the
        // projection matters for the bucket bit
        s += v.getDouble(d) * ((mix(planeOffset + p, d) % 2001L) / 1000.0)
        d += 1
      }
      if (s >= 0.0) out |= (1L << p)
      p += 1
    }
    out
  }

  def apply(c: Column, planes: Int): Column = apply(c, planes, 0)

  def apply(c: Column, planes: Int, planeOffset: Int): Column =
    Bridge.column(HyperplaneBucket(Bridge.expression(c), planes, planeOffset))
}

object SimHash64 {
  /** Called from generated code. Input must be array<long>. */
  def simhash(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))
}

/** Asymmetric-distance (ADC) score for product-quantized vectors: given
  * a candidate's PQ code array (m dense codes, one per subspace) and a
  * query's flattened lookup table (m·ksub doubles, entry `j·ksub + c` =
  * dot(query subvector j, codebook centroid c of subspace j)), the score
  * is Σ_j lut[j·ksub + codes[j]] — the classic IVF-ADC inner-product
  * estimate (Jégou et al., PAMI 2011) in ONE table-lookup loop per pair.
  * Reference behavior: the engine's ANN surface is approximate top-k
  * retrieval; this kernel is the 100 TB memory-scale variant — an
  * m-byte-ish code per vector instead of dim doubles (dim/m compression
  * beyond int8), with per-pair cost O(m) instead of O(dim).
  *
  * Stays in whole-stage codegen via the static call; the loop order is
  * fixed (subspace 0..m-1), so the double sum is the identical IEEE
  * sequence on every engine/partitioning — deterministic scores,
  * deterministic ranks. ksub is inferred as lut.length / codes.length
  * and the division must be exact; an out-of-range code throws rather
  * than reading a neighboring subspace's entry (a silent wrong-answer
  * generator, the composite-id-fence posture). */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAdcScore.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqAdcScore.score($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  /** Called from generated code. codes: array<int> (m dense codes),
    * lut: array<double> (m·ksub entries, subspace-major). */
  def score(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    val total = lut.numElements()
    if (m == 0 || total % m != 0) {
      throw new IllegalArgumentException(
        s"pq_adc_score layout mismatch: ${total} LUT entries over $m codes")
    }
    val ksub = total / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) {
        throw new IllegalArgumentException(
          s"pq_adc_score code out of range: $c at subspace $j (ksub=$ksub)")
      }
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  def apply(codes: Column, lut: Column): Column =
    Bridge.column(PqAdcScore(Bridge.expression(codes),
      Bridge.expression(lut)))
}
