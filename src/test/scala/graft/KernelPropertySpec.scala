package graft

import scala.util.Random
import graft.functions.{MinHashSig, PolyHash64, SimHash64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-style tests for the native kernels (pure JVM, no Spark
  * session), over seeded random inputs for determinism. */
class KernelPropertySpec extends SparkSpec {

  private val rnd = new Random(42)
  private def asciiStr(maxLen: Int = 200): String = {
    val n = rnd.nextInt(maxLen)
    (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
  }

  test("poly_hash64 stays within the 2^61-1 field and is deterministic") {
    (1 to 200).foreach { _ =>
      val s = asciiStr()
      val h1 = PolyHash64.hash(s.getBytes("UTF-8"))
      val h2 = PolyHash64.hash(s.getBytes("UTF-8"))
      assert(h1 == h2)
      assert(h1 >= 0 && h1 < PolyHash64.Mod)
    }
  }

  test("poly_hash64 matches a BigInt reference implementation") {
    (1 to 100).foreach { _ =>
      val s = asciiStr()
      val expected = s.getBytes("UTF-8")
        .foldLeft(BigInt(7)) { (h, b) =>
          (h * 31 + (b & 0xff)) mod (BigInt(2).pow(61) - 1)
        }
      assert(BigInt(PolyHash64.hash(s.getBytes("UTF-8"))) == expected,
        s"mismatch for '$s'")
    }
  }

  test("winnowed_anchors matches an O(n·w) brute reference on random strings") {
    import graft.functions.WinnowedAnchors
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ref(text: String, k: Int, w: Int): Set[String] = {
      val n = text.length - k + 1 // ascii inputs: chars == code points
      if (n <= 0) Set.empty
      else {
        val hs = (0 until n).map(i => md5hex(text.substring(i, i + k)))
        (0 until n).map(i => hs.slice(i, math.min(i + w, n)).min).toSet
      }
    }
    (1 to 60).foreach { _ =>
      val s = asciiStr(300)
      val k = 3 + rnd.nextInt(10)
      val w = 1 + rnd.nextInt(12) // w = 1 degenerates to every-hash
      val got = WinnowedAnchors.anchors(UTF8String.fromString(s), k, w)
      val gotSet = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString).toSet
      assert(gotSet == ref(s, k, w), s"k=$k w=$w for '$s'")
    }
  }

  test("winnowed_anchors guarantee: a shared k+w-1 run always shares an anchor") {
    import graft.functions.WinnowedAnchors
    (1 to 40).foreach { _ =>
      val k = 5 + rnd.nextInt(8)
      val w = 2 + rnd.nextInt(8)
      val shared = asciiStr(k + w + 20).padTo(k + w - 1, 'x').mkString
      val a = asciiStr(60) + shared + asciiStr(60)
      val b = asciiStr(80) + shared + asciiStr(40)
      def anchorSet(s: String) = {
        val arr = WinnowedAnchors.anchors(UTF8String.fromString(s), k, w)
        (0 until arr.numElements())
          .map(i => arr.getUTF8String(i).toString).toSet
      }
      assert(anchorSet(a).intersect(anchorSet(b)).nonEmpty,
        s"k=$k w=$w shared='$shared'")
    }
  }

  test("minhash signature of a superset is elementwise <=") {
    (1 to 100).foreach { _ =>
      val small = Array.fill(1 + rnd.nextInt(50))(rnd.nextLong())
      val big = small ++ Array.fill(rnd.nextInt(50))(rnd.nextLong())
      val sa = MinHashSig.signature(new GenericArrayData(small), 16)
      val sb = MinHashSig.signature(new GenericArrayData(big), 16)
      (0 until 16).foreach(i => assert(sb.getLong(i) <= sa.getLong(i)))
    }
  }

  test("minhash agreement estimates jaccard for related sets") {
    // two sets with true jaccard ~0.5 → signature agreement ~0.5 ± noise
    val shared = Array.fill(500)(rnd.nextLong())
    val a = shared ++ Array.fill(250)(rnd.nextLong())
    val b = shared ++ Array.fill(250)(rnd.nextLong())
    val k = 256
    val sa = MinHashSig.signature(new GenericArrayData(a), k)
    val sb = MinHashSig.signature(new GenericArrayData(b), k)
    val agree = (0 until k).count(i => sa.getLong(i) == sb.getLong(i))
    val est = agree.toDouble / k
    val trueJ = 500.0 / 1000.0
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }

  test("simhash is deterministic and sensitive to input changes") {
    (1 to 100).foreach { _ =>
      val hs = Array.fill(1 + rnd.nextInt(100))(rnd.nextLong())
      val a = SimHash64.simhash(new GenericArrayData(hs))
      assert(a == SimHash64.simhash(new GenericArrayData(hs)))
    }
    // near-identical multisets → small hamming distance
    val base = Array.fill(200)(rnd.nextLong())
    val tweaked = base.clone(); tweaked(0) = rnd.nextLong()
    val h = java.lang.Long.bitCount(
      SimHash64.simhash(new GenericArrayData(base)) ^
        SimHash64.simhash(new GenericArrayData(tweaked)))
    assert(h <= 16, s"hamming $h too large for a 1/200 change")
  }

  test("hyperplane_bucket is deterministic, in range, and locality-sensitive") {
    import graft.functions.HyperplaneBucket
    val planes = 8
    def bucket(v: Array[Double]) =
      HyperplaneBucket.bucket(new GenericArrayData(v), planes, 0)
    // disjoint plane ranges (hash tables) bucket independently
    val probe = Array.fill(16)(rnd.nextGaussian())
    assert(HyperplaneBucket.bucket(new GenericArrayData(probe), planes, 0) !=
      HyperplaneBucket.bucket(new GenericArrayData(probe), planes, 64) ||
      HyperplaneBucket.bucket(new GenericArrayData(probe), planes, 128) !=
        HyperplaneBucket.bucket(new GenericArrayData(probe), planes, 0))
    (1 to 100).foreach { _ =>
      val v = Array.fill(16)(rnd.nextGaussian())
      val b = bucket(v)
      assert(b == bucket(v))
      assert(b >= 0 && b < (1L << planes))
      // scaling a vector never changes its signs → same bucket
      assert(bucket(v.map(_ * 3.7)) == b)
      // the antipode flips every projection → complement bucket
      assert(bucket(v.map(-_)) == (~b & ((1L << planes) - 1)))
    }
    // locality: a small perturbation keeps most plane signs
    val flips = (1 to 200).map { _ =>
      val v = Array.fill(16)(rnd.nextGaussian())
      val w = v.map(_ + rnd.nextGaussian() * 0.01)
      java.lang.Long.bitCount(bucket(v) ^ bucket(w))
    }
    assert(flips.sum.toDouble / flips.size < 1.0,
      s"avg flips ${flips.sum.toDouble / flips.size}")
  }

  test("byte_dot matches the double kernel on int8 codes, rejects mismatched dims") {
    import graft.functions.{ByteDot, DotProduct}
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)((rnd.nextInt(255) - 127).toByte)
      val b = Array.fill(n)((rnd.nextInt(255) - 127).toByte)
      val got = ByteDot.dot(new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any)))
      // integer dot == exact double dot of the same values (all int8
      // products are exactly representable), and symmetric
      val viaDouble = DotProduct.dot(
        new GenericArrayData(a.map(_.toDouble: Any)),
        new GenericArrayData(b.map(_.toDouble: Any)))
      assert(got.toDouble == viaDouble)
      assert(got == ByteDot.dot(new GenericArrayData(b.map(x => x: Any)),
        new GenericArrayData(a.map(x => x: Any))))
    }
    intercept[IllegalArgumentException] {
      ByteDot.dot(new GenericArrayData(Array[Any](1.toByte)),
        new GenericArrayData(Array[Any](1.toByte, 2.toByte)))
    }
  }

  test("quantize_int8 matches the scalar reference, zero/empty vectors, range") {
    import graft.functions.QuantizeInt8
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val v = Array.fill(n)((rnd.nextDouble() - 0.5) * 20.0)
      val got = QuantizeInt8.encode(new GenericArrayData(v.map(x => x: Any)))
      // reference: the exact IEEE sequence of the oracle SQL formulation
      val mx = v.map(math.abs).max
      (0 until n).foreach { i =>
        val expect =
          if (mx == 0.0) 0.toByte
          else math.floor(v(i) * 127.0 / mx + 0.5).toLong.toByte
        assert(got.getByte(i) == expect, s"elem $i of ${v.toSeq}")
        assert(got.getByte(i) >= -127 && got.getByte(i) <= 127)
      }
      // the max-|v| element always codes to ±127 — qnrm>0 ⟺ mx>0
      assert(v.indices.exists(i => math.abs(got.getByte(i)) == 127) || mx == 0.0)
    }
    val zeros = QuantizeInt8.encode(new GenericArrayData(
      Array[Any](0.0, 0.0, 0.0)))
    assert((0 until 3).forall(zeros.getByte(_) == 0))
    assert(QuantizeInt8.encode(new GenericArrayData(Array.empty[Any]))
      .numElements() == 0)
  }

  test("sparse_dot_counts matches a map-based reference, rejects mismatched arrays") {
    import graft.functions.SparseDotCounts
    (1 to 200).foreach { _ =>
      def vec(): (Array[Long], Array[Long]) = {
        val n = rnd.nextInt(40)
        val ks = Array.fill(n)(rnd.nextInt(30).toLong).distinct.sorted
        (ks, Array.fill(ks.length)((rnd.nextInt(2000) - 1000).toLong))
      }
      val (ak, aw) = vec(); val (bk, bw) = vec()
      val got = SparseDotCounts.merge(
        new GenericArrayData(ak.map(x => x: Any)),
        new GenericArrayData(aw.map(x => x: Any)),
        new GenericArrayData(bk.map(x => x: Any)),
        new GenericArrayData(bw.map(x => x: Any)))
      val am = ak.zip(aw).toMap
      val bm = bk.zip(bw).toMap
      val shared = am.keySet & bm.keySet
      assert(got.getLong(0) == shared.toSeq.map(k => am(k) * bm(k)).sum)
      assert(got.getLong(1) == shared.size.toLong)
    }
    intercept[IllegalArgumentException] {
      SparseDotCounts.merge(new GenericArrayData(Array[Any](1L)),
        new GenericArrayData(Array[Any](1L, 2L)),
        new GenericArrayData(Array[Any](1L)),
        new GenericArrayData(Array[Any](1L)))
    }
  }

  test("char_bigrams length and packing") {
    (1 to 200).foreach { _ =>
      val s = asciiStr()
      val arr = graft.functions.CharBigrams.bigrams(UTF8String.fromString(s))
      assert(arr.numElements() == math.max(s.length - 1, 0))
      if (s.length >= 2) {
        val c0 = arr.getInt(0)
        assert((c0 >> 16) == s.charAt(0).toInt &&
          (c0 & 0xffff) == s.charAt(1).toInt)
      }
    }
  }

  test("sorted_intersect_count matches a set-intersection reference; empty/disjoint/identical") {
    import graft.functions.SortedIntersectCount
    def arr(xs: Seq[Long]) = new GenericArrayData(xs.map(x => x: Any))
    (1 to 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val got = SortedIntersectCount.count(arr(a), arr(b))
      assert(got == (a.toSet & b.toSet).size.toLong, s"$a vs $b")
    }
    assert(SortedIntersectCount.count(arr(Nil), arr(Nil)) == 0L)
    assert(SortedIntersectCount.count(arr(Seq(1L, 2L)), arr(Nil)) == 0L)
    assert(SortedIntersectCount.count(
      arr(Seq(1L, 3L)), arr(Seq(2L, 4L))) == 0L)
    assert(SortedIntersectCount.count(
      arr(Seq(Long.MinValue, 0L, Long.MaxValue)),
      arr(Seq(Long.MinValue, 0L, Long.MaxValue))) == 3L)
  }

  // ── adversarial inputs for the text kernels (r13 verdict #7: the
  // MediaCodec hostile-truncation discipline applied to text) ─────────
  private val AstralS = "𝕊" // U+1D54A, a 4-byte UTF-8 char
  private val Hostile = Seq(
    "",                               // empty
    "a",                              // 1 char vs k-char windows
    AstralS,                          // lone astral char
    AstralS * 50,                     // astral run longer than k
    "ab" + AstralS + "cd" + AstralS,  // mixed BMP/astral
    "\uD800",                         // unpaired HIGH surrogate
    "\uDC00",                         // unpaired LOW surrogate
    "x\uD800y\uDC00z",                // surrogate halves inside text
    "\u0000\u0001\t\n ",            // control chars
    "é" * 60,                         // 2-byte UTF-8 run
    "字" * 60)                        // 3-byte UTF-8 run

  /** Printable escape for clue messages — raw lone surrogates in a
    * test-failure string crash sbt's output encoder. */
  private def esc(s: String): String =
    s.map(c => if (c >= 32 && c < 127) c.toString
      else f"\\u${c.toInt}%04x").mkString

  test("char_bigrams survives hostile inputs: length law over UTF-16 units") {
    Hostile.foreach { raw =>
      // the kernel sees the UTF8String round-trip of the input — the
      // engine's real view: Spark strings are UTF-8, so an unpaired
      // surrogate half arrives REPLACED ('?'), never as a raw half
      val s = UTF8String.fromString(raw).toString
      val arr = graft.functions.CharBigrams.bigrams(UTF8String.fromString(raw))
      // contract: one packed int per adjacent UTF-16 unit pair (the
      // same units both engines' length() of a bigram slice sees)
      assert(arr.numElements() == math.max(s.length - 1, 0), esc(raw))
      var i = 0
      while (i < arr.numElements()) {
        val c = arr.getInt(i)
        assert((c >>> 16) == s.charAt(i).toInt &&
          (c & 0xffff) == s.charAt(i + 1).toInt, s"${esc(raw)} @$i")
        i += 1
      }
    }
  }

  test("char_ngram_hashes survives hostile inputs: count law, determinism") {
    Hostile.foreach { raw =>
      val s = UTF8String.fromString(raw).toString // the engine's view
      Seq(1, 3, 5).foreach { n =>
        val h1 = graft.functions.CharNGramHashes.hashes(
          UTF8String.fromString(raw), n)
        val h2 = graft.functions.CharNGramHashes.hashes(
          UTF8String.fromString(raw), n)
        assert(h1.numElements() == math.max(s.length - n + 1, 0),
          s"${esc(raw)} n=$n")
        assert(h1.toLongArray.toSeq == h2.toLongArray.toSeq)
      }
    }
  }

  test("winnowed_anchors survives hostile inputs: codepoint windows, brute parity") {
    def brute(s: String, k: Int, w: Int): Set[String] = {
      // the SQL-substr semantics the ascii brute-parity test pins: k
      // CODEPOINT windows, md5 of the window bytes, min per w-hash run
      // with trailing runs truncated at the end (one run per start)
      val m = s.codePointCount(0, s.length)
      if (m < k) return Set.empty
      val offs = Array.iterate(0, m + 1)(p =>
        p + Character.charCount(s.codePointAt(p)))
      val md = java.security.MessageDigest.getInstance("MD5")
      val n = m - k + 1
      val hs = (0 until n).map { i =>
        md.reset()
        md.digest(s.substring(offs(i), offs(i + k)).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      (0 until n).map(i => hs.slice(i, math.min(i + w, n)).min).toSet
    }
    Hostile.foreach { raw =>
      val s = UTF8String.fromString(raw).toString // the engine's view
      Seq((3, 2), (5, 4), (40, 25)).foreach { case (k, w) =>
        val got = {
          val a = graft.functions.WinnowedAnchors.anchors(
            UTF8String.fromString(raw), k, w)
          (0 until a.numElements()).map(a.getUTF8String(_).toString).toSet
        }
        assert(got == brute(s, k, w), s"${esc(raw)} k=$k w=$w")
      }
    }
  }

  test("quantize_int8 survives hostile magnitudes: float-range extremes stay in [-127, 127]") {
    val cases = Seq(
      Array(3.4e38, -3.4e38, 1.0, 0.0),      // float max magnitudes
      Array(1.4e-45, -1.4e-45),              // float subnormal range
      Array(-0.0, 0.0),                      // signed zeros → all-zero
      Array(1e-300, 1e-310, 5e-324))         // double subnormals
    cases.foreach { v =>
      val q = graft.functions.QuantizeInt8.encode(
        new GenericArrayData(v.map(x => x: Any)))
      assert(q.numElements() == v.length)
      (0 until q.numElements()).foreach { i =>
        val c = q.getByte(i)
        assert(c >= -127 && c <= 127, s"${v.toSeq} -> code $c @$i")
      }
      // the max-magnitude element always codes to ±127
      val mx = v.map(math.abs).max
      if (mx > 0.0) {
        val im = v.indexWhere(x => math.abs(x) == mx)
        assert(math.abs(q.getByte(im).toInt) == 127, v.toSeq.toString)
      }
    }
  }

  test("embedding-moment overflow bound is ENFORCED: over-bound batches raise in every moment operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val K = graft.similarity.Knn
    // 8 vectors over 2 labels (4 each), non-degenerate codes
    val e = (1 to 8).map(i =>
        (i.toLong, i % 2, Seq(0.1 * i, 0.25, -0.4 * i)))
      .toDF("vec_id", "label", "v")
      .localCheckpoint(true)
    def hasFence(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(
        _.contains("overflow fence")) || hasFence(t.getCause))
    val ops: Seq[(String, Long => org.apache.spark.sql.DataFrame)] = Seq(
      ("emb_drift_quantized", m => K.embDriftQuantized(e, maxVecs = m)),
      ("emb_centroid_affinity", m => K.embCentroidAffinity(e, maxVecs = m)),
      ("emb_outliers", m => K.embOutliers(e, maxVecs = m)),
      ("centroid_confusion", m => K.centroidConfusion(e, maxVecs = m)),
      ("emb_dim_stats", m => K.embDimStats(e, maxVecs = m)),
      ("emb_cluster_quality", m => K.embClusterQuality(e, maxVecs = m)))
    ops.foreach { case (name, f) =>
      // planted over-bound batch: the documented bound, enforced — the
      // plan must RAISE the named fence, never wrap silently
      val ex = intercept[Exception] { f(3L).collect() }
      assert(hasFence(ex), s"$name: expected the overflow fence, got $ex")
      // within bound: the guard is invisible (adds integer 0) — the
      // plan must complete without raising (emb_outliers' flagged tail
      // is legitimately empty on this well-behaved batch)
      val n = f(8L).count()
      assert(n > 0 || name == "emb_outliers",
        s"$name: in-bound batch must still produce rows")
    }
    // the in-bound guard leaves values untouched vs the default bound
    val a = K.embDriftQuantized(e).collect().map(_.toSeq).toSet
    val b = K.embDriftQuantized(e, maxVecs = 8L).collect()
      .map(_.toSeq).toSet
    assert(a == b)
  }
}
