package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-based fuzzing of the custom expressions' static kernels —
  * driven directly (no Spark session), so hundreds of random inputs
  * run in milliseconds and unicode/empty/adversarial strings get
  * coverage no fixed corpus provides. Sampling is seeded, so a failure
  * reproduces. */
class ExpressionPropertySpec extends AnyFunSuite {

  /** deterministic scalacheck sampling (no scalatestplus bridge needed) */
  private def forSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def utf8(s: String) = UTF8String.fromString(s)
  private def tokens(ts: Seq[String]) =
    new GenericArrayData(ts.map(t => utf8(t): Any).toArray)

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.oneOf("!@#.,-汉字é\t".toSeq)
  )).map(_.mkString)

  test("text_profile counters always satisfy their structural invariants") {
    forSamples(text) { s =>
      val r = graft.functions.TextProfile.compute(utf8(s))
      val nChars = r.getLong(0); val nWords = r.getLong(1)
      val nPunct = r.getLong(2); val nStop = r.getLong(3)
      assert(nChars == s.codePointCount(0, s.length))
      assert(nWords >= 0 && nPunct >= 0 && nStop >= 0)
      assert(nPunct <= nChars)
      // words are space-separated, so at most gaps+1 of them
      assert(nWords <= s.count(_ == ' ') + 1)
      // each counted stopword occupies 5 chars, overlaps excluded
      assert(nStop * 5 <= nChars + 4)
    }
  }

  test("simhash128 word 0 equals simhash64 for arbitrary token arrays") {
    forSamples(Gen.listOf(word)) { ts =>
      val s64 = graft.functions.SimHash64.compute(tokens(ts))
      val s128 = graft.functions.SimHash128.compute(tokens(ts))
      assert(s128.getLong(0) == s64)
    }
  }

  test("simhash is permutation-invariant (bag-of-tokens semantics)") {
    forSamples(Gen.nonEmptyListOf(word).map(ts => (ts, ts.reverse))) {
      case (ts, rev) =>
        assert(graft.functions.SimHash64.compute(tokens(ts)) ==
          graft.functions.SimHash64.compute(tokens(rev)),
          "simhash must not depend on token order")
    }
  }

  test("hamming distance axioms: identity, symmetry, triangle inequality") {
    forSamples(Gen.zip(Gen.long, Gen.long, Gen.long)) { case (a, b, c) =>
      def h(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
      assert(h(a, a) == 0)
      assert(h(a, b) == h(b, a))
      assert(h(a, c) <= h(a, b) + h(b, c))
    }
  }

  test("minhash128 signatures: 128 slots in the modulus, minima subset-monotone") {
    forSamples(Gen.nonEmptyListOf(word), n = 150) { ts =>
      val sig = graft.functions.MinHash128.compute(tokens(ts))
      assert(sig.numElements() == 128)
      (0 until 128).foreach { i =>
        val v = sig.getLong(i)
        assert(v >= 0 && v < 2147483647L)
      }
      // adding tokens can only LOWER each min slot (monotone minima) —
      // the property LSH banding recall rests on
      val more = graft.functions.MinHash128.compute(tokens(ts ++ ts.map(_ + "x")))
      (0 until 128).foreach(i => assert(more.getLong(i) <= sig.getLong(i)))
    }
  }

  test("rolling hash: whitespace/punct/case noise never changes the fingerprint") {
    forSamples(Gen.nonEmptyListOf(word)) { ts =>
      val clean = ts.mkString(" ")
      val noisy = ts.mkString("  ").toUpperCase + "!"
      assert(graft.functions.WordShingles.rollingHash(utf8(clean)) ==
        graft.functions.WordShingles.rollingHash(utf8(noisy)))
    }
  }

  test("zorder2: morton interleave is a bijection on 16-bit pairs and order-embeds boxes") {
    val coord = Gen.chooseNum(0L, 65535L)
    forSamples(Gen.zip(coord, coord)) { case (x, y) =>
      val z = graft.functions.ZOrder2.morton(x, y)
      assert(z >= 0 && z < (1L << 32))
      // de-interleave recovers the inputs exactly (bijection)
      var rx = 0L; var ry = 0L
      (0 until 16).foreach { b =>
        rx |= ((z >> (2 * b)) & 1L) << b
        ry |= ((z >> (2 * b + 1)) & 1L) << b
      }
      assert(rx == x && ry == y)
      // monotone within each dimension when the other is fixed
      if (x < 65535L) assert(graft.functions.ZOrder2.morton(x + 1, y) > z)
      if (y < 65535L) assert(graft.functions.ZOrder2.morton(x, y + 1) > z)
    }
  }

  test("zorder2 rejects out-of-domain coordinates instead of wrapping") {
    // a silent & 0xFFFF would alias 70000 onto 4464's curve position
    // and quietly break min/max pruning
    for ((x, y) <- Seq((70000L, 0L), (0L, 70000L), (-1L, 0L), (0L, -1L)))
      intercept[IllegalArgumentException] { graft.functions.ZOrder2.morton(x, y) }
  }

  test("nearest_cell rejects vectors shorter than the trained dimension") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cs = Array(Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))
    // short vector would read past UnsafeArrayData bounds — must throw
    val short2 = new GenericArrayData(Array[Any](0.1f, 0.2f))
    intercept[IllegalArgumentException] { graft.functions.NearestCell.nearest(short2, cs) }
    intercept[IllegalArgumentException] { graft.functions.NearestCell.nearestK(short2, cs, 1) }
    // a LONGER vector is legal: subspace quantizers score a prefix
    val long4 = new GenericArrayData(Array[Any](0.1f, 0.2f, 0.3f, 0.9f))
    assert(graft.functions.NearestCell.nearest(long4, cs) == 0)
  }

  test("sorted_intersect_count equals set intersection on arbitrary sorted distinct arrays") {
    val longs = Gen.listOf(Gen.chooseNum(-50L, 50L))
    def arr(xs: Seq[Long]) =
      new GenericArrayData(xs.distinct.sorted.map(x => x: Any).toArray)
    forSamples(Gen.zip(longs, longs)) { case (xs, ys) =>
      val want = xs.toSet.intersect(ys.toSet).size.toLong
      assert(graft.functions.SortedIntersect.count(arr(xs), arr(ys)) == want)
      // symmetric, and self-intersection is the set size
      assert(graft.functions.SortedIntersect.count(arr(ys), arr(xs)) == want)
      assert(graft.functions.SortedIntersect.count(arr(xs), arr(xs)) ==
        xs.distinct.size.toLong)
    }
  }

  test("winnow_fps selection is sparse, sorted, and positionally in range") {
    forSamples(Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta",
        "epsilon", "zeta", "eta", "theta")).map(_.mkString(" "))) { s =>
      val out = graft.functions.Winnow.compute(utf8(s))
      val keys = (0 until out.numElements()).map(out.getUTF8String(_).toString)
      // sorted distinct
      assert(keys == keys.sorted && keys.distinct == keys)
      // every key is md5hex#7digits with a valid position
      keys.foreach { k =>
        val Array(h, inv) = k.split("#")
        assert(h.length == 32 && h.forall(c => c.isDigit || (c >= 'a' && c <= 'f')))
        val pos = 9999999 - inv.toInt
        assert(pos >= 1 && pos <= 28) // 30 words -> 28 k-grams
      }
      // sparsification: never more fingerprints than windows
      assert(keys.size <= 25) // 30 words -> 25 windows
    }
  }
}
