package graft.exprs

import org.scalatest.funsuite.AnyFunSuite

class TextHashSpec extends AnyFunSuite {

  // deterministic word-salad corpus (no scalatest-plus bridge offline, so
  // property-style checks run over an explicit seeded sample)
  private val words = Vector("data", "query", "table", "scan", "join", "agg", "row", "batch")
  private val rnd = new scala.util.Random(42)
  private val texts: Seq[String] =
    (0 until 50).map(_ => Seq.fill(rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" "))

  test("minhash signature is deterministic and of requested length") {
    val a = TextHash.minhashSig("the quick brown fox", 32, 5)
    val b = TextHash.minhashSig("the quick brown fox", 32, 5)
    assert(a.length == 32)
    assert(a.sameElements(b))
  }

  test("identical documents share the full minhash signature") {
    texts.foreach { t =>
      assert(TextHash.minhashSig(t, 16, 5).sameElements(TextHash.minhashSig(t, 16, 5)))
    }
  }

  test("jaccard is 1 on self, symmetric, and within [0, 1]") {
    for (a <- texts.take(20); b <- texts.take(20)) {
      assert(TextHash.ngramJaccard(a, a, 5) == 1.0)
      val ab = TextHash.ngramJaccard(a, b, 5)
      assert(ab == TextHash.ngramJaccard(b, a, 5))
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }

  test("minhash signature agreement tracks jaccard similarity") {
    // near-identical docs agree on most signature positions; disjoint
    // docs agree on (almost) none.
    val base = "spark catalyst optimizer pushes filters into the parquet scan " * 5
    val near = base + " extra"
    val far = "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq " * 5
    def agree(a: Array[Long], b: Array[Long]) = a.zip(b).count { case (x, y) => x == y }
    val k = 64
    val sBase = TextHash.minhashSig(base, k, 5)
    assert(agree(sBase, TextHash.minhashSig(near, k, 5)) > k / 2)
    assert(agree(sBase, TextHash.minhashSig(far, k, 5)) < k / 4)
  }

  test("simhash of near-identical docs is close in hamming distance") {
    val base = "spark catalyst optimizer pushes filters into the parquet scan " * 5
    val near = base + " tail"
    val far = "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq " * 5
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hBase = TextHash.simhash64(base, 5)
    assert(ham(hBase, TextHash.simhash64(near, 5)) <= 8)
    assert(ham(hBase, TextHash.simhash64(far, 5)) > 16)
  }

  test("empty text yields sentinel signature (empty docs all collide)") {
    assert(TextHash.minhashSig("", 8, 5).forall(_ == Long.MaxValue))
  }
}
