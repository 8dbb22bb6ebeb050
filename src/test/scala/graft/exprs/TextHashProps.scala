package graft.exprs

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the text-dedup kernels (SURVEY.md §5.2):
  * Jaccard laws, Hamming metric laws, MinHash signature structure, and the
  * band-collision soundness direction (equal band rows => equal bucket). */
object TextHashProps extends Properties("texthash") {

  private val docs: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  property("jaccard is within [0, 1]") = forAll(docs, docs) { (a, b) =>
    val j = TextHash.ngramJaccard(a, b, 5)
    j >= 0.0 && j <= 1.0
  }

  property("jaccard(a, a) == 1") = forAll(docs) { a =>
    TextHash.ngramJaccard(a, a, 5) == 1.0
  }

  property("jaccard is symmetric") = forAll(docs, docs) { (a, b) =>
    TextHash.ngramJaccard(a, b, 5) == TextHash.ngramJaccard(b, a, 5)
  }

  property("simhash is deterministic and hamming(a, a) == 0") = forAll(docs) { a =>
    val h1 = TextHash.simhash64(a, 5)
    val h2 = TextHash.simhash64(a, 5)
    h1 == h2 && java.lang.Long.bitCount(h1 ^ h2) == 0
  }

  property("hamming via xor-popcount is a metric on the hypercube") =
    forAll(Gen.long, Gen.long, Gen.long) { (a, b, c) =>
      def d(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
      d(a, b) == d(b, a) && d(a, b) >= 0 && d(a, b) <= 64 &&
        d(a, c) <= d(a, b) + d(b, c) // triangle inequality
    }

  property("minhash signature: k minima, deterministic, permutation-free") =
    forAll(docs, Gen.chooseNum(1, 64)) { (a, k) =>
      val s1 = TextHash.minhashSig(a, k, 5)
      val s2 = TextHash.minhashSig(a, k, 5)
      s1.length == k && s1.sameElements(s2)
    }

  property("identical docs collide in every band") = forAll(docs) { a =>
    // soundness direction of LSH banding: equal inputs => equal buckets
    val b1 = bandHashes(a); val b2 = bandHashes(a)
    b1.sameElements(b2)
  }

  private def bandHashes(text: String, bands: Int = 8, rows: Int = 8): Array[Long] = {
    val sig = TextHash.minhashSig(text, bands * rows, 5)
    Array.tabulate(bands) { b =>
      var h = 0xcbf29ce484222325L ^ b.toLong
      var r = 0
      while (r < rows) { h = TextHash.mix64(h ^ sig(b * rows + r)); r += 1 }
      h
    }
  }
}
