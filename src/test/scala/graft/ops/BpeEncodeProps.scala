package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The q_bpe_encode equivalence law: the array-form greedy encoder
  * ([[TextQueries.applyMerges]] — one left-to-right non-overlapping pass
  * per merge, rank order) equals the oracle's replace-chain formulation
  * (each merge = one standard `String.replace` over ⟨⟩-wrapped tokens).
  * Exercised on adversarial inputs the production merge table avoids:
  * identical-pair merges (overlap runs like "aaaa"), merges whose outputs
  * feed later merges, and the production [[TextQueries.BpeMerges]] list
  * itself over normalized corpus-like text. */
object BpeEncodeProps extends Properties("bpe_encode") {

  /** The oracle formulation, verbatim in Scala: wrap, chain replace,
    * unwrap. `String.replace` is the same left-to-right non-overlapping
    * single pass DuckDB's `replace` performs. */
  private def replaceChain(norm: String, merges: Seq[(String, String)]): Array[String] = {
    val wrapped = norm.map(c => s"⟨$c⟩").mkString
    val enc = merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      acc.replace(s"⟨$a⟩⟨$b⟩", s"⟨$a$b⟩")
    }
    if (enc.isEmpty) Array.empty
    else enc.stripPrefix("⟨").stripSuffix("⟩").split("⟩⟨", -1)
  }

  private val letters = Gen.oneOf('a', 'b', 't', 'h', 'e', ' ')
  private val texts: Gen[String] =
    Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, letters).map(_.mkString))

  private val adversarialMerges: Gen[Seq[(String, String)]] = Gen.oneOf(
    Seq(("a", "a"), ("aa", "a"), ("aa", "aa")),           // overlap runs
    Seq(("t", "h"), ("th", "e"), ("the", "th")),          // outputs feed later merges
    Seq(("a", "b"), ("b", "a"), ("ab", "ba"), ("a", "a")),
    TextQueries.BpeMerges)

  property("array encoder == replace-chain oracle formulation") =
    forAll(texts, adversarialMerges) { (s, merges) =>
      TextQueries.applyMerges(s.map(_.toString).toArray, merges).toSeq ==
        replaceChain(s, merges).toSeq
    }

  property("production merge list on normalized text: token count bounded by char count") =
    forAll(texts) { s =>
      val norm = TextQueries.normalizeAz(s)
      val toks = TextQueries.applyMerges(norm.map(_.toString).toArray, TextQueries.BpeMerges)
      toks.length <= norm.length && toks.mkString == norm // merges are lossless
    }

  property("normalizeAz keeps exactly [a-z ] incl. multi-char lowercasings") = {
    val s = "Ab Cİx!9K" // İ lowercases to i+combining-dot, K (Kelvin) to k
    TextQueries.normalizeAz(s) == "ab cix" + "k"
  }
}
