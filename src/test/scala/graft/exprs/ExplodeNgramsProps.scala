package graft.exprs

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the [[ExplodeNgrams]] GENERATOR: exact
  * equivalence with a naive code-point sliding window — including
  * surrogate-pair (emoji) input, where byte- or char-indexed substrings
  * would split a code point — plus the empty/short/null edge laws.
  *
  * The extraction maps each reused InternalRow to a value BEFORE
  * advancing the iterator — the same one-element-in-flight contract
  * GenerateExec relies on. */
object ExplodeNgramsProps extends Properties("explode_ngrams") {

  private def grams(s: String, n: Int): Seq[(Int, String)] = {
    val e = ExplodeNgrams(Literal(s), Literal(n))
    // map-then-toSeq: each element materializes before next() — a
    // toSeq of the raw rows would observe only the final reused row
    e.eval(null).iterator
      .map(r => (r.getInt(0), r.getUTF8String(1).toString)).toSeq
  }

  private def naive(s: String, n: Int): Seq[(Int, String)] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - n).map(i => (i + 1, new String(cps, i, n)))
  }

  private val uchar: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.oneOf("é", "ß", "中", "😀", "🜚", " "),
    1 -> Gen.const(""))
  private val texts: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(k => Gen.listOfN(k, uchar).map(_.mkString))
  private val ns: Gen[Int] = Gen.chooseNum(1, 5)

  property("equals the naive code-point sliding window") =
    forAll(texts, ns) { (s, n) => grams(s, n) == naive(s, n) }

  property("emits max(0, numCodePoints - n + 1) rows with 1-based positions") =
    forAll(texts, ns) { (s, n) =>
      val g = grams(s, n)
      val want = math.max(0, s.codePoints().count().toInt - n + 1)
      g.length == want && g.map(_._1) == (1 to want)
    }

  property("null input generates nothing") = forAll(ns) { n =>
    ExplodeNgrams(Literal.create(null, org.apache.spark.sql.types.StringType),
      Literal(n)).eval(null).iterator.isEmpty
  }
}
