package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The two laws heavyHitters' candidate pass leans on:
  *  1. superset — every item with true frequency > n/(k+1) survives a
  *     k-counter Misra-Gries pass (so recount-and-filter is exact);
  *  2. split-invariance of the superset — under ANY partitioning of the
  *     stream, the union of per-partition survivors still contains every
  *     GLOBAL item with frequency > n/k (the averaging argument: a global
  *     heavy hitter is a local one somewhere).
  */
object MisraGriesProps extends Properties("misragries") {

  private val genStream = Gen.listOf(Gen.oneOf(
    Gen.choose('a', 'f').map(_.toString),     // small alphabet: forces ties
    Gen.identifier.map(_.take(4))))           // long tail of rare items
  private val genK = Gen.choose(1, 8)

  property("survivors include every item above n/(k+1)") =
    forAll(genStream, genK) { (xs, k) =>
      val freq = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val survivors = TextQueries.misraGries(xs.iterator, k).toSet
      val mustKeep = freq.collect { case (t, c) if c * (k + 1) > xs.size => t }
      survivors.size <= k && mustKeep.forall(survivors.contains)
    }

  property("per-partition survivor union covers global items above n/k") =
    forAll(genStream, genK, Gen.choose(1, 5)) { (xs, k, nParts) =>
      val parts = if (xs.isEmpty) Seq(Seq.empty[String])
        else xs.grouped(math.max(1, xs.size / nParts)).toSeq
      val union = parts.flatMap(p => TextQueries.misraGries(p.iterator, k)).toSet
      val freq = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = freq.collect { case (t, c) if c * k > xs.size => t }
      heavy.forall(union.contains)
    }
}
