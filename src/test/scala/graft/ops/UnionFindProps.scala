package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Split-invariance law for the two-level connected-components plan:
  * contracting each arbitrary partition of the edge list independently
  * (the mapPartitions pass) and labeling the concatenated forests (the
  * coalesce(1) finish) must equal the brute-force transitive closure with
  * min-id representatives. */
object UnionFindProps extends Properties("unionfind") {

  /** Brute-force components with min-id representative. */
  def model(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var comp = nodes.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b) =>
        val m = math.min(comp(a), comp(b))
        if (comp(a) != m) { comp += a -> m; changed = true }
        if (comp(b) != m) { comp += b -> m; changed = true }
      }
    }
    comp
  }

  private val genEdges = Gen.listOf(for {
    a <- Gen.chooseNum(0L, 40L)
    b <- Gen.chooseNum(0L, 40L) if a != b
  } yield (a, b))

  property("contract-per-split + label ≡ brute-force closure") =
    forAll(genEdges, Gen.chooseNum(1, 5)) { (edges, nSplits) =>
      val parts =
        if (edges.isEmpty) Seq(Seq.empty[(Long, Long)])
        else edges.grouped(math.max(1, edges.size / nSplits)).toSeq
      val forest = parts.flatMap(p => TextQueries.contractEdges(p.iterator))
      TextQueries.labelComponents(forest.iterator).toMap == model(edges)
    }
}
