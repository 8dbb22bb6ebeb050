package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The union-find kernels behind dedupClusters: the per-partition
  * contraction pass and the terminal labeling pass. Deterministic cases
  * here; the split-invariance property lives in [[UnionFindProps]]. */
class UnionFindSpec extends AnyFunSuite {

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TextQueries.labelComponents(edges.iterator).toMap

  test("labelComponents: chain, star, disjoint pairs, duplicates, reversed edges") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(labelsOf(chain) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val star = Seq((10L, 5L), (10L, 6L), (10L, 7L))
    assert(labelsOf(star) == Map(10L -> 5L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
    val mixed = Seq((2L, 1L), (1L, 2L), (2L, 1L), (8L, 9L))
    assert(labelsOf(mixed) == Map(1L -> 1L, 2L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("contractEdges preserves components exactly and keeps every node") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (7L, 9L))
    val forest = TextQueries.contractEdges(edges.iterator).toSeq
    // forest is smaller (redundant cycle edges dropped) but same closure
    assert(forest.size == 4, forest.toString)
    assert(labelsOf(forest) == UnionFindProps.model(edges))
  }

  test("distributed label-propagation fallback agrees with the single-task finish") {
    // singleTaskMax = 0 forces the iterative loop over the contracted
    // forest — the 100 TB path that the gate corpora otherwise never
    // exercise end-to-end — and it must produce the identical clustering
    val spark = graft.SparkFixture.spark
    val dir = "/root/testdata/sf0.001"
    val fast = TextQueries.dedupClusters(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val loop = TextQueries.dedupClusters(spark, dir, singleTaskMax = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.sorted.sameElements(loop.sorted),
      s"fast=${fast.toSeq.take(10)} loop=${loop.toSeq.take(10)}")
  }
}
