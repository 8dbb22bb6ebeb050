package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force equivalence for the round-11 algorithmic kernels, on
  * ADVERSARIAL inputs the lattice fixture never produces (off-grid
  * coordinates, points straddling cell boundaries, irregular graphs):
  *
  *  - [[SpatialCluster.ripleyPairs]] (3×3 grid-cell neighbor join) must
  *    emit exactly the ordered pairs within rMax that an all-pairs scan
  *    finds — the grid is a candidate generator, never a filter.
  *  - [[GraphQueries.kcoreRounds]] must match a reference sequential
  *    peeling run for the same round count, and converge to the exact
  *    k-core fixpoint when rounds ≥ the peel depth.
  *
  * Inputs derive from splitmix-style integer mixing — deterministic, no
  * RNG seed drift between runs. */
class SpatialStatsEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private def mix(i: Long, salt: Long): Long = {
    var z = i * 0x9E3779B97F4A7C15L + salt
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("ripleyPairs == brute-force all-pairs on clustered off-grid points") {
    // 300 points: ~half clustered tightly (many in-radius pairs, incl.
    // cross-cell ones near boundaries), rest scattered
    val pts = (0 until 300).map { i =>
      val h1 = mix(i, 1); val h2 = mix(i, 2)
      if (i % 2 == 0)
        (i.toLong, ((h1 % 2000 + 2000) % 2000).toDouble / 7.0,
          ((h2 % 2000 + 2000) % 2000).toDouble / 7.0)
      else
        (i.toLong, ((h1 % 100000 + 100000) % 100000).toDouble / 3.0,
          ((h2 % 100000 + 100000) % 100000).toDouble / 3.0)
    }
    val rMax = 137.5 // not a divisor of anything in the data
    val df = pts.toDF("pid", "x", "y")
    val got = SpatialCluster.ripleyPairs(df, rMax)
      .collect().map(_.getDouble(0)).sorted.toSeq
    val want = (for {
      (pa, xa, ya) <- pts; (pb, xb, yb) <- pts
      if pa != pb
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= rMax * rMax
    } yield d2).sorted
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  /** Reference sequential synchronous peel; returns surviving node ->
    * induced degree after `rounds` (or the fixpoint for rounds = -1). */
  private def peelRef(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Int] = {
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var r = 0
    var changed = true
    while ((rounds < 0 && changed) || (rounds >= 0 && r < rounds)) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).view.mapValues(_.size).toMap
      val next = alive.filter(n => deg.getOrElse(n, 0) >= k)
      changed = next != alive
      alive = next
      r += 1
    }
    edges.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).view.mapValues(_.size).toMap
  }

  test("kcoreRounds matches sequential peeling and reaches the fixpoint") {
    // irregular graph: a dense clique core + a long tail of whiskers
    val und = ((for (a <- 0L until 8L; b <- 0L until 8L if a < b) yield (a, b)) ++
      (0 until 120).map { i =>
        (mix(i, 7).abs % 40, mix(i, 11).abs % 40)
      }.filter { case (a, b) => a != b }).distinct
    val bidir = (und ++ und.map(_.swap)).distinct
    val df = bidir.toDF("src", "dst")
    for (rounds <- Seq(1, 2, 3)) {
      val got = GraphQueries.kcoreRounds(df, k = 4, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == peelRef(bidir, 4, rounds), s"rounds=$rounds")
    }
    // deep enough rounds == the true k-core fixpoint
    val deep = GraphQueries.kcoreRounds(df, k = 4, rounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(deep == peelRef(bidir, 4, -1))
    // the 8-clique always survives with k=4
    assert((0L until 8L).forall(deep.contains))
  }
}
