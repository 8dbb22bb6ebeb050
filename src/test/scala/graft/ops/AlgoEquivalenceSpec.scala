package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence of the scalable algorithms against brute-force models on
  * ADVERSARIAL fixtures — inputs chosen to hit the edges the corpus never
  * exercises: exact duplicates, sub-minimum documents, empty strings,
  * all-tied prices, duplicate points. The operators read parquet, so the
  * fixtures are written as tiny parquet tables and the ops run unchanged.
  */
class AlgoEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def fixtureDir(name: String): String = {
    val d = new java.io.File(s"/root/repo/target/fixtures/$name")
    d.mkdirs()
    d.getPath
  }

  test("setsimJoin equals brute force on an adversarial corpus (dups, tiny docs, empties)") {
    import spark.implicits._
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",      // exact dup of 1
      3L -> "the quick brown fox jumps over the lazy cat",      // near dup of 1
      4L -> "a completely different document about spark joins here",
      5L -> "a completely different document about spark joins now",  // near dup of 4
      6L -> "one two",                                          // < 3 tokens: excluded
      7L -> "",                                                 // empty: excluded
      8L -> "the quick brown fox",                              // short overlap with 1
      9L -> "pad pad pad pad pad pad pad pad pad",              // repeated token
      10L -> "pad pad pad pad pad pad pad pad pad")             // exact dup of 9
    val dir = fixtureDir("setsim")
    texts.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def grams(t: String): Set[String] = {
      val l = t.split(" ").filter(_.nonEmpty)
      if (l.length < 3) Set.empty
      else l.sliding(3).map(_.mkString(" ")).toSet
    }
    val model = (for {
      (ia, ta) <- texts; (ib, tb) <- texts
      if ia < ib
      ga = grams(ta); gb = grams(tb)
      if ga.nonEmpty && gb.nonEmpty
      inter = (ga & gb).size
      j = BigDecimal(inter.toDouble / (ga.size + gb.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.7
    } yield (ia, ib, j)).toSet

    val got = TextQueries.setsimJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == model, s"got=$got model=$model")
    // the fixture must actually exercise the interesting cases
    assert(model.contains((1L, 2L, 1.0)) && model.contains((9L, 10L, 1.0)))
    assert(model.exists { case (a, b, j) => j < 1.0 && j >= 0.7 })
  }

  test("skyline equals pairwise dominance on ties, duplicates, and single points") {
    import spark.implicits._
    // (flag, price, qty): equal-price columns, equal-qty rows, exact dups,
    // a strictly-dominated chain, and a singleton group
    val pts = Seq(
      ("A", 1.00, 5.0), ("A", 1.00, 7.0),   // same price, keep only qty=7
      ("A", 2.00, 7.0),                     // same qty as frontier, pricier: dominated
      ("A", 3.00, 9.0), ("A", 3.00, 9.0),   // exact dup on the frontier
      ("A", 4.00, 8.0),                     // dominated by (3, 9)
      ("B", 10.00, 1.0))                    // singleton group
    val dir = fixtureDir("skyline")
    pts.zipWithIndex.map { case ((f, p, q), i) => (f, p, q, i.toLong) }
      .toDF("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val cents = pts.map { case (f, p, q) =>
      (f, math.floor(p * 100 + 0.5).toLong, math.floor(q * 100 + 0.5).toLong)
    }.distinct
    val model = cents.filter { case (f, p, q) =>
      !cents.exists { case (f2, p2, q2) =>
        f2 == f && (p2 <= p && q2 >= q) && (p2 < p || q2 > q)
      }
    }.toSet
    val got = RelationalQueries.skyline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == model, s"got=$got model=$model")
    assert(got == Set(("A", 100L, 700L), ("A", 300L, 900L), ("B", 1000L, 100L)))
  }

  test("two-phase sharded skyline equals the plain single-window frontier at every shard count") {
    import spark.implicits._
    // deterministic pseudo-random cloud, big enough that every shard of a
    // 16-way salt is non-trivially populated and shard frontiers overlap
    val rnd = new scala.util.Random(42)
    val pts = (1 to 2000).map { i =>
      val f = if (rnd.nextBoolean()) "A" else "B"
      (f, (rnd.nextInt(500) + 1) / 100.0 * 100, rnd.nextInt(300) / 10.0, i.toLong)
    }
    val dir = fixtureDir("skyline_sharded")
    pts.toDF("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val cents = pts.map { case (f, p, q, _) =>
      (f, math.floor(p * 100 + 0.5).toLong, math.floor(q * 100 + 0.5).toLong)
    }.distinct
    val model = cents.filter { case (f, p, q) =>
      !cents.exists { case (f2, p2, q2) =>
        f2 == f && (p2 <= p && q2 >= q) && (p2 < p || q2 > q)
      }
    }.toSet
    // sharded == plain: shards = 1 IS the plain single-window frontier, so
    // equality across shard counts is the sharded==plain property
    for (shards <- Seq(1, 3, 16)) {
      val got = RelationalQueries.skyline(spark, dir, shards).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == model, s"shards=$shards got=${got.size} model=${model.size}")
    }
  }
}
