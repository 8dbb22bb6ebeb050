package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 source's three contracts: content (generator closed form),
  * partition-exact filter pushdown (pruned regions never become
  * InputPartitions), and column pruning reaching the reader. */
class LatticeSourceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark

  private def load(regions: Int = 25, sites: Int = 2500, keepMod: Int = 0) =
    spark.read.format("graft.sources.LatticeSource")
      .option("regions", regions).option("sites", sites)
      .option("keepMod", keepMod).load()

  test("content matches the generator closed form") {
    val got = load(regions = 3, sites = 10)
      .select(col("r"), col("pos"), col("x"), col("y"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val want = (for (r <- 0 until 3; p <- 0 until 10)
      yield (r, p, LatticeSource.siteX(r, p), LatticeSource.siteY(r, p))).toSet
    assert(got == want)
    // keepMod drops pos % m >= 3
    assert(load(regions = 1, sites = 14, keepMod = 7).count() ==
      (0 until 14).count(_ % 7 < 3))
  }

  test("r predicates prune InputPartitions at planning time") {
    assert(load().rdd.getNumPartitions == 25)
    assert(load().filter(col("r") === 3).rdd.getNumPartitions == 1)
    assert(load().filter(col("r") >= 10 && col("r") <= 14)
      .rdd.getNumPartitions == 5)
    assert(load().filter(col("r").isin(1, 5, 9)).rdd.getNumPartitions == 3)
    // non-r predicates do not prune (and do not break)
    assert(load().filter(col("pos") === 1).rdd.getNumPartitions == 25)
    // residual re-evaluation keeps correctness: values, not just counts
    val got = load(sites = 100).filter(col("r") === 3 && col("pos") < 5)
      .select(col("pos")).collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(0, 1, 2, 3, 4))
  }

  test("reported key-grouped partitioning elides the aggregation exchange") {
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val agg = load(sites = 100).groupBy(col("r")).agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy(r) over the key-grouped source should not shuffle:\n${plan.take(1200)}")
      // and the values are still right
      assert(agg.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
        (0 until 25).map((_, 100L)).toSet)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  test("storage-partitioned JOIN between two lattice scans runs with zero exchanges") {
    val prev = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real two-sided join
    try {
      val l = load(sites = 100).groupBy(col("r")).agg(count(lit(1)).as("na"))
      val r = load(sites = 50).groupBy(col("r")).agg(count(lit(1)).as("nb"))
      val j = l.join(r, "r")
      val rows = j.collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSet
      assert(rows == (0 until 25).map((_, 100L, 50L)).toSet)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ should need no shuffle on either side:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pushdown and column pruning are visible in the scan, and an empty prune is fine") {
    val df = load().filter(col("r") === 7).select(col("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("EqualTo(r,7)"), plan.take(800))
    assert(plan.contains("read=[r]"), plan.take(800))
    assert(df.count() == 2500)
    // contradiction prunes every partition -> empty result, no reader runs
    val none = load().filter(col("r") === 99)
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0)
  }
}
