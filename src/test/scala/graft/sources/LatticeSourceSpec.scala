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

  test("reported statistics are the closed form, shrink under pushdown, and drive the broadcast flip") {
    // exact size: rows x schema defaultSize (4+4+8+8 = 24 bytes)
    def sizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sizeOf(load(regions = 3, sites = 10)) == BigInt(3 * 10 * 24))
    // filter pushdown shrinks the estimate to the admitted region
    assert(sizeOf(load(regions = 25, sites = 100).filter(col("r") === 3)) ==
      BigInt(100 * 24))
    // column pruning shrinks the per-row width (r, pos = 8 bytes)
    assert(sizeOf(load(regions = 3, sites = 10).select(col("r"), col("pos"))) ==
      BigInt(3 * 10 * 8))
    // keepMod thinning is reflected (closed-form admitted count)
    assert(sizeOf(load(regions = 2, sites = 14, keepMod = 7)) ==
      BigInt(2 * (0 until 14).count(_ % 7 < 3) * 24))

    // the flip, lattice-vs-lattice so BOTH sides carry exact stats: the
    // SAME unhinted equi join auto-broadcasts a stats-small probe side
    // and refuses a stats-huge one (pre-stats, every DSv2 relation
    // reported defaultSizeInBytes = Long.Max and could never broadcast)
    val fact = load(regions = 25, sites = 200000) // 25*2e5*24 = 120 MB
    def joined(sites: Int) = fact.join(
      load(regions = 25, sites = sites)
        .select(col("r").as("r2"), col("pos").as("pos2")),
      col("r") === col("r2"))
    val small = joined(100).queryExecution.sparkPlan.toString // 60 KB side
    assert(small.contains("BroadcastHashJoin") && small.contains("BuildRight"),
      small.take(2000))
    val big = joined(2000000).queryExecution.sparkPlan.toString // 1.2 GB side
    assert(!big.contains("BroadcastHashJoin"), big.take(2000))
    assert(big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin"),
      big.take(2000))
    // same declarative form both ways, and the small join computes
    assert(joined(2).count() == 25L * 200000 * 2) // 2 matches per probe row
  }

  test("reported key-grouped partitioning elides the aggregation exchange") {
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // sum(pos) is NOT an accepted pushdown aggregate, so the row scan
      // (and its KeyGroupedPartitioning) survives — the shape this
      // storage-partitioned device exists for
      val agg = load(sites = 100).groupBy(col("r"))
        .agg(sum(col("pos").cast("long")).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy(r) over the key-grouped source should not shuffle:\n${plan.take(1200)}")
      // and the values are still right
      assert(agg.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
        (0 until 25).map((_, 4950L)).toSet)
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
      // sum: not pushdown-accepted, so both row scans keep their
      // key-grouped partitioning and the join lines partitions up
      val l = load(sites = 100).groupBy(col("r")).agg(sum(col("pos").cast("long")).as("na"))
      val r = load(sites = 50).groupBy(col("r")).agg(sum(col("pos").cast("long")).as("nb"))
      val j = l.join(r, "r")
      val rows = j.collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSet
      assert(rows == (0 until 25).map((_, 4950L, 1225L)).toSet)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ should need no shuffle on either side:\n${plan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("aggregate pushdown collapses to closed-form summary rows: zero data rows generated") {
    // grouped (COMPLETE pushdown): one summary row per region, readers
    // never iterate sites — assert the plan AND values vs the row path
    val agg = load(sites = 100, keepMod = 7).filter(col("r") < 5)
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"), max(col("pos")).as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAgg=[count,min_pos,max_pos groupBy=r]"), plan.take(1200))
    assert(plan.contains("pushed=[LessThan(r,5)]"), plan.take(1200)) // filter CONSUMED, not residual
    val got = agg.collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val wantN = LatticeSource.admittedCount(100, 7)
    val wantMx = LatticeSource.maxAdmittedPos(100, 7)
    assert(got == (0 until 5).map(r => (r, wantN, 0, wantMx)).toSet, got)
    // ungrouped (partial pushdown): per-partition summaries merged by Spark
    val g = load(sites = 100, keepMod = 7)
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx")).collect()(0)
    assert((g.getLong(0), g.getInt(1)) == (25L * wantN, wantMx))
    // every partition statically pruned + ungrouped: SQL empty-aggregate
    // semantics (count 0, null extrema), via the sentinel summary row
    val e = load().filter(col("r") === 99)
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn")).collect()(0)
    assert(g != null && e.getLong(0) == 0L && e.isNullAt(1))
    // a non-accepted aggregate (sum) keeps the row-scan path — and the
    // two paths agree on the shared count/min/max semantics
    val s2 = load(sites = 100, keepMod = 7).filter(col("r") < 5)
      .groupBy(col("r")).agg(sum(col("pos").cast("long")).as("s"))
    assert(!s2.queryExecution.executedPlan.toString.contains("pushedAgg="))
    assert(s2.count() == 5L)
  }

  test("runtime V2 filtering: a join's build side prunes partitions before readers open") {
    // the dim filters on a NON-key column, so nothing is inferable
    // statically — only the DPP runtime IN(r, ...) can prune the source
    val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .filter(col("n_name").isin("NATION_2", "NATION_3"))
      .select(col("n_nationkey").cast("int").as("rk"))
    LatticeSource.readersOpened.set(0)
    val j = load(sites = 1000).join(dim, col("r") === col("rk"))
      .groupBy(col("rk")).count()
    val rows = j.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(rows == Set((2, 1000L), (3, 1000L)))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"), plan.take(1500))
    // 2 of 25 partitions opened readers; pruning happened BEFORE any read
    assert(LatticeSource.readersOpened.get() == 2L,
      s"readersOpened=${LatticeSource.readersOpened.get()}")
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

  test("top-N pushdown caps generation per partition; non-ascending orders don't push") {
    // ORDER BY r, pos LIMIT 40: every sort key is an ASC column of
    // (r, pos) => pushed. Each of the 25 region partitions emits at
    // most 40 rows instead of admittedCount(2500, 7) ≈ 1072.
    LatticeSource.rowsEmitted.set(0)
    val top = load(keepMod = 7).orderBy(col("r"), col("pos")).limit(40)
    assert(top.queryExecution.executedPlan.toString.contains("pushedLimit=40"),
      top.queryExecution.executedPlan.toString.take(1200))
    val got = top.collect().map(r => (r.getInt(0), r.getInt(1)))
    val wantPos = (0 until 2500).filter(_ % 7 < 3).take(40)
    assert(got.toSeq == wantPos.map((0, _)), got.take(5).toSeq)
    assert(LatticeSource.rowsEmitted.get() <= 40L * 25,
      s"rowsEmitted=${LatticeSource.rowsEmitted.get()}")
    // plain LIMIT (no sort) pushes too — generation capped the same way
    LatticeSource.rowsEmitted.set(0)
    assert(load(keepMod = 7).limit(5).collect().length == 5)
    assert(LatticeSource.rowsEmitted.get() <= 5L * 25,
      s"rowsEmitted=${LatticeSource.rowsEmitted.get()}")
    // DESC ordering violates the generation-order contract: not pushed,
    // result still correct (Spark sorts the full scan)
    LatticeSource.rowsEmitted.set(0)
    val desc = load(keepMod = 7).orderBy(col("pos").desc).limit(3)
    assert(!desc.queryExecution.executedPlan.toString.contains("pushedLimit"))
    assert(desc.collect().map(_.getInt(1)).toSeq ==
      Seq.fill(3)(LatticeSource.maxAdmittedPos(2500, 7)))
    assert(LatticeSource.rowsEmitted.get() == 25L * LatticeSource.admittedCount(2500, 7),
      s"rowsEmitted=${LatticeSource.rowsEmitted.get()}")
  }
}
