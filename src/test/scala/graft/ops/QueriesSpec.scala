package graft.ops

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke over the declared operator inventory on sf0.001: every
  * registered query must build a plan, execute, and (except known-empty
  * candidate searches) produce rows. DuckDB value-level correctness is the
  * driver's job (CORRECTNESS_r*.json); this spec guards "it runs at all"
  * plus structural invariants. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  // near-dup searches may legitimately find nothing at tiny scale
  private val mayBeEmpty =
    Set("q_dedup_minhash", "q_dedup_simhash", "q_dedup_embedding", "q_dedup_clusters")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys without queries: $unknown")
  }

  test("flagship closed-form area: every group area is a multiple of 160000 m^2") {
    val bad = Pipelines.flagship(spark, dir, to5880 = false)
      .filter(org.apache.spark.sql.functions.expr("area % 160000.0 != 0"))
      .count()
    assert(bad == 0)
  }

  test("approx_count_distinct is within its 1% rsd of the exact count") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, dir)
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = RelationalQueries.approxDistinct(spark, dir).head().getLong(1)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("sharded packing conserves per-source docs and tokens") {
    import org.apache.spark.sql.functions._
    // sharding changes sequence boundaries, never membership: per-source
    // totals must match the unsharded packing exactly
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("docs"), sum(col("sum_tokens")).as("toks"))
        .orderBy(col("source")).collect().toSeq
    assert(totals(TextQueries.packSequencesSharded(spark, dir)) ==
      totals(TextQueries.packSequences(spark, dir)))
  }

  test("sessionize nanos->ms uses integer division (2^53 regression)") {
    import spark.implicits._
    // 1704067207179575175 ns: double division would round the low ms
    val ms = Seq(1704067207179575175L).toDF("ts")
      .selectExpr("ts DIV 1000000L AS tms").head().getLong(0)
    assert(ms == 1704067207179L)
  }
}
