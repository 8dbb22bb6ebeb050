package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit operators — the validation gates a production
  * pipeline runs before a table is published or a corpus ships to
  * training: column profiling (completeness + cardinality) and declared
  * data-contract expectations with violation counts.
  */
object AuditQueries {
  import Tables._

  private val ProfileCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Column profile of `orders`: per column, row count, null count and
    * exact distinct cardinality — the completeness/cardinality audit
    * (the deequ/GE "profile" primitive) as one declarative pass.
    *
    * Scale shape: ONE scan. The multiple COUNT(DISTINCT) resolve through
    * Catalyst's Expand (each input row fans out once per audited column
    * before the partial aggregate) — shuffle volume is #cols × the
    * DISTINCT key width, the standard engine-native trade for exact
    * multi-column cardinality in a single pass; swap countDistinct for
    * approx_count_distinct when ±2% cardinality is acceptable and the
    * Expand disappears. The per-column reshape is a driver-side literal
    * stack over ONE aggregated row, not a data operation. */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val aggs = ProfileCols.flatMap { c =>
      // coalesce: sum over an EMPTY table is NULL, but "zero nulls" is the
      // correct profile of an empty column (count/countDistinct already
      // return 0 there)
      Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"))
    }
    val one = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr = ProfileCols
      .map(c => s"'$c', ${c}_nulls, ${c}_distinct")
      .mkString(s"stack(${ProfileCols.size}, ", ", ", ")")
    one.select(col("n_rows"),
        expr(s"$stackExpr AS (col_name, n_null, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
      .orderBy(col("col_name"))
  }

  /** Declared expectations over `orders` — the data-contract check: each
    * rule is a boolean predicate; the query reports how many rows violate
    * each and whether the contract holds. One scan, conditional map-side
    * partials, a literal reshape on the single aggregated row; at 100 TB
    * this is exactly one pass over the table regardless of rule count. */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    val rules: Seq[(String, String)] = Seq(
      "totalprice_positive" -> "o_totalprice > 0",
      "status_in_enum" -> "o_orderstatus IN ('O', 'F')",
      "orderdate_in_range" ->
        "o_orderdate >= TIMESTAMP '1992-01-01' AND o_orderdate < TIMESTAMP '2001-01-01'",
      "custkey_present" -> "o_custkey IS NOT NULL",
      "price_below_cap" -> "o_totalprice <= 400000")
    val o = orders(spark, dir)
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      // coalesce: an empty table violates nothing (sum over empty is NULL)
      coalesce(sum(when(expr(pred), 0L).otherwise(1L)), lit(0L)).as(s"v$i")
    }
    val one = o.agg(count(lit(1)).as("n_checked"), aggs: _*)
    val stackExpr = rules.indices
      .map(i => s"'${rules(i)._1}', v$i")
      .mkString(s"stack(${rules.size}, ", ", ", ")")
    one.select(col("n_checked"), expr(s"$stackExpr AS (rule, n_violations)"))
      .select(col("rule"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy(col("rule"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> (profile _),
    "q_expectations" -> (expectations _),
  )

  val oracles: Map[String, String] = Map(
    "q_profile" -> {
      val branches = ProfileCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |       CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |       count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
      }
      branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_expectations" ->
      """WITH v AS (
        |  SELECT count(*) AS n_checked,
        |    count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, false)) AS v0,
        |    count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O', 'F'), false)) AS v1,
        |    count(*) FILTER (WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1992-01-01'
        |                            AND o_orderdate < TIMESTAMP '2001-01-01', false)) AS v2,
        |    count(*) FILTER (WHERE o_custkey IS NULL) AS v3,
        |    count(*) FILTER (WHERE NOT coalesce(o_totalprice <= 400000, false)) AS v4
        |  FROM orders)
        |SELECT r.rule, v.n_checked, r.n_violations, r.n_violations = 0 AS pass
        |FROM v, LATERAL (VALUES
        |  ('totalprice_positive', CAST(v0 AS BIGINT)),
        |  ('status_in_enum', CAST(v1 AS BIGINT)),
        |  ('orderdate_in_range', CAST(v2 AS BIGINT)),
        |  ('custkey_present', CAST(v3 AS BIGINT)),
        |  ('price_below_cap', CAST(v4 AS BIGINT))) AS r(rule, n_violations)
        |ORDER BY r.rule""".stripMargin,
  )
}
