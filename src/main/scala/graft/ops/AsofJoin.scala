package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the temporal operator Spark lacks natively (builder-brief
  * example of a custom operator; DuckDB has it as ASOF JOIN, which is the
  * oracle). For every left row, attach the right row with the greatest
  * timestamp <= the left timestamp within the same key.
  *
  * Implementation composes existing operators (preference (a) of the
  * custom-operator ladder): tag and union both sides, run one
  * last-non-null window over (key, time), keep left rows. One shuffle on
  * the key, both sides sorted once — the same cost profile as a
  * sort-merge join, with no per-row probing; this is the formulation that
  * scales to unbounded history because the window state is one row.
  */
object AsofJoin {

  /** events ⟕asof orders on user/customer key and millisecond time:
    * each event picks the user's most recent order at or before it.
    * Rows tagged 0 (right) sort before tag 1 (left) at equal times, so
    * "at or before" includes same-instant rows; equal-time right rows
    * sort by payload so the frame's last (= the pick) is the max payload,
    * deterministically, with no pre-dedup aggregate. */
  def eventsAsofOrders(spark: SparkSession, dir: String): DataFrame = {
    // the order side's NTZ->epoch conversion goes through the session zone
    // while the event side is raw epoch nanos; any zone but UTC would skew
    // the two time axes against each other — fail fast instead of
    // returning silently shifted matches
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "as-of join requires spark.sql.session.timeZone=UTC (NTZ order dates are interpreted in the session zone)")
    val right = Tables.orders(spark, dir)
      .select(col("o_custkey").as("k"),
        // parquet ms-timestamps read as TIMESTAMP_NTZ; the session is UTC,
        // so the LTZ cast yields the same epoch DuckDB's epoch_ms computes
        unix_millis(col("o_orderdate").cast("timestamp")).as("t"),
        col("o_orderkey").as("payload"))
      .withColumn("tag", lit(0))
      .withColumn("event_id", lit(null).cast("long"))
    val left = Tables.events(spark, dir)
      .select(col("user_id").as("k"),
        expr("ts DIV 1000000L").as("t"),
        col("event_id"))
      .withColumn("payload", lit(null).cast("long"))
      .withColumn("tag", lit(1))
      .select(col("k"), col("t"), col("payload"), col("tag"), col("event_id"))
    // payload as the final sort key replaces a pre-dedup aggregate on the
    // right side: among equal-time right rows the LAST one in frame order
    // is the max payload, which is exactly what `last(ignoreNulls)` picks
    // — and dropping the aggregate leaves this window's exchange as the
    // plan's ONLY shuffle (left-row ties sort by a null payload, which
    // cannot affect the ignore-nulls pick)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"), col("payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    right.unionByName(left)
      .withColumn("asof_payload", last(col("payload"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("asof_payload").as("o_orderkey"))
      .orderBy(col("event_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (eventsAsofOrders _),
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS k, epoch_ms(o_orderdate) AS t,
        |         max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2),
        |e AS (
        |  SELECT event_id, user_id, CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS tms
        |  FROM events)
        |SELECT e.event_id, e.user_id, o.o_orderkey
        |FROM e ASOF LEFT JOIN o ON e.user_id = o.k AND e.tms >= o.t
        |ORDER BY event_id""".stripMargin,
  )
}
