package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark 4 SQL-surface operators: the VARIANT semi-structured type,
  * SQL pipe syntax, SQL-defined functions (scalar + table), and LATERAL
  * correlated subquery joins. These are language/engine capabilities a
  * user of the reference pipeline reaches for the moment their loader SQL
  * outgrows flat SELECTs (reference: spark_job/process_geodata.py runs its
  * whole transform as `spark.sql(...)` strings — this is the modern SQL
  * surface those strings graduate into).
  *
  * Every query here is a DECLARATIVE plan: the probes confirmed (see
  * PLANS.md) that Catalyst compiles each one to the same physical shape as
  * the hand-written DataFrame equivalent — pipe stages fold into one
  * Aggregate, SQL UDFs inline into the expression tree (no eval boundary,
  * codegen intact), and the correlated LATERAL-with-LIMIT decorrelates to
  * a broadcast join + WindowGroupLimit (partial under the shuffle), NOT a
  * per-outer-row subquery or nested-loop join.
  */
object SqlSurfaceQueries {
  import Tables._

  /** Schema-on-read over the VARIANT type (Spark 4 native semi-structured
    * path — the declared-schema complement of
    * [[RelationalQueries.jsonExtract]]'s `from_json`): construct a nested
    * JSON document per event, `parse_json` it into VARIANT, and extract
    * typed lanes back out with `variant_get` path expressions — nested
    * object (`$.who.id`), array index (`$.tags[1]`), top-level field — plus
    * the two failure lanes `try_variant_get` handles without aborting the
    * scan: a missing path and a type-mismatched cast (string field read as
    * BIGINT), both NULL. The events `props` column rides along as a second
    * VARIANT parsed from real stored text. Equality with the oracle's
    * direct-on-columns aggregate proves extract∘parse∘construct = identity
    * on every lane.
    *
    * Scale shape: VARIANT parse + path extraction are per-row expressions
    * inside the scan's codegen stage — no shuffle until the ≤O(event types)
    * group keys; the binary VARIANT encoding makes repeated `variant_get`
    * calls on one value cheap (parse once, navigate offsets), which is the
    * reason this beats N× `get_json_object` string re-parses at 100 TB. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir).createOrReplaceTempView("graft_events_variant")
    spark.sql(
      """WITH j AS (
        |  SELECT parse_json(to_json(named_struct(
        |           'who', named_struct('id', user_id, 'ty', event_type),
        |           'val_micros', CAST(floor(value * 1000000 + 0.5) AS BIGINT),
        |           'tags', array(event_id % 5, event_id % 3)))) AS v,
        |         parse_json(props) AS p
        |  FROM graft_events_variant
        |  WHERE value IS NOT NULL AND props IS NOT NULL)
        |SELECT variant_get(v, '$.who.ty', 'string') AS ty,
        |       count(*) AS n,
        |       sum(variant_get(v, '$.who.id', 'bigint')) AS sum_uid,
        |       sum(variant_get(v, '$.val_micros', 'bigint')) AS sum_micros,
        |       sum(variant_get(v, '$.tags[1]', 'bigint')) AS sum_tag1,
        |       count(try_variant_get(v, '$.who.absent', 'bigint')) AS n_missing_path,
        |       count(try_variant_get(v, '$.who.ty', 'bigint')) AS n_bad_cast,
        |       sum(variant_get(p, '$.k', 'bigint')) AS sum_k
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** SQL pipe syntax (`|>`): the same filter→derive→aggregate→having→sort
    * chain every loader writes, expressed as sequential pipe stages instead
    * of inside-out nested SELECTs. Catalyst folds the stages into the
    * identical logical plan — pipe `WHERE` before `AGGREGATE` is a scan
    * filter (pushed down), after it a HAVING — so the surface costs
    * nothing; the oracle is the classic-SQL spelling of the same query. */
  def pipeSyntax(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir).createOrReplaceTempView("graft_lineitem_pipe")
    spark.sql(
      """FROM graft_lineitem_pipe
        ||> WHERE l_quantity > 5
        ||> EXTEND CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        ||> AGGREGATE count(*) AS n, sum(cents) AS sum_cents,
        |             CAST(max(l_quantity) AS BIGINT) AS max_qty
        |   GROUP BY l_returnflag, l_linestatus
        ||> WHERE n > 10
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN`): a scalar
    * UDF (exact-cents), a second scalar UDF used as a grouping key
    * (discount band), and a TABLE function enumerating the band dimension —
    * the catalog-level reuse unit for the house integer-exactness devices.
    * Unlike JVM/Python UDFs these are INLINED by the analyzer: the plan
    * contains the expanded CASE/floor expression trees, stays inside
    * whole-stage codegen, and the scan still sees pushable predicates.
    * The oracle replays the bodies inline — equal results prove the
    * definition/invocation indirection is semantically free. */
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir).createOrReplaceTempView("graft_lineitem_udf")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE)
        |RETURNS BIGINT RETURN CAST(floor(x * 100 + 0.5) AS BIGINT)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_band(d DOUBLE)
        |RETURNS STRING RETURN
        |  CASE WHEN d < 0.03 THEN 'low'
        |       WHEN d < 0.07 THEN 'mid'
        |       ELSE 'high' END""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_bands()
        |RETURNS TABLE(band STRING, band_ord INT)
        |RETURN SELECT * FROM VALUES ('low', 1), ('mid', 2), ('high', 3)
        |  AS t(band, band_ord)""".stripMargin)
    spark.sql(
      """SELECT b.band, b.band_ord, a.n, a.sum_cents
        |FROM (SELECT graft_disc_band(l_discount) AS band,
        |             count(*) AS n,
        |             sum(graft_cents(l_extendedprice)) AS sum_cents
        |      FROM graft_lineitem_udf GROUP BY 1) a
        |JOIN graft_bands() b ON a.band = b.band
        |ORDER BY b.band_ord""".stripMargin)
  }

  /** LATERAL correlated subquery join with per-outer-row ORDER BY + LIMIT —
    * the "top-N related rows for each outer row" idiom (top nations per
    * region by customer balance). The declarative spelling every SQL user
    * writes first; Spark DECORRELATES it (probe-confirmed, PLANS.md): one
    * nation⨝customer broadcast join, one aggregate, then WindowGroupLimit
    * (partial BELOW the shuffle, so each map task forwards ≤2 rows per
    * region) + row_number — identical physical work to the hand-rolled
    * window-rank top-N, zero per-outer-row execution, no nested-loop join.
    * Ties broken by name inside the LIMIT so the result is a function of
    * the data. */
  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    region(spark, dir).createOrReplaceTempView("graft_region_lat")
    nation(spark, dir).createOrReplaceTempView("graft_nation_lat")
    customer(spark, dir).createOrReplaceTempView("graft_customer_lat")
    spark.sql(
      """SELECT r.r_name AS region, l.nation, l.nation_cents
        |FROM graft_region_lat r
        |JOIN LATERAL (
        |  SELECT n.n_name AS nation,
        |         sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS nation_cents
        |  FROM graft_nation_lat n
        |  JOIN graft_customer_lat c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY nation_cents DESC, nation
        |  LIMIT 2) l
        |ORDER BY region, nation_cents DESC, nation""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_variant_extract" -> (variantExtract _),
    "q_pipe_syntax" -> (pipeSyntax _),
    "q_sql_udf" -> (sqlUdf _),
    "q_lateral_topn" -> (lateralTopN _))

  val oracles: Map[String, String] = Map(
    // direct-on-columns replay: construct→parse→extract must be identity
    // on every lane; props.k re-parsed via DuckDB's JSON path
    "q_variant_extract" ->
      """SELECT event_type AS ty,
        |       count(*) AS n,
        |       CAST(sum(user_id) AS BIGINT) AS sum_uid,
        |       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micros,
        |       CAST(sum(event_id % 3) AS BIGINT) AS sum_tag1,
        |       CAST(0 AS BIGINT) AS n_missing_path,
        |       CAST(0 AS BIGINT) AS n_bad_cast,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE value IS NOT NULL AND props IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pipe_syntax" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       CAST(max(l_quantity) AS BIGINT) AS max_qty
        |FROM lineitem
        |WHERE l_quantity > 5
        |GROUP BY l_returnflag, l_linestatus
        |HAVING count(*) > 10
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the UDF bodies inlined — proves define/invoke is semantically free
    "q_sql_udf" ->
      """SELECT b.band, b.band_ord, a.n, a.sum_cents
        |FROM (SELECT CASE WHEN l_discount < 0.03 THEN 'low'
        |                  WHEN l_discount < 0.07 THEN 'mid'
        |                  ELSE 'high' END AS band,
        |             count(*) AS n,
        |             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |      FROM lineitem GROUP BY 1) a
        |JOIN (VALUES ('low', 1), ('mid', 2), ('high', 3)) b(band, band_ord)
        |  ON a.band = b.band
        |ORDER BY b.band_ord""".stripMargin,
    // DuckDB runs the SAME lateral decorrelation
    "q_lateral_topn" ->
      """SELECT r.r_name AS region, l.nation, l.nation_cents
        |FROM region r, LATERAL (
        |  SELECT n.n_name AS nation,
        |         CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS nation_cents
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY nation_cents DESC, nation
        |  LIMIT 2) l
        |ORDER BY region, nation_cents DESC, nation""".stripMargin)
}
