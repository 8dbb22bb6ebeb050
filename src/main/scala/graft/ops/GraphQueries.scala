package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a relation-derived edge list. The companion to
  * the union-find connected components in [[TextQueries.dedupClusters]]:
  * where CC answers "which rows are the same entity", PageRank answers
  * "which entities matter" — the link-based importance score used to
  * weight training documents by citation/reference structure.
  */
object GraphQueries {
  import Tables._

  /** Damped PageRank, two synchronous iterations, exact integer micros.
    *
    * The graph: distinct (part-bucket → supplier-bucket) edges from
    * lineitem — a stand-in for any edge relation (hyperlinks, citations);
    * the operator never looks at how edges were made. All arithmetic is
    * integer: per-edge contribution `rank DIV out_degree`, damping
    * `150000 + (850000 * inflow) DIV 1000000` — both engines replay it
    * bit-for-bit, no float sums in any order. Dangling-node mass is
    * dropped (the uniform-redistribution variant changes only the
    * constant term; documented, not modeled).
    *
    * Scale shape per iteration: one hash equi join of edges against the
    * current rank relation on src (at web scale: ranks partition by src
    * and the join co-locates after the first shuffle) + one aggregate on
    * dst with map-side partials. Out-degrees join in once. The rank
    * relation is |V| rows — always the small side; nothing ever
    * collects to the driver, and iterations are unrolled declaratively
    * so Catalyst sees one plan (an iterative runner would localCheckpoint
    * each step — same shuffles, shorter lineage). */
  def pagerank(spark: SparkSession, dir: String, iterations: Int = 2): DataFrame = {
    val edges = lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(100L)).as("src"),
        pmod(col("l_suppkey"), lit(100L)).as("dst"))
      .distinct()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val init = nodes.withColumn("r", lit(1000000L))
    val ranks = (1 to iterations).foldLeft(init) { (cur, _) =>
      val contrib = edges
        .join(cur.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("r DIV d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(850000 * coalesce(inflow, 0)) DIV 1000000")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_micros")).orderBy(col("node"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> ((s, d) => pagerank(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q_pagerank" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_partkey % 100 AS src, l_suppkey % 100 AS dst
        |  FROM lineitem),
        |nodes AS (
        |  SELECT DISTINCT src AS node FROM edges
        |  UNION SELECT DISTINCT dst FROM edges),
        |outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |in1 AS (
        |  SELECT e.dst, CAST(sum(r0.r // o.d) AS BIGINT) AS inflow
        |  FROM edges e JOIN r0 ON e.src = r0.node JOIN outdeg o ON e.src = o.src
        |  GROUP BY e.dst),
        |r1 AS (
        |  SELECT n.node,
        |         150000 + (850000 * coalesce(in1.inflow, 0)) // 1000000 AS r
        |  FROM nodes n LEFT JOIN in1 ON n.node = in1.dst),
        |in2 AS (
        |  SELECT e.dst, CAST(sum(r1.r // o.d) AS BIGINT) AS inflow
        |  FROM edges e JOIN r1 ON e.src = r1.node JOIN outdeg o ON e.src = o.src
        |  GROUP BY e.dst),
        |r2 AS (
        |  SELECT n.node,
        |         150000 + (850000 * coalesce(in2.inflow, 0)) // 1000000 AS r
        |  FROM nodes n LEFT JOIN in2 ON n.node = in2.dst)
        |SELECT node, CAST(r AS BIGINT) AS rank_micros FROM r2 ORDER BY node""".stripMargin,
  )
}
