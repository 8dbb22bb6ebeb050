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

  /** Per-node triangle participation — the local clustering signal used
    * for community/spam structure in link graphs. Exact enumeration via
    * DEGREE-ORDERED edge orientation (the standard scale trick): rank
    * every node by (degree, id), orient each undirected edge toward the
    * higher rank, and count wedges only at each triangle's lowest-rank
    * corner. Orientation bounds every node's out-degree by O(√|E|) on any
    * graph, so the wedge join — the quadratic step of naive triangle
    * counting — is Σ outdeg² ≤ |E|^1.5 instead of Σ deg² (which a hub
    * node makes catastrophic at link-graph scale). The plan is three
    * hash equi joins + one aggregate: wedges pair oriented edges on their
    * low corner, the closing edge joins on the (high, highest) pair, and
    * the three corners of each found triangle unpivot into one count per
    * node. Rank packs as `degree·1000 + node` (injective while node ids
    * < 1000 — guarded) so the order is one integer both engines compare
    * identically. */
  def triangles(spark: SparkSession, dir: String, buckets: Int = 300): DataFrame =
    triangleParts(spark, dir, buckets)._2.orderBy(col("node"))

  /** Shared kernel of [[triangles]] and [[clusteringCoef]]: the distinct
    * undirected edge list's (degrees, per-node triangle counts). */
  private def triangleParts(spark: SparkSession, dir: String,
      buckets: Int): (DataFrame, DataFrame) = {
    require(buckets <= 1000, s"rank packing needs node ids < 1000, got $buckets")
    val raw = lineitem(spark, dir).select(
      pmod(col("l_partkey"), lit(buckets.toLong)).as("x"),
      pmod(col("l_suppkey"), lit(buckets.toLong)).as("y"))
      .filter(col("x") =!= col("y"))
    val und = raw.select(least(col("x"), col("y")).as("u"),
      greatest(col("x"), col("y")).as("v")).distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val rank = deg.select(col("node"), (col("d") * 1000L + col("node")).as("rk"))
    val withRanks = und
      .join(rank.select(col("node").as("u"), col("rk").as("rku")), "u")
      .join(rank.select(col("node").as("v"), col("rk").as("rkv")), "v")
    val oriented = withRanks.select(
      when(col("rku") < col("rkv"), col("u")).otherwise(col("v")).as("a"),
      when(col("rku") < col("rkv"), col("v")).otherwise(col("u")).as("b"),
      when(col("rku") < col("rkv"), col("rkv")).otherwise(col("rku")).as("rb"))
    val e1 = oriented.select(col("a"), col("b").as("b1"), col("rb").as("rb1"))
    val e2 = oriented.select(col("a"), col("b").as("b2"), col("rb").as("rb2"))
    val wedges = e1.join(e2, Seq("a")).filter(col("rb1") < col("rb2"))
    val closing = oriented.select(col("a").as("b1"), col("b").as("b2"))
    val tri = wedges.join(closing, Seq("b1", "b2"))
    val triCounts = tri.select(col("a").as("node"))
      .union(tri.select(col("b1").as("node")))
      .union(tri.select(col("b2").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    (deg, triCounts)
  }

  /** Local clustering coefficient — per node, the fraction of its
    * neighbor PAIRS that are themselves connected: cc(v) = 2·tri(v) /
    * (d(v)·(d(v)−1)); the community-tightness feature next to raw
    * triangle counts (Watts–Strogatz 1998). Emitted as the exact
    * rational in ppm (integer DIV — both engines share the arithmetic),
    * with triangle-free nodes kept via the left join (cc = 0) and
    * degree-1 nodes excluded (the coefficient is undefined there — a
    * documented rule, not a dropped row).
    *
    * Scale shape: identical to [[triangles]] (the rank-oriented wedge
    * join — each triangle counted exactly once, no hub explosion) plus
    * one degree-keyed join on the ≤|nodes| relation. */
  def clusteringCoef(spark: SparkSession, dir: String): DataFrame = {
    val (deg, tri) = triangleParts(spark, dir, 300)
    deg.filter(col("d") >= 2)
      .join(tri, Seq("node"), "left")
      .select(col("node"), col("d"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_ppm", expr("(2000000 * n_tri) DIV (d * (d - 1))"))
      .orderBy(col("node"))
  }

  /** K-hop neighborhood size (k=2): per node, how many distinct nodes a
    * directed path of length 1 and of length 2 reaches — the local
    * influence/expansion measure behind graph features (friend-of-friend
    * counts, citation reach) and sampling fan-out estimation.
    *
    * Scale shape: `n_1hop` is one aggregate over the edge list. The 2-hop
    * relation is edges self-joined on the middle node — a hash equi join
    * whose raw output is Σ_mid indeg·outdeg rows. On a power-law graph a
    * hub mid makes that product explode, so the join carries a HUB CAP:
    * mids with out-degree > `maxMidDeg` are excluded (loudly-by-rule,
    * the same production guard as [[linkPredictRa]]'s `maxWedge` gate),
    * which bounds the join output by maxMidDeg·|E| — LINEAR in the edge
    * count, hub-proof. The oracle mirrors the cap explicitly. When exact
    * full-graph reach is required instead, the distinct count swaps for
    * an HLL sketch merged over mids ([[RelationalQueries]]'s
    * approx_count_distinct) at ±2%. The bucket modulus keeps |V| fixed
    * so both engines replay the same graph; the 300-bucket test graph is
    * near-complete (out-degrees ≤ 299 < 1024), so the default cap keeps
    * it intact — the cap's pruning behavior is exercised against a
    * brute-force model on a hub-heavy fixture in AlgoEquivalenceSpec. */
  def khopReach(spark: SparkSession, dir: String, buckets: Int = 300,
                maxMidDeg: Int = 1024): DataFrame = {
    val e = lineitem(spark, dir).select(
        pmod(col("l_partkey"), lit(buckets.toLong)).as("src"),
        pmod(col("l_suppkey"), lit(buckets.toLong)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val hop1 = e.groupBy(col("src")).agg(count(lit(1)).as("n_1hop"))
    // hub cap: only mids whose fan-out is bounded participate in hop 2
    val mids = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .filter(col("od") <= maxMidDeg.toLong)
      .select(col("src").as("mid"))
    val two = e.select(col("src"), col("dst").as("mid"))
      .join(e.select(col("src").as("mid"), col("dst").as("dst2"))
        .join(mids, Seq("mid"), "left_semi"), "mid")
      .filter(col("dst2") =!= col("src"))
      .select(col("src"), col("dst2")).distinct()
    val hop2 = two.groupBy(col("src")).agg(count(lit(1)).as("n_2hop"))
    hop1.join(hop2, Seq("src"), "left")
      .select(col("src").as("node"), col("n_1hop"),
        coalesce(col("n_2hop"), lit(0L)).as("n_2hop"))
      .orderBy(col("node"))
  }

  /** Community detection by synchronous MIN-label propagation, two
    * unrolled rounds: every node starts as its own label and repeatedly
    * adopts the minimum label over itself and its neighbors — after k
    * rounds, labels have flooded k hops, and connected regions converge
    * toward their minimum node id (the deterministic variant of LPA;
    * frequency-based LPA tie-breaks randomly, which no oracle could
    * mirror). The same kernel [[TextQueries.dedupClusters]] iterates to a
    * fixpoint for exact components; exposed here as the bounded-round
    * graph operator, useful when "roughly-communities after k hops" is
    * the product (feature hashing, partition hinting) and a fixpoint
    * isn't worth its extra rounds.
    *
    * Scale shape per round: one hash equi join of the bidirectional edge
    * list against the |V|-row label relation + a min-aggregate — both
    * partition by the same key at scale; iterations unroll declaratively
    * so Catalyst sees one plan. */
  def labelProp(spark: SparkSession, dir: String, rounds: Int = 2,
                buckets: Int = 300): DataFrame = {
    val und = lineitem(spark, dir).select(
        pmod(col("l_partkey"), lit(buckets.toLong)).as("x"),
        pmod(col("l_suppkey"), lit(buckets.toLong)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val bidir = und.select(col("x").as("src"), col("y").as("dst"))
      .union(und.select(col("y").as("src"), col("x").as("dst")))
    val nodes = bidir.select(col("src").as("node")).distinct()
    val init = nodes.withColumn("lbl", col("node"))
    val done = (1 to rounds).foldLeft(init) { (cur, _) =>
      bidir.join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("lbl"))
        .union(cur)
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
    }
    done.orderBy(col("node"))
  }

  /** Link prediction by the Resource-Allocation index (Zhou, Lü &amp; Zhang
    * 2009 — the integer-friendly sibling of Adamic-Adar): predicted
    * affinity between two part buckets = Σ over shared orders of
    * 1/|order|, here in exact micros (`1000000 DIV order_size`) so both
    * engines replay the sum bit-for-bit. The bipartite wedge runs through
    * the ORDER side — the side whose degree is naturally bounded (TPC-H
    * ≤7 parts/order; web graphs: documents, baskets, sessions) — so the
    * per-wedge fan-out is O(d²) of a SMALL d, never of a hub part. A
    * `maxWedge` gate (64) makes the bound explicit: a pathological
    * container wider than that is excluded loudly-by-rule rather than
    * quadratically exploding, the standard production guard.
    *
    * Scale shape: one distinct on (order, part), ONE grouped
    * collect-sorted-list per order (the wedge container is ≤maxWedge by
    * the gate, so the array is bounded), pair enumeration INSIDE the row
    * by array algebra (the same in-bucket device as the MinHash pair
    * generation — no self-join, so the order key shuffles once instead
    * of three times), one grouped sum with map-side partials, then a
    * global top-50 which Catalyst plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort). Ties break (score DESC,
    * a, b) — fully deterministic. */
  def linkPredictRa(spark: SparkSession, dir: String, k: Int = 50,
                    maxWedge: Int = 64): DataFrame = {
    val e = lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), pmod(col("l_partkey"), lit(200L)).as("p"))
      .distinct()
    val grouped = e.groupBy(col("o"))
      .agg(sort_array(collect_list(col("p"))).as("ps"), count(lit(1)).as("d"))
      .filter(col("d") <= maxWedge && col("d") >= 2)
    // ordered pairs (i < j) of the sorted distinct array: fan-out bounded
    // by maxWedge^2/2 per container
    val pairs = grouped.select(col("d"), explode(expr(
      "flatten(transform(ps, (x, i) -> " +
        "transform(slice(ps, i + 2, size(ps) - i - 1), " +
        "y -> struct(x AS pa, y AS pb))))")).as("pr"))
    pairs.select(col("pr.pa").as("pa"), col("pr.pb").as("pb"),
        expr("1000000 DIV d").as("c"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n_common"), sum(col("c")).as("score_micros"))
      .orderBy(col("score_micros").desc, col("pa"), col("pb"))
      .limit(k)
  }

  /** Bounded-round k-core peeling (Seidman 1983's coreness, the
    * degeneracy-ordering workhorse behind community seeding and graph
    * sparsification): repeatedly delete nodes of induced degree &lt; k.
    * Like [[labelProp]], the operator contract is FIXED synchronous
    * rounds — `rounds` peels — so the result is deterministic and
    * oracle-replayable by unrolling; the exact k-core is the fixpoint
    * this converges to monotonically (each round only removes nodes, so
    * R rounds give a provable SUPERSET of the true core that shrinks
    * with R — the bounded-round law documented for label propagation).
    *
    * Scale shape: per round, TWO hash equi semi joins (edges ⋈ alive on
    * src and dst) + one grouped count — all key-partitioned shuffles on
    * the node id; no iteration-until-fixpoint driver loop, no
    * collect. */
  /** R peel rounds over a symmetric (src, dst) edge relation — the
    * kernel behind [[kcore]], exposed for the brute-force fixpoint
    * equivalence test in `SpatialStatsEquivalenceSpec`. Returns
    * (node, deg) of the round-R survivors' induced subgraph. */
  private[ops] def kcoreRounds(bidir: DataFrame, k: Int, rounds: Int): DataFrame = {
    val init = bidir.select(col("src").as("node")).distinct()
    val survivors = (1 to rounds).foldLeft(init) { (alive, _) =>
      // per-round lineage truncation (the connectedComponents
      // convention): without it the nested semi-join plan deepens
      // exponentially in `rounds` at ANALYSIS time; the materialized
      // relation is only the |nodes|-row alive set
      bidir
        .join(alive.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k.toLong)
        .select(col("src").as("node"))
        .localCheckpoint(eager = true)
    }
    // final induced degree of the surviving subgraph
    bidir
      .join(survivors.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(survivors.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .orderBy(col("node"))
  }

  def kcore(spark: SparkSession, dir: String, k: Int = 4, rounds: Int = 3,
            buckets: Int = 300): DataFrame = {
    // canonicalize BEFORE distinct: (a,b) and (b,a) are the same simple
    // edge, so least/greatest-fold them or induced degrees double-count
    // (standard Seidman k-core is over the simple undirected graph)
    val und = lineitem(spark, dir).select(
        pmod(col("l_partkey"), lit(buckets.toLong)).as("a"),
        pmod(col("l_suppkey"), lit(buckets.toLong)).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("x"),
        greatest(col("a"), col("b")).as("y"))
      .distinct()
    val bidir = und.select(col("x").as("src"), col("y").as("dst"))
      .union(und.select(col("y").as("src"), col("x").as("dst")))
      .localCheckpoint(eager = true)
    kcoreRounds(bidir, k, rounds)
  }

  /** Bounded-depth BFS as a RECURSIVE CTE (`WITH RECURSIVE` — new SQL
    * surface in Spark 4): hop distance and bounded-path counts from node
    * 0 over a sparsified edge graph, the transitive-closure shape
    * (reachability, BOM explosion, org-chart rollup) expressed
    * declaratively. `min(depth)` outside the recursion gives BFS
    * distance; `count(*)` exposes the UNION ALL semantics (every bounded
    * path survives), which is exactly what the oracle replays.
    *
    * Scale judgment, stated honestly: Spark's recursive CTEs support
    * UNION ALL only, so the working set is PATHS, not nodes — it grows
    * as out_degreeᵈᵉᵖᵗʰ. Right when depth × branching is bounded (this
    * graph: ≤100 nodes, sparsified out-degree ≈14, depth ≤3 ⇒ ≤3k
    * rows at ANY corpus scale, since the node space is value-capped by
    * the mod). For unbounded vocabularies use the frontier-dedup
    * iterative form ([[khopReach]]'s device) — semi-naive evaluation
    * with per-level DISTINCT, which UNION ALL recursion cannot express. */
  def recursiveBfs(spark: SparkSession, dir: String, maxDepth: Int = 3): DataFrame = {
    lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(100L)).as("src"),
        pmod(col("l_suppkey"), lit(100L)).as("dst"))
      .filter(pmod(col("src") * 31 + col("dst"), lit(7L)) === 0L)
      .distinct()
      .createOrReplaceTempView("graft_edges_rec")
    spark.sql(
      s"""WITH RECURSIVE reach(node, depth) AS (
         |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
         |  UNION ALL
         |  SELECT e.dst, r.depth + 1
         |  FROM reach r JOIN graft_edges_rec e ON e.src = r.node
         |  WHERE r.depth < $maxDepth)
         |SELECT node, min(depth) AS hops, count(*) AS n_paths
         |FROM reach GROUP BY node ORDER BY node""".stripMargin)
  }

  /** Bounded-hop weighted single-source shortest path — Bellman-Ford
    * unrolled for `rounds` relaxations from node 0 over the thinned
    * bucket graph, with a deterministic integer weight derived from the
    * edge endpoints (so both engines rebuild the identical weighted
    * graph). After k rounds the distance is the exact minimum cost over
    * walks of ≤ k edges — precisely what the oracle's depth-bounded
    * recursive CTE enumerates, so the two formulations (relaxation vs
    * path enumeration) check each other.
    *
    * Scale shape per round: ONE hash equi join of the edge list against
    * the current |V|-bounded distance relation + a min-aggregate with
    * map-side partials (the same kernel as [[labelProp]]); rounds unroll
    * declaratively into one Catalyst plan. The relaxation form carries
    * |V| state per round regardless of path count — the enumeration
    * form the oracle runs is exponential in depth and exists only as a
    * small-graph check. */
  def sssp(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val edges = lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(100L)).as("src"),
        pmod(col("l_suppkey"), lit(100L)).as("dst"))
      .filter(pmod(col("src") * 31 + col("dst"), lit(7L)) === 0L)
      .distinct()
      .withColumn("w", pmod(col("src") * 13 + col("dst") * 17, lit(97L)) + 1L)
    // source node 0 via a NON-FOLDABLE expression: a lit(0) key would be
    // foldable-propagated into the first relaxation join's condition,
    // degrading the hash equi join to a nested loop
    val init = spark.range(1)
      .select(pmod(col("id"), lit(1L)).as("node"), lit(0L).as("d"))
    val dist = (1 to rounds).foldLeft(init) { (cur, _) =>
      val relaxed = edges
        .join(cur.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
      cur.unionAll(relaxed).groupBy(col("node")).agg(min(col("d")).as("d"))
    }
    dist.select(col("node"), col("d").as("dist")).orderBy(col("node"))
  }

  /** Exact connected components as a first-class GRAPH operator — the
    * one classic missing between [[labelProp]] (bounded rounds,
    * approximate) and [[TextQueries.dedupClusters]] (the same kernel on
    * near-dup pairs): runs the two-level union-find engine
    * ([[TextQueries.connectedComponents]]: per-partition edge
    * contraction, then one-task forest labeling or the log-diameter
    * min-label/pointer-jump tail) over the thinned bucket graph and
    * rolls up per-component size. The %13 thinning leaves a 4-component
    * structure at test scale, so the rollup is non-trivial.
    *
    * Oracle: DuckDB computes each node's component as min(node id over
    * the bidirected transitive closure) via a fixpoint recursive CTE —
    * component label = min member on both sides, two completely
    * different algorithms agreeing. Closure is |V|² worst case: an
    * oracle-side-only cost (|V| = 100 buckets); the engine side never
    * materializes reachability. */
  def graphCc(spark: SparkSession, dir: String): DataFrame = {
    val edges = lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(100L)).as("a_id"),
        pmod(col("l_suppkey"), lit(100L)).as("b_id"))
      .filter(pmod(col("a_id") * 31 + col("b_id"), lit(13L)) === 0L &&
        col("a_id") =!= col("b_id"))
      .distinct()
    TextQueries.connectedComponents(spark, edges)
      .groupBy(col("rep").as("component"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("component"))
  }

  /** Degree assortativity (Newman 2002) — do hubs link to hubs? The
    * standard mixing diagnostic for link graphs: the Pearson correlation
    * of endpoint degrees over all edge ends. Crawl graphs are typically
    * DISassortative (hubs link to leaves, r < 0); a strongly assortative
    * or near-zero r changes which sampling/pruning strategies are safe
    * on the web graph feeding a training corpus.
    *
    * Exactness device: over the symmetrized end list (each undirected
    * edge contributes both ordered orientations) the x- and y-marginals
    * coincide, so r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — every term an
    * exact integer. The raw moments are emitted as BIGINTs alongside the
    * coefficient in signed ppm (sign split from magnitude, the
    * [[SessionQueries.abTest]] device, both factors in DECIMAL(38,0)
    * lanes). The raw moments s_xx/s_xy themselves accumulate in
    * DECIMAL(38,0) with the cast BEFORE the multiply — at 10⁹ ends with
    * 10⁶-degree hubs a dx·dy term is ~10¹² and the sum ~10²¹, past
    * BIGINT. Precision ceiling: the ppm multiplier needs |num| ≤ 10³² —
    * comfortable for any real graph (|num| ≈ 10²⁷ at that scale); past
    * it the DECIMAL lane yields NULL ppm (never a wrong value).
    *
    * Scale shape: the degree rollup and the final moment aggregate both
    * take map-side partials; degrees attach to ends via two hash equi
    * joins on the node key (the |V|-row side shuffles, never collects);
    * output is one row. Self-loops are excluded and both orientations of
    * a pair fold to one simple edge before symmetrization ([[kcore]]'s
    * canonicalization). */
  def degreeAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val raw = lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(100L)).as("u"),
        pmod(col("l_suppkey"), lit(100L)).as("v"))
    val e = raw
      .select(least(col("u"), col("v")).as("x"), greatest(col("u"), col("v")).as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val ends = e.select(col("x").as("a"), col("y").as("b"))
      .union(e.select(col("y").as("a"), col("x").as("b")))
    val deg = ends.groupBy(col("a")).agg(count(lit(1)).as("d"))
    ends
      .join(deg.select(col("a").as("na"), col("d").as("dx")), col("a") === col("na"))
      .join(deg.select(col("a").as("nb"), col("d").as("dy")), col("b") === col("nb"))
      // raw moments accumulate in DECIMAL(38,0): at 1e9 ends with
      // 1e6-degree hubs a per-term dx·dy is ~1e12 and the SUM ~1e21 —
      // past BIGINT, which non-ANSI Spark would wrap silently. The cast
      // happens BEFORE the multiply so the product lane is exact too.
      // num/den stay DECIMAL internally; only BIGINT columns are
      // EMITTED (the driver's DuckDB fetch renders DECIMAL outputs as
      // lossy float64, breaking the hash compare).
      .agg(count(lit(1)).as("n_ends"), sum(col("dx")).as("s_x"),
        sum(col("dx").cast("decimal(38,0)") * col("dx")).as("s_xx_d"),
        sum(col("dx").cast("decimal(38,0)") * col("dy")).as("s_xy_d"))
      .withColumn("num", expr(
        "CAST(n_ends AS DECIMAL(38,0)) * s_xy_d - CAST(s_x AS DECIMAL(38,0)) * s_x"))
      .withColumn("den", expr(
        "CAST(n_ends AS DECIMAL(38,0)) * s_xx_d - CAST(s_x AS DECIMAL(38,0)) * s_x"))
      .select(col("n_ends"), col("s_x"),
        col("s_xx_d").cast("bigint").as("s_xx"),
        col("s_xy_d").cast("bigint").as("s_xy"),
        expr("CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT)")
          .as("r_sign"),
        expr("""CASE WHEN den = 0 THEN CAST(0 AS BIGINT)
               |ELSE CAST((1000000 * abs(num)) DIV den AS BIGINT) END""".stripMargin)
          .as("r_ppm_abs"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_cc" -> (graphCc _),
    "q_assortativity" -> (degreeAssortativity _),
    "q_sssp" -> ((s, d) => sssp(s, d)),
    "q_recursive_cte" -> ((s, d) => recursiveBfs(s, d)),
    "q_kcore" -> ((s, d) => kcore(s, d)),
    "q_link_predict" -> ((s, d) => linkPredictRa(s, d)),
    "q_pagerank" -> ((s, d) => pagerank(s, d)),
    "q_triangles" -> ((s, d) => triangles(s, d)),
    "q_clustering_coef" -> (clusteringCoef _),
    "q_khop" -> ((s, d) => khopReach(s, d)),
    "q_label_prop" -> ((s, d) => labelProp(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // same canonicalized simple graph, same exact integer moments
    "q_assortativity" ->
      """WITH e AS (
        |  SELECT DISTINCT least(l_partkey % 100, l_suppkey % 100) AS x,
        |         greatest(l_partkey % 100, l_suppkey % 100) AS y
        |  FROM lineitem
        |  WHERE (l_partkey % 100) <> (l_suppkey % 100)),
        |ends AS (SELECT x AS a, y AS b FROM e
        |         UNION ALL SELECT y AS a, x AS b FROM e),
        |deg AS (SELECT a AS node, count(*) AS d FROM ends GROUP BY a),
        |m AS (
        |  SELECT count(*) AS n_ends,
        |         CAST(sum(da.d) AS BIGINT) AS s_x,
        |         CAST(sum(CAST(da.d AS HUGEINT) * db.d) AS HUGEINT) AS s_xy,
        |         CAST(sum(CAST(da.d AS HUGEINT) * da.d) AS HUGEINT) AS s_xx
        |  FROM ends JOIN deg da ON ends.a = da.node
        |            JOIN deg db ON ends.b = db.node),
        |z AS (
        |  SELECT *,
        |    CAST(n_ends AS HUGEINT) * s_xy - CAST(s_x AS HUGEINT) * s_x AS num,
        |    CAST(n_ends AS HUGEINT) * s_xx - CAST(s_x AS HUGEINT) * s_x AS den
        |  FROM m)
        |SELECT n_ends, s_x,
        |  CAST(s_xx AS BIGINT) AS s_xx,
        |  CAST(s_xy AS BIGINT) AS s_xy,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |       AS INT) AS r_sign,
        |  CAST(CASE WHEN den = 0 THEN 0
        |       ELSE (1000000 * abs(num)) // den END AS BIGINT) AS r_ppm_abs
        |FROM z""".stripMargin,
    // bidirected transitive closure to a fixpoint (recursive CTE with
    // set-union dedup), component = min reachable node id — a different
    // algorithm than the engine's union-find, same partition of V
    "q_graph_cc" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT (l_partkey % 100) AS a, (l_suppkey % 100) AS b
        |  FROM lineitem
        |  WHERE ((l_partkey % 100) * 31 + (l_suppkey % 100)) % 13 = 0
        |    AND (l_partkey % 100) != (l_suppkey % 100)),
        |und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |nodes AS (SELECT DISTINCT a AS node FROM und),
        |reach(src, node) AS (
        |  SELECT node AS src, node FROM nodes
        |  UNION
        |  SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.node),
        |comp AS (SELECT src, min(node) AS component FROM reach GROUP BY src)
        |SELECT component, count(*) AS n_nodes
        |FROM comp GROUP BY component ORDER BY component""".stripMargin,
    // depth-bounded walk ENUMERATION: min cost over walks of <= 3 edges
    // equals 3 rounds of Bellman-Ford relaxation — two independent
    // formulations of the same quantity
    "q_sssp" ->
      """WITH RECURSIVE e AS (
        |  SELECT src, dst, 1 + (src * 13 + dst * 17) % 97 AS w FROM (
        |    SELECT DISTINCT (l_partkey % 100) AS src, (l_suppkey % 100) AS dst
        |    FROM lineitem
        |    WHERE ((l_partkey % 100) * 31 + (l_suppkey % 100)) % 7 = 0)),
        |reach(node, cost, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost, 0 AS depth
        |  UNION ALL
        |  SELECT e.dst, r.cost + e.w, r.depth + 1
        |  FROM reach r JOIN e ON e.src = r.node
        |  WHERE r.depth < 3)
        |SELECT node, CAST(min(cost) AS BIGINT) AS dist
        |FROM reach GROUP BY node ORDER BY node""".stripMargin,
    // identical UNION ALL recursion — DuckDB's WITH RECURSIVE has the
    // same bounded-path semantics, so hops AND n_paths replay exactly
    "q_recursive_cte" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT (l_partkey % 100) AS src, (l_suppkey % 100) AS dst
        |  FROM lineitem
        |  WHERE ((l_partkey % 100) * 31 + (l_suppkey % 100)) % 7 = 0),
        |reach(node, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
        |  UNION ALL
        |  SELECT e.dst, r.depth + 1
        |  FROM reach r JOIN e ON e.src = r.node
        |  WHERE r.depth < 3)
        |SELECT node, CAST(min(depth) AS INTEGER) AS hops,
        |  count(*) AS n_paths
        |FROM reach GROUP BY node ORDER BY node""".stripMargin,
    "q_kcore" ->
      """WITH und AS (
        |  SELECT DISTINCT least(l_partkey % 300, l_suppkey % 300) AS x,
        |                  greatest(l_partkey % 300, l_suppkey % 300) AS y
        |  FROM lineitem WHERE l_partkey % 300 <> l_suppkey % 300),
        |e AS (
        |  SELECT x AS src, y AS dst FROM und
        |  UNION ALL SELECT y, x FROM und),
        |a0 AS (SELECT DISTINCT src AS node FROM e),
        |a1 AS (
        |  SELECT src AS node FROM e
        |  WHERE src IN (SELECT node FROM a0) AND dst IN (SELECT node FROM a0)
        |  GROUP BY src HAVING count(*) >= 4),
        |a2 AS (
        |  SELECT src AS node FROM e
        |  WHERE src IN (SELECT node FROM a1) AND dst IN (SELECT node FROM a1)
        |  GROUP BY src HAVING count(*) >= 4),
        |a3 AS (
        |  SELECT src AS node FROM e
        |  WHERE src IN (SELECT node FROM a2) AND dst IN (SELECT node FROM a2)
        |  GROUP BY src HAVING count(*) >= 4)
        |SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e
        |WHERE src IN (SELECT node FROM a3) AND dst IN (SELECT node FROM a3)
        |GROUP BY src ORDER BY node""".stripMargin,
    "q_link_predict" ->
      """WITH e AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey % 200 AS p FROM lineitem),
        |osz AS (
        |  SELECT o, count(*) AS d FROM e GROUP BY o HAVING count(*) <= 64),
        |w AS (
        |  SELECT a.p AS pa, b.p AS pb, osz.d
        |  FROM e a JOIN e b ON a.o = b.o AND a.p < b.p
        |  JOIN osz ON a.o = osz.o)
        |SELECT pa, pb, count(*) AS n_common,
        |       CAST(sum(1000000 // d) AS BIGINT) AS score_micros
        |FROM w GROUP BY pa, pb
        |ORDER BY score_micros DESC, pa, pb LIMIT 50""".stripMargin,
    "q_label_prop" ->
      """WITH und AS (
        |  SELECT DISTINCT l_partkey % 300 AS x, l_suppkey % 300 AS y
        |  FROM lineitem WHERE l_partkey % 300 <> l_suppkey % 300),
        |bidir AS (
        |  SELECT x AS src, y AS dst FROM und
        |  UNION ALL SELECT y, x FROM und),
        |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM bidir),
        |l1 AS (
        |  SELECT node, min(lbl) AS lbl FROM (
        |    SELECT b.dst AS node, l0.lbl FROM bidir b JOIN l0 ON b.src = l0.node
        |    UNION ALL SELECT node, lbl FROM l0)
        |  GROUP BY node),
        |l2 AS (
        |  SELECT node, min(lbl) AS lbl FROM (
        |    SELECT b.dst AS node, l1.lbl FROM bidir b JOIN l1 ON b.src = l1.node
        |    UNION ALL SELECT node, lbl FROM l1)
        |  GROUP BY node)
        |SELECT node, lbl FROM l2 ORDER BY node""".stripMargin,
    "q_khop" ->
      """WITH e AS (
        |  SELECT DISTINCT l_partkey % 300 AS src, l_suppkey % 300 AS dst
        |  FROM lineitem WHERE l_partkey % 300 <> l_suppkey % 300),
        |h1 AS (SELECT src, count(*) AS n_1hop FROM e GROUP BY src),
        |mids AS (SELECT src FROM e GROUP BY src HAVING count(*) <= 1024),
        |e2 AS (
        |  SELECT DISTINCT a.src, b.dst AS dst2
        |  FROM e a JOIN e b ON a.dst = b.src
        |  WHERE b.dst <> a.src AND a.dst IN (SELECT src FROM mids)),
        |h2 AS (SELECT src, count(*) AS n_2hop FROM e2 GROUP BY src)
        |SELECT h1.src AS node, h1.n_1hop,
        |       CAST(coalesce(h2.n_2hop, 0) AS BIGINT) AS n_2hop
        |FROM h1 LEFT JOIN h2 ON h1.src = h2.src
        |ORDER BY node""".stripMargin,
    "q_triangles" ->
      """WITH raw AS (
        |  SELECT l_partkey % 300 AS x, l_suppkey % 300 AS y FROM lineitem
        |  WHERE l_partkey % 300 <> l_suppkey % 300),
        |und AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM raw),
        |deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node),
        |rk AS (SELECT node, d * 1000 + node AS rk FROM deg),
        |o AS (
        |  SELECT CASE WHEN ru.rk < rv.rk THEN und.u ELSE und.v END AS a,
        |         CASE WHEN ru.rk < rv.rk THEN und.v ELSE und.u END AS b,
        |         CASE WHEN ru.rk < rv.rk THEN rv.rk ELSE ru.rk END AS rb
        |  FROM und JOIN rk ru ON und.u = ru.node JOIN rk rv ON und.v = rv.node),
        |tri AS (
        |  SELECT e1.a, e1.b AS b1, e2.b AS b2
        |  FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.rb < e2.rb
        |  JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b),
        |corners AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b1 FROM tri
        |  UNION ALL SELECT b2 FROM tri)
        |SELECT node, count(*) AS n_tri FROM corners
        |GROUP BY node ORDER BY node""".stripMargin,
    // same triangle replay, joined back to degrees for the exact ppm
    // rational; d = 1 nodes excluded by the shared rule
    "q_clustering_coef" ->
      """WITH raw AS (
        |  SELECT l_partkey % 300 AS x, l_suppkey % 300 AS y FROM lineitem
        |  WHERE l_partkey % 300 <> l_suppkey % 300),
        |und AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM raw),
        |deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY node),
        |rk AS (SELECT node, d * 1000 + node AS rk FROM deg),
        |o AS (
        |  SELECT CASE WHEN ru.rk < rv.rk THEN und.u ELSE und.v END AS a,
        |         CASE WHEN ru.rk < rv.rk THEN und.v ELSE und.u END AS b,
        |         CASE WHEN ru.rk < rv.rk THEN rv.rk ELSE ru.rk END AS rb
        |  FROM und JOIN rk ru ON und.u = ru.node JOIN rk rv ON und.v = rv.node),
        |tri AS (
        |  SELECT e1.a, e1.b AS b1, e2.b AS b2
        |  FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.rb < e2.rb
        |  JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b),
        |corners AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b1 FROM tri
        |  UNION ALL SELECT b2 FROM tri),
        |t AS (SELECT node, count(*) AS n_tri FROM corners GROUP BY node)
        |SELECT deg.node, CAST(deg.d AS BIGINT) AS d,
        |  CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST((2000000 * coalesce(t.n_tri, 0)) // (deg.d * (deg.d - 1))
        |       AS BIGINT) AS cc_ppm
        |FROM deg LEFT JOIN t ON deg.node = t.node
        |WHERE deg.d >= 2 ORDER BY deg.node""".stripMargin,
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
