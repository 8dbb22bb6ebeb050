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
    Set("q_dedup_minhash", "q_dedup_simhash", "q_dedup_embedding", "q_dedup_clusters",
      "q_setsim_join")

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

  test("domain cap: at most 10 docs per source; salted two-phase equals the plain window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = TextQueries.domainCap(spark, dir).collect()
    val perSource = got.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perSource.values.forall(_ <= 10))
    // reference: single global window, no salting — same kept set
    val plain = Tables.documents(spark, dir)
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L), lit(1000000L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= 10)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
      .collect()
    assert(got.map(_.toSeq).toSet == plain.map(_.toSeq).toSet)
  }

  test("flagship closed-form area: every group area is a multiple of 160000 m^2") {
    val bad = Pipelines.flagship(spark, dir, to5880 = false)
      .filter(org.apache.spark.sql.functions.expr("area % 160000.0 != 0"))
      .count()
    assert(bad == 0)
  }

  test("5880 flagship: closed-form cross-check, bucket agreement, and boundary margins") {
    import org.apache.spark.sql.functions._
    // Cross-check for the q_geo_flagship_5880 oracle device: each group's
    // clipped union is a set of disjoint 400 m EPSG:3857 squares, so its
    // Polyconic area has a closed form — transform each square's 4 corners
    // and shoelace-sum — computed here WITHOUT the union/intersection/
    // st_area pipeline under test (only the Crs vertex math is shared, and
    // that carries its own absolute anchors in CrsSpec).
    val tx = graft.geom.Crs.pointTransform("EPSG:3857", "EPSG:5880")
    def parcelArea(x0: Double, y0: Double): Double = {
      val pts = Array((x0, y0), (x0 + 400, y0), (x0 + 400, y0 + 400), (x0, y0 + 400))
        .map { case (x, y) => tx(x, y) }
      math.abs(pts.indices.map { i =>
        val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % 4)
        x1 * y2 - x2 * y1
      }.sum) / 2.0
    }
    import GeoFixtures._
    val parcels = Tables.lineitem(spark, dir).select(
        (col("l_partkey") % 25).cast("int").as("region_id"),
        (month(col("l_shipdate")) % 4).cast("int").as("season_id"),
        (col("l_partkey") % 7).cast("int").as("land_type_id"),
        parcelX0(col("l_partkey") % 25, parcelIdx(col("l_orderkey"), col("l_linenumber")))
          .cast("double").as("x0"),
        parcelY0(col("l_partkey") % 25, parcelIdx(col("l_orderkey"), col("l_linenumber")))
          .cast("double").as("y0"))
      .distinct().collect()
    val expected = parcels
      .groupBy(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      .map { case (k, rs) => k -> rs.map(r => parcelArea(r.getDouble(3), r.getDouble(4))).sum }

    // (1) raw pipeline areas within 0.11 m^2 of the closed form
    val raw = Pipelines.flagshipMeasured(spark, dir, gapBuffer = 0.0, to5880 = true)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(raw.keySet == expected.keySet)
    val worst = expected.map { case (k, a) => math.abs(raw(k) - a) }.max
    assert(worst <= 0.11, s"worst group-area divergence $worst m^2")

    // (2) the phased 1000 m^2 bucket: boundary margin >= 1 m^2 for EVERY
    // group (vs <=0.005 m^2 measured Spark<->DuckDB divergence — ~200×),
    // on both the pipeline value and the closed form — the guarantee the
    // oracle hash-match rests on (measured fixture-wide minimum: 2.43 m^2)
    val g = Pipelines.Bucket5880Size
    val phase = Pipelines.Bucket5880Phase
    def boundaryDist(v: Double): Double = {
      val u = v / g - phase
      math.abs(u - math.round(u)) * g
    }
    (raw.values ++ expected.values).foreach { v =>
      assert(boundaryDist(v) >= 1.0,
        s"area $v is ${boundaryDist(v)} m^2 from a bucket boundary (phase drifted?)")
    }

    // (3) bucketed query output == bucketed closed form, group by group
    val got = SparkEntry.queries("q_geo_flagship_5880")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, a) =>
      assert(got(k) == math.floor(a / g - phase).toLong, s"bucket mismatch at $k")
    }
  }

  test("approx_count_distinct audit row: exact counts match and both booleans hold") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, dir)
    val exactOrders = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val row = RelationalQueries.approxDistinct(spark, dir).head()
    assert(row.getLong(1) == exactOrders, s"exact_orders ${row.getLong(1)} vs $exactOrders")
    assert(row.getBoolean(2) && row.getBoolean(3), s"in-spec booleans: $row")
    // independent tighter check: the raw estimate itself sits within 5 rsd
    val est = li.agg(approx_count_distinct(col("l_orderkey"), 0.01)).head().getLong(0)
    assert(math.abs(est - exactOrders).toDouble / exactOrders < 0.05, s"$est vs $exactOrders")
  }

  test("int8 SQ search recall: quantized top-10 vs exact dot-product top-10") {
    import org.apache.spark.sql.functions._
    // exact float dot-product ranking (the target SQ approximates)
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0L)
      .head().getSeq[Float](1).map(_.toDouble)
    val exact = Tables.embeddings(spark, dir).filter(col("vec_id") =!= 0L)
      .withColumn("dot", aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")), typedlit(q),
          (a, b) => a * b), lit(0.0), (acc, x) => acc + x))
      .orderBy(col("dot").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val sq = VectorQueries.annSq(spark, dir).collect().map(_.getLong(1)).toSet
    val recall = (exact & sq).size / 10.0
    assert(recall >= 0.8, s"SQ recall@10 = $recall (exact=$exact sq=$sq)")
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

  test("tfidf keyword extraction yields exactly one keyword per document") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).count()
    val kw = TextQueries.tfidfKeywords(spark, dir)
    assert(kw.count() == docs)
    assert(kw.select(countDistinct(col("doc_id"))).head().getLong(0) == docs)
  }

  test("bigram LM score counts every adjacent token pair exactly once") {
    import org.apache.spark.sql.functions._
    // sum over docs of n_bigrams == total tokens - n_docs (each doc with
    // t tokens contributes t-1 bigrams; no empty docs in the corpus)
    val docs = Tables.documents(spark, dir)
      .select(size(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
    val expected = docs.agg(sum(col("t") - lit(1))).head().getLong(0)
    val got = TextQueries.lmBigramScore(spark, dir)
      .agg(sum(col("n_bigrams"))).head().getLong(0)
    assert(got == expected, s"$got vs $expected")
  }

  test("source mix takes min(quota, source size) docs from every source") {
    import org.apache.spark.sql.functions._
    val sizes = Tables.documents(spark, dir).groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val taken = TextQueries.sourceMix(spark, dir, quota = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(taken.keySet == sizes.keySet)
    taken.foreach { case (s, n) => assert(n == math.min(10L, sizes(s)), s"$s: $n") }
  }

  test("ewma: per-user smoothed mass is bracketed by 128x and 255x raw mass") {
    import org.apache.spark.sql.functions._
    // each cents value feeds <= 8 downstream taps with weights
    // 128+64+...+1 = 255, and always its own row at weight 128, so
    // 128*S <= sum_w <= 255*S per user — exact bracket, no tolerance
    val raw = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("user_id"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy(col("user_id")).agg(sum(col("c")).as("s"))
    val bad = SessionQueries.ewma(spark, dir).join(raw, "user_id")
      .filter(col("sum_ewma_x256") < col("s") * 128L ||
              col("sum_ewma_x256") > col("s") * 255L)
      .count()
    assert(bad == 0)
  }

  test("attribution: both models conserve total purchase revenue and count") {
    import org.apache.spark.sql.functions._
    val m = SessionQueries.attribution(spark, dir)
      .groupBy(col("model"))
      .agg(sum(col("n_purchases")).as("n"), sum(col("attributed_cents")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("first") == m("last"), "first/last models must redistribute, not change, totals")
    val purchases = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type") === "purchase")
      .agg(count(lit(1)), sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")))
      .head()
    assert(m("first") == ((purchases.getLong(0), purchases.getLong(1))))
  }

  test("streaks: islands partition each user's active days") {
    import org.apache.spark.sql.functions._
    val st = SessionQueries.streaks(spark, dir)
    val activeDays = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 86400000000000L").as("day")).distinct().count()
    assert(st.agg(sum(col("n_active_days"))).head().getLong(0) == activeDays)
    assert(st.filter(col("max_streak") > col("n_active_days")).count() == 0)
    assert(st.filter(col("n_streaks") < 1).count() == 0)
  }

  test("twap: bracketed by per-user min/max cents and span equals first-to-last gap") {
    import org.apache.spark.sql.functions._
    val tw = SessionQueries.twap(spark, dir)
    val bounds = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("user_id"), expr("ts DIV 1000000L").as("tms"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy(col("user_id"))
      .agg(min(col("c")).as("lo"), max(col("c")).as("hi"),
        (max(col("tms")) - min(col("tms"))).as("gap"))
    val joined = tw.join(bounds, "user_id")
    // a time-weighted mean of the step function can't leave [lo, hi]
    assert(joined.filter(col("twap_cents") < col("lo") ||
      col("twap_cents") > col("hi")).count() == 0)
    // durations tile the observed span exactly
    assert(joined.filter(col("span_ms") =!= col("gap")).count() == 0)
  }

  test("ohlc: bars are internally consistent (low <= open,close <= high)") {
    import org.apache.spark.sql.functions._
    val bars = SessionQueries.ohlcBars(spark, dir)
    val bad = bars.filter(col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close") ||
      col("low") > col("high")).count()
    assert(bad == 0)
  }

  test("skew profile: octaves conserve keys and rows, max stays in octave range") {
    import org.apache.spark.sql.functions._
    val p = RelationalQueries.skewProfile(spark, dir)
    val li = Tables.lineitem(spark, dir)
    assert(p.agg(sum(col("sum_rows"))).head().getLong(0) == li.count())
    assert(p.agg(sum(col("n_keys"))).head().getLong(0) ==
      li.select(countDistinct(col("l_partkey"))).head().getLong(0))
    // a count in octave o satisfies 2^o <= count < 2^(o+1)
    val bad = p.filter(expr("max_rows < shiftleft(1L, octave)") ||
      expr("max_rows >= shiftleft(2L, octave)")).count()
    assert(bad == 0)
  }

  test("time to convert: median bracketed by min/max and consistent with mean bounds") {
    import org.apache.spark.sql.functions._
    val r = SessionQueries.timeToConvert(spark, dir).head()
    val (n, lo, med, hi, total) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n > 0 && lo <= med && med <= hi)
    assert(total >= n * lo && total <= n * hi)
  }

  test("mm retrieval: dense 1..3 ranks per probe, no self-match, scores non-increasing") {
    import org.apache.spark.sql.functions._
    val r = Multimodal.mmRetrieval(spark, dir).collect()
    val byProbe = r.groupBy(_.getLong(0))
    assert(byProbe.keySet == Set(0L, 33L, 150L, 300L, 498L))
    byProbe.foreach { case (p, rows) =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 3), s"probe $p ranks")
      assert(rows.forall(_.getLong(2) != p), s"probe $p self-match")
      val scores = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"probe $p order")
    }
  }

  test("graph cc: component sizes match a driver-side brute-force union-find") {
    import org.apache.spark.sql.functions._
    val edges = Tables.lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(100L)).as("a"),
        pmod(col("l_suppkey"), lit(100L)).as("b"))
      .filter(pmod(col("a") * 31 + col("b"), lit(13L)) === 0L && col("a") =!= col("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(find).map { case (rep, ns) => rep -> ns.length.toLong }
    val got = GraphQueries.graphCc(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("sssp: source at zero, and a fourth relaxation round never increases a distance") {
    import org.apache.spark.sql.functions._
    val d3 = GraphQueries.sssp(spark, dir, rounds = 3)
    assert(d3.filter(col("node") === 0L && col("dist") === 0L).count() == 1)
    val d4 = GraphQueries.sssp(spark, dir, rounds = 4)
    // Bellman-Ford monotonicity: more rounds only shrink distances, and
    // every round-3-reachable node stays reachable
    val grew = d3.as("a").join(d4.as("b"), "node", "left")
      .filter(col("b.dist").isNull || col("b.dist") > col("a.dist")).count()
    assert(grew == 0)
  }

  test("feature covariance: full triangle per label, constant n, non-negative diagonal") {
    import org.apache.spark.sql.functions._
    val cov = VectorQueries.featureCov(spark, dir)
    // 8 dims -> 36 (i <= j) pairs per label, one n per label
    val shape = cov.groupBy(col("label"))
      .agg(count(lit(1)).as("pairs"), countDistinct(col("n")).as("nn"))
      .filter(col("pairs") =!= 36 || col("nn") =!= 1).count()
    assert(shape == 0)
    // diagonal entries are variances: n^2-scaled Cauchy-Schwarz keeps
    // them >= 0 exactly (truncation only shrinks magnitude)
    assert(cov.filter(col("i") === col("j") && col("cov_micro") < 0).count() == 0)
  }

  test("scd2 intervals tile each user's timeline without gap or overlap") {
    import org.apache.spark.sql.functions._
    val iv = SessionQueries.scd2(spark, dir)
    // every interval's valid_to equals the next interval's valid_from
    // (lead by construction), so it suffices that versions are dense from
    // 1 and event counts conserve
    val n = iv.agg(sum(col("n_events"))).head().getLong(0)
    assert(n == Tables.events(spark, dir).count())
    val badVersion = iv.withColumn("expected",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("version"))))
      .filter(col("version") =!= col("expected")).count()
    assert(badVersion == 0)
    // exactly one open interval (NULL valid_to) per user
    val users = iv.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(iv.filter(col("valid_to_ms").isNull).count() == users)
  }

  test("approx winsorize tracks the exact rank statistic at high accuracy") {
    import org.apache.spark.sql.functions._
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_returnflag"), col("l_linestatus"), col("sum_clipped_micros"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = sums(RelationalQueries.winsorize(spark, dir))
    val approx = sums(RelationalQueries.winsorizeApprox(spark, dir))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // only the <=10% clipped tails can move, and only by the sketch's
      // rank error — 1% relative drift is a generous ceiling
      assert(math.abs(a - e).toDouble <= 0.01 * e, s"$k: $a vs $e")
    }
  }

  test("pagerank covers every node with at least the damping floor") {
    import org.apache.spark.sql.functions._
    val pr = GraphQueries.pagerank(spark, dir)
    val nodes = Tables.lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(100L)).as("n"))
      .union(Tables.lineitem(spark, dir).select(pmod(col("l_suppkey"), lit(100L))))
      .distinct().count()
    assert(pr.count() == nodes)
    assert(pr.filter(col("rank_micros") < 150000L).count() == 0)
  }

  test("corpus drift scores the reference source as exactly zero") {
    import org.apache.spark.sql.functions._
    val ref = TextQueries.corpusDrift(spark, dir)
      .filter(col("source") === "src0").head()
    assert(ref.getAs[Long]("drift_micros") == 0L, ref.toString)
    // and every source shares its full vocabulary with itself
    assert(ref.getAs[Long]("n_terms") == ref.getAs[Long]("shared_terms"))
  }

  test("sessionize nanos->ms uses integer division (2^53 regression)") {
    import spark.implicits._
    // 1704067207179575175 ns: double division would round the low ms
    val ms = Seq(1704067207179575175L).toDF("ts")
      .selectExpr("ts DIV 1000000L AS tms").head().getLong(0)
    assert(ms == 1704067207179L)
  }
}
