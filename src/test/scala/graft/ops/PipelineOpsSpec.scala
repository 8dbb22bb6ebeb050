package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form laws for the round-11 pipeline additions (PII scrub, URL
  * parse, intra-doc dedup, RA link prediction, PQ ANN) — invariants the
  * DuckDB hash-match can't express because they hold by CONSTRUCTION of
  * the synthetic spans, not by agreement between two engines.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def fixtureDir(name: String): String = {
    val d = new java.io.File(s"/root/repo/target/fixtures/$name")
    d.mkdirs()
    d.getPath
  }

  test("pii scrub: class counts follow the doc_id synthesis law exactly") {
    // corpus text is lowercase words — no '@' and no digits — so every
    // match comes from the synthesized spans: exactly one email per even
    // doc_id, one IP per doc_id%3==0, one phone per doc_id%5==0
    import spark.implicits._
    val perSource = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = TextQueries.piiScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = perSource(r.getString(0))
      assert(r.getLong(2) === ids.count(_ % 2 == 0), "emails")
      assert(r.getLong(3) === ids.count(_ % 3 == 0), "ips")
      assert(r.getLong(4) === ids.count(_ % 5 == 0), "phones")
      assert(r.getLong(5) === ids.count(i => i % 2 != 0 && i % 3 != 0 && i % 5 != 0),
        "docs_clean")
    }
  }

  test("url extract: every doc yields one URL, www only on mod-4 (.com) hosts") {
    val rows = TextQueries.urlExtract(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum === nDocs)
    rows.foreach { r =>
      val host = r.getString(0)
      assert(host.matches("site[0-9]+\\.example\\.(com|net)"), host)
      assert(r.getString(1) === host.split("\\.").last, "tld")
      // doc_id%4==0 implies doc_id even implies .com: .net hosts carry no www
      if (host.endsWith(".net")) assert(r.getLong(3) === 0L, s"www on .net $host")
    }
  }

  test("intradoc dedup: exact chars-removed accounting on a crafted corpus") {
    import spark.implicits._
    val seg1 = (1 to 10).map(i => s"tok$i").mkString(" ")   // 10-token segment
    val seg2 = (11 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      // seg1 seg2 seg1: one dup segment dropped -> seg1.length chars removed
      (1L, s"$seg1 $seg2 $seg1", "en", "a", 0L),
      // no repetition
      (2L, s"$seg1 $seg2", "en", "a", 0L),
      // empty doc: zero segments
      (3L, "", "en", "a", 0L))
    val fdir = fixtureDir("intradoc")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$fdir/documents.parquet")
    val r = TextQueries.intradocDedup(spark, fdir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 3L, "n_docs")
    assert(r(0).getLong(2) === 1L, "docs_with_dup")
    assert(r(0).getLong(3) === 5L, "n_segs: 3 + 2 + 0")
    assert(r(0).getLong(4) === 4L, "n_kept")
    assert(r(0).getLong(5) === seg1.length.toLong, "chars_removed")
  }

  test("span excise: keep-first canonical + island merge on a crafted corpus") {
    import spark.implicits._
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")  // exactly one window
    val fillF = (1 to 20).map(i => s"f$i").mkString(" ")
    val fillG = (1 to 20).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      // canonical owner of the boiler window (doc_id-min): loses nothing
      (1L, s"$boiler $fillF", "en", "a", 0L),
      // same boiler once: its [0,20) instance is excised -> 20 toks, 1 span
      (2L, s"$boiler $fillG", "en", "a", 0L),
      // boiler TWICE: st=0 and st=20 instances both excised; adjacent
      // ranges [0,20)+[20,40) must merge to ONE 40-token island
      (3L, s"$boiler $boiler", "en", "a", 0L),
      // below the window width: contributes to totals, never to cuts
      (4L, "x y z", "en", "a", 0L))
    val fdir = fixtureDir("span_excise")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$fdir/documents.parquet")
    val r = TextQueries.spanExcise(spark, fdir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 4L, "n_docs")
    assert(r(0).getLong(2) === 2L, "docs_excised")
    assert(r(0).getLong(3) === 123L, "toks_total: 40*3 + 3")
    assert(r(0).getLong(4) === 60L, "toks_cut: 20 + merged 40")
    assert(r(0).getLong(5) === 2L, "n_spans: one merged island each")
    assert(r(0).getLong(6) === 60000000L / 123L, "cut_ppm")
  }

  test("link prediction: scores bounded by the wedge law, output deterministic top-50") {
    val rows = GraphQueries.linkPredictRa(spark, dir).collect()
    assert(rows.length === 50)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (nCommon, score) = (r.getLong(2), r.getLong(3))
      // each shared order contributes 1000000 DIV d with 2 <= d <= 64
      assert(score <= nCommon * 500000, s"score $score vs n_common $nCommon")
      assert(score >= nCommon * (1000000L / 64), s"score floor")
      assert(score <= prev, "descending by score")
      prev = score
    }
  }

  test("bpe pair stats: pair counts conserve total in-word adjacencies") {
    // sum over ALL pairs of n = sum over words of (len-1); the top-3 rows
    // are a prefix of that relation, so per-source rank-1 count must be
    // >= rank-2 >= rank-3 and every pair must be 2 chars
    val rows = TextQueries.bpePairStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq === (1 to byRank.length))
      assert(byRank.map(_.getLong(3)).toSeq.sliding(2).forall(
        p => p.length < 2 || p(0) >= p(1)), "counts descend with rank")
      assert(rs.forall(_.getString(2).length == 2), "pairs are 2 chars")
    }
  }

  test("containment join: exact subset is found at containment 1.0, both directions asymmetric") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")       // 30 tokens
    val sub = (1 to 12).map(i => s"w$i").mkString(" ")        // strict prefix: 12 tokens
    val docs = Seq(
      (1L, base, "en", "a", 0L),
      (2L, sub, "en", "a", 0L),     // contained in 1 (all its trigrams are 1's)
      (3L, (40 to 70).map(i => s"x$i").mkString(" "), "en", "a", 0L)) // disjoint
    val fdir = fixtureDir("containment")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$fdir/documents.parquet")
    val r = TextQueries.containmentJoin(spark, fdir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(r.contains((2L, 1L, 1.0)), s"sub->base containment missing: $r")
    assert(!r.exists(p => p._1 == 1L && p._2 == 2L),
      s"base->sub must fail the 0.9 bar (12/28 trigrams): $r")
    assert(!r.exists(p => p._1 == 3L || p._2 == 3L), s"disjoint doc matched: $r")
  }

  test("semantic dedup: clusters partition the corpus, removals bounded by pairs") {
    val rows = VectorQueries.semanticDedup(spark, dir).collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum === nVecs, "clusters partition all vectors")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        s"removed ${r.getLong(3)} > pairs ${r.getLong(2)}")
      assert(r.getLong(3) < r.getLong(1) || r.getLong(1) == 0,
        "cannot remove every vector of a non-empty cluster")
    }
  }

  test("rrf fusion: ranks 1..10, scores descend, component law holds") {
    val rows = VectorQueries.rrfFusion(spark, dir).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    val scores = rows.map(_.getLong(4))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)), "descending rrf")
    rows.foreach { r =>
      val (rt, rv, s) = (r.getInt(2), r.getInt(3), r.getLong(4))
      val expected = (if (rt > 0) 1000000L / (60 + rt) else 0L) +
        (if (rv > 0) 1000000L / (60 + rv) else 0L)
      assert(s === expected, s"rrf component law: rt=$rt rv=$rv s=$s")
      assert(rt > 0 || rv > 0, "fused id must appear in at least one ranking")
    }
  }

  test("dbscan: cluster sizes + noise conserve the point count; sizes >= 1") {
    import org.apache.spark.sql.functions._
    val rows = SpatialCluster.dbscan(spark, dir).collect()
    val noise = rows.filter(_.getLong(0) == -1L)
    assert(noise.length === 1, "exactly one noise row")
    val clustered = rows.filter(_.getLong(0) > 0L)
    assert(rows.length === clustered.length + 1, "no zero/negative sizes")
    val covered = clustered.map(r => r.getLong(0) * r.getLong(1)).sum +
      noise.head.getLong(1)
    val nPts = graft.ops.Tables.lineitem(spark, dir)
      .select((col("l_partkey") % 25).as("r"),
        expr("(l_orderkey * 7 + l_linenumber) % 2500").as("pos"))
      .filter(col("pos") % 7 < 3).distinct().count()
    assert(covered === nPts, s"covered $covered != points $nPts")
    // a cluster needs at least one core point; with minPts=3 the smallest
    // cluster is a single isolated core (size >= 1)
    assert(clustered.forall(_.getLong(1) > 0))
  }

  test("entity resolution: classes partition candidates; unique names make every match true") {
    val r = RelationalQueries.entityResolution(spark, dir).head()
    val (nLeft, nCand, nMatch, nTrue, nPoss, nNon, nMissed) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
    assert(nCand === nMatch + nPoss + nNon, "classes partition candidates")
    // name agreement (+24) is required to reach the 30 bar, and names are
    // unique per key, so a cross-key match is impossible
    assert(nMatch === nTrue, "every match must be a true match")
    assert(nMissed === nLeft - nTrue)
    assert(nTrue > 0 && nMissed > 0,
      "fixture must produce both found and missed true pairs")
  }

  test("moran/geary: lattice invariants (w_sum = directed rook edges; stats in range)") {
    val r = SpatialCluster.moransI(spark, dir).head()
    val (n, w) = (r.getLong(0), r.getLong(1))
    assert(n <= 25 && n > 0)
    // full 5x5 lattice has 2*(2*5*4) = 80 directed rook edges
    if (n == 25) assert(w === 80L, s"w_sum $w")
    // |I| <= ~1 and C in [0, ~2] for any data (loose published bounds)
    assert(r.getLong(3) <= 1100000L, "moran within loose bound")
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 2200000L, "geary within loose bound")
  }

  test("lisa: quadrant labels agree with the sign column; lag sums conserve") {
    val rows = SpatialCluster.lisa(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (quad, sign) = (r.getString(3), r.getInt(4))
      if (quad == "HH" || quad == "LL") assert(sign === 1, s"$quad sign $sign")
      if (quad == "HL" || quad == "LH") assert(sign === -1, s"$quad sign $sign")
    }
    // every directed rook edge contributes its source value to exactly one
    // lag sum: Σ lag_v = Σ over cells of deg(cell) · v(cell) — verified
    // against the global Moran run's w_sum via a weaker parity check:
    // total lag equals total lag computed from the transposed direction
    // (rook adjacency is symmetric)
    val byR = rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val vMap = byR.map(t => t._1 -> t._2).toMap
    byR.foreach { case (r, _, lagV) =>
      val expected = Seq((-1, 0), (1, 0), (0, -1), (0, 1)).flatMap { case (dx, dy) =>
        val (rx, ry) = (r % 5 + dx, r / 5 + dy)
        if (rx >= 0 && rx <= 4 && ry >= 0 && ry <= 4) vMap.get(ry * 5 + rx) else None
      }.sum
      assert(lagV === expected, s"lag of region $r")
    }
  }

  test("pq ann: 5 ranked rows, non-decreasing reconstruction distance") {
    val rows = VectorQueries.annPq(spark, dir).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getInt(0)).toSeq === (1 to 5))
    val dists = rows.map(_.getDouble(2))
    assert(dists.forall(_ >= 0.0))
    assert(dists.sliding(2).forall(p => p(0) <= p(1)), "sorted by adc distance")
    assert(!rows.exists(_.getLong(1) == 0L), "query vector held out")
  }
}
