package graft.exprs

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The MRL quantile-sketch laws [[MrlAgg]]'s consumers rely on,
  * exercised against the buffer API the TypedImperativeAggregate path
  * drives:
  *
  *  1. WEIGHT CONSERVATION: total weight == exact item count under any
  *     split of the stream and any merge order (this is what makes the
  *     rank normalization exact);
  *  2. DETERMINISTIC RANK-ERROR BOUND: the exact rank of every
  *     estimated quantile lies within N·L/(2k) of its target rank
  *     (L = realized level count) — the Munro-Paterson compaction bound,
  *     with no failure probability;
  *  3. bounded state: every level holds < 4k values after any update or
  *     merge (≤ 2k steady state, transiently more only mid-merge);
  *  4. serialization round-trips the level structure.
  */
object MrlAggProps extends Properties("mrl_agg") {

  private def build(k: Int, xs: Seq[Long], nSplits: Int,
                    mergeLeft: Boolean): MrlAgg.Buf = {
    val bufs = Array.fill(nSplits)(new MrlAgg.Buf())
    xs.zipWithIndex.foreach { case (v, i) => bufs(i % nSplits).add(v, k) }
    if (mergeLeft) bufs.reduceLeft { (a, b) => a.mergeIn(b, k); a }
    else bufs.reduceRight { (a, b) => b.mergeIn(a, k); b }
  }

  private val streamGen = for {
    k <- Gen.choose(8, 64)
    n <- Gen.choose(1, 4000)
    // heavy duplication likely: value space smaller than the stream
    xs <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    nSplits <- Gen.choose(1, 7)
    mergeLeft <- Gen.oneOf(true, false)
  } yield (k, xs, nSplits, mergeLeft)

  property("total weight == exact count under any split and merge order") =
    forAll(streamGen) { case (k, xs, nSplits, mergeLeft) =>
      build(k, xs, nSplits, mergeLeft).totalWeight == xs.length.toLong
    }

  property("every quantile estimate is rank-accurate within N*L/(2k)") =
    forAll(streamGen) { case (k, xs, nSplits, mergeLeft) =>
      val buf = build(k, xs, nSplits, mergeLeft)
      val sorted = xs.sorted.toIndexedSeq
      val n = xs.length.toLong
      val levels = buf.levels.length.toLong
      val bound = (n * levels) / (2L * k) + 1L
      Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99).forall { q =>
        val est = buf.quantile(q)
        val target = math.max(1L, math.ceil(q * n).toLong)
        // rank interval of est in the exact sorted stream
        val rLt = sorted.count(_ < est).toLong
        val rLe = sorted.count(_ <= est).toLong
        // est's rank interval [rLt+1, rLe] must come within `bound` of target
        val dist =
          if (target < rLt + 1) rLt + 1 - target
          else if (target > rLe) target - rLe
          else 0L
        dist <= bound
      }
    }

  property("state stays bounded: every level < 4k after updates and merges") =
    forAll(streamGen) { case (k, xs, nSplits, mergeLeft) =>
      build(k, xs, nSplits, mergeLeft).levels.forall(_.length < 4 * k)
    }

  property("serialize round-trips the level structure") =
    forAll(streamGen) { case (k, xs, nSplits, mergeLeft) =>
      val agg = MrlAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
      val buf = build(k, xs, nSplits, mergeLeft)
      val rt = agg.deserialize(agg.serialize(buf))
      rt.levels.map(_.toSeq) == buf.levels.map(_.toSeq) &&
        rt.totalWeight == buf.totalWeight
    }

  /** Drive [[MrlMergeAgg]] the way Spark would: each chunk's MrlAgg
    * OUTPUT (the (v, w) pairs) re-enters through update(), partials
    * merge, and the combined summary must keep weight conservation AND
    * the rank bound over the union stream — the re-aggregation contract
    * `q_quantile_reagg` gates on. */
  private def reagg(k: Int, chunks: Seq[Seq[Long]], nSplits: Int): MrlAgg.Buf = {
    val mergeAgg = MrlMergeAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("w",
              org.apache.spark.sql.types.LongType, nullable = false))),
          containsNull = false),
        nullable = true),
      org.apache.spark.sql.catalyst.expressions.Literal(k))
    val bufs = Array.fill(nSplits)(mergeAgg.createAggregationBuffer())
    chunks.zipWithIndex.foreach { case (c, i) =>
      val cell = new MrlAgg.Buf()
      c.foreach(v => cell.add(v, k))
      val pairs = cell.weightedSorted
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        pairs.map { case (v, w) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](v, w)): Any
        })
      mergeAgg.update(bufs(i % nSplits),
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](arr)))
    }
    bufs.reduceLeft(mergeAgg.merge)
  }

  private val chunkGen = for {
    k <- Gen.choose(8, 64)
    chunks <- Gen.listOf(Gen.listOfN(200, Gen.choose(-500L, 500L)))
    nSplits <- Gen.choose(1, 4)
  } yield (k, chunks, nSplits)

  property("mrl_merge_agg conserves total weight over stored sketches") =
    forAll(chunkGen) { case (k, chunks, nSplits) =>
      reagg(k, chunks, nSplits).totalWeight == chunks.map(_.length).sum.toLong
    }

  property("mrl_merge_agg median stays rank-accurate within N*L/(2k)") =
    forAll(chunkGen) { case (k, chunks, nSplits) =>
      val xs = chunks.flatten
      xs.isEmpty || {
        val buf = reagg(k, chunks, nSplits)
        val sorted = xs.sorted.toIndexedSeq
        val n = xs.length.toLong
        val bound = (n * buf.levels.length.toLong) / (2L * k) + 1L
        val est = buf.quantile(0.5)
        val target = math.max(1L, math.ceil(0.5 * n).toLong)
        val rLt = sorted.count(_ < est).toLong
        val rLe = sorted.count(_ <= est).toLong
        val dist =
          if (target < rLt + 1) rLt + 1 - target
          else if (target > rLe) target - rLe
          else 0L
        dist <= bound
      }
    }

  property("mrl_merge_agg rejects a non-power-of-two weight") =
    forAll(Gen.choose(8, 64)) { k =>
      val mergeAgg = MrlMergeAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("v",
                org.apache.spark.sql.types.LongType, nullable = false),
              org.apache.spark.sql.types.StructField("w",
                org.apache.spark.sql.types.LongType, nullable = false))),
            containsNull = false),
          nullable = true),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
      val bad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](7L, 3L))))
      try {
        mergeAgg.update(mergeAgg.createAggregationBuffer(),
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](bad)))
        false
      } catch { case e: IllegalArgumentException =>
        e.getMessage.contains("power of two") }
    }
}
