package graft.exprs

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The KMV laws [[KmvAgg]]'s consumers rely on, exercised directly
  * against update/merge/eval — the calls Spark's
  * TypedImperativeAggregate path makes:
  *
  *  1. the sketch is EXACTLY the k smallest distinct hashes, under ANY
  *     split of the stream into partial buffers and any merge order
  *     (this is what makes the estimator deterministic and the DuckDB
  *     oracle's ORDER BY h LIMIT k replay bit-identical);
  *  2. state stays bounded by k through updates and merges;
  *  3. serialization round-trips;
  *  4. the set-algebra identity `kmvOverlap` depends on: the k smallest
  *     of A ∪ B computed from the two SKETCHES equals the k smallest
  *     computed from the FULL sets.
  */
object KmvAggProps extends Properties("kmv_agg") {

  private def mk(k: Int) = KmvAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(0,
      org.apache.spark.sql.types.LongType, nullable = true),
    org.apache.spark.sql.catalyst.expressions.Literal(k))

  private def row(v: Long) =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](v))

  private def sketchOf(k: Int, xs: Seq[Long], nSplits: Int): Seq[Long] = {
    val agg = mk(k)
    val bufs = Array.fill(nSplits)(agg.createAggregationBuffer())
    xs.zipWithIndex.foreach { case (v, i) => agg.update(bufs(i % nSplits), row(v)) }
    val merged = bufs.reduceLeft(agg.merge)
    agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  private val streamGen = for {
    k <- Gen.choose(1, 16)
    n <- Gen.choose(0, 300)
    // duplicates likely: hash space deliberately smaller than the stream
    xs <- Gen.listOfN(n, Gen.choose(0L, 120L))
    nSplits <- Gen.choose(1, 8)
  } yield (k, xs, nSplits)

  property("sketch == k smallest distinct hashes under any split") =
    forAll(streamGen) { case (k, xs, nSplits) =>
      sketchOf(k, xs, nSplits) == xs.distinct.sorted.take(k)
    }

  property("buffer size never exceeds k") =
    forAll(streamGen) { case (k, xs, nSplits) =>
      val agg = mk(k)
      val bufs = Array.fill(nSplits)(agg.createAggregationBuffer())
      val okUpdates = xs.zipWithIndex.forall { case (v, i) =>
        agg.update(bufs(i % nSplits), row(v)).size <= k
      }
      okUpdates && bufs.reduceLeft((a, b) => {
        val m = agg.merge(a, b); assert(m.size <= k); m
      }).size <= k
    }

  property("serialize round-trips the buffer") =
    forAll(streamGen) { case (k, xs, _) =>
      val agg = mk(k)
      val buf = agg.createAggregationBuffer()
      xs.foreach(v => agg.update(buf, row(v)))
      agg.deserialize(agg.serialize(buf)) == buf
    }

  property("merged-sketch union == full-set union (kmvOverlap identity)") =
    forAll(for {
      k <- Gen.choose(1, 12)
      as <- Gen.listOf(Gen.choose(0L, 150L))
      bs <- Gen.listOf(Gen.choose(0L, 150L))
    } yield (k, as, bs)) { case (k, as, bs) =>
      val ska = sketchOf(k, as, 1)
      val skb = sketchOf(k, bs, 1)
      val fromSketches = (ska ++ skb).distinct.sorted.take(k)
      val fromFullSets = (as ++ bs).distinct.sorted.take(k)
      fromSketches == fromFullSets
    }

  property("kmv_merge_agg(stored sketches) == kmv_agg(raw union) — merge == rebuild") =
    forAll(for {
      k <- Gen.choose(1, 12)
      chunks <- Gen.listOf(Gen.listOf(Gen.choose(0L, 150L)))
      nSplits <- Gen.choose(1, 4)
    } yield (k, chunks, nSplits)) { case (k, chunks, nSplits) =>
      // per-chunk KmvAgg sketches (the stored cube cells)...
      val cells = chunks.map(c => sketchOf(k, c, 1))
      // ...re-aggregated through KmvMergeAgg under any partial split
      val mergeAgg = KmvMergeAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = true),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
      val bufs = Array.fill(nSplits)(mergeAgg.createAggregationBuffer())
      cells.zipWithIndex.foreach { case (sk, i) =>
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          sk.map(_.asInstanceOf[Any]).toArray)
        mergeAgg.update(bufs(i % nSplits),
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](arr)))
      }
      val reagg = mergeAgg.eval(bufs.reduceLeft(mergeAgg.merge))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      reagg == chunks.flatten.distinct.sorted.take(k)
    }

  property("kmv_merge_agg rejects an oversized (different-k) sketch") =
    forAll(Gen.choose(1, 8)) { k =>
      val mergeAgg = KmvMergeAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = true),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
      val buf = mergeAgg.createAggregationBuffer()
      val tooBig = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        (0L to k.toLong).map(_.asInstanceOf[Any]).toArray) // k+1 values
      try {
        mergeAgg.update(buf,
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](tooBig)))
        false
      } catch { case e: IllegalArgumentException =>
        e.getMessage.contains("same k") }
    }

  property("negative hash fails loudly (estimator precondition)") =
    forAll(Gen.choose(Long.MinValue, -1L)) { h =>
      val agg = mk(4)
      val buf = agg.createAggregationBuffer()
      try { agg.update(buf, row(h)); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("negative hash") && buf.isEmpty }
    }
}
