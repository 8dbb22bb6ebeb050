package graft.exprs

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The Misra-Gries law [[MgAgg]]'s consumers rely on: every key with
  * frequency > N/k survives in the summary under ANY partitioning of the
  * stream into partial buffers and ANY merge order (Agarwal et al. 2013).
  * Exercised directly against the aggregate's update/merge/eval methods —
  * the same calls Spark's TypedImperativeAggregate path makes.
  */
object MgAggProps extends Properties("mg_agg") {

  private def mk(k: Int) = MgAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(0,
      org.apache.spark.sql.types.LongType, nullable = true),
    org.apache.spark.sql.catalyst.expressions.Literal(k))

  private def row(v: Long) =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](v))

  private val streamGen = for {
    k <- Gen.choose(2, 12)
    n <- Gen.choose(0, 400)
    // skewed alphabet: small ids are hot
    xs <- Gen.listOfN(n, Gen.frequency(
      (5, Gen.choose(0L, 2L)), (3, Gen.choose(0L, 15L)), (2, Gen.choose(0L, 200L))))
    nSplits <- Gen.choose(1, 8)
  } yield (k, xs, nSplits)

  property("freq > N/k keys always survive any split + left-fold merge") =
    forAll(streamGen) { case (k, xs, nSplits) =>
      val agg = mk(k)
      // split the stream into nSplits partials (round-robin = adversarial
      // interleaving), update each, then fold-merge left to right
      val bufs = Array.fill(nSplits)(agg.createAggregationBuffer())
      xs.zipWithIndex.foreach { case (v, i) =>
        agg.update(bufs(i % nSplits), row(v))
      }
      val merged = bufs.reduceLeft(agg.merge)
      val out = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSet
      val n = xs.length
      val freq = xs.groupBy(identity).view.mapValues(_.size)
      freq.forall { case (key, c) => c.toLong * k <= n || out.contains(key) }
    }

  property("serialize round-trips the buffer") =
    forAll(streamGen) { case (k, xs, _) =>
      val agg = mk(k)
      val buf = agg.createAggregationBuffer()
      xs.foreach(v => agg.update(buf, row(v)))
      val back = agg.deserialize(agg.serialize(buf))
      back.toMap == buf.toMap
    }

  property("state never exceeds k-1 counters after update or merge") =
    forAll(streamGen) { case (k, xs, nSplits) =>
      val agg = mk(k)
      val bufs = Array.fill(nSplits)(agg.createAggregationBuffer())
      xs.zipWithIndex.foreach { case (v, i) =>
        agg.update(bufs(i % nSplits), row(v))
      }
      bufs.forall(_.size <= k - 1) && bufs.reduceLeft(agg.merge).size <= k - 1
    }
}
