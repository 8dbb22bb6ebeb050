package graft.exprs

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, throws}

/** The bitmap laws [[BitmapAgg]]'s consumers rely on, against
  * update/merge/eval directly (the TypedImperativeAggregate path):
  * exact set semantics under any stream split, bounded fixed state,
  * serialization round-trip, and the loud out-of-universe failure. */
object BitmapAggProps extends Properties("bitmap_agg") {

  private def mk(universe: Int) = BitmapAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(0,
      org.apache.spark.sql.types.LongType, nullable = true),
    org.apache.spark.sql.catalyst.expressions.Literal(universe))

  private def row(v: Long) =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](v))

  private def bits(words: Seq[Long]): Set[Long] =
    (for (w <- words.indices; b <- 0 until 64
          if (words(w) & (1L << b)) != 0L) yield w * 64L + b).toSet

  private val streamGen = for {
    universe <- Gen.choose(1, 300)
    n <- Gen.choose(0, 400)
    xs <- Gen.listOfN(n, Gen.choose(0L, universe.toLong - 1))
    nSplits <- Gen.choose(1, 8)
  } yield (universe, xs, nSplits)

  property("bitmap == the exact id set under any split + merge order") =
    forAll(streamGen) { case (universe, xs, nSplits) =>
      val agg = mk(universe)
      val bufs = Array.fill(nSplits)(agg.createAggregationBuffer())
      xs.zipWithIndex.foreach { case (v, i) => agg.update(bufs(i % nSplits), row(v)) }
      val merged = bufs.reduceLeft(agg.merge)
      val out = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      out.length == (universe + 63) / 64 && bits(out) == xs.toSet
    }

  property("serialize round-trips the fixed-size buffer") =
    forAll(streamGen) { case (universe, xs, _) =>
      val agg = mk(universe)
      val buf = agg.createAggregationBuffer()
      xs.foreach(v => agg.update(buf, row(v)))
      java.util.Arrays.equals(agg.deserialize(agg.serialize(buf)), buf)
    }

  property("out-of-universe ids fail loudly") =
    forAll(Gen.choose(1, 100)) { universe =>
      val agg = mk(universe)
      val buf = agg.createAggregationBuffer()
      throws(classOf[IllegalArgumentException]) {
        agg.update(buf, row(universe.toLong))
      } && throws(classOf[IllegalArgumentException]) {
        agg.update(buf, row(-1L))
      }
    }
}
