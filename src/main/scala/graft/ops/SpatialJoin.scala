package graft.ops

import graft.geom.Geom
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType
import org.locationtech.jts.index.strtree.STRtree
import scala.jdk.CollectionConverters._

/** Broadcast R-tree spatial join, DataFrame-API form — the engine-level
  * operator Sedona's installed-but-unused spatial-join machinery would
  * have provided (reference: Sedona extensions loaded at
  * airflow_dag/dag_geo_pipeline.py:20, never exercised; SURVEY.md §2.3
  * marks this the capability stretch goal).
  *
  * The PREFERRED path is the declarative one: write
  * `left.join(broadcast(right), st_intersects(lg, rg))` and let
  * graft.plans.SpatialJoinStrategy plan BroadcastRTreeSpatialJoinExec —
  * Catalyst then still prunes columns and composes the join with the rest
  * of the plan. This explicit operator remains for sessions where the
  * strategy is not installed.
  *
  * Catalyst cannot know `st_intersects` is index-accelerable, so a naive
  * formulation becomes BroadcastNestedLoopJoin — O(|L|·|R|) geometry tests.
  * This operator broadcasts the small side as WKB, builds one JTS STRtree
  * per partition (not per row), and probes it with each left row's
  * envelope; exact `intersects` runs only on envelope survivors. At 1000
  * executors the tree builds 1000 times total and the big side never
  * shuffles — the same plan shape Spark uses for broadcast hash joins.
  */
object SpatialJoin {

  /** Inner join `left ⋈ right ON st_intersects(left[leftGeomCol],
    * right[rightGeomCol])`. `right` must be the dimension side (collected
    * and broadcast, like `functions.broadcast`). Output schema is the
    * concatenation of both sides' columns, or just `outputCols` when given
    * (resolved left side first). mapPartitions is opaque to Catalyst column
    * pruning, so when the consumer needs only a few columns — e.g. a
    * count-per-key rollup that drops both geometries — projecting inside
    * the operator is what keeps multi-hundred-byte WKB payloads out of the
    * row encoder and the downstream shuffle. */
  def broadcastIntersects(left: DataFrame, right: DataFrame,
                          leftGeomCol: String, rightGeomCol: String,
                          outputCols: Seq[String] = Nil): DataFrame =
    broadcastJoin(left, right, leftGeomCol, rightGeomCol, outputCols, distance = None)

  /** Inner join on `st_dwithin(left[leftGeomCol], right[rightGeomCol], d)`
    * — the probe envelope is expanded by `d` before the R-tree query and
    * exact JTS distance runs as the post-filter (same kernel as the
    * planner-strategy form). */
  def broadcastDWithin(left: DataFrame, right: DataFrame,
                       leftGeomCol: String, rightGeomCol: String, d: Double,
                       outputCols: Seq[String] = Nil): DataFrame = {
    require(d >= 0.0, s"distance must be non-negative, got $d")
    broadcastJoin(left, right, leftGeomCol, rightGeomCol, outputCols, distance = Some(d))
  }

  private def broadcastJoin(left: DataFrame, right: DataFrame,
                            leftGeomCol: String, rightGeomCol: String,
                            outputCols: Seq[String],
                            distance: Option[Double]): DataFrame = {
    val spark = left.sparkSession
    val rightSchema = right.schema
    val rightGeomIdx = rightSchema.fieldIndex(rightGeomCol)
    // dimension side: WKB + the row's other values travel in one broadcast
    val rightRows: Array[(Array[Byte], Seq[Any])] = right.collect().map { r =>
      (r.getAs[Array[Byte]](rightGeomIdx), r.toSeq)
    }
    val bRight = spark.sparkContext.broadcast(rightRows)
    val leftSchema = left.schema
    val leftGeomIdx = leftSchema.fieldIndex(leftGeomCol)
    // output projection: (isLeft, ordinal) per emitted column
    val picks: Array[(Boolean, Int)] =
      if (outputCols.isEmpty) {
        leftSchema.fields.indices.map(i => (true, i)).toArray ++
          rightSchema.fields.indices.map(i => (false, i))
      } else outputCols.map { c =>
        val li = leftSchema.fieldNames.indexOf(c)
        if (li >= 0) (true, li)
        else (false, rightSchema.fieldIndex(c))
      }.toArray
    val outSchema = StructType(picks.map { case (isLeft, i) =>
      if (isLeft) leftSchema.fields(i) else rightSchema.fields(i)
    })

    // probe kernel is per-row JTS work — guarantee it fans out across cores
    Par.fanOut(left).mapPartitions { it =>
      // PreparedGeometry caches the index-side geometry's edge index: the
      // same polygon is probed by every left row in the partition, which
      // is PreparedGeometryFactory's designed use case (~3x on intersects)
      val tree = new STRtree()
      bRight.value.foreach { case (wkb, values) =>
        val g = Geom.fromWkb(wkb)
        val prepared = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(g)
        tree.insert(g.getEnvelopeInternal, (prepared, values))
      }
      tree.build()
      it.flatMap { lrow =>
        val lg = Geom.fromWkb(lrow.getAs[Array[Byte]](leftGeomIdx))
        val qEnv = new org.locationtech.jts.geom.Envelope(lg.getEnvelopeInternal)
        distance.foreach(qEnv.expandBy)
        tree.query(qEnv).asScala.iterator
          .map(_.asInstanceOf[(org.locationtech.jts.geom.prep.PreparedGeometry, Seq[Any])])
          .filter { case (rg, _) =>
            distance match {
              case None => rg.intersects(lg)
              // prepared intersects first: overlap implies distance 0, so
              // the exact distance test only runs for disjoint candidates
              case Some(dd) => rg.intersects(lg) || rg.getGeometry.isWithinDistance(lg, dd)
            }
          }
          .map { case (_, rvals) =>
            val vs = new Array[Any](picks.length)
            var i = 0
            while (i < picks.length) {
              val (isLeft, ord) = picks(i)
              vs(i) = if (isLeft) lrow.get(ord) else rvals(ord)
              i += 1
            }
            Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vs))
          }
      }
    }(Encoders.row(outSchema))
  }
}
