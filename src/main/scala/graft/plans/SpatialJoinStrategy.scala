package graft.plans

import graft.exprs.StIntersects
import graft.geom.Geom
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree
import scala.jdk.CollectionConverters._

/** Planner strategy for spatial joins (SURVEY.md §2.3 stretch operator,
  * realized at tier (c) of the extension ladder: LogicalPlan pattern →
  * SparkStrategy → custom SparkPlan).
  *
  * Catalyst cannot know `st_intersects` is index-accelerable: a plain
  * `left.join(right, st_intersects(lg, rg))` is a non-equi join and planks
  * down to BroadcastNestedLoopJoin — O(|L|·|R|) full geometry tests. This
  * strategy recognizes that exact logical shape and plans
  * [[BroadcastRTreeSpatialJoinExec]] instead: the broadcast-hinted (or
  * stats-small) side becomes a per-partition JTS STRtree, each probe row
  * touches only envelope-overlapping candidates, and exact `intersects`
  * runs against PreparedGeometry. The big side never shuffles — the same
  * distribution shape as Spark's own broadcast hash join, which is what
  * survives a 100 TB probe side.
  *
  * Falls through (Nil) whenever the shape doesn't match — inner joins
  * only, with a clearly broadcastable build side — leaving Spark's
  * default planning untouched.
  */
object SpatialJoinStrategy extends SparkStrategy {

  private def wantsBroadcast(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(StIntersects(a, b)), hint) =>
      // orient the two geometry expressions to the children they reference
      val oriented: Option[(Expression, Expression)] =
        if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
          Some((a, b))
        else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
          Some((b, a))
        else None
      oriented match {
        case Some((leftGeom, rightGeom)) =>
          val threshold = SQLConf.get.autoBroadcastJoinThreshold
          def small(p: LogicalPlan): Boolean =
            threshold >= 0 && p.stats.sizeInBytes <= threshold
          if (wantsBroadcast(hint.rightHint) || (!wantsBroadcast(hint.leftHint) && small(right)))
            BroadcastRTreeSpatialJoinExec(
              planLater(left), planLater(right), leftGeom, rightGeom, buildLeft = false) :: Nil
          else if (wantsBroadcast(hint.leftHint) || small(left))
            BroadcastRTreeSpatialJoinExec(
              planLater(left), planLater(right), leftGeom, rightGeom, buildLeft = true) :: Nil
          else Nil // neither side broadcastable: fall back to default planning
        case None => Nil
      }
    case _ => Nil
  }
}

/** Broadcast R-tree spatial inner join: collects the build side, ships it
  * as WKB + rows, builds one STRtree per probe partition (25-row dimension
  * → microseconds), and streams the probe side through envelope queries +
  * PreparedGeometry.intersects. Output is `left.output ++ right.output`,
  * like Spark's join execs; everything stays at the InternalRow level (no
  * external Row round-trip). */
case class BroadcastRTreeSpatialJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftGeom: Expression, rightGeom: Expression,
    buildLeft: Boolean) extends SparkPlan {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def children: Seq[SparkPlan] = Seq(left, right)
  override protected def withNewChildrenInternal(c: IndexedSeq[SparkPlan]): SparkPlan =
    copy(left = c(0), right = c(1))
  override def outputPartitioning =
    (if (buildLeft) right else left).outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (buildPlan, streamPlan) = if (buildLeft) (left, right) else (right, left)
    val (buildGeom, streamGeom) = if (buildLeft) (leftGeom, rightGeom) else (rightGeom, leftGeom)
    val buildBound = BindReferences.bindReference(buildGeom, buildPlan.output)
    val streamBound = BindReferences.bindReference(streamGeom, streamPlan.output)
    // dimension side to the driver once, WKB + row in one broadcast
    val buildRows: Array[(Array[Byte], InternalRow)] = buildPlan.executeCollect().map { r =>
      (buildBound.eval(r).asInstanceOf[Array[Byte]], r.copy())
    }
    val bc = sparkContext.broadcast(buildRows)
    val outAttrs = output
    val bLeft = buildLeft
    streamPlan.execute().mapPartitions { it =>
      val tree = new STRtree()
      bc.value.foreach { case (wkb, row) =>
        if (wkb != null) {
          val g = Geom.fromWkb(wkb)
          tree.insert(g.getEnvelopeInternal, (PreparedGeometryFactory.prepare(g), row))
        }
      }
      tree.build()
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      it.flatMap { srow =>
        val wkb = streamBound.eval(srow).asInstanceOf[Array[Byte]]
        if (wkb == null) Iterator.empty
        else {
          val g = Geom.fromWkb(wkb)
          tree.query(g.getEnvelopeInternal).asScala.iterator
            .map(_.asInstanceOf[(PreparedGeometry, InternalRow)])
            .filter { case (bg, _) => bg.intersects(g) }
            .map { case (_, brow) =>
              proj(if (bLeft) joined.withLeft(brow).withRight(srow)
                   else joined.withLeft(srow).withRight(brow))
            }
        }
      }
    }
  }
}
