package graft.plans

import graft.exprs.{StDWithin, StIntersects}
import graft.geom.Geom
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.locationtech.jts.geom.Envelope
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree
import scala.jdk.CollectionConverters._

/** Planner strategy for spatial joins (SURVEY.md §2.3 stretch operator,
  * realized at tier (c) of the extension ladder: LogicalPlan pattern →
  * SparkStrategy → custom SparkPlan).
  *
  * Catalyst cannot know `st_intersects` / `st_dwithin` are
  * index-accelerable: a plain `left.join(right, st_intersects(lg, rg))`
  * is a non-equi join and planks down to BroadcastNestedLoopJoin —
  * O(|L|·|R|) full geometry tests. This strategy recognizes those exact
  * logical shapes and plans [[BroadcastRTreeSpatialJoinExec]] instead:
  * the broadcast-hinted (or stats-small) side becomes a per-partition JTS
  * STRtree, each probe row touches only envelope-overlapping candidates
  * (for `st_dwithin(a, b, d)` the probe envelope is expanded by `d`
  * before the index query, then the exact distance test filters), and
  * exact predicates run against PreparedGeometry. The big side never
  * shuffles — the same distribution shape as Spark's own broadcast hash
  * join, which is what survives a 100 TB probe side.
  *
  * Falls through (Nil) whenever the shape doesn't match — inner joins
  * only, with a clearly broadcastable build side, and (for dwithin) a
  * foldable distance — leaving Spark's default planning untouched.
  */
object SpatialJoinStrategy extends SparkStrategy {

  private def wantsBroadcast(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(StIntersects(a, b)), hint) =>
      planSpatial(left, right, a, b, hint.leftHint, hint.rightHint, distance = None)
    case Join(left, right, Inner, Some(StDWithin(a, b, d)), hint) if d.foldable =>
      d.eval(null) match {
        // negative distance: predicate is constant-false for disjoint
        // geometries but still degenerate — leave it to default planning
        case dist: java.lang.Double if dist >= 0.0 =>
          planSpatial(left, right, a, b, hint.leftHint, hint.rightHint,
            distance = Some(dist.doubleValue()))
        case _ => Nil
      }
    // spatial filtering: LEFT SEMI preserves (and streams) the left side,
    // so only the build-right orientation is valid — the broadcast R-tree
    // answers "does ANY right geometry match" per left row
    case Join(left, right, LeftSemi, Some(StIntersects(a, b)), hint) =>
      planSpatial(left, right, a, b, hint.leftHint, hint.rightHint,
        distance = None, semi = true)
    case Join(left, right, LeftSemi, Some(StDWithin(a, b, d)), hint) if d.foldable =>
      d.eval(null) match {
        case dist: java.lang.Double if dist >= 0.0 =>
          planSpatial(left, right, a, b, hint.leftHint, hint.rightHint,
            distance = Some(dist.doubleValue()), semi = true)
        case _ => Nil
      }
    case _ => Nil
  }

  private def planSpatial(
      left: LogicalPlan, right: LogicalPlan,
      a: Expression, b: Expression,
      leftHint: Option[HintInfo], rightHint: Option[HintInfo],
      distance: Option[Double], semi: Boolean = false): Seq[SparkPlan] = {
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
        // semi mode supports ONLY build-right, so a left-side broadcast
        // hint (un-honorable there) must not suppress the one valid plan
        if (wantsBroadcast(rightHint) ||
            ((semi || !wantsBroadcast(leftHint)) && small(right)))
          BroadcastRTreeSpatialJoinExec(
            planLater(left), planLater(right), leftGeom, rightGeom,
            buildLeft = false, distance, semi) :: Nil
        else if (!semi && (wantsBroadcast(leftHint) || small(left)))
          BroadcastRTreeSpatialJoinExec(
            planLater(left), planLater(right), leftGeom, rightGeom,
            buildLeft = true, distance) :: Nil
        else Nil // no valid orientation: fall back to default planning
      case None => Nil
    }
  }
}

/** Broadcast R-tree spatial inner/semi join: collects the build side,
  * ships it as WKB + rows, builds one STRtree per probe partition (25-row
  * dimension → microseconds), and streams the probe side through envelope
  * queries + PreparedGeometry predicates. `distance = None` joins on
  * intersects; `Some(d)` joins on distance <= d (envelope expanded by d
  * for the index query, exact JTS distance as the post-filter). Inner
  * output is `left.output ++ right.output`, like Spark's join execs;
  * `semi = true` (always build-right) emits each left row at most once,
  * short-circuiting on the first matching build geometry. Everything
  * stays at the InternalRow level (no external Row round-trip). */
case class BroadcastRTreeSpatialJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftGeom: Expression, rightGeom: Expression,
    buildLeft: Boolean, distance: Option[Double] = None,
    semi: Boolean = false) extends SparkPlan {

  require(!semi || !buildLeft, "semi mode streams (and preserves) the left side")
  // the predicate's prepared-intersects short-circuit (distance 0 implies
  // intersects) is only equivalence-preserving for d >= 0; the strategy
  // guards this at planning, this guards direct construction
  require(distance.forall(_ >= 0.0),
    s"distance must be non-negative, got $distance")

  override def output: Seq[Attribute] =
    if (semi) left.output else left.output ++ right.output
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
    val dist = distance
    val semiMode = semi
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
      def predicate(bg: PreparedGeometry, g: org.locationtech.jts.geom.Geometry): Boolean =
        dist match {
          case None => bg.intersects(g)
          // intersecting geometries have distance 0, so the prepared
          // (indexed) intersects test short-circuits the expensive
          // exact distance computation for the common overlap case
          case Some(d) => bg.intersects(g) || bg.getGeometry.isWithinDistance(g, d)
        }
      def candidates(g: org.locationtech.jts.geom.Geometry) = {
        val qEnv = new Envelope(g.getEnvelopeInternal)
        dist.foreach(qEnv.expandBy)
        tree.query(qEnv).asScala.iterator
          .map(_.asInstanceOf[(PreparedGeometry, InternalRow)])
      }
      it.flatMap { srow =>
        val wkb = streamBound.eval(srow).asInstanceOf[Array[Byte]]
        if (wkb == null) Iterator.empty
        else {
          val g = Geom.fromWkb(wkb)
          if (semiMode) {
            // at most one output row; exists short-circuits candidate scan
            if (candidates(g).exists { case (bg, _) => predicate(bg, g) })
              Iterator.single(proj(srow))
            else Iterator.empty
          } else {
            candidates(g)
              .filter { case (bg, _) => predicate(bg, g) }
              .map { case (_, brow) =>
                proj(if (bLeft) joined.withLeft(brow).withRight(srow)
                     else joined.withLeft(srow).withRight(brow))
              }
          }
        }
      }
    }
  }
}
