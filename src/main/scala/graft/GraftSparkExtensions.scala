package graft

import graft.exprs._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `spark.sql.extensions`-style injection of the graft function surface —
  * the exact mechanism the reference uses to get Sedona's `ST_*` into SQL
  * (reference: airflow_dag/dag_geo_pipeline.py:20 sets
  * `spark.sql.extensions=org.apache.sedona.sql.SedonaSqlExtensions`).
  *
  * Usage: `.config("spark.sql.extensions", "graft.GraftSparkExtensions")`
  * at session build — every `st_*`/dedup function is then resolvable in
  * SQL text on any session of that builder, with no per-session
  * registerAll call. `functions.registerAll` remains as the imperative
  * alternative for sessions built elsewhere.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: fuse chained st_transform calls (SURVEY §7.5)
    ext.injectOptimizerRule(_ => graft.plans.CollapseStTransforms)
    // planner strategy: st_intersects join conditions plan as a broadcast
    // R-tree join instead of BroadcastNestedLoopJoin (SURVEY §2.3)
    ext.injectPlannerStrategy(_ => graft.plans.SpatialJoinStrategy)

    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, null, "", "", "", "", "", "", "scala_udf"),
        builder))

    inject("st_geomfromwkt", es => StGeomFromWKT(es.head))
    inject("st_astext", es => StAsText(es.head))
    inject("st_point", es => StPoint(es.head, es(1)))
    inject("st_makeenvelope", es => StMakeEnvelope(es))
    inject("st_makevalid", es => StMakeValid(es.head))
    inject("st_buffer", es => StBuffer(es.head, es(1)))
    inject("st_intersection", es => StIntersection(es.head, es(1)))
    inject("st_union", es => StUnion(es.head, es(1)))
    inject("st_area", es => StArea(es.head))
    inject("st_length", es => StLength(es.head))
    inject("st_centroid", es => StCentroid(es.head))
    inject("st_envelope", es => StEnvelope(es.head))
    inject("st_x", es => StX(es.head))
    inject("st_y", es => StY(es.head))
    inject("st_isvalid", es => StIsValid(es.head))
    inject("st_intersects", es => StIntersects(es.head, es(1)))
    inject("st_contains", es => StContains(es.head, es(1)))
    inject("st_within", es => StWithin(es.head, es(1)))
    inject("st_distance", es => StDistance(es.head, es(1)))
    inject("st_transform", es => StTransform(es.head, es(1), es(2)))
    inject("st_union_agg", es => StUnionAgg(es.head))
    inject("minhash_sig", es => MinHashSig(es.head, es(1), es(2)))
    inject("minhash_bands", es => MinHashBands(es))
    inject("simhash64", es => SimHash64(es.head, es(1)))
    inject("hamming64", es => Hamming64(es.head, es(1)))
    inject("ngram_jaccard", es => NGramJaccard(es.head, es(1), es(2)))
  }
}
