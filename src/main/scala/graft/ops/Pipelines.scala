package graft.ops

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship spatial-aggregation pipeline, re-expressed
  * Spark-first (reference: spark_job/process_geodata.py:98-144 —
  * broadcast equi join → spatial derive → grouped geometric union →
  * intersection → reproject → area → final projection).
  */
object Pipelines {

  /** Flagship pipeline over synthesized parcels/regions (GeoFixtures).
    *
    * @param gapBuffer the reference's gap-sealing buffer distance
    *                  (1e-7 at process_geodata.py:102); 0.0 keeps shapes
    *                  closed-form for the DuckDB oracle.
    * @param roundTo   decimal places for the output area.
    */
  def flagship(spark: SparkSession, dir: String, gapBuffer: Double = 0.0,
               roundTo: Int = 2): DataFrame = {
    import GeoFixtures._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_shipdate"))
    val parcels = li.select(
      (col("l_partkey") % 25).cast("int").as("region_id"),
      (month(col("l_shipdate")) % 4).cast("int").as("season_id"),
      (col("l_partkey") % 7).cast("int").as("land_type_id"),
      parcelWkt(col("l_partkey") % 25, parcelIdx(col("l_orderkey"), col("l_linenumber"))).as("parcel_wkt"))

    val regions = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("int").as("id"),
        regionWkt(col("n_nationkey")).as("region_wkt"))

    // dimension side is 25 rows — broadcast, exactly like the reference (J1)
    val joined = parcels.join(broadcast(regions), parcels("region_id") === regions("id"), "inner")
      .withColumn("geo_land_use_mod",
        st_buffer(st_makevalid(st_geomfromwkt(col("parcel_wkt"))), lit(gapBuffer)))
      .withColumn("geo_region_mod", st_makevalid(st_geomfromwkt(col("region_wkt"))))

    joined
      .groupBy(col("region_id"), col("season_id"), col("land_type_id"), col("geo_region_mod"))
      .agg(st_makevalid(st_union_agg(col("geo_land_use_mod"))).as("geo_union"))
      .withColumn("area",
        round(st_area(st_transform(
          st_buffer(st_intersection(col("geo_union"), col("geo_region_mod")), lit(0.0)),
          "EPSG:3857", "EPSG:5880")), roundTo))
      .select(col("region_id"), col("season_id"), col("land_type_id"), col("area"))
  }
}
