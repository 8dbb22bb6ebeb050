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
    * @param to5880    reproject EPSG:3857→5880 before measuring area (the
    *                  reference's full chain, process_geodata.py:120-139).
    *                  false keeps areas in EPSG:3857 m² — closed-form
    *                  (disjoint 400 m parcels => area = 160000 · #parcels),
    *                  so a DuckDB oracle can mirror it arithmetically.
    */
  def flagship(spark: SparkSession, dir: String, gapBuffer: Double = 0.0,
               roundTo: Int = 2, to5880: Boolean = true): DataFrame = {
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

    val clipped = joined
      .groupBy(col("region_id"), col("season_id"), col("land_type_id"), col("geo_region_mod"))
      .agg(st_makevalid(st_union_agg(col("geo_land_use_mod"))).as("geo_union"))
      .withColumn("clip",
        st_buffer(st_makevalid(st_intersection(col("geo_union"), col("geo_region_mod"))), lit(0.0)))
    val measured =
      if (to5880) clipped.withColumn("area",
        round(st_area(st_transform(col("clip"), "EPSG:3857", "EPSG:5880")), roundTo))
      else clipped.withColumn("area", round(st_area(col("clip")), roundTo))
    measured
      .select(col("region_id"), col("season_id"), col("land_type_id"), col("area"))
      .orderBy(col("region_id"), col("season_id"), col("land_type_id"))
  }

  /** Closed-form oracle for `flagship(to5880 = false, gapBuffer = 0)`:
    * parcels are disjoint 400 m squares fully inside their region, so the
    * clipped union area is exactly 160000 · count(DISTINCT parcel index). */
  val flagshipOracleSql: String =
    """SELECT CAST(l_partkey % 25 AS INTEGER) AS region_id,
      |       CAST(month(l_shipdate) % 4 AS INTEGER) AS season_id,
      |       CAST(l_partkey % 7 AS INTEGER) AS land_type_id,
      |       ROUND(count(DISTINCT (l_orderkey * 7 + l_linenumber) % 2500) * 160000.0, 2) AS area
      |FROM lineitem JOIN nation ON (l_partkey % 25) = n_nationkey
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
}
