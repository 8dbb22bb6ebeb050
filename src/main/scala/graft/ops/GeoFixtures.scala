package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic geometry fixtures synthesized from table keys (FIXTURES.md §A):
  * axis-aligned rectangles in EPSG:3857 meters over Brazil, so the reference's
  * `ST_Transform(..., 'EPSG:3857', 'EPSG:5880')` → `ST_Area` chain
  * (reference: spark_job/process_geodata.py:120-139) is exercised on shapes
  * whose areas have closed forms a DuckDB oracle can mirror arithmetically.
  *
  * All coordinates are integral meters so WKT construction is exact string
  * arithmetic (codegen'd concat — no geometry code on the hot path).
  */
object GeoFixtures {
  // region grid: 25 cells of 50 km x 50 km near (-56E, -17S)
  val RegionX0 = -6300000L
  val RegionY0 = -2000000L
  val RegionSize = 50000L
  val RegionStep = 60000L
  // parcel grid inside a region: 50 x 50 cells of 1 km, parcel 400 m square
  val ParcelCell = 1000L
  val ParcelSize = 400L

  private def s(c: Column): Column = c.cast("long").cast("string")

  /** WKT of the axis-aligned rectangle [x0, x0+w] x [y0, y0+h]. */
  def rectWkt(x0: Column, y0: Column, w: Long, h: Long): Column = {
    val x1 = x0 + lit(w)
    val y1 = y0 + lit(h)
    concat(
      lit("POLYGON (("),
      s(x0), lit(" "), s(y0), lit(", "),
      s(x1), lit(" "), s(y0), lit(", "),
      s(x1), lit(" "), s(y1), lit(", "),
      s(x0), lit(" "), s(y1), lit(", "),
      s(x0), lit(" "), s(y0), lit("))"))
  }

  /** Region-cell origin for a region key 0..24. */
  def regionX0(key: Column): Column = lit(RegionX0) + (key % 5).cast("long") * lit(RegionStep)
  def regionY0(key: Column): Column = lit(RegionY0) + (key.cast("long") / lit(5L)).cast("long") * lit(RegionStep)

  /** Region rectangle WKT for a region key. */
  def regionWkt(key: Column): Column =
    rectWkt(regionX0(key), regionY0(key), RegionSize, RegionSize)

  /** Parcel grid index within a region (0..2499), from fact-row keys. */
  def parcelIdx(orderkey: Column, linenumber: Column): Column =
    (orderkey * 7 + linenumber) % 2500

  /** Parcel-cell origin coordinates for cell (idx%50, idx/50) of the region. */
  def parcelX0(regionKey: Column, idx: Column): Column =
    regionX0(regionKey) + (idx % 50).cast("long") * lit(ParcelCell)
  def parcelY0(regionKey: Column, idx: Column): Column =
    regionY0(regionKey) + (idx.cast("long") / lit(50L)).cast("long") * lit(ParcelCell)

  /** Parcel rectangle WKT: 400 m square in cell (idx%50, idx/50) of the region. */
  def parcelWkt(regionKey: Column, idx: Column): Column =
    rectWkt(parcelX0(regionKey, idx), parcelY0(regionKey, idx), ParcelSize, ParcelSize)
}
