package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.GeometryFixer
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}
import org.locationtech.jts.operation.union.UnaryUnionOp

/** JTS geometry codecs and validity helpers.
  *
  * Storage/shuffle representation is WKB bytes in a Spark `BinaryType`
  * column (see SURVEY.md §7.3); JTS `Geometry` is the in-operator object
  * model. WKT (`StringType`) appears only at the edges, mirroring the
  * reference's WKT transport (reference: spark_job/process_geodata.py:102-103,
  * 167,173 — `ST_AsText` server-side, `ST_GeomFromWKT` in-flight).
  *
  * JTS readers/writers are not thread-safe → one instance per thread.
  */
object Geom {
  val factory = new GeometryFactory(new PrecisionModel(), 0)

  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())
  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())

  def fromWkt(s: String): Geometry = wktReader.get.read(s)
  def toWkt(g: Geometry): String = wktWriter.get.write(g)
  def fromWkb(b: Array[Byte]): Geometry = wkbReader.get.read(b)
  def toWkb(g: Geometry): Array[Byte] = wkbWriter.get.write(g)

  /** Repair invalid geometry; identity on valid input.
    * Mirrors Sedona `ST_MakeValid` as exercised by the reference
    * (process_geodata.py:102,103,113,126). */
  def makeValid(g: Geometry): Geometry =
    if (g.isValid) g else GeometryFixer.fix(g)

  /** Defensive intersection: on TopologyException, repair both sides and
    * retry, then fall back to zero-buffer normalization — reproducing the
    * reference's defensive nesting (process_geodata.py:125-133). */
  def safeIntersection(a: Geometry, b: Geometry): Geometry =
    try a.intersection(b)
    catch {
      case _: TopologyException =>
        try makeValid(a).intersection(makeValid(b))
        catch {
          case _: TopologyException => a.buffer(0).intersection(b.buffer(0))
        }
    }

  /** Union of many geometries (UnaryUnionOp = cascaded union for polygons). */
  def unionAll(gs: java.util.Collection[Geometry]): Geometry =
    if (gs.isEmpty) factory.createGeometryCollection()
    else UnaryUnionOp.union(gs)
}
