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

  /** Per-thread direct-mapped WKB→Geometry decode memo.
    *
    * Spatial joins evaluate their predicates once per CANDIDATE PAIR, and
    * one side of every such pair is a dimension-sized relation whose few
    * distinct geometries recur millions of times (25 regions × 5.3M kNN
    * pairs at sf0.1) — re-parsing ~1 µs of WKB per evaluation was the
    * dominant per-pair cost next to the distance math itself. A content-
    * keyed cache hit costs one byte-array hash + equals (~80 ns for the
    * 93-byte envelope WKB); a miss adds the same on top of the parse.
    *
    * Safety: entries are shared within a thread across rows, so callers
    * must treat parsed geometries as immutable — every mutating site in
    * the expression layer `copy()`s first (audited r17; the JTS read-only
    * predicates/overlay ops never mutate inputs, and the lazily-computed
    * internal envelope is confined to this thread). This is transient
    * per-task JVM state keyed on bytes in flight, never a cross-run
    * result cache. */
  private final class DecodeCache(cap: Int) {
    private val keys = new Array[Array[Byte]](cap)
    private val vals = new Array[Geometry](cap)
    def get(b: Array[Byte]): Geometry = {
      val i = (java.util.Arrays.hashCode(b) & 0x7fffffff) % cap
      val k = keys(i)
      if (k != null && java.util.Arrays.equals(k, b)) vals(i)
      else {
        val g = wkbReader.get.read(b)
        keys(i) = b
        vals(i) = g
        g
      }
    }
  }
  private val decodeCache =
    ThreadLocal.withInitial[DecodeCache](() => new DecodeCache(64))

  /** [[fromWkb]] through the per-thread decode memo — for read-only
    * consumers (the Catalyst expression layer); see [[DecodeCache]]. */
  def fromWkbCached(b: Array[Byte]): Geometry = decodeCache.get().get(b)

  /** WKB of the axis-aligned rectangle [x0,x1]×[y0,y1], written directly
    * (big-endian, the same layout JTS WKBWriter emits — byte-identical to
    * encoding the equivalent JTS polygon). The envelope is the probe-side
    * geometry of every spatial join, built once per fact row: direct byte
    * writing skips five Coordinate allocations + polygon construction and
    * is a static call codegen can emit inline. */
  def envelopeWkb(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(93) // 1 + 4 + 4 + 4 + 5*16, big-endian
    buf.put(0.toByte)      // XDR byte order
    buf.putInt(3)          // wkbPolygon
    buf.putInt(1)          // one ring
    buf.putInt(5)          // five points, closed
    buf.putDouble(x0).putDouble(y0)
    buf.putDouble(x1).putDouble(y0)
    buf.putDouble(x1).putDouble(y1)
    buf.putDouble(x0).putDouble(y1)
    buf.putDouble(x0).putDouble(y0)
    buf.array()
  }

  /** Repair invalid geometry; identity on valid input.
    * Mirrors Sedona `ST_MakeValid` as exercised by the reference
    * (process_geodata.py:102,103,113,126). */
  def makeValid(g: Geometry): Geometry =
    if (g.isValid) g else GeometryFixer.fix(g)

  /** Defensive intersection: on TopologyException, repair both sides and
    * retry, then fall back to zero-buffer normalization — reproducing the
    * reference's defensive nesting (process_geodata.py:125-133). */
  def safeIntersection(a: Geometry, b: Geometry): Geometry =
    safeOverlay(a, b)(_.intersection(_))

  /** Defensive overlay ladder shared by difference/symDifference — the
    * same TopologyException nesting as [[safeIntersection]]. */
  private def safeOverlay(a: Geometry, b: Geometry)
                         (op: (Geometry, Geometry) => Geometry): Geometry =
    try op(a, b)
    catch {
      case _: TopologyException =>
        try op(makeValid(a), makeValid(b))
        catch {
          case _: TopologyException => op(a.buffer(0), b.buffer(0))
        }
    }

  /** Defensive A \ B. */
  def safeDifference(a: Geometry, b: Geometry): Geometry =
    safeOverlay(a, b)(_.difference(_))

  /** Defensive (A \ B) ∪ (B \ A). */
  def safeSymDifference(a: Geometry, b: Geometry): Geometry =
    safeOverlay(a, b)(_.symDifference(_))

  /** Union of many geometries (UnaryUnionOp = cascaded union for polygons). */
  def unionAll(gs: java.util.Collection[Geometry]): Geometry =
    if (gs.isEmpty) factory.createGeometryCollection()
    else UnaryUnionOp.union(gs)
}
