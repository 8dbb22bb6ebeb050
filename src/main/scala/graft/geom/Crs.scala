package graft.geom

import org.locationtech.jts.geom.{CoordinateSequence, Geometry}
import org.locationtech.jts.geom.CoordinateSequenceFilter

/** Minimal CRS registry + map-projection math.
  *
  * The environment ships no GeoTools, so the reference's
  * `ST_Transform(geom, 'EPSG:3857', 'EPSG:5880')`
  * (reference: spark_job/process_geodata.py:124,134-136) is implemented
  * directly from Snyder, *Map Projections — A Working Manual* (USGS
  * Professional Paper 1395):
  *   - EPSG:3857 (WGS84 / Pseudo-Mercator): spherical Mercator,
  *     eqs. 7-1/7-2 forward and 7-4/7-5 inverse, R = 6378137.
  *   - EPSG:5880 (SIRGAS 2000 / Brazil Polyconic): ellipsoidal American
  *     Polyconic on GRS80, eqs. 18-12…18-15 forward with the meridional
  *     arc series eq. 3-21; iterative inverse per eqs. 18-18…18-21.
  * SIRGAS 2000 is realized identically to WGS84 at this precision, so the
  * lon/lat hub needs no datum shift.
  *
  * All projections convert through geographic lon/lat degrees (EPSG:4326).
  */
object Crs {

  trait Projection {
    /** projected (x, y) -> geographic (lonDeg, latDeg) */
    def inverse(x: Double, y: Double): (Double, Double)
    /** geographic (lonDeg, latDeg) -> projected (x, y) */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
  }

  private val DegToRad = math.Pi / 180.0
  private val RadToDeg = 180.0 / math.Pi

  /** EPSG:4326 — identity hub (coordinates are lon/lat degrees). */
  object LonLat extends Projection {
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
  }

  /** EPSG:3857 — spherical Web Mercator, R = WGS84 semi-major axis. */
  object WebMercator extends Projection {
    private val R = 6378137.0
    def inverse(x: Double, y: Double): (Double, Double) = {
      val lon = x / R * RadToDeg
      val lat = (math.Pi / 2.0 - 2.0 * math.atan(math.exp(-y / R))) * RadToDeg
      (lon, lat)
    }
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val x = R * lonDeg * DegToRad
      val y = R * math.log(math.tan(math.Pi / 4.0 + latDeg * DegToRad / 2.0))
      (x, y)
    }
  }

  /** Ellipsoidal American Polyconic (Snyder ch. 18). */
  final class Polyconic(a: Double, e2: Double, lat0Deg: Double, lon0Deg: Double,
                        fe: Double, fn: Double) extends Projection {
    private val lon0 = lon0Deg * DegToRad
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    // meridional arc coefficients, Snyder eq. 3-21
    private val c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    private val c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    private val c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    private val c6 = 35.0 * e6 / 3072.0
    private def meridArc(phi: Double): Double =
      a * (c0 * phi - c2 * math.sin(2 * phi) + c4 * math.sin(4 * phi) - c6 * math.sin(6 * phi))
    private val m0 = meridArc(lat0Deg * DegToRad)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = latDeg * DegToRad
      val lam = lonDeg * DegToRad
      if (math.abs(phi) < 1e-12) {
        (fe + a * (lam - lon0), fn - m0)
      } else {
        val sinPhi = math.sin(phi)
        val n = a / math.sqrt(1.0 - e2 * sinPhi * sinPhi)
        val cot = 1.0 / math.tan(phi)
        val l = (lam - lon0) * sinPhi // Snyder eq. 18-2 ("E")
        val x = n * cot * math.sin(l)
        val y = meridArc(phi) - m0 + n * cot * (1.0 - math.cos(l))
        (fe + x, fn + y)
      }
    }

    /** Inverse by damped 2-D Newton on the (tested) forward map with a
      * finite-difference Jacobian. Snyder's closed-form iteration
      * (eqs. 18-18…18-21) has sign-sensitive terms and a sin(2φ)
      * singularity near the equator; inverting the forward numerically is
      * robust everywhere the forward is defined and converges in a handful
      * of iterations (the inverse is a cold path — the flagship pipeline
      * only ever runs forward 5880). Throws on non-convergence rather than
      * returning silently-wrong coordinates. */
    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      // initial guess: equirectangular approximation around (lat0, lon0)
      var lat = (yIn - fn + m0) / a * RadToDeg
      var lon = lon0Deg + (xIn - fe) / a * RadToDeg / math.max(0.2, math.cos(lat * DegToRad))
      val h = 1e-7 // degrees; ~1 cm — safe for forward differences in double
      var i = 0
      while (i < 60) {
        val (fx, fy) = forward(lon, lat)
        val rx = fx - xIn
        val ry = fy - yIn
        if (math.abs(rx) < 1e-6 && math.abs(ry) < 1e-6) return (lon, lat)
        val (fxLon, fyLon) = forward(lon + h, lat)
        val (fxLat, fyLat) = forward(lon, lat + h)
        val j11 = (fxLon - fx) / h; val j12 = (fxLat - fx) / h
        val j21 = (fyLon - fy) / h; val j22 = (fyLat - fy) / h
        val det = j11 * j22 - j12 * j21
        // near-singular test relative to the Jacobian's own scale (m/deg):
        // an exact ==0.0 check would let a numerically-degenerate matrix
        // produce a huge step and mask the failure as non-convergence
        val scale = math.max(math.max(math.abs(j11), math.abs(j12)),
          math.max(math.abs(j21), math.abs(j22)))
        if (det == 0.0 || math.abs(det) < 1e-12 * scale * scale)
          throw new IllegalStateException(
            s"polyconic inverse: near-singular Jacobian at ($xIn, $yIn)")
        var dLon = (rx * j22 - ry * j12) / det
        var dLat = (ry * j11 - rx * j21) / det
        // damp steps so iterates stay in the projection's domain
        val maxStep = 5.0
        val norm = math.max(math.abs(dLon), math.abs(dLat))
        if (norm > maxStep) { dLon *= maxStep / norm; dLat *= maxStep / norm }
        lon -= dLon
        lat -= dLat
        if (lat > 89.9) lat = 89.9
        if (lat < -89.9) lat = -89.9
        i += 1
      }
      throw new IllegalStateException(
        s"polyconic inverse did not converge for ($xIn, $yIn)")
    }
  }

  // GRS80 ellipsoid (EPSG:7019): a = 6378137, 1/f = 298.257222101
  private val Grs80A = 6378137.0
  private val Grs80F = 1.0 / 298.257222101
  private val Grs80E2 = Grs80F * (2.0 - Grs80F)

  /** EPSG:5880 — SIRGAS 2000 / Brazil Polyconic
    * (lat0=0, lon0=-54, FE=5 000 000 m, FN=10 000 000 m). */
  val BrazilPolyconic = new Polyconic(Grs80A, Grs80E2, 0.0, -54.0, 5000000.0, 10000000.0)

  val registry: Map[String, Projection] = Map(
    "EPSG:4326" -> LonLat,
    "EPSG:3857" -> WebMercator,
    "EPSG:5880" -> BrazilPolyconic
  )

  /** Pointwise coordinate transform src -> dst via the lon/lat hub.
    * src == dst is the exact identity (no hub round-trip FP noise) — the
    * case CollapseStTransforms produces when fusing a→b→a chains. */
  def pointTransform(src: String, dst: String): (Double, Double) => (Double, Double) = {
    val s = registry.getOrElse(src, throw new IllegalArgumentException(s"unknown CRS $src"))
    val d = registry.getOrElse(dst, throw new IllegalArgumentException(s"unknown CRS $dst"))
    if (src == dst) (x, y) => (x, y)
    else (x, y) => {
      val (lon, lat) = s.inverse(x, y)
      d.forward(lon, lat)
    }
  }

  /** Vertex-wise geometry reprojection (returns a new geometry). */
  def transformGeometry(g: Geometry, src: String, dst: String): Geometry = {
    val f = pointTransform(src, dst)
    val out = g.copy()
    out.apply(new CoordinateSequenceFilter {
      override def filter(seq: CoordinateSequence, i: Int): Unit = {
        val (x, y) = f(seq.getX(i), seq.getY(i))
        seq.setOrdinate(i, 0, x)
        seq.setOrdinate(i, 1, y)
      }
      override def isDone: Boolean = false
      override def isGeometryChanged: Boolean = true
    })
    out.geometryChanged()
    out
  }
}
