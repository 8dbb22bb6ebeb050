package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class CrsSpec extends AnyFunSuite {

  test("EPSG:5880 projection origin maps to false easting/northing") {
    val (x, y) = Crs.BrazilPolyconic.forward(-54.0, 0.0)
    assert(math.abs(x - 5000000.0) < 1e-6)
    assert(math.abs(y - 10000000.0) < 1e-6)
  }

  test("EPSG:5880 equator scales by a*dLon along y = FN") {
    // On the polyconic equator, x = a * (lon - lon0) in radians.
    val (x, y) = Crs.BrazilPolyconic.forward(-53.0, 0.0)
    assert(math.abs(x - (5000000.0 + 6378137.0 * math.Pi / 180.0)) < 1e-6)
    assert(math.abs(y - 10000000.0) < 1e-6)
  }

  test("GRS80 quarter meridian matches the published value to < 0.5 m") {
    // Absolute anchor for the meridional-arc series (Snyder eq. 3-21
    // coefficients, Crs.scala): the GRS80 meridian quadrant is a published
    // geodetic constant — 10 001 965.7293 m (Moritz, "Geodetic Reference
    // System 1980", Bulletin Géodésique; the EPSG:7019 ellipsoid). At the
    // central meridian (lon0 = -54) the polyconic northing is exactly
    // FN + M(lat), so forward(-54, 90) exposes M(90°) = the quadrant.
    // A wrong c0/c2/c4/c6 coefficient cannot reproduce this value; the
    // truncated-series (e^8) error is ~4 mm, far inside the tolerance.
    val (x, y) = Crs.BrazilPolyconic.forward(-54.0, 90.0)
    assert(math.abs(x - 5000000.0) < 1e-6, s"easting $x")
    assert(math.abs((y - 10000000.0) - 10001965.7293) < 0.5, s"M(90) = ${y - 10000000.0}")
  }

  test("EPSG:5880 Brasília anchored to an independently-derived coordinate < 1 m") {
    // Expected value computed OUTSIDE this codebase from the projection's
    // definition: meridional arc by 64-point Gauss-Legendre integration of
    // M(φ) = a(1-e²)∫(1-e²sin²t)^(-3/2)dt (no series), cross-checked
    // against the Helmert third-flattening series — the two agree to
    // < 1e-7 m, and the same integration reproduces the published GRS80
    // quarter meridian to 0.07 mm. Parameters from the EPSG registry
    // entry for 5880 (SIRGAS 2000 / Brazil Polyconic: GRS80, lat0=0,
    // lon0=-54, FE=5 000 000, FN=10 000 000). This pins the hand-derived
    // series absolutely, not just round-trip.
    val (e, n) = Crs.BrazilPolyconic.forward(-47.8828, -15.7939)
    assert(math.abs(e - 5655325.4548) < 1.0, s"easting $e")
    assert(math.abs(n - 8243641.0379) < 1.0, s"northing $n")
  }

  test("polyconic inverse round-trips Brazil-wide grid to < 1 mm") {
    for (lonI <- -74 to -34 by 4; latI <- -34 to 5 by 3) {
      val lon = lonI.toDouble
      val lat = latI.toDouble
      val (x, y) = Crs.BrazilPolyconic.forward(lon, lat)
      val (lon2, lat2) = Crs.BrazilPolyconic.inverse(x, y)
      // 1e-8 deg ≈ 1 mm
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2")
    }
  }


  test("3857 -> 5880 -> 3857 point round-trip < 1 m (São Paulo region)") {
    val to = Crs.pointTransform("EPSG:3857", "EPSG:5880")
    val back = Crs.pointTransform("EPSG:5880", "EPSG:3857")
    val (x0, y0) = (-5193566.0, -2698813.0)
    val (e, n) = to(x0, y0)
    val (x1, y1) = back(e, n)
    assert(math.hypot(x1 - x0, y1 - y0) < 1.0)
  }

  test("web mercator inverse of forward is identity") {
    val (x, y) = Crs.WebMercator.forward(-47.8828, -15.7939)
    val (lon, lat) = Crs.WebMercator.inverse(x, y)
    assert(math.abs(lon - -47.8828) < 1e-10)
    assert(math.abs(lat - -15.7939) < 1e-10)
  }

  test("unknown CRS fails fast") {
    assertThrows[IllegalArgumentException](Crs.pointTransform("EPSG:9999", "EPSG:5880"))
  }

  test("transformGeometry reprojects every vertex") {
    val g = Geom.fromWkt("POLYGON ((-5200000 -2700000, -5100000 -2700000, -5100000 -2600000, -5200000 -2600000, -5200000 -2700000))")
    val t = Crs.transformGeometry(g, "EPSG:3857", "EPSG:5880")
    assert(t.getNumPoints == g.getNumPoints)
    // all vertices move into the 5880 false-origin band
    val env = t.getEnvelopeInternal
    assert(env.getMinX > 4_000_000 && env.getMaxX < 6_000_000)
    assert(env.getMinY > 7_000_000 && env.getMaxY < 9_000_000)
  }
}
