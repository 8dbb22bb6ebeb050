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

  test("UTM zones resolve by EPSG-code pattern and match independent Krüger values < 5 cm") {
    // Expected values computed OUTSIDE this codebase with the Krüger
    // third-flattening series (order n^6 — a different formulation than
    // the Snyder eqs. 8-9…8-13 implemented here), whose meridian scale
    // reproduces the published GRS80 quarter meridian. São Paulo in both
    // datums' UTM 23S and Berlin in WGS84 UTM 33N.
    val sp23sWgs = Crs.lookup("EPSG:32723").get.forward(-46.633, -23.55)
    assert(math.abs(sp23sWgs._1 - 333317.9113) < 0.05, s"E ${sp23sWgs._1}")
    assert(math.abs(sp23sWgs._2 - 7394644.0366) < 0.05, s"N ${sp23sWgs._2}")
    val sp23sSirgas = Crs.lookup("EPSG:31983").get.forward(-46.633, -23.55)
    assert(math.abs(sp23sSirgas._1 - 333317.9113) < 0.05, s"E ${sp23sSirgas._1}")
    assert(math.abs(sp23sSirgas._2 - 7394644.0367) < 0.05, s"N ${sp23sSirgas._2}")
    val berlin33n = Crs.lookup("EPSG:32633").get.forward(13.4, 52.52)
    assert(math.abs(berlin33n._1 - 391440.0321) < 0.05, s"E ${berlin33n._1}")
    assert(math.abs(berlin33n._2 - 5820079.6669) < 0.05, s"N ${berlin33n._2}")
  }

  test("UTM central meridian: easting exactly FE, northing = FN + k0·M(lat)") {
    // On lon0 the TM series collapses to the meridional arc, so this pins
    // the UTM forward to the same integral-validated arc as EPSG:5880:
    // FN + 0.9996·M(-15°) = 8 341 674.0064 (WGS84, derived by numerical
    // integration of the defining arc integral).
    val (x, y) = Crs.lookup("EPSG:32723").get.forward(-45.0, -15.0)
    assert(math.abs(x - 500000.0) < 1e-6, s"E $x")
    assert(math.abs(y - 8341674.0064) < 0.05, s"N $y")
  }

  test("UTM inverse round-trips a zone-wide grid to < 1 mm") {
    val tm = Crs.lookup("EPSG:32723").get
    for (lonI <- -48 to -42 by 1; latI <- -34 to 0 by 2) {
      val (x, y) = tm.forward(lonI.toDouble, latI.toDouble)
      val (lon2, lat2) = tm.inverse(x, y)
      assert(math.abs(lon2 - lonI) < 1e-8, s"lon $lonI -> $lon2")
      assert(math.abs(lat2 - latI) < 1e-8, s"lat $latI -> $lat2")
    }
  }

  test("EPSG:4674 (SIRGAS geographic) is the same lon/lat hub as 4326") {
    val t = Crs.pointTransform("EPSG:4674", "EPSG:5880")
    val ref = Crs.pointTransform("EPSG:4326", "EPSG:5880")
    val (e1, n1) = t(-47.8828, -15.7939)
    val (e2, n2) = ref(-47.8828, -15.7939)
    assert(e1 == e2 && n1 == n2)
  }

  test("runtime registration plugs a custom CRS into pointTransform") {
    Crs.register("TEST:utm22s", Crs.utm(22, south = true, 6378137.0,
      (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563)))
    val t = Crs.pointTransform("EPSG:4326", "TEST:utm22s")
    val viaEpsg = Crs.pointTransform("EPSG:4326", "EPSG:32722")
    assert(t(-51.0, -30.0) == viaEpsg(-51.0, -30.0))
  }

  test("out-of-range UTM zone codes stay unknown") {
    assertThrows[IllegalArgumentException](Crs.pointTransform("EPSG:32699", "EPSG:4326"))
    assertThrows[IllegalArgumentException](Crs.pointTransform("EPSG:31990", "EPSG:4326"))
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
