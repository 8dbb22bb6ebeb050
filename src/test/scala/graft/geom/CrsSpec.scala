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

  test("Albers e→0 limit matches the independent spherical closed form") {
    // Snyder ch. 14 spherical Albers (eqs. 14-3…14-6) written out inline —
    // a DIFFERENT formula path (no authalic q, no m): n = (sinφ₁+sinφ₂)/2,
    // C = cos²φ₁ + 2n·sinφ₁, ρ = a√(C − 2n·sinφ)/n. The ellipsoidal class
    // at e² = 0 must reproduce it to FP noise.
    val a = 6370997.0
    val alb = new Crs.AlbersEqualArea(a, 0.0, 23.0, 29.5, 45.5, -96.0, 0.0, 0.0)
    val d2r = math.Pi / 180.0
    val n = (math.sin(29.5 * d2r) + math.sin(45.5 * d2r)) / 2.0
    val c = math.cos(29.5 * d2r) * math.cos(29.5 * d2r) + 2.0 * n * math.sin(29.5 * d2r)
    def rhoS(latDeg: Double) = a * math.sqrt(c - 2.0 * n * math.sin(latDeg * d2r)) / n
    for ((lon, lat) <- Seq((-75.0, 35.0), (-120.0, 48.0), (-96.0, 23.0), (-85.0, 30.25))) {
      val (x, y) = alb.forward(lon, lat)
      val theta = n * (lon - -96.0) * d2r
      val xs = rhoS(lat) * math.sin(theta)
      val ys = rhoS(23.0) - rhoS(lat) * math.cos(theta)
      assert(math.abs(x - xs) < 1e-6, s"x $x vs spherical $xs at ($lon,$lat)")
      assert(math.abs(y - ys) < 1e-6, s"y $y vs spherical $ys at ($lon,$lat)")
    }
  }

  test("LCC e→0 limit matches the independent spherical closed form") {
    // Snyder ch. 15 spherical LCC (eqs. 15-1…15-4) inline — again a
    // different path (cones of tan(π/4+φ/2), no isometric correction):
    // n = ln(cosφ₁/cosφ₂)/ln(tan(π/4+φ₂/2)/tan(π/4+φ₁/2)),
    // F = cosφ₁·tanⁿ(π/4+φ₁/2)/n, ρ = a·F/tanⁿ(π/4+φ/2).
    val a = 6370997.0
    val lcc = new Crs.LambertConformalConic(a, 0.0, 46.5, 44.0, 49.0, 3.0, 0.0, 0.0)
    val d2r = math.Pi / 180.0
    def tanHalf(latDeg: Double) = math.tan(math.Pi / 4.0 + latDeg * d2r / 2.0)
    val n = math.log(math.cos(44.0 * d2r) / math.cos(49.0 * d2r)) /
      math.log(tanHalf(49.0) / tanHalf(44.0))
    val f = math.cos(44.0 * d2r) * math.pow(tanHalf(44.0), n) / n
    def rhoS(latDeg: Double) = a * f / math.pow(tanHalf(latDeg), n)
    for ((lon, lat) <- Seq((2.3522, 48.8566), (-4.5, 48.0), (7.75, 43.5), (3.0, 46.5))) {
      val (x, y) = lcc.forward(lon, lat)
      val theta = n * (lon - 3.0) * d2r
      val xs = rhoS(lat) * math.sin(theta)
      val ys = rhoS(46.5) - rhoS(lat) * math.cos(theta)
      assert(math.abs(x - xs) < 1e-6, s"x $x vs spherical $xs at ($lon,$lat)")
      assert(math.abs(y - ys) < 1e-6, s"y $y vs spherical $ys at ($lon,$lat)")
    }
  }

  test("EPSG:5070 preserves ellipsoidal area (the equal-area contract)") {
    // Project a 10°×10° CONUS graticule quad with edges densified to 0.05°
    // and take the planar shoelace area; Albers must reproduce the
    // closed-form ellipsoidal quad area a²·Δλ·(q(φ₂)−q(φ₁))/2 (Snyder
    // eq. 3-12) to the chord-sagitta error of the densification (<1e-6).
    val (lon0, lon1, lat0, lat1) = (-110.0, -100.0, 30.0, 40.0)
    val step = 0.05
    val ring = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val nSteps = math.round((lon1 - lon0) / step).toInt
    val mSteps = math.round((lat1 - lat0) / step).toInt
    for (i <- 0 until nSteps) ring += ((lon0 + i * step, lat0))
    for (j <- 0 until mSteps) ring += ((lon1, lat0 + j * step))
    for (i <- 0 until nSteps) ring += ((lon1 - i * step, lat1))
    for (j <- 0 until mSteps) ring += ((lon0, lat1 - j * step))
    val pts = ring.map { case (lon, lat) => Crs.ConusAlbers.forward(lon, lat) }
    var shoelace = 0.0
    for (i <- pts.indices) {
      val (x1, y1) = pts(i)
      val (x2, y2) = pts((i + 1) % pts.length)
      shoelace += x1 * y2 - x2 * y1
    }
    val planar = math.abs(shoelace) / 2.0
    val a = 6378137.0
    val e2 = (1.0 / 298.257222101) * (2.0 - 1.0 / 298.257222101)
    val d2r = math.Pi / 180.0
    val ellipsoidal = a * a * ((lon1 - lon0) * d2r) *
      (Crs.authalicQ(e2, lat1 * d2r) - Crs.authalicQ(e2, lat0 * d2r)) / 2.0
    assert(math.abs(planar - ellipsoidal) / ellipsoidal < 1e-6,
      s"planar $planar vs ellipsoidal $ellipsoidal")
  }

  test("EPSG:2154 has true scale on both standard parallels, k>1 outside") {
    // Conformal-conic contract: the local scale factor k = (chord length
    // on the map) / (ellipsoidal parallel arc a·cosφ/√(1−e²sin²φ)·Δλ)
    // is exactly 1 on φ=44 and φ=49, and >1 outside the parallel band,
    // <1 strictly between them.
    val a = 6378137.0
    val e2 = (1.0 / 298.257222101) * (2.0 - 1.0 / 298.257222101)
    val d2r = math.Pi / 180.0
    def k(latDeg: Double): Double = {
      val dLon = 1e-4
      val (x1, y1) = Crs.Lambert93.forward(3.0, latDeg)
      val (x2, y2) = Crs.Lambert93.forward(3.0 + dLon, latDeg)
      val phi = latDeg * d2r
      val arc = a * math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi)) *
        dLon * d2r
      math.hypot(x2 - x1, y2 - y1) / arc
    }
    assert(math.abs(k(44.0) - 1.0) < 1e-8, s"k(44)=${k(44.0)}")
    assert(math.abs(k(49.0) - 1.0) < 1e-8, s"k(49)=${k(49.0)}")
    assert(k(42.0) > 1.0 && k(51.0) > 1.0, "scale must exceed 1 outside the parallels")
    assert(k(46.5) < 1.0, "scale must dip below 1 between the parallels")
  }

  test("EPSG:2154 is conformal: meridian and parallel scales agree") {
    // Finite-difference h (north) vs k (east) scale at a non-special
    // point; conformality means they're equal to discretization error.
    val a = 6378137.0
    val e2 = (1.0 / 298.257222101) * (2.0 - 1.0 / 298.257222101)
    val d2r = math.Pi / 180.0
    val (lon, lat) = (5.5, 47.25)
    val d = 1e-5
    val (x0, y0) = Crs.Lambert93.forward(lon, lat)
    val (xe, ye) = Crs.Lambert93.forward(lon + d, lat)
    val (xn, yn) = Crs.Lambert93.forward(lon, lat + d)
    val phi = lat * d2r
    val sin2 = math.sin(phi) * math.sin(phi)
    val parallelArc = a * math.cos(phi) / math.sqrt(1.0 - e2 * sin2) * d * d2r
    val meridianArc = a * (1.0 - e2) / math.pow(1.0 - e2 * sin2, 1.5) * d * d2r
    val kEast = math.hypot(xe - x0, ye - y0) / parallelArc
    val hNorth = math.hypot(xn - x0, yn - y0) / meridianArc
    assert(math.abs(kEast - hNorth) / kEast < 1e-6, s"k=$kEast h=$hNorth")
  }

  test("LAEA e→0 limit matches the independent spherical closed form") {
    // Snyder eq. 24-2 spherical oblique LAEA inline — no authalic machinery:
    // k' = √(2/(1+sinφ₁sinφ+cosφ₁cosφcosΔλ)), x = R·k'·cosφ·sinΔλ,
    // y = R·k'·(cosφ₁sinφ − sinφ₁cosφcosΔλ).
    val a = 6370997.0
    val laea = new Crs.LambertAzimuthalEqualArea(a, 0.0, 52.0, 10.0, 0.0, 0.0)
    val d2r = math.Pi / 180.0
    for ((lon, lat) <- Seq((10.0, 52.0), (-8.0, 38.0), (25.0, 60.0), (14.5, 41.0))) {
      val (x, y) = laea.forward(lon, lat)
      val dl = (lon - 10.0) * d2r
      val (s0, c0) = (math.sin(52.0 * d2r), math.cos(52.0 * d2r))
      val (s, c) = (math.sin(lat * d2r), math.cos(lat * d2r))
      val kp = math.sqrt(2.0 / (1.0 + s0 * s + c0 * c * math.cos(dl)))
      val xs = a * kp * c * math.sin(dl)
      val ys = a * kp * (c0 * s - s0 * c * math.cos(dl))
      assert(math.abs(x - xs) < 1e-6, s"x $x vs spherical $xs at ($lon,$lat)")
      assert(math.abs(y - ys) < 1e-6, s"y $y vs spherical $ys at ($lon,$lat)")
    }
  }

  test("EPSG:3035 preserves ellipsoidal area (the equal-area contract)") {
    // Same audit as EPSG:5070: densified 10°×8° European quad, planar
    // shoelace vs the closed-form a²·Δλ·(q(φ₂)−q(φ₁))/2.
    val (lon0, lon1, lat0, lat1) = (5.0, 15.0, 44.0, 52.0)
    val step = 0.05
    val ring = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val nSteps = math.round((lon1 - lon0) / step).toInt
    val mSteps = math.round((lat1 - lat0) / step).toInt
    for (i <- 0 until nSteps) ring += ((lon0 + i * step, lat0))
    for (j <- 0 until mSteps) ring += ((lon1, lat0 + j * step))
    for (i <- 0 until nSteps) ring += ((lon1 - i * step, lat1))
    for (j <- 0 until mSteps) ring += ((lon0, lat1 - j * step))
    val pts = ring.map { case (lon, lat) => Crs.LaeaEurope.forward(lon, lat) }
    var shoelace = 0.0
    for (i <- pts.indices) {
      val (x1, y1) = pts(i)
      val (x2, y2) = pts((i + 1) % pts.length)
      shoelace += x1 * y2 - x2 * y1
    }
    val planar = math.abs(shoelace) / 2.0
    val a = 6378137.0
    val e2 = (1.0 / 298.257222101) * (2.0 - 1.0 / 298.257222101)
    val d2r = math.Pi / 180.0
    val ellipsoidal = a * a * ((lon1 - lon0) * d2r) *
      (Crs.authalicQ(e2, lat1 * d2r) - Crs.authalicQ(e2, lat0 * d2r)) / 2.0
    assert(math.abs(planar - ellipsoidal) / ellipsoidal < 1e-6,
      s"planar $planar vs ellipsoidal $ellipsoidal")
  }

  test("EPSG:3035 round-trips a Europe-wide grid to < 1 mm; origin at false origin") {
    val (x0, y0) = Crs.LaeaEurope.forward(10.0, 52.0)
    assert(math.abs(x0 - 4321000.0) < 1e-6 && math.abs(y0 - 3210000.0) < 1e-6)
    for (lonI <- -10 to 30 by 4; latI <- 35 to 70 by 5) {
      val (x, y) = Crs.LaeaEurope.forward(lonI, latI)
      val (lon2, lat2) = Crs.LaeaEurope.inverse(x, y)
      assert(math.abs(lon2 - lonI) < 1e-8 && math.abs(lat2 - latI) < 1e-8,
        s"laea ($lonI,$latI) -> ($lon2,$lat2)")
    }
  }

  test("EPSG:2154 projection origin maps to the false origin; 5070 to (0,0)") {
    val (x, y) = Crs.Lambert93.forward(3.0, 46.5)
    assert(math.abs(x - 700000.0) < 1e-6 && math.abs(y - 6600000.0) < 1e-6)
    val (ax, ay) = Crs.ConusAlbers.forward(-96.0, 23.0)
    assert(math.abs(ax) < 1e-6 && math.abs(ay) < 1e-6)
  }

  test("Albers and LCC inverses round-trip their service areas to < 1 mm") {
    for (lonI <- -124 to -68 by 4; latI <- 24 to 49 by 5) {
      val (x, y) = Crs.ConusAlbers.forward(lonI, latI)
      val (lon2, lat2) = Crs.ConusAlbers.inverse(x, y)
      assert(math.abs(lon2 - lonI) < 1e-8 && math.abs(lat2 - latI) < 1e-8,
        s"albers ($lonI,$latI) -> ($lon2,$lat2)")
    }
    for (lonI <- -5 to 9 by 2; latI <- 41 to 51 by 2) {
      val (x, y) = Crs.Lambert93.forward(lonI, latI)
      val (lon2, lat2) = Crs.Lambert93.inverse(x, y)
      assert(math.abs(lon2 - lonI) < 1e-8 && math.abs(lat2 - latI) < 1e-8,
        s"lcc ($lonI,$latI) -> ($lon2,$lat2)")
    }
  }

  test("EPSG:5070 and EPSG:2154 resolve through the registry surface") {
    val (ax, ay) = Crs.pointTransform("EPSG:4326", "EPSG:5070")(-96.0, 23.0)
    assert(math.abs(ax) < 1e-6 && math.abs(ay) < 1e-6)
    val (lx, ly) = Crs.pointTransform("EPSG:4326", "EPSG:2154")(3.0, 46.5)
    assert(math.abs(lx - 700000.0) < 1e-6 && math.abs(ly - 6600000.0) < 1e-6)
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
