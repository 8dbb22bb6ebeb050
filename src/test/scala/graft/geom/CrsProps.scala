package graft.geom

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the projection registry: UTM forward/inverse
  * laws over random in-zone points and the cross-zone/cross-datum
  * consistency of the pattern resolver. */
object CrsProps extends Properties("crs") {

  // UTM 23S usable area: ±3° of lon0 = -45, southern hemisphere band
  private val lon = Gen.choose(-48.0, -42.0)
  private val lat = Gen.choose(-33.0, -1.0)
  private val zone = Gen.choose(1, 60)

  property("UTM 23S inverse(forward) round-trips to < 1e-8 deg (~1 mm)") =
    forAll(lon, lat) { (lo, la) =>
      val tm = Crs.lookup("EPSG:32723").get
      val (x, y) = tm.forward(lo, la)
      val (lo2, la2) = tm.inverse(x, y)
      math.abs(lo2 - lo) < 1e-8 && math.abs(la2 - la) < 1e-8
    }

  property("UTM northing decreases with southern latitude, easting grows east") =
    forAll(lon, lat) { (lo, la) =>
      val tm = Crs.lookup("EPSG:32723").get
      val (x1, y1) = tm.forward(lo, la)
      val (x2, y2) = tm.forward(lo + 0.01, la - 0.01)
      x2 > x1 && y2 < y1
    }

  property("every WGS84 UTM zone resolves N and S, and differs only by FN") =
    forAll(zone, Gen.choose(-3.0, 3.0), Gen.choose(1.0, 30.0)) { (z, dLon, la) =>
      val n = Crs.lookup(f"EPSG:326$z%02d").get
      val s = Crs.lookup(f"EPSG:327$z%02d").get
      val lon0 = 6.0 * z - 183.0
      val (xn, yn) = n.forward(lon0 + dLon, la)
      val (xs, ys) = s.forward(lon0 + dLon, la)
      xn == xs && math.abs((ys - yn) - 10000000.0) < 1e-6
    }

  property("WGS84 vs SIRGAS UTM 23S differ by < 1 mm (same-epoch datums)") =
    forAll(lon, lat) { (lo, la) =>
      val w = Crs.lookup("EPSG:32723").get.forward(lo, la)
      val g = Crs.lookup("EPSG:31983").get.forward(lo, la)
      math.hypot(w._1 - g._1, w._2 - g._2) < 1e-3
    }
}
