package graft.geom

import org.locationtech.jts.geom.Geometry
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties over the geometry algebra (SURVEY.md §5.2):
  * codec round-trips, intersection/buffer area laws, validity repair, and
  * the 3857↔5880 reprojection round-trip. Generators use integral-meter
  * rectangles near the fixture grid (Brazil, EPSG:3857) so the laws hold
  * to tight FP tolerances. */
object GeomProps extends Properties("geom") {

  private val coord = Gen.choose(-7000000L, -5000000L)
  private val coordY = Gen.choose(-3000000L, -1000000L)
  private val side = Gen.choose(1L, 100000L)

  private case class Rect(x0: Long, y0: Long, w: Long, h: Long) {
    def wkt: String =
      s"POLYGON (($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + h}, $x0 ${y0 + h}, $x0 $y0))"
    def geom: Geometry = Geom.fromWkt(wkt)
  }

  private val rects: Gen[Rect] = for {
    x0 <- coord; y0 <- coordY; w <- side; h <- side
  } yield Rect(x0, y0, w, h)

  property("WKT -> geometry -> WKT -> geometry is exact") = forAll(rects) { r =>
    val g = r.geom
    Geom.fromWkt(Geom.toWkt(g)).equalsExact(g)
  }

  property("WKB round-trip is exact") = forAll(rects) { r =>
    val g = r.geom
    Geom.fromWkb(Geom.toWkb(g)).equalsExact(g)
  }

  property("rect area is w*h exactly") = forAll(rects) { r =>
    r.geom.getArea == r.w.toDouble * r.h.toDouble
  }

  property("area(a intersect b) <= min(area a, area b)") = forAll(rects, rects) { (a, b) =>
    val ia = Geom.safeIntersection(a.geom, b.geom).getArea
    ia <= math.min(a.geom.getArea, b.geom.getArea) + 1e-6
  }

  property("buffer(d >= 0) never shrinks") = forAll(rects, Gen.choose(0L, 1000L)) { (r, d) =>
    r.geom.buffer(d.toDouble).getArea >= r.geom.getArea - 1e-6
  }

  property("makevalid is identity on valid geometry") = forAll(rects) { r =>
    val g = r.geom
    (Geom.makeValid(g) eq g) || Geom.makeValid(g).equalsExact(g)
  }

  property("union area between max(parts) and sum(parts)") = forAll(rects, rects) { (a, b) =>
    val u = a.geom.union(b.geom).getArea
    val (aa, ab) = (a.geom.getArea, b.geom.getArea)
    u >= math.max(aa, ab) - 1e-6 && u <= aa + ab + 1e-6
  }

  property("direct envelopeWkb is byte-identical to JTS-encoded polygon") =
    forAll(rects) { r =>
      val direct = Geom.envelopeWkb(r.x0.toDouble, r.y0.toDouble,
        (r.x0 + r.w).toDouble, (r.y0 + r.h).toDouble)
      java.util.Arrays.equals(direct, Geom.toWkb(r.geom))
    }

  property("3857 -> 5880 -> 3857 round-trips to < 1 m") = forAll(coord, coordY) { (x, y) =>
    val fwd = Crs.pointTransform("EPSG:3857", "EPSG:5880")
    val inv = Crs.pointTransform("EPSG:5880", "EPSG:3857")
    val (px, py) = fwd(x.toDouble, y.toDouble)
    val (bx, by) = inv(px, py)
    Prop(math.abs(bx - x) < 1.0 && math.abs(by - y) < 1.0) :|
      s"($x,$y) -> ($px,$py) -> ($bx,$by)"
  }
}
