package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {

  test("WKT -> WKB -> WKT round-trip preserves geometry") {
    val wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    val g = Geom.fromWkt(wkt)
    val back = Geom.fromWkb(Geom.toWkb(g))
    assert(back.equalsExact(g))
  }

  test("unit square has area 1, perimeter 4") {
    val g = Geom.fromWkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(g.getArea === 1.0)
    assert(g.getLength === 4.0)
  }

  test("makeValid repairs a bowtie into area 0.5 (two triangles of 0.25)") {
    // self-intersecting "bowtie": invalid as a single ring
    val bowtie = Geom.fromWkt("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))")
    assert(!bowtie.isValid)
    val fixed = Geom.makeValid(bowtie)
    assert(fixed.isValid)
    assert(math.abs(fixed.getArea - 0.5) < 1e-12)
  }

  test("makeValid is identity on valid input") {
    val g = Geom.fromWkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert(Geom.makeValid(g) eq g)
  }

  test("safeIntersection clips overlapping squares") {
    val a = Geom.fromWkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = Geom.fromWkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    assert(math.abs(Geom.safeIntersection(a, b).getArea - 1.0) < 1e-12)
  }

  test("safeIntersection survives an invalid input via repair") {
    val bowtie = Geom.fromWkt("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))")
    val big = Geom.fromWkt("POLYGON ((-1 -1, 2 -1, 2 2, -1 2, -1 -1))")
    val r = Geom.safeIntersection(bowtie, big)
    assert(math.abs(r.getArea - 0.5) < 1e-9)
  }

  test("unionAll merges disjoint and overlapping polygons") {
    val gs = new java.util.ArrayList[org.locationtech.jts.geom.Geometry]()
    gs.add(Geom.fromWkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    gs.add(Geom.fromWkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"))
    gs.add(Geom.fromWkt("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"))
    assert(math.abs(Geom.unionAll(gs).getArea - 8.0) < 1e-12)
  }
}
