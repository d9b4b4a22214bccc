package graft.spatial

import org.scalatest.funsuite.AnyFunSuite

class GeometrySpec extends AnyFunSuite {
  import Geometry._

  private val squareWkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
  private val square = fromWkt(squareWkt)

  test("WKT round-trip for every geometry type") {
    val wkts = Seq(
      "POINT (3 4)",
      "LINESTRING (0 0, 1 1, 2 0)",
      squareWkt,
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))")
    wkts.foreach { w =>
      assert(toWkt(fromWkt(w)) == w, s"round-trip $w")
    }
  }

  test("WKB round-trip preserves geometry") {
    val gs = Seq(
      "POINT (3.5 -4.25)", "LINESTRING (0 0, 1 1, 2 0)", squareWkt,
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))")
    gs.foreach { w =>
      val g = fromWkt(w)
      assert(toWkt(fromWkb(toWkb(g))) == toWkt(g), s"wkb round-trip $w")
    }
  }

  test("area: square, hole, multipolygon") {
    assert(area(square) == 100.0)
    val holed = fromWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(area(holed) == 96.0)
    val mp = fromWkt(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
    assert(area(mp) == 5.0)
  }

  test("centroid of square and of weighted multipolygon") {
    val c = centroid(square)
    assert(c == Pt(5.0, 5.0))
    val l = centroid(fromWkt("LINESTRING (0 0, 10 0)"))
    assert(l == Pt(5.0, 0.0))
  }

  test("contains: interior, boundary, exterior, holes") {
    assert(contains(square, Pt(5, 5)))
    assert(contains(square, Pt(0, 5))) // boundary counts
    assert(!contains(square, Pt(15, 5)))
    val holed = fromWkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(!contains(holed, Pt(3, 3))) // inside hole
    assert(contains(holed, Pt(5, 5)))
  }

  test("pointOnSurface falls inside, even for concave shapes") {
    val cShape = fromWkt(
      "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))")
    val p = pointOnSurface(cShape)
    assert(contains(cShape, p), s"pos $p not inside")
    assert(contains(square, pointOnSurface(square)))
  }

  test("intersects: crossing, containment, disjoint") {
    val l1 = fromWkt("LINESTRING (-1 5, 11 5)")
    assert(intersects(square, l1))
    assert(intersects(square, fromWkt("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")))
    assert(!intersects(square, fromWkt("POINT (20 20)")))
    assert(intersects(square, fromWkt("POINT (5 5)")))
    assert(!intersects(
      fromWkt("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"), square))
  }

  test("distance: point to polygon, disjoint polygons") {
    assert(distance(square, fromWkt("POINT (13 0)")) == 3.0)
    assert(distance(square, fromWkt("POINT (5 5)")) == 0.0)
    val far = fromWkt("POLYGON ((20 0, 30 0, 30 10, 20 10, 20 0))")
    assert(distance(square, far) == 10.0)
  }

  test("isValid / makeValid") {
    assert(isValid(square))
    val open = Poly(Array(Array(Pt(0, 0), Pt(1, 0), Pt(1, 1)))) // unclosed
    assert(!isValid(open))
    val fixed = makeValid(open)
    assert(fixed.isDefined && isValid(fixed.get))
    val bowtie = fromWkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert(!isValid(bowtie)) // self-intersecting
    assert(makeValid(Poly(Array(Array(Pt(0, 0), Pt(0, 0))))).isEmpty)
  }

  test("buffer: point becomes ~circle, line capsule contains offsets") {
    val circ = buffer(Pt(0, 0), 1.0)
    val a = area(circ)
    assert(math.abs(a - math.Pi) < 0.05, s"circle area $a")
    val lineBuf = buffer(fromWkt("LINESTRING (0 0, 10 0)"), 1.0)
    assert(contains(lineBuf, Pt(5, 0.9)))
    assert(contains(lineBuf, Pt(5, -0.9)))
    assert(contains(lineBuf, Pt(-0.5, 0))) // round cap
    assert(!contains(lineBuf, Pt(5, 1.5)))
  }

  test("geometry type names") {
    assert(square.typeName == "POLYGON")
    assert(fromWkt("POINT (1 1)").typeName == "POINT")
    assert(fromWkt("MULTIPOLYGON EMPTY").typeName == "MULTIPOLYGON")
  }
}
