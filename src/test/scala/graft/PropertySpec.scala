package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.h3.H3Core
import graft.spatial.{Crs, Geometry, Pt, Poly}

/** ScalaCheck property suite (SURVEY §5): randomized invariants over
  * the spatial core beyond the example-based specs. */
class PropertySpec extends AnyFunSuite {

  // raw-ScalaCheck driver (the scalatestplus bridge is not in the
  // offline cache): 200 deterministic samples per property
  private val N = 200

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until N).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(i.toLong * 7919 + 17)).get)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  private val swedenLat = Gen.choose(55.0, 69.0)
  private val swedenLng = Gen.choose(10.5, 24.0)
  private val res = Gen.choose(0, 13)

  test("property: H3 round-trip is exact for any point and resolution") {
    forAll(swedenLat, swedenLng, res) { (lat, lng, r) =>
      val cell = H3Core.latLngToCell(lat, lng, r)
      val (clat, clng) = H3Core.cellToLatLng(cell)
      assert(H3Core.latLngToCell(clat, clng, r) == cell)
      assert(H3Core.isValidCell(cell))
      assert(H3Core.resolution(cell) == r)
    }
  }

  test("property: parent resolution chain is monotone and transitive") {
    forAll(swedenLat, swedenLng, Gen.choose(3, 12)) { (lat, lng, r) =>
      val cell = H3Core.latLngToCell(lat, lng, r)
      val p1 = H3Core.cellToParent(cell, r - 1)
      val p2 = H3Core.cellToParent(cell, r - 2)
      assert(H3Core.resolution(p1) == r - 1)
      assert(H3Core.cellToParent(p1, r - 2) == p2) // transitivity
    }
  }

  test("property: CRS round-trip below 0.1 mm over the SWEREF99 domain") {
    forAll(Gen.choose(54.0, 70.0), Gen.choose(10.0, 25.0)) { (lat, lng) =>
      val (e, n) = Crs.wgs84ToSweref(lat, lng)
      val (lat2, lng2) = Crs.swerefToWgs84(e, n)
      // 1e-9 deg ~ 0.1 mm
      assert(math.abs(lat2 - lat) < 1e-9 && math.abs(lng2 - lng) < 1e-9)
      val (e2, n2) = Crs.wgs84ToSweref(lat2, lng2)
      assert(math.abs(e2 - e) < 1e-4 && math.abs(n2 - n) < 1e-4)
    }
  }

  private val genPoint: Gen[Pt] = for {
    x <- Gen.choose(-1e6, 1e6)
    y <- Gen.choose(-1e6, 1e6)
  } yield Pt(x, y)

  private val genRect: Gen[Poly] = for {
    x0 <- Gen.choose(-1e5, 1e5)
    y0 <- Gen.choose(-1e5, 1e5)
    w <- Gen.choose(1.0, 1e4)
    h <- Gen.choose(1.0, 1e4)
  } yield Poly(Array(Array(
    Pt(x0, y0), Pt(x0 + w, y0), Pt(x0 + w, y0 + h), Pt(x0, y0 + h), Pt(x0, y0))))

  test("property: WKT and WKB round-trips preserve rectangles exactly") {
    forAll(genRect) { p =>
      val wkbBack = Geometry.fromWkb(Geometry.toWkb(p)).asInstanceOf[Poly]
      assert(wkbBack.rings(0).toSeq == p.rings(0).toSeq)
      val back = Geometry.fromWkt(Geometry.toWkt(p)).asInstanceOf[Poly]
      assert(back.rings(0).toSeq == p.rings(0).toSeq)
    }
  }

  test("property: rectangle area/centroid/containment coherence") {
    forAll(genRect) { p =>
      val r = p.rings(0)
      val w = r(1).x - r(0).x
      val h = r(2).y - r(1).y
      assert(math.abs(Geometry.area(p) - w * h) < 1e-6 * w * h + 1e-9)
      val c = Geometry.centroid(p)
      assert(Geometry.contains(p, c))
      assert(Geometry.contains(p, Geometry.pointOnSurface(p)))
    }
  }

  test("property: distance symmetry and intersects consistency") {
    forAll(genRect, genPoint) { (p, q) =>
      val d1 = Geometry.distance(p, q)
      val d2 = Geometry.distance(q, p)
      assert(math.abs(d1 - d2) < 1e-9)
      assert((d1 == 0.0) == Geometry.intersects(p, q))
    }
  }

  test("property: makeValid output is valid (when salvageable)") {
    // drop the closing point -> invalid; makeValid must fix it
    forAll(genRect) { p =>
      val open = Poly(Array(p.rings(0).dropRight(1)))
      assert(!Geometry.isValid(open))
      val fixed = Geometry.makeValid(open)
      assert(fixed.exists(Geometry.isValid))
      assert(fixed.exists(g => math.abs(Geometry.area(g) - Geometry.area(p)) < 1e-6))
    }
  }

  test("property: compact/uncompact inverse on random child subsets") {
    forAll(swedenLat, swedenLng, Gen.choose(4, 9)) { (lat, lng, r) =>
      val parent = H3Core.latLngToCell(lat, lng, r)
      val children = H3Core.cellToChildren(parent, r + 1)
      // full set compacts to the parent, and uncompacts back
      assert(H3Core.compactCells(children) == Seq(parent))
      assert(H3Core.uncompactCells(Seq(parent), r + 1).sorted == children.sorted)
      // strict subset never compacts
      if (children.size > 1) {
        val subset = children.dropRight(1)
        assert(H3Core.compactCells(subset).toSet == subset.toSet)
      }
    }
  }
}
