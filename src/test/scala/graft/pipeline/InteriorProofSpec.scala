package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.h3.H3Core
import graft.spatial.{Crs, Geometry, Poly, Pt}

/** Property pin for the interior-cell proof behind the exact-refine
  * short-circuit (H3Query.needsRefineFlags): q67's correctness rests on
  * the claim that a query cell flagged `needs_refine = false` has every
  * descendant index cell provably intersecting the query polygon — the
  * refine filter skips st_intersects for those candidates entirely, so
  * a false positive here would be an UNDETECTED wrong answer, not a
  * slow one. The driver oracles only probe the one fixture polygon;
  * this spec asserts the law over random convex and concave polygons at
  * query resolutions 7-9, checking every descendant one and two levels
  * below the query res (the index explodes at finer resolutions; the
  * proof's drift bound covers the whole parent chain, so two levels
  * exercise the worst per-level drift steps).
  */
class InteriorProofSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813L)

  /** Random simple star polygon in SWEREF99 TM: vertices at sorted
    * angles around (cx, cy), radius jittered by `jitter` (0 = near
    * circle/convex, large = deeply concave star). */
  private def starPoly(cx: Double, cy: Double, baseR: Double,
      nVerts: Int, jitter: Double): Poly = {
    val angles = Array.fill(nVerts)(rnd.nextDouble() * 2 * math.Pi).sorted
    // drop near-duplicate angles (degenerate slivers are not the law
    // under test; polyfill/contains on slivers is covered elsewhere)
    val kept = angles.zipWithIndex.collect {
      case (a, i) if i == 0 || a - angles(i - 1) > 0.05 => a
    }
    val ring = kept.map { a =>
      val r = baseR * (1.0 - jitter + rnd.nextDouble() * 2 * jitter)
      Pt(cx + r * math.cos(a), cy + r * math.sin(a))
    }
    Poly(Array(ring :+ ring(0)))
  }

  private def toWgs(poly: Poly): graft.spatial.Geom =
    Geometry.mapCoords(poly, p => {
      val (lat, lng) = Crs.swerefToWgs84(p.x, p.y)
      Pt(lng, lat)
    })

  /** SWEREF boundary polygon of a cell — the same construction the
    * engine's g_h3_cell_to_geom uses for the index geom column. */
  private def cellPoly(h: Long): Poly = {
    val b = H3Core.cellToBoundary(h)
    val ring = new Array[Pt](b.length + 1)
    var i = 0
    while (i < b.length) {
      val (lat, lng) = b(i)
      val (e, n) = Crs.wgs84ToSweref(lat, lng)
      ring(i) = Pt(e, n)
      i += 1
    }
    ring(b.length) = ring(0)
    Poly(Array(ring))
  }

  test("interior flag implies every descendant cell intersects the polygon") {
    var interiorChecked = 0L
    var polysWithInterior = 0
    // polygon radius scales with cell size so each res sees a
    // comparable cell count; centers wander over the fixture window
    for (res <- 7 to 9; trial <- 0 until 3) {
      val baseR = res match {
        case 7 => 9000.0
        case 8 => 3500.0
        case _ => 1500.0
      }
      val cx = 565000.0 + rnd.nextDouble() * 40000
      val cy = 6445000.0 + rnd.nextDouble() * 40000
      // trial 0: near-convex; trials 1-2: concave stars
      val jitter = if (trial == 0) 0.08 else 0.45
      val poly = starPoly(cx, cy, baseR, 14, jitter)
      val cells = H3Core.polygonToCells(toWgs(poly), res)
      val flags = H3Query.needsRefineFlags(cells, poly)
      assert(flags.length === cells.length)
      val interior = flags.collect { case (c, false) => c }
      if (interior.nonEmpty) polysWithInterior += 1
      for (c <- interior; childRes <- Seq(res + 1, res + 2);
           d <- H3Core.cellToChildren(c, childRes)) {
        interiorChecked += 1
        assert(Geometry.intersects(cellPoly(d), poly),
          s"descendant ${H3Core.toHexString(d)} (res $childRes) of interior " +
            s"cell ${H3Core.toHexString(c)} (res $res, trial $trial) does NOT intersect the polygon")
      }
    }
    // the law must not green vacuously: the area-dominant interior has
    // to actually appear for most polygons at these sizes
    assert(polysWithInterior >= 6,
      s"only $polysWithInterior/9 polygons produced interior cells")
    assert(interiorChecked > 1000,
      s"only $interiorChecked descendant checks ran")
  }

  test("boundary-ring cells keep needs_refine=true (conservative side)") {
    // a cell whose center is outside the polygon can never be flagged
    // interior — spot-checks the proof's precondition ordering. The
    // polyfill itself only returns center-inside cells, so probe with
    // the polyfill of an ENLARGED copy: the annulus cells have centers
    // outside the original polygon.
    val poly = starPoly(580000, 6460000, 3000.0, 12, 0.4)
    val bigger = Poly(poly.rings.map(_.map(p =>
      Pt(580000 + (p.x - 580000) * 1.4, 6460000 + (p.y - 6460000) * 1.4))))
    val cells = H3Core.polygonToCells(toWgs(bigger), 8)
    val flags = H3Query.needsRefineFlags(cells, poly).toMap
    var centerOutside = 0
    for (c <- cells) {
      val (lat, lng) = H3Core.cellToLatLng(c)
      val (e, n) = Crs.wgs84ToSweref(lat, lng)
      if (!Geometry.contains(poly, Pt(e, n))) {
        centerOutside += 1
        assert(flags(c),
          s"cell ${H3Core.toHexString(c)} center outside polygon but flagged interior")
      }
    }
    assert(centerOutside > 0, "no boundary cells — test polygon too coarse")
  }
}
