package graft.spatial

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal planar geometry model covering exactly the surface the
  * reference engine uses (SURVEY.md §2.4: WKT/WKB codec, type, valid/
  * makeValid, centroid, pointOnSurface, area, distance, buffer,
  * intersects, X/Y). 2D cartesian, ring-based; coordinates are either
  * SWEREF99 TM meters or WGS84 degrees depending on pipeline stage —
  * the model is unit-agnostic like the reference's DuckDB GEOMETRY.
  *
  * Not a full OGC implementation: buffer on lines returns the union-
  * semantics capsule chain (containment/intersects exact, area double-
  * counts overlaps), mirroring the reference's own best-effort geometry
  * fixing (`zip_geopackage.py:327-343` uses buffer(0) heuristics).
  */
sealed trait Geom {
  def typeName: String
  def isEmpty: Boolean
}

final case class Pt(x: Double, y: Double) extends Geom {
  def typeName = "POINT"
  def isEmpty = x.isNaN || y.isNaN
}
final case class Line(pts: Array[Pt]) extends Geom {
  def typeName = "LINESTRING"
  def isEmpty = pts.length == 0
}
/** rings(0) = shell, rest = holes; rings closed (first==last). */
final case class Poly(rings: Array[Array[Pt]]) extends Geom {
  def typeName = "POLYGON"
  def isEmpty = rings.length == 0
}
final case class MultiPt(pts: Array[Pt]) extends Geom {
  def typeName = "MULTIPOINT"
  def isEmpty = pts.isEmpty
}
final case class MultiLine(lines: Array[Line]) extends Geom {
  def typeName = "MULTILINESTRING"
  def isEmpty = lines.isEmpty
}
final case class MultiPoly(polys: Array[Poly]) extends Geom {
  def typeName = "MULTIPOLYGON"
  def isEmpty = polys.isEmpty
}
final case class GeomColl(geoms: Array[Geom]) extends Geom {
  def typeName = "GEOMETRYCOLLECTION"
  def isEmpty = geoms.isEmpty
}

object Geometry {

  // ---------------------------------------------------------------- WKT

  def fromWkt(wkt: String): Geom = new WktParser(wkt).parse()

  def toWkt(g: Geom): String = {
    val sb = new StringBuilder
    writeWkt(g, sb)
    sb.toString
  }

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else {
      val s = d.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }

  private def writeCoords(pts: Array[Pt], sb: StringBuilder): Unit = {
    sb.append('(')
    var i = 0
    while (i < pts.length) {
      if (i > 0) sb.append(", ")
      sb.append(fmt(pts(i).x)).append(' ').append(fmt(pts(i).y))
      i += 1
    }
    sb.append(')')
  }

  private def writeWkt(g: Geom, sb: StringBuilder): Unit = g match {
    case Pt(x, y) =>
      if (x.isNaN) sb.append("POINT EMPTY")
      else sb.append("POINT (").append(fmt(x)).append(' ').append(fmt(y)).append(')')
    case Line(pts) =>
      if (pts.isEmpty) sb.append("LINESTRING EMPTY")
      else { sb.append("LINESTRING "); writeCoords(pts, sb) }
    case Poly(rings) =>
      if (rings.isEmpty) sb.append("POLYGON EMPTY")
      else {
        sb.append("POLYGON (")
        var i = 0
        while (i < rings.length) {
          if (i > 0) sb.append(", ")
          writeCoords(rings(i), sb)
          i += 1
        }
        sb.append(')')
      }
    case MultiPt(pts) =>
      if (pts.isEmpty) sb.append("MULTIPOINT EMPTY")
      else {
        sb.append("MULTIPOINT (")
        var i = 0
        while (i < pts.length) {
          if (i > 0) sb.append(", ")
          sb.append('(').append(fmt(pts(i).x)).append(' ').append(fmt(pts(i).y)).append(')')
          i += 1
        }
        sb.append(')')
      }
    case MultiLine(ls) =>
      if (ls.isEmpty) sb.append("MULTILINESTRING EMPTY")
      else {
        sb.append("MULTILINESTRING (")
        var i = 0
        while (i < ls.length) {
          if (i > 0) sb.append(", ")
          writeCoords(ls(i).pts, sb)
          i += 1
        }
        sb.append(')')
      }
    case MultiPoly(ps) =>
      if (ps.isEmpty) sb.append("MULTIPOLYGON EMPTY")
      else {
        sb.append("MULTIPOLYGON (")
        var i = 0
        while (i < ps.length) {
          if (i > 0) sb.append(", ")
          sb.append('(')
          var r = 0
          while (r < ps(i).rings.length) {
            if (r > 0) sb.append(", ")
            writeCoords(ps(i).rings(r), sb)
            r += 1
          }
          sb.append(')')
          i += 1
        }
        sb.append(')')
      }
    case GeomColl(gs) =>
      if (gs.isEmpty) sb.append("GEOMETRYCOLLECTION EMPTY")
      else {
        sb.append("GEOMETRYCOLLECTION (")
        var i = 0
        while (i < gs.length) {
          if (i > 0) sb.append(", ")
          writeWkt(gs(i), sb)
          i += 1
        }
        sb.append(')')
      }
  }

  private final class WktParser(s: String) {
    private var pos = 0

    def parse(): Geom = { val g = parseGeom(); g }

    private def skipWs(): Unit =
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def word(): String = {
      skipWs()
      val st = pos
      while (pos < s.length && (s.charAt(pos).isLetter)) pos += 1
      s.substring(st, pos).toUpperCase
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= s.length || s.charAt(pos) != c)
        throw new IllegalArgumentException(
          s"WKT parse error at $pos: expected '$c' in: ${s.take(80)}")
      pos += 1
    }

    private def peek(): Char = { skipWs(); if (pos < s.length) s.charAt(pos) else '\u0000' }

    private def number(): Double = {
      skipWs()
      val st = pos
      while (pos < s.length && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      java.lang.Double.parseDouble(s.substring(st, pos))
    }

    private def isEmptyToken(): Boolean = {
      skipWs()
      if (s.regionMatches(true, pos, "EMPTY", 0, 5)) { pos += 5; true } else false
    }

    private def coordSeq(): Array[Pt] = {
      expect('(')
      val buf = new ArrayBuffer[Pt]
      var done = false
      while (!done) {
        val x = number(); val y = number()
        // tolerate Z/M ordinates: skip extra numbers until , or )
        while (peek() != ',' && peek() != ')') number()
        buf += Pt(x, y)
        if (peek() == ',') pos += 1 else done = true
      }
      expect(')')
      buf.toArray
    }

    private def parseGeom(): Geom = {
      val w = word()
      // tolerate Z/M suffix words
      val save = pos
      val mod = word()
      if (mod != "Z" && mod != "M" && mod != "ZM") pos = save
      w match {
        case "POINT" =>
          if (isEmptyToken()) Pt(Double.NaN, Double.NaN)
          else { expect('('); val x = number(); val y = number(); while (peek() != ')') number(); expect(')'); Pt(x, y) }
        case "LINESTRING" =>
          if (isEmptyToken()) Line(Array.empty) else Line(coordSeq())
        case "POLYGON" =>
          if (isEmptyToken()) Poly(Array.empty)
          else {
            expect('(')
            val rings = new ArrayBuffer[Array[Pt]]
            var done = false
            while (!done) {
              rings += coordSeq()
              if (peek() == ',') pos += 1 else done = true
            }
            expect(')')
            Poly(rings.toArray)
          }
        case "MULTIPOINT" =>
          if (isEmptyToken()) MultiPt(Array.empty)
          else {
            expect('(')
            val pts = new ArrayBuffer[Pt]
            var done = false
            while (!done) {
              if (peek() == '(') { expect('('); pts += Pt(number(), number()); while (peek() != ')') number(); expect(')') }
              else { pts += Pt(number(), number()) }
              if (peek() == ',') pos += 1 else done = true
            }
            expect(')')
            MultiPt(pts.toArray)
          }
        case "MULTILINESTRING" =>
          if (isEmptyToken()) MultiLine(Array.empty)
          else {
            expect('(')
            val ls = new ArrayBuffer[Line]
            var done = false
            while (!done) {
              ls += Line(coordSeq())
              if (peek() == ',') pos += 1 else done = true
            }
            expect(')')
            MultiLine(ls.toArray)
          }
        case "MULTIPOLYGON" =>
          if (isEmptyToken()) MultiPoly(Array.empty)
          else {
            expect('(')
            val ps = new ArrayBuffer[Poly]
            var done = false
            while (!done) {
              expect('(')
              val rings = new ArrayBuffer[Array[Pt]]
              var d2 = false
              while (!d2) {
                rings += coordSeq()
                if (peek() == ',') pos += 1 else d2 = true
              }
              expect(')')
              ps += Poly(rings.toArray)
              if (peek() == ',') pos += 1 else done = true
            }
            expect(')')
            MultiPoly(ps.toArray)
          }
        case "GEOMETRYCOLLECTION" =>
          if (isEmptyToken()) GeomColl(Array.empty)
          else {
            expect('(')
            val gs = new ArrayBuffer[Geom]
            var done = false
            while (!done) {
              gs += parseGeom()
              if (peek() == ',') pos += 1 else done = true
            }
            expect(')')
            GeomColl(gs.toArray)
          }
        case other =>
          throw new IllegalArgumentException(s"Unsupported WKT type: $other")
      }
    }
  }

  // ---------------------------------------------------------------- WKB

  private val WkbPoint = 1
  private val WkbLine = 2
  private val WkbPoly = 3
  private val WkbMPoint = 4
  private val WkbMLine = 5
  private val WkbMPoly = 6
  private val WkbColl = 7
  // ISO curved types — read-only: linearized to the simple types above
  // on parse (ref: zip_geopackage.py:327-343 downgrades MultiSurface/
  // CurvePolygon/CompoundCurve via shapely buffer(0); we linearize arcs
  // at 32 segments per full circle, then makeValid runs in stage004).
  private val WkbCircular = 8
  private val WkbCompound = 9
  private val WkbCurvePoly = 10
  private val WkbMCurve = 11
  private val WkbMSurface = 12

  def toWkb(g: Geom): Array[Byte] = {
    val size = wkbSize(g)
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    writeWkb(g, bb)
    bb.array()
  }

  private def wkbSize(g: Geom): Int = g match {
    case _: Pt => 5 + 16
    case Line(p) => 9 + 16 * p.length
    case Poly(r) => 9 + r.map(4 + 16 * _.length).sum
    case MultiPt(p) => 9 + p.length * 21
    case MultiLine(l) => 9 + l.map(x => wkbSize(x)).sum
    case MultiPoly(p) => 9 + p.map(x => wkbSize(x)).sum
    case GeomColl(gs) => 9 + gs.map(wkbSize).sum
  }

  private def writeWkb(g: Geom, bb: ByteBuffer): Unit = {
    bb.put(1.toByte) // little-endian
    g match {
      case Pt(x, y) =>
        bb.putInt(WkbPoint).putDouble(x).putDouble(y)
      case Line(pts) =>
        bb.putInt(WkbLine).putInt(pts.length)
        pts.foreach(p => bb.putDouble(p.x).putDouble(p.y))
      case Poly(rings) =>
        bb.putInt(WkbPoly).putInt(rings.length)
        rings.foreach { r =>
          bb.putInt(r.length)
          r.foreach(p => bb.putDouble(p.x).putDouble(p.y))
        }
      case MultiPt(pts) =>
        bb.putInt(WkbMPoint).putInt(pts.length)
        pts.foreach(p => writeWkb(p, bb))
      case MultiLine(ls) =>
        bb.putInt(WkbMLine).putInt(ls.length)
        ls.foreach(writeWkb(_, bb))
      case MultiPoly(ps) =>
        bb.putInt(WkbMPoly).putInt(ps.length)
        ps.foreach(writeWkb(_, bb))
      case GeomColl(gs) =>
        bb.putInt(WkbColl).putInt(gs.length)
        gs.foreach(writeWkb(_, bb))
    }
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    val bb = ByteBuffer.wrap(bytes)
    readWkb(bb)
  }

  private def readWkb(bb: ByteBuffer): Geom = {
    val byteOrder = bb.get()
    bb.order(if (byteOrder == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    var t = bb.getInt()
    if ((t & 0x20000000) != 0) { bb.getInt(); t &= ~0x20000000 } // EWKB SRID
    t &= 0xff // strip Z/M high-bit flags (ISO 1000s not handled; 2D only)
    t match {
      case WkbPoint => Pt(bb.getDouble, bb.getDouble)
      case WkbLine =>
        val n = bb.getInt()
        Line(Array.fill(n)(Pt(bb.getDouble, bb.getDouble)))
      case WkbPoly =>
        val nr = bb.getInt()
        Poly(Array.fill(nr) {
          val np = bb.getInt()
          Array.fill(np)(Pt(bb.getDouble, bb.getDouble))
        })
      case WkbMPoint =>
        val n = bb.getInt()
        MultiPt(Array.fill(n)(readWkb(bb).asInstanceOf[Pt]))
      case WkbMLine =>
        val n = bb.getInt()
        MultiLine(Array.fill(n)(readWkb(bb).asInstanceOf[Line]))
      case WkbMPoly =>
        val n = bb.getInt()
        MultiPoly(Array.fill(n)(readWkb(bb).asInstanceOf[Poly]))
      case WkbColl =>
        val n = bb.getInt()
        GeomColl(Array.fill(n)(readWkb(bb)))
      case WkbCircular =>
        val n = bb.getInt()
        Line(linearizeCircular(Array.fill(n)(Pt(bb.getDouble, bb.getDouble))))
      case WkbCompound =>
        val n = bb.getInt()
        Line(joinSegments(Array.fill(n)(curvePoints(readWkb(bb)))))
      case WkbCurvePoly =>
        val nr = bb.getInt()
        Poly(Array.fill(nr)(closeRing(curvePoints(readWkb(bb)))))
      case WkbMCurve =>
        val n = bb.getInt()
        MultiLine(Array.fill(n)(Line(curvePoints(readWkb(bb)))))
      case WkbMSurface =>
        val n = bb.getInt()
        MultiPoly(Array.fill(n)(readWkb(bb) match {
          case p: Poly => p
          case g => throw new IllegalArgumentException(
            s"MULTISURFACE member is not a surface: ${g.typeName}")
        }))
      case other =>
        throw new IllegalArgumentException(s"Unsupported WKB type $other")
    }
  }

  // ------------------------------------------------ curve linearization

  /** Vertex chain of an (already linearized) curve component. */
  private def curvePoints(g: Geom): Array[Pt] = g match {
    case Line(pts) => pts
    case g => throw new IllegalArgumentException(
      s"expected a curve component, got ${g.typeName}")
  }

  /** Concatenate CompoundCurve segments, dropping each joint's
    * duplicated first vertex. */
  private def joinSegments(segs: Array[Array[Pt]]): Array[Pt] = {
    val out = Array.newBuilder[Pt]
    segs.zipWithIndex.foreach { case (s, i) =>
      out ++= (if (i == 0) s else s.drop(1))
    }
    out.result()
  }

  private def closeRing(pts: Array[Pt]): Array[Pt] =
    if (pts.length >= 2 && pts.head != pts.last) pts :+ pts.head else pts

  /** CIRCULARSTRING: consecutive 3-point arcs (p0,p1,p2),(p2,p3,p4)…
    * Each arc becomes chords at ≤ 2π/32 sweep per chord; collinear
    * triples degrade to a straight segment. */
  private def linearizeCircular(pts: Array[Pt]): Array[Pt] = {
    require(pts.length >= 3 && pts.length % 2 == 1,
      s"CIRCULARSTRING needs odd n≥3 points, got ${pts.length}")
    val out = Array.newBuilder[Pt]
    out += pts(0)
    var i = 0
    while (i + 2 < pts.length) {
      out ++= linearizeArc(pts(i), pts(i + 1), pts(i + 2))
      i += 2
    }
    out.result()
  }

  /** Points AFTER `a` through `c` approximating the arc a→b→c. */
  private def linearizeArc(a: Pt, b: Pt, c: Pt): Array[Pt] = {
    val d = 2.0 * (a.x * (b.y - c.y) + b.x * (c.y - a.y) + c.x * (a.y - b.y))
    val span = math.max(math.hypot(c.x - a.x, c.y - a.y),
      math.max(math.hypot(b.x - a.x, b.y - a.y), 1e-300))
    // collinear (or numerically so relative to the arc's extent)
    if (math.abs(d) < 1e-12 * span * span) return Array(c)
    val aa = a.x * a.x + a.y * a.y
    val bbq = b.x * b.x + b.y * b.y
    val cc = c.x * c.x + c.y * c.y
    val cx = (aa * (b.y - c.y) + bbq * (c.y - a.y) + cc * (a.y - b.y)) / d
    val cy = (aa * (c.x - b.x) + bbq * (a.x - c.x) + cc * (b.x - a.x)) / d
    val r = math.hypot(a.x - cx, a.y - cy)
    val t0 = math.atan2(a.y - cy, a.x - cx)
    val t1 = math.atan2(b.y - cy, b.x - cx)
    val t2 = math.atan2(c.y - cy, c.x - cx)
    val tau = 2.0 * math.Pi
    def ccwDelta(from: Double, to: Double): Double = {
      val dlt = (to - from) % tau
      if (dlt < 0) dlt + tau else dlt
    }
    // closed arc (a == c): full circle through b
    val closed = a.x == c.x && a.y == c.y
    val sweep =
      if (closed) { if (ccwDelta(t0, t1) > 0) tau else -tau }
      else if (ccwDelta(t0, t1) <= ccwDelta(t0, t2)) ccwDelta(t0, t2)
      else ccwDelta(t0, t2) - tau
    val nSeg = math.max(2, math.ceil(math.abs(sweep) / (tau / 32)).toInt)
    Array.tabulate(nSeg) { k =>
      if (k == nSeg - 1 && !closed) c // land exactly on the given endpoint
      else {
        val t = t0 + sweep * (k + 1) / nSeg
        Pt(cx + r * math.cos(t), cy + r * math.sin(t))
      }
    }
  }

  // ------------------------------------------------------------ measures

  /** Signed ring area (shoelace); positive = CCW. */
  def signedRingArea(r: Array[Pt]): Double = {
    var s = 0.0
    var i = 0
    val n = r.length
    while (i < n - 1) {
      s += r(i).x * r(i + 1).y - r(i + 1).x * r(i).y
      i += 1
    }
    s / 2.0
  }

  def area(g: Geom): Double = g match {
    case p: Poly =>
      if (p.rings.isEmpty) 0.0
      else math.abs(signedRingArea(p.rings(0))) -
        p.rings.drop(1).map(r => math.abs(signedRingArea(r))).sum
    case MultiPoly(ps) => ps.map(area).sum
    case GeomColl(gs) => gs.map(area).sum
    case _ => 0.0
  }

  def length(g: Geom): Double = g match {
    case Line(p) =>
      var s = 0.0; var i = 0
      while (i < p.length - 1) { s += dist(p(i), p(i + 1)); i += 1 }
      s
    case MultiLine(ls) => ls.map(length).sum
    case GeomColl(gs) => gs.map(length).sum
    case _ => 0.0
  }

  private def dist(a: Pt, b: Pt): Double = math.hypot(a.x - b.x, a.y - b.y)

  def centroid(g: Geom): Pt = g match {
    case p: Pt => p
    case Line(pts) =>
      if (pts.length == 1) pts(0)
      else {
        var sx = 0.0; var sy = 0.0; var sl = 0.0; var i = 0
        while (i < pts.length - 1) {
          val l = dist(pts(i), pts(i + 1))
          sx += (pts(i).x + pts(i + 1).x) / 2 * l
          sy += (pts(i).y + pts(i + 1).y) / 2 * l
          sl += l
          i += 1
        }
        if (sl == 0) pts(0) else Pt(sx / sl, sy / sl)
      }
    case Poly(rings) =>
      if (rings.isEmpty) Pt(Double.NaN, Double.NaN)
      else {
        // area-weighted: shell positive, holes negative
        var sx = 0.0; var sy = 0.0; var sa = 0.0
        var r = 0
        while (r < rings.length) {
          val ring = rings(r)
          val sgn = if (r == 0) 1.0 else -1.0
          val a = math.abs(signedRingArea(ring)) * sgn
          val c = ringCentroid(ring)
          sx += c.x * a; sy += c.y * a; sa += a
          r += 1
        }
        if (math.abs(sa) < 1e-12) ringCentroid(rings(0)) else Pt(sx / sa, sy / sa)
      }
    case MultiPt(pts) =>
      if (pts.isEmpty) Pt(Double.NaN, Double.NaN)
      else Pt(pts.map(_.x).sum / pts.length, pts.map(_.y).sum / pts.length)
    case MultiLine(ls) => centroid(Line(ls.flatMap(_.pts)))
    case MultiPoly(ps) =>
      val nonEmpty = ps.filter(!_.isEmpty)
      if (nonEmpty.isEmpty) Pt(Double.NaN, Double.NaN)
      else {
        var sx = 0.0; var sy = 0.0; var sa = 0.0
        nonEmpty.foreach { p =>
          val a = math.max(area(p), 1e-12)
          val c = centroid(p)
          sx += c.x * a; sy += c.y * a; sa += a
        }
        Pt(sx / sa, sy / sa)
      }
    case GeomColl(gs) =>
      val cs = gs.filter(!_.isEmpty).map(centroid)
      if (cs.isEmpty) Pt(Double.NaN, Double.NaN)
      else Pt(cs.map(_.x).sum / cs.length, cs.map(_.y).sum / cs.length)
  }

  private def ringCentroid(r: Array[Pt]): Pt = {
    var cx = 0.0; var cy = 0.0; var a = 0.0
    var i = 0
    while (i < r.length - 1) {
      val cross = r(i).x * r(i + 1).y - r(i + 1).x * r(i).y
      cx += (r(i).x + r(i + 1).x) * cross
      cy += (r(i).y + r(i + 1).y) * cross
      a += cross
      i += 1
    }
    if (math.abs(a) < 1e-12) {
      // degenerate: vertex average
      val n = math.max(r.length - 1, 1)
      Pt(r.take(n).map(_.x).sum / n, r.take(n).map(_.y).sum / n)
    } else Pt(cx / (3.0 * a), cy / (3.0 * a))
  }

  /** A point guaranteed inside the geometry (ST_PointOnSurface,
    * reference aab_ext_restr/001:27): centroid when interior, else the
    * midpoint of the widest interior scanline span. */
  def pointOnSurface(g: Geom): Pt = g match {
    case p: Pt => p
    case Line(pts) => if (pts.isEmpty) Pt(Double.NaN, Double.NaN) else pts(pts.length / 2)
    case p: Poly =>
      val c = centroid(p)
      if (contains(p, c)) c
      else {
        // scanline through centroid.y: midpoint of widest inside interval
        val xs = ArrayBuffer[Double]()
        p.rings.foreach { r =>
          var i = 0
          while (i < r.length - 1) {
            val (a, b) = (r(i), r(i + 1))
            if ((a.y > c.y) != (b.y > c.y)) {
              xs += a.x + (c.y - a.y) / (b.y - a.y) * (b.x - a.x)
            }
            i += 1
          }
        }
        val sorted = xs.sorted
        var best = c
        var bestW = -1.0
        var i = 0
        while (i + 1 < sorted.length) {
          val mid = (sorted(i) + sorted(i + 1)) / 2
          val w = sorted(i + 1) - sorted(i)
          if (w > bestW && contains(p, Pt(mid, c.y))) { bestW = w; best = Pt(mid, c.y) }
          i += 2
        }
        best
      }
    case MultiPoly(ps) =>
      val withArea = ps.filter(!_.isEmpty)
      if (withArea.isEmpty) Pt(Double.NaN, Double.NaN)
      else pointOnSurface(withArea.maxBy(area))
    case MultiPt(pts) => if (pts.isEmpty) Pt(Double.NaN, Double.NaN) else pts(0)
    case MultiLine(ls) => if (ls.isEmpty) Pt(Double.NaN, Double.NaN) else pointOnSurface(ls(0))
    case GeomColl(gs) => if (gs.isEmpty) Pt(Double.NaN, Double.NaN) else pointOnSurface(gs(0))
  }

  // ---------------------------------------------------------- predicates

  /** Ray-cast point-in-ring (boundary counts as inside). */
  def pointInRing(p: Pt, r: Array[Pt]): Boolean = {
    var inside = false
    var i = 0
    val n = r.length
    while (i < n - 1) {
      val a = r(i); val b = r(i + 1)
      if (onSegment(p, a, b)) return true
      if ((a.y > p.y) != (b.y > p.y)) {
        val xint = a.x + (p.y - a.y) / (b.y - a.y) * (b.x - a.x)
        if (p.x < xint) inside = !inside
      }
      i += 1
    }
    inside
  }

  private def onSegment(p: Pt, a: Pt, b: Pt): Boolean = {
    val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
    if (math.abs(cross) > 1e-9 * (math.abs(b.x - a.x) + math.abs(b.y - a.y) + 1)) false
    else p.x >= math.min(a.x, b.x) - 1e-12 && p.x <= math.max(a.x, b.x) + 1e-12 &&
      p.y >= math.min(a.y, b.y) - 1e-12 && p.y <= math.max(a.y, b.y) + 1e-12
  }

  def contains(g: Geom, p: Pt): Boolean = g match {
    case Pt(x, y) => x == p.x && y == p.y
    case Line(pts) =>
      var i = 0
      while (i < pts.length - 1) { if (onSegment(p, pts(i), pts(i + 1))) return true; i += 1 }
      false
    case Poly(rings) =>
      if (rings.isEmpty) false
      else pointInRing(p, rings(0)) && !rings.drop(1).exists(h =>
        pointInRingStrict(p, h))
    case MultiPt(pts) => pts.exists(q => q.x == p.x && q.y == p.y)
    case MultiLine(ls) => ls.exists(contains(_, p))
    case MultiPoly(ps) => ps.exists(contains(_, p)) // union semantics
    case GeomColl(gs) => gs.exists(contains(_, p))
  }

  /** strict interior of a ring (boundary NOT inside) — used for holes. */
  private def pointInRingStrict(p: Pt, r: Array[Pt]): Boolean = {
    var i = 0
    while (i < r.length - 1) { if (onSegment(p, r(i), r(i + 1))) return false; i += 1 }
    pointInRing(p, r)
  }

  private def segIntersects(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Boolean = {
    def orient(p: Pt, q: Pt, r: Pt): Double =
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
    val d1 = orient(b1, b2, a1)
    val d2 = orient(b1, b2, a2)
    val d3 = orient(a1, a2, b1)
    val d4 = orient(a1, a2, b2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else onSegment(a1, b1, b2) || onSegment(a2, b1, b2) ||
      onSegment(b1, a1, a2) || onSegment(b2, a1, a2)
  }

  private def segments(g: Geom): Iterator[(Pt, Pt)] = g match {
    case _: Pt | _: MultiPt => Iterator.empty
    case Line(p) => (0 until p.length - 1).iterator.map(i => (p(i), p(i + 1)))
    case Poly(rings) => rings.iterator.flatMap(r =>
      (0 until r.length - 1).iterator.map(i => (r(i), r(i + 1))))
    case MultiLine(ls) => ls.iterator.flatMap(segments)
    case MultiPoly(ps) => ps.iterator.flatMap(segments)
    case GeomColl(gs) => gs.iterator.flatMap(segments)
  }

  private def anyPoint(g: Geom): Option[Pt] = g match {
    case p: Pt => if (p.isEmpty) None else Some(p)
    case Line(p) => p.headOption
    case Poly(r) => r.headOption.flatMap(_.headOption)
    case MultiPt(p) => p.headOption
    case MultiLine(l) => l.headOption.flatMap(x => x.pts.headOption)
    case MultiPoly(p) => p.headOption.flatMap(x => anyPoint(x))
    case GeomColl(g2) => g2.iterator.flatMap(anyPoint(_)).nextOption()
  }

  /** ST_Intersects (sql/examples/h3_polygon_queries.sql:240-244). */
  def intersects(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    (a, b) match {
      case (p: Pt, g) => contains(g, p)
      case (g, p: Pt) => contains(g, p)
      case (MultiPt(ps), g) => ps.exists(contains(g, _))
      case (g, MultiPt(ps)) => ps.exists(contains(g, _))
      case _ =>
        // any segment crossing, or full containment either way
        val segsA = segments(a).toArray
        val segsB = segments(b).toArray
        var i = 0
        while (i < segsA.length) {
          var j = 0
          while (j < segsB.length) {
            if (segIntersects(segsA(i)._1, segsA(i)._2, segsB(j)._1, segsB(j)._2))
              return true
            j += 1
          }
          i += 1
        }
        anyPoint(a).exists(contains(b, _)) || anyPoint(b).exists(contains(a, _))
    }
  }

  def distance(a: Geom, b: Geom): Double = {
    if (intersects(a, b)) return 0.0
    def ptsOf(g: Geom): Array[Pt] = g match {
      case p: Pt => Array(p)
      case MultiPt(p) => p
      case _ => Array.empty
    }
    def ptSegDist(p: Pt, a1: Pt, a2: Pt): Double = {
      val dx = a2.x - a1.x; val dy = a2.y - a1.y
      val l2 = dx * dx + dy * dy
      if (l2 == 0) dist(p, a1)
      else {
        val t = math.max(0.0, math.min(1.0,
          ((p.x - a1.x) * dx + (p.y - a1.y) * dy) / l2))
        dist(p, Pt(a1.x + t * dx, a1.y + t * dy))
      }
    }
    val segsA = segments(a).toArray
    val segsB = segments(b).toArray
    val ptsA = ptsOf(a) ++ segsA.flatMap(s => Array(s._1, s._2))
    val ptsB = ptsOf(b) ++ segsB.flatMap(s => Array(s._1, s._2))
    var best = Double.MaxValue
    ptsA.foreach { p =>
      if (segsB.isEmpty) ptsB.foreach(q => best = math.min(best, dist(p, q)))
      else segsB.foreach(s => best = math.min(best, ptSegDist(p, s._1, s._2)))
    }
    ptsB.foreach { p =>
      if (segsA.isEmpty) ptsA.foreach(q => best = math.min(best, dist(p, q)))
      else segsA.foreach(s => best = math.min(best, ptSegDist(p, s._1, s._2)))
    }
    best
  }

  // ------------------------------------------------------------ validity

  def isValid(g: Geom): Boolean = g match {
    case p: Pt => !p.isEmpty
    case Line(p) => p.length >= 2 && p.forall(q => !q.x.isNaN && !q.y.isNaN)
    case Poly(rings) =>
      rings.nonEmpty && rings.forall { r =>
        r.length >= 4 && r.head == r.last &&
          r.forall(q => !q.x.isNaN && !q.y.isNaN) &&
          math.abs(signedRingArea(r)) > 0.0
      } && !ringSelfIntersects(rings(0))
    case MultiPt(p) => p.nonEmpty
    case MultiLine(l) => l.nonEmpty && l.forall(isValid)
    case MultiPoly(p) => p.nonEmpty && p.forall(isValid)
    case GeomColl(gs) => gs.forall(isValid)
  }

  private def ringSelfIntersects(r: Array[Pt]): Boolean = {
    // O(n^2) over non-adjacent segment pairs; rings in this engine are
    // source-data sized (hundreds of points), not index-sized.
    val n = r.length - 1
    var i = 0
    while (i < n) {
      var j = i + 2
      while (j < n) {
        val adjacent = (i == 0 && j == n - 1)
        if (!adjacent &&
          segIntersectsStrict(r(i), r(i + 1), r(j), r(j + 1))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  private def segIntersectsStrict(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Boolean = {
    def orient(p: Pt, q: Pt, r: Pt): Double =
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
    val d1 = orient(b1, b2, a1); val d2 = orient(b1, b2, a2)
    val d3 = orient(a1, a2, b1); val d4 = orient(a1, a2, b2)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  /** Best-effort fixer mirroring the reference's buffer(0)/make_valid
    * heuristics (g_validate_geom 003:25, zip_geopackage.py:327-343):
    * closes open rings, drops degenerate rings/parts. Returns None when
    * nothing salvageable remains. */
  def makeValid(g: Geom): Option[Geom] = g match {
    case p: Pt => if (p.isEmpty) None else Some(p)
    case Line(p) =>
      val clean = p.filter(q => !q.x.isNaN && !q.y.isNaN)
      if (clean.length >= 2) Some(Line(clean)) else None
    case Poly(rings) =>
      val fixed = rings.flatMap { r0 =>
        val r1 = r0.filter(q => !q.x.isNaN && !q.y.isNaN)
        val r = if (r1.length >= 3 && r1.head != r1.last) r1 :+ r1.head else r1
        if (r.length >= 4 && math.abs(signedRingArea(r)) > 0.0) Some(r) else None
      }
      if (fixed.isEmpty) None else Some(Poly(fixed))
    case MultiPt(p) => if (p.isEmpty) None else Some(MultiPt(p.filter(q => !q.isEmpty)))
    case MultiLine(l) =>
      val fixed = l.flatMap(x => makeValid(x).collect { case li: Line => li })
      if (fixed.isEmpty) None else Some(MultiLine(fixed))
    case MultiPoly(p) =>
      val fixed = p.flatMap(x => makeValid(x).collect { case po: Poly => po })
      if (fixed.isEmpty) None else Some(MultiPoly(fixed))
    case GeomColl(gs) =>
      val fixed = gs.flatMap(makeValid)
      if (fixed.isEmpty) None else Some(GeomColl(fixed))
  }

  /** Apply a coordinate transform to every vertex (CRS reprojection). */
  def mapCoords(g: Geom, f: Pt => Pt): Geom = g match {
    case p: Pt => if (p.isEmpty) p else f(p)
    case Line(pts) => Line(pts.map(f))
    case Poly(rings) => Poly(rings.map(_.map(f)))
    case MultiPt(pts) => MultiPt(pts.map(f))
    case MultiLine(ls) => MultiLine(ls.map(l => Line(l.pts.map(f))))
    case MultiPoly(ps) => MultiPoly(ps.map(p => Poly(p.rings.map(_.map(f)))))
    case GeomColl(gs) => GeomColl(gs.map(mapCoords(_, f)))
  }

  // -------------------------------------------------------------- buffer

  /** ST_Buffer (g_h3_line_cells 003:71 uses it ahead of polyfill).
    * Points become 32-gon circles; lines become per-segment capsule
    * chains with union containment semantics (MultiPoly); polygons with
    * d == 0 are makeValid'd, d > 0 expands ring vertices outward along
    * vertex normals (approximate). */
  def buffer(g: Geom, d: Double): Geom = g match {
    case p: Pt => circle(p, d, 32)
    case MultiPt(pts) => MultiPoly(pts.map(p => circle(p, d, 32)))
    case Line(pts) =>
      val caps = (0 until pts.length - 1).map(i => capsule(pts(i), pts(i + 1), d)).toArray
      val joints = pts.map(p => circle(p, d, 16))
      MultiPoly(caps ++ joints)
    case MultiLine(ls) =>
      MultiPoly(ls.flatMap(l => buffer(l, d) match {
        case MultiPoly(ps) => ps
        case p: Poly => Array(p)
        case _ => Array.empty[Poly]
      }))
    case p: Poly =>
      if (d == 0.0) makeValid(p).getOrElse(p)
      else Poly(Array(offsetRing(p.rings(0), d)) ++ p.rings.drop(1))
    case MultiPoly(ps) => MultiPoly(ps.map(p => buffer(p, d).asInstanceOf[Poly]))
    case GeomColl(gs) => GeomColl(gs.map(buffer(_, d)))
  }

  private def circle(c: Pt, r: Double, n: Int): Poly = {
    val pts = (0 to n).map { i =>
      val a = 2 * math.Pi * i / n
      Pt(c.x + r * math.cos(a), c.y + r * math.sin(a))
    }.toArray
    Poly(Array(pts))
  }

  private def capsule(a: Pt, b: Pt, r: Double): Poly = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val l = math.hypot(dx, dy)
    if (l == 0) return circle(a, r, 16)
    val nx = -dy / l * r; val ny = dx / l * r
    Poly(Array(Array(
      Pt(a.x + nx, a.y + ny), Pt(b.x + nx, b.y + ny),
      Pt(b.x - nx, b.y - ny), Pt(a.x - nx, a.y - ny),
      Pt(a.x + nx, a.y + ny))))
  }

  private def offsetRing(r: Array[Pt], d: Double): Array[Pt] = {
    val ccw = signedRingArea(r) > 0
    val sign = if (ccw) 1.0 else -1.0
    val n = r.length - 1
    val out = new Array[Pt](r.length)
    var i = 0
    while (i < n) {
      val prev = r((i - 1 + n) % n)
      val next = r((i + 1) % n)
      val cur = r(i)
      // vertex normal = normalized sum of adjacent edge normals
      def norm(a: Pt, b: Pt): (Double, Double) = {
        val dx = b.x - a.x; val dy = b.y - a.y
        val l = math.hypot(dx, dy)
        if (l == 0) (0.0, 0.0) else (sign * dy / l, -sign * dx / l)
      }
      val (n1x, n1y) = norm(prev, cur)
      val (n2x, n2y) = norm(cur, next)
      val (sx, sy) = (n1x + n2x, n1y + n2y)
      val sl = math.hypot(sx, sy)
      val (ux, uy) = if (sl < 1e-12) (n2x, n2y) else (sx / sl, sy / sl)
      out(i) = Pt(cur.x + ux * d, cur.y + uy * d)
      i += 1
    }
    out(n) = out(0)
    out
  }
}
