package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

import graft.spatial.{Geometry, Line, MultiPoly, Poly, Pt}

/** FlatGeobuf write -> read round-trips (the reader independently walks
  * the flatbuffer vtables/vectors per the published format). */
class FlatGeobufSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def tmp(name: String) =
    Files.createTempDirectory("fgb").resolve(name).toString

  test("df -> fgb -> read round-trip: header, columns, props, geometries") {
    import spark.implicits._
    val geoms = Seq(
      (1L, Geometry.toWkb(Pt(500000, 6400000)), "first", 1.5, true),
      (2L, Geometry.toWkb(Poly(Array(
        Array(Pt(0, 0), Pt(100, 0), Pt(100, 50), Pt(0, 50), Pt(0, 0)),
        Array(Pt(10, 10), Pt(20, 10), Pt(20, 20), Pt(10, 20), Pt(10, 10))))),
        "donut åäö", 2.5, false),
      (3L, Geometry.toWkb(Line(Array(Pt(1, 2), Pt(3, 4), Pt(5, 6)))),
        null, 3.5, true))
    val df = geoms.toDF("oid", "geom", "namn", "vikt", "flagga")
    val path = tmp("t.fgb")
    FlatGeobuf.write(df, path, "lager", "geom")

    val (layer, feats) = FlatGeobuf.read(path)
    assert(layer.name == "lager")
    assert(layer.featuresCount == 3L)
    assert(layer.geometryType == 0) // mixed -> Unknown
    assert(layer.columns.map(_.name) == Seq("oid", "namn", "vikt", "flagga"))
    assert(layer.crsOrg == "EPSG" && layer.crsCode == 3006)
    assert(layer.envelope.toSeq == Seq(0.0, 0.0, 500000.0, 6400000.0))

    assert(feats.length == 3)
    val (g1, p1) = feats(0)
    assert(g1 == Pt(500000, 6400000))
    assert(p1("oid") == 1L && p1("namn") == "first" &&
      p1("vikt") == 1.5 && p1("flagga") == true)
    val (g2, p2) = feats(1)
    val poly = g2.asInstanceOf[Poly]
    assert(poly.rings.length == 2)
    assert(poly.rings(1).length == 5)
    assert(Geometry.area(poly) == 100.0 * 50 - 100)
    assert(p2("namn") == "donut åäö")
    val (g3, p3) = feats(2)
    assert(g3.asInstanceOf[Line].pts.toSeq == Seq(Pt(1, 2), Pt(3, 4), Pt(5, 6)))
    assert(!p3.contains("namn")) // null property omitted
  }

  test("multipolygon via nested parts") {
    import spark.implicits._
    val mp = MultiPoly(Array(
      Poly(Array(Array(Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 1), Pt(0, 0)))),
      Poly(Array(Array(Pt(5, 5), Pt(7, 5), Pt(7, 7), Pt(5, 7), Pt(5, 5))))))
    val df = Seq((1L, Geometry.toWkb(mp))).toDF("id", "geom")
    val path = tmp("mp.fgb")
    FlatGeobuf.write(df, path, "mp", "geom")
    val (layer, feats) = FlatGeobuf.read(path)
    assert(layer.geometryType == 6)
    val got = feats.head._1.asInstanceOf[MultiPoly]
    assert(got.polys.length == 2)
    assert(Geometry.area(got) == 1.0 + 4.0)
  }

  test("magic bytes and empty-properties features") {
    import spark.implicits._
    val df = Seq((Geometry.toWkb(Pt(1, 1)))).map(Tuple1(_)).toDF("geom")
    val path = tmp("m.fgb")
    FlatGeobuf.write(df, path, "only_geom", "geom")
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(bytes.take(8).toSeq == FlatGeobuf.Magic.toSeq)
    val (layer, feats) = FlatGeobuf.read(path)
    assert(layer.columns.isEmpty)
    assert(feats.head._1 == Pt(1, 1))
    assert(feats.head._2.isEmpty)
  }
}
