package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

import graft.functions.GFunctions._
import graft.pipeline.{GeoFixture, Stages}
import graft.sinks.{Exporters, FlatGeobuf, GeopackageWriter}
import graft.sources.Sources

/** Driver-visible end-to-end loops through the source/sink surface
  * (SURVEY §2.1/§2.2): write with the repo's native writers, read back
  * with the repo's native sources, and project the result into an
  * oracle-checkable digest — so the GPKG/FGB/GeoJSON/CSV round-trips
  * produce hash-matched CORRECTNESS rows instead of scalatest-only
  * evidence (reference plugin contract: `tests/test_plugins.py:12-228`).
  *
  * Each loop runs on a 300-feature fixture slice: big enough to hit
  * multi-page SQLite b-trees and every geometry type, small enough that
  * the single-file writers stay off the bench's critical path.
  */
object SourceSinkQueries {

  private def slice(s: SparkSession, dir: String): DataFrame =
    GeoFixture(s, dir).filter(col("fid") <= 300)
      .select(col("fid").as("src_fid"), col("name"), col("geom"))

  /** Same digest convention as q60: md5 of the WKT rendering, so the
    * DuckDB oracle can reproduce it with pure string arithmetic. */
  private def digest(df: DataFrame): DataFrame =
    df.select(col("src_fid").cast("long").as("fid"),
      col("name"),
      md5(st_astext(col("geom")).cast("binary")).as("wkt_md5"))
      .orderBy("fid")

  private val digestOracle: String =
    s"""SELECT c_custkey AS fid, c_name AS name, md5(${GeoFixture.wktSql}) AS wkt_md5
       |FROM customer WHERE c_custkey <= 300 ORDER BY fid""".stripMargin

  private def md5hex(text: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Native GPKG writer -> native SQLite/GPKG source -> digest.
    "q93_gpkg_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_q93")
      val gpkg = tmp.resolve("loop.gpkg").toString
      GeopackageWriter.write(slice(s, dir), gpkg, "loop")
      val back = Sources.GeopackageSource.read(s, Map("url" -> gpkg))
      digest(back)
    }),

    // Native FlatGeobuf writer -> own reader -> digest (the reader is
    // driver-side by design: FGB is an interactive/interop format).
    "q94_fgb_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_q94")
      val fgb = tmp.resolve("loop.fgb").toString
      FlatGeobuf.write(slice(s, dir), fgb, "loop")
      val (_, feats) = FlatGeobuf.read(fgb)
      val rows = feats.map { case (g, props) =>
        Row(props("src_fid").asInstanceOf[Long],
          props("name").asInstanceOf[String],
          md5hex(graft.spatial.Geometry.toWkt(g)))
      }
      val schema = StructType(Seq(StructField("fid", LongType),
        StructField("name", StringType), StructField("wkt_md5", StringType)))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.asJava, schema).orderBy("fid")
    }),

    // Writer -> zip archive -> zip_geopackage source -> stage004 ->
    // geometry-type census (the published-dataset ingest loop).
    "q95_zip_gpkg_stage004" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_q95")
      val gpkg = tmp.resolve("export.gpkg")
      GeopackageWriter.write(slice(s, dir), gpkg.toString, "exported")
      val zipPath = tmp.resolve("export.zip")
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(zipPath.toFile))
      zos.putNextEntry(new java.util.zip.ZipEntry("export.gpkg"))
      zos.write(Files.readAllBytes(gpkg))
      zos.closeEntry(); zos.close()
      val back = Sources.ZipGeopackageSource.read(s, Map(
        "url" -> zipPath.toUri.toString,
        "cache_dir" -> Files.createTempDirectory("graft_q95c").toString))
      Stages.stage004(back)
        .select(st_geometrytype(col("geom")).as("gtype"))
        .groupBy("gtype").agg(count(lit(1)).as("n"))
        .orderBy("gtype")
    }),

    // Distributed GeoJSONSeq export -> text source -> JSON-path fields
    // -> geometry reparse -> digest.
    "q96_geojson_roundtrip" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_q96")
      val path = tmp.resolve("features").toString
      Exporters.geojsonSeq(slice(s, dir), path)
      s.read.text(path)
        .select(
          get_json_object(col("value"), "$.properties.src_fid")
            .cast("long").as("fid"),
          get_json_object(col("value"), "$.properties.name").as("name"),
          md5(st_astext(st_geomfromgeojson(
            get_json_object(col("value"), "$.geometry"))).cast("binary"))
            .as("wkt_md5"))
        .orderBy("fid")
    }),

    // CSV export (Kepler hex_id convention) -> CSV source: rows survive
    // only if hex_id mirrors h3_cell, so a broken mirror fails the
    // row-count check, and fid/name hash-match against the oracle.
    "q97_csv_export_loop" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_q97")
      val path = tmp.resolve("csv").toString
      val enriched = slice(s, dir).select(
        col("src_fid"), col("name"),
        g_h3_center(g_centroid_lat(col("geom")), g_centroid_lng(col("geom")),
          lit(8)).as("h3_cell"))
      Exporters.csv(enriched, path)
      s.read.option("header", "true").csv(path)
        .filter(col("hex_id") === col("h3_cell"))
        .select(col("src_fid").cast("long").as("fid"), col("name"))
        .orderBy("fid")
    })
  )

  val oracle: Map[String, String] = Map(
    "q93_gpkg_roundtrip" -> digestOracle,
    "q94_fgb_roundtrip" -> digestOracle,
    "q95_zip_gpkg_stage004" ->
      """SELECT CASE WHEN c_custkey % 3 = 0 THEN 'POINT'
        |            WHEN c_custkey % 3 = 1 THEN 'POLYGON'
        |            ELSE 'LINESTRING' END AS gtype, COUNT(*) AS n
        |FROM customer WHERE c_custkey <= 300
        |GROUP BY 1 ORDER BY gtype""".stripMargin,
    "q96_geojson_roundtrip" -> digestOracle,
    "q97_csv_export_loop" ->
      """SELECT c_custkey AS fid, c_name AS name
        |FROM customer WHERE c_custkey <= 300 ORDER BY fid""".stripMargin
  )
}
