package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

/** Scripted explorer session over a real Runner-layout warehouse —
  * the capability subset of the reference's admin explorer screen
  * (table list / info / preview / braille map / polygon query /
  * export). */
class ExplorerSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val fm = FieldMapping(Map(
    "source_id" -> "$source_id", "klass" -> "$klass_raw",
    "grupp" -> "fixture", "typ" -> "synthetic",
    "leverantor" -> "$lev_raw", "data_1" -> "$name"))

  /** Build a minimal on-disk warehouse: one dataset through the real
    * stage chain, written in Runner's layout. */
  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("wh").toString
    val staged = Stages.stage004(GeoFixture(spark, sfDir))
    val normalized = Stages.normalizeExtRestr(staged, fm, "geo_cust")
    val mart = Stages.martH3Cells(normalized, "geo_cust")
    staged.write.mode("overwrite").parquet(s"$dir/staging_004/geo_cust.parquet")
    mart.write.mode("overwrite").parquet(s"$dir/mart/geo_cust_h3.parquet")
    H3Index.stats(H3Index.build(spark,
      Map("geo_cust" -> spark.read.parquet(s"$dir/mart/geo_cust_h3.parquet"))))
      .write.mode("overwrite").parquet(s"$dir/mart/h3_stats.parquet")
    dir
  }

  private def run(commands: String*): String = {
    val baos = new ByteArrayOutputStream()
    val out = new PrintStream(baos, true, "UTF-8")
    Explorer.session(spark, commands.iterator, out)
    baos.toString("UTF-8")
  }

  test("openWarehouse registers layered views + h3_index") {
    val views = Explorer.openWarehouse(spark, warehouse)
    assert(views.toSet == Set(
      "staging_004_geo_cust", "mart_geo_cust_h3", "h3_stats", "h3_index"))
    assert(spark.table("h3_index").columns.contains("h3_cell"))
  }

  test("scripted session: tables, info, head") {
    Explorer.openWarehouse(spark, warehouse)
    val txt = run("tables", "info mart_geo_cust_h3", "head mart_geo_cust_h3 3")
    // mart listed before staging, geometry flag shown
    val lines = txt.linesIterator.toSeq
    val martLine = lines.indexWhere(_.contains("mart_geo_cust_h3"))
    val stagingLine = lines.indexWhere(_.contains("staging_004_geo_cust"))
    assert(martLine >= 0 && stagingLine > martLine)
    assert(lines(martLine).contains("geo"))
    // info block
    assert(txt.contains("geometry: geom"))
    assert(txt.contains("- h3_cell (bigint)"))
    // head renders a table with WKT-preview geometry, not raw bytes
    assert(txt.contains("| id ") || txt.contains("| id"))
    assert(txt.contains("POINT") || txt.contains("POLYGON") ||
      txt.contains("LINESTRING"))
  }

  test("scripted session: braille map plots the fixture extent") {
    Explorer.openWarehouse(spark, warehouse)
    val txt = run("map mart_geo_cust_h3 40 10")
    assert(txt.contains("extent:"))
    val mapLines = txt.linesIterator.filter(
      _.exists(ch => ch >= 0x2800 && ch <= 0x28FF)).toSeq
    assert(mapLines.nonEmpty, "no braille output")
    // something was actually plotted (not all blank cells)
    assert(mapLines.exists(_.exists(ch => ch > 0x2800)))
  }

  test("scripted session: polygon query + export + error resilience") {
    Explorer.openWarehouse(spark, warehouse)
    val exportDir = Files.createTempDirectory("expl_exp").toString
    val txt = run(
      "nonsense command",
      "info no_such_table",
      s"query heatmap 8 ${GeoFixture.queryPolygonWkt}",
      s"export $exportDir",
      "quit",
      "tables # must never run - session ended")
    assert(txt.contains("unknown command: nonsense"))
    assert(txt.contains("error:")) // bad table didn't kill the session
    assert(txt.contains("object_count"))
    assert(txt.contains("export geo_cust"))
    assert(Files.list(java.nio.file.Paths.get(exportDir)).count() > 0)
    assert(!txt.contains("h3_index\n# must"))
  }
}
