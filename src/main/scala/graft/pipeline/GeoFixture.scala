package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GFunctions._

/** Deterministic geodata derived from the driver's `customer` table —
  * the engine has no shipped geodata, so the spatial pipeline is
  * exercised on synthetic SWEREF99 TM features whose WKT is built with
  * pure integer arithmetic (reproducible in the DuckDB oracle for the
  * string-level checks; the spatial results get rows-only checks).
  *
  * Coordinates land in a plausible southern-Sweden box
  * (E 560-623 km, N 6440-6509 km). custkey % 3 picks the geometry
  * type, mirroring the reference's mixed polygon/line/point datasets.
  * The query polygon below covers the box's northern ~60%, so polygon
  * queries select a real subset.
  */
object GeoFixture {

  /** `eastOffset`/`fidOffset` (both default 0 — every oracle-checked
    * query uses the unshifted form) let a scale-curve harness union m
    * DISJOINT replicas: each shifted replica covers its own 62 km
    * east-west band at the SAME object density, so a fixed query
    * polygon keeps constant selectivity while the index grows m-fold —
    * the shape a real lake has (more area, not more overlap). */
  def apply(spark: SparkSession, dir: String,
      eastOffset: Long = 0L, fidOffset: Long = 0L): DataFrame = {
    val c = spark.read.parquet(s"$dir/customer.parquet")
    // 31 x 23 position grid (713 positions, coprime to the %3 type
    // split -> every position hosts all three geometry types): objects
    // CLUSTER — several per position as sf grows — so H3 cells are
    // shared across objects and the heatmap / stats aggregates exercise
    // real multi-object groups instead of the degenerate all-counts-1
    // case (which is both unrealistic and the aggregation worst case:
    // one group per row defeats map-side combine).
    val x0 = (col("c_custkey") % 31) * 2000 + 560000 + eastOffset
    val y0 = ((col("c_custkey") * 7) % 23) * 3000 + 6440000
    def s(c0: org.apache.spark.sql.Column) = c0.cast("long").cast("string")
    val wkt = when(col("c_custkey") % 3 === 0,
      concat(lit("POINT ("), s(x0), lit(" "), s(y0), lit(")")))
      .when(col("c_custkey") % 3 === 1,
        concat(lit("POLYGON (("),
          s(x0), lit(" "), s(y0), lit(", "),
          s(x0 + 800), lit(" "), s(y0), lit(", "),
          s(x0 + 800), lit(" "), s(y0 + 800), lit(", "),
          s(x0), lit(" "), s(y0 + 800), lit(", "),
          s(x0), lit(" "), s(y0), lit("))")))
      .otherwise(
        concat(lit("LINESTRING ("),
          s(x0), lit(" "), s(y0), lit(", "),
          s(x0 + 1500), lit(" "), s(y0 + 900), lit(")")))
    c.select(
      (col("c_custkey") + fidOffset).as("fid"),
      (col("c_custkey") + fidOffset).cast("string").as("source_id"),
      col("c_mktsegment").as("klass_raw"),
      concat(lit("nation_"), col("c_nationkey").cast("string")).as("lev_raw"),
      col("c_name").as("name"),
      wkt.as("wkt"))
      .withColumn("geom", st_geomfromtext(col("wkt")))
  }

  /** The SQL that reproduces the WKT strings in DuckDB, for oracles. */
  val wktSql: String =
    """CASE
      |  WHEN c_custkey % 3 = 0 THEN 'POINT (' || CAST((c_custkey % 31) * 2000 + 560000 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440000 AS VARCHAR) || ')'
      |  WHEN c_custkey % 3 = 1 THEN 'POLYGON ((' ||
      |    CAST((c_custkey % 31) * 2000 + 560000 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440000 AS VARCHAR) || ', ' ||
      |    CAST((c_custkey % 31) * 2000 + 560800 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440000 AS VARCHAR) || ', ' ||
      |    CAST((c_custkey % 31) * 2000 + 560800 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440800 AS VARCHAR) || ', ' ||
      |    CAST((c_custkey % 31) * 2000 + 560000 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440800 AS VARCHAR) || ', ' ||
      |    CAST((c_custkey % 31) * 2000 + 560000 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440000 AS VARCHAR) || '))'
      |  ELSE 'LINESTRING (' ||
      |    CAST((c_custkey % 31) * 2000 + 560000 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440000 AS VARCHAR) || ', ' ||
      |    CAST((c_custkey % 31) * 2000 + 561500 AS VARCHAR) || ' ' || CAST((c_custkey * 7) % 23 * 3000 + 6440900 AS VARCHAR) || ')'
      |END""".stripMargin

  /** A query polygon over the middle of the fixture box (SWEREF99). */
  val queryPolygonWkt: String =
    "POLYGON ((560000 6450000, 620000 6450000, 620000 6500000, 560000 6500000, 560000 6450000))"
}
