package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GFunctions._
import graft.pipeline._

/** The spatial pipeline as driver-checkable queries: fixture ->
  * Stage004 -> Normalize -> MartH3 -> h3_index/h3_stats -> polygon
  * queries (SURVEY.md §3.1-3.2, §7.2 minimum slice).
  *
  * q60 is string-level and DuckDB-oracle-checked; the H3/geometry
  * results (q61+) have no SQL-expressible oracle (the driver's DuckDB
  * has no spatial/h3 extensions offline) and get rows-only checks —
  * their value-level correctness is covered by the scalatest golden
  * suite (PipelineSpec, H3CoreSpec, GFunctionsSpec).
  */
object GeoQueries {

  private val fm = FieldMapping(Map(
    "source_id" -> "$source_id",
    "klass" -> "$klass_raw",
    "grupp" -> "fixture",
    "typ" -> "synthetic",
    "leverantor" -> "$lev_raw",
    "data_1" -> "$name"))

  /** The stage004 polyfill is the expensive step (O(cells) H3 math per
    * row); materialize it once per scale factor and share across every
    * downstream query — the reference materializes staging_004 as a
    * table for the same reason (004:23 CREATE OR REPLACE TABLE). */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  private def cached(key: String, dir: String)(build: => DataFrame): DataFrame =
    memo.computeIfAbsent((key, dir), _ => build.persist())

  private def staged(s: SparkSession, dir: String): DataFrame =
    cached("staged", dir) {
      // the fixture parquet is one small file -> 1-2 input partitions;
      // the per-row H3 polyfill is compute-bound, so spread it across
      // the cluster width before the expensive projection
      Stages.stage004(
        GeoFixture(s, dir).repartition(s.sparkContext.defaultParallelism))
    }

  private def mart(s: SparkSession, dir: String): DataFrame =
    cached("mart", dir) {
      Stages.martH3Cells(
        Stages.normalizeExtRestr(staged(s, dir), fm, "geo_cust"), "geo_cust")
    }

  private[queries] def sharedIndex(s: SparkSession, dir: String): DataFrame =
    index(s, dir)

  private def index(s: SparkSession, dir: String): DataFrame =
    cached("index", dir) {
      // two datasets split by id parity -> exercises the dynamic union,
      // both branches filtering the one cached mart (no recompute)
      val m = mart(s, dir)
      val parity = conv(substring(col("id"), 1, 2), 16, 10).cast("int") % 2
      val even = m.filter(parity === 0).withColumn("dataset", lit("geo_even"))
      val odd = m.filter(parity === 1).withColumn("dataset", lit("geo_odd"))
      H3Index.build(s, Map("geo_even" -> even, "geo_odd" -> odd))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WKB<->WKT round-trip + type dispatch, oracle-checked at string
    // level (the only spatial check DuckDB can replay without its
    // spatial extension).
    "q60_geom_roundtrip" -> ((s, dir) => {
      GeoFixture(s, dir)
        .select(col("fid"),
          md5(st_astext(col("geom")).cast("binary")).as("wkt_md5"),
          st_geometrytype(col("geom")).as("gtype"))
        .orderBy("fid")
    }),

    // Stage004 enrichment (004_staging_transform_template.sql:10-61).
    "q61_stage004" -> ((s, dir) => {
      staged(s, dir)
        .select(col("fid"), col("_geom_md5"), col("_attr_md5"),
          col("_h3_index"),
          size(col("_h3_cells")).cast("long").as("n_cells"),
          round(col("_centroid_lat"), 6).as("clat"),
          round(col("_centroid_lng"), 6).as("clng"))
        .orderBy("fid")
    }),

    // Mart explode -> per-klass cell stats (aab_ext_restr/002).
    "q62_mart_explode" -> ((s, dir) => {
      mart(s, dir)
        .groupBy("klass")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("h3_cell")).as("n_cells"),
          countDistinct(col("id")).as("n_objects"))
        .orderBy("klass")
    }),

    // Dynamic-union index -> h3_stats heatmap pre-aggregate
    // (pipeline_runner.py:1144-1153), top cells.
    "q63_h3_stats" -> ((s, dir) => {
      H3Index.stats(index(s, dir))
        .orderBy(desc("object_count"), asc("h3_cell"))
        .limit(50)
    }),

    // Polygon query, objects mode (h3_query.py:98-119).
    "q64_query_objects" -> ((s, dir) =>
      H3Query.objects(s, index(s, dir), GeoFixture.queryPolygonWkt, res = 8)),

    // Polygon query, stats mode (h3_query.py:122-144).
    "q65_query_stats" -> ((s, dir) =>
      H3Query.stats(s, index(s, dir), GeoFixture.queryPolygonWkt, res = 8)),

    // Polygon query, heatmap mode (h3_query.py:147-171).
    "q66_query_heatmap" -> ((s, dir) =>
      H3Query.heatmap(s, index(s, dir), GeoFixture.queryPolygonWkt, res = 8)
        .limit(100)),

    // H3 prefilter + exact ST_Intersects refine
    // (docs/H3_POLYGON_ANALYSIS.md:337-355).
    "q67_query_exact" -> ((s, dir) =>
      H3Query.objectsExact(s, index(s, dir), GeoFixture.queryPolygonWkt, res = 8)),

    // Per-object compacted hierarchy (aab_ext_restr/003:10-16).
    "q68_compact" -> ((s, dir) => {
      val normalized = Stages.normalizeExtRestr(staged(s, dir), fm, "geo_cust")
      Stages.martH3Compact(normalized)
        .select(col("id"),
          size(col("h3_cells_compact")).cast("long").as("n_compact"))
        .orderBy("id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q60_geom_roundtrip" ->
      s"""SELECT c_custkey AS fid, md5(${GeoFixture.wktSql}) AS wkt_md5,
         |  CASE WHEN c_custkey % 3 = 0 THEN 'POINT'
         |       WHEN c_custkey % 3 = 1 THEN 'POLYGON'
         |       ELSE 'LINESTRING' END AS gtype
         |FROM customer ORDER BY fid""".stripMargin
  )
}
