package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the polygon-query aggregate paths (q64-q67).
  * Not part of the driver contract.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile-query")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.queries.GeoQueries
    // build the shared caches the way the bench does (q61..q64 run first)
    time("q61_first")(noop(GeoQueries.queries("q61_stage004")(spark, sfDir)))
    time("q63_first")(noop(GeoQueries.queries("q63_h3_stats")(spark, sfDir)))
    time("q64_first")(noop(GeoQueries.queries("q64_query_objects")(spark, sfDir)))
    time("q65_first")(noop(GeoQueries.queries("q65_query_stats")(spark, sfDir)))
    time("q65_second")(noop(GeoQueries.queries("q65_query_stats")(spark, sfDir)))
    time("q66_first")(noop(GeoQueries.queries("q66_query_heatmap")(spark, sfDir)))
    time("q66_second")(noop(GeoQueries.queries("q66_query_heatmap")(spark, sfDir)))
    val idx = GeoQueries.sharedIndex(spark, sfDir)
    val wkt = graft.pipeline.GeoFixture.queryPolygonWkt
    val q = broadcast(graft.pipeline.H3Query.queryCells(spark, wkt, 8))
    val joined = idx.withColumn("q_cell", col("h3_parent_8")).join(q, "q_cell")
    time("joined_only")(noop(joined.select("dataset_id", "klass", "leverantor", "id", "h3_cell")))
    time("byObject_branch")(noop(joined.groupBy("dataset_id", "klass", "id")
      .agg(collect_set(col("leverantor")).as("_ls"))))
    time("byCell_branch")(noop(joined.groupBy("dataset_id", "klass", "h3_cell")
      .agg(count(lit(1)).as("_n"))))
    time("q65_third")(noop(GeoQueries.queries("q65_query_stats")(spark, sfDir)))
    GeoQueries.queries("q65_query_stats")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
