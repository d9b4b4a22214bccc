package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness for the q61/q62/q63 trio (the index-build path) —
  * times each query exactly the way Bench.scala does (noop-sink write,
  * shared GeoQueries memo, name order). Not part of the driver
  * contract.
  */
object TrioBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-trio")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q61_stage004", "q62_mart_explode", "q63_h3_stats",
        "q64_query_objects", "q65_query_stats", "q66_query_heatmap",
        "q67_query_exact", "q68_compact")
    var total = 0.0
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      total += s
      println(f"$name%-20s $s%8.2f s")
    }
    println(f"TOTAL                $total%8.2f s")
    spark.stop()
  }
}
