package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Materialization is a `noop`-sink write — every row and column is
  * produced and serialized, so Catalyst cannot shortcut the query the
  * way a bare `.count()` over parquet can (column pruning + row-group
  * metadata). Failures are reported per-query in an `errors` map and
  * as a -1 time, never silently folded into the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen paths once so per-query times measure the
    // query, not first-use classloading.
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(160)
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // BASELINE.md headline micro-bench: polygon query over a ~10k-object
    // H3 index with a 2x2 km query polygon (docs/H3_POLYGON_ANALYSIS.md:
    // 318-319 reports ~50 ms in DuckDB). Index build is excluded (the
    // reference queries a prebuilt warehouse too); measured warm.
    val h3QueryMs: Double =
      try {
        import org.apache.spark.sql.functions._
        val fixture = graft.pipeline.GeoFixture(spark, sfDir)
          .orderBy("fid").limit(10000)
          .repartition(spark.sparkContext.defaultParallelism)
        val fm = graft.pipeline.FieldMapping(Map(
          "source_id" -> "$source_id", "klass" -> "$klass_raw",
          "grupp" -> "b", "typ" -> "b", "leverantor" -> "$lev_raw"))
        val mart = graft.pipeline.Stages.martH3Cells(
          graft.pipeline.Stages.normalizeExtRestr(
            graft.pipeline.Stages.stage004(fixture), fm, "bench"), "bench")
        // right-size partitions: a ~10k-object warehouse is a handful of
        // files, not 32 shuffle partitions of 800 rows each — tiny-query
        // latency is task-count-bound
        val index = graft.pipeline.H3Index.withParentAt(
          graft.pipeline.H3Index.build(spark, Map("bench" -> mart)), 8)
          .coalesce(4).persist()
        index.count() // materialize the warehouse
        val poly =
          "POLYGON ((574000 6450000, 576000 6450000, 576000 6452000, 574000 6452000, 574000 6450000))"
        def once(): Long = graft.pipeline.H3Query
          .objects(spark, index, poly, res = 8).count()
        once() // warm
        val t = System.nanoTime()
        val reps = 5
        (1 to reps).foreach(_ => once())
        (System.nanoTime() - t) / 1e6 / reps
      } catch { case _: Throwable => -1.0 }

    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.4f""" }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_failed":${errors.size},"h3_polygon_query_ms_10k_warm":$h3QueryMs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
