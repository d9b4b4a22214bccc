package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access over the driver-provided parquet dirs (TESTDATA.md).
  *
  * Mirrors the reference's layered-catalog idea (SURVEY.md §1.1,
  * reference `src/g_etl/services/pipeline_runner.py:1010-1047`) in the
  * Spark-native way: parquet dirs are the storage layer, DataFrames are
  * the (lazy) views.
  */
object Tables {
  // TESTDATA.md documents the 8 TPC-H-ish tables; `documents` and
  // `embeddings` also exist on disk at every scale factor (confirmed
  // by the round-1 advisor) and carry the text/vector operator suites.
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for the spark.sql surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
