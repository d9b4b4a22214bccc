package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the co-located-join lever for keys that are
  * too big to broadcast (builder brief: "broadcast() for small dims,
  * repartition()/bucketing for co-located joins").
  *
  * At 100 TB the h3 index and the mart are both huge and both keyed by
  * `h3_cell`; every index⋈mart join or per-cell aggregation re-shuffles
  * hundreds of TB UNLESS the tables are written pre-hashed. A bucketed
  * write pays ONE shuffle at write time; after that, every equi-join
  * between co-bucketed tables and every groupBy on the bucket key reads
  * the co-located files with ZERO exchange (BucketedSpec pins this on
  * the physical plan). This is the write-once/query-many trade the
  * reference makes with its covering H3 index, applied to Spark's
  * storage layer.
  */
object Bucketed {

  /** Write `df` as a managed parquet table bucketed+sorted by `key`.
    * One shuffle now; no shuffle on any future `key` join/agg. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // an in-memory catalog forgets tables across JVMs but the managed
    // location survives in storage and blocks the next CTAS — clear it.
    // The location comes from the CATALOG's own default-path rule (so
    // current-database and db-qualified names resolve to <db>.db/<t>,
    // not a guessed <warehouse>/<t>) and is deleted through Hadoop's
    // FileSystem so file:, hdfs: and s3a: warehouses behave identically.
    val loc = new org.apache.hadoop.fs.Path(
      org.apache.spark.sql.graftbridge.Bridge.defaultTablePath(spark, table))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket key. The plan
    * must contain no ShuffleExchange on either side — both relations
    * report the same HashPartitioning(key, buckets) from the files. */
  def joinCoBucketed(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
