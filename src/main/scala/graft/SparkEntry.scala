package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the operator inventory modules; every key has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (those get the driver's rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The multi-way broadcast star join — the plan shape the whole engine
    * is built around (small dims broadcast, fact side never shuffles
    * before aggregation). */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      TextQueries.queries ++
      VectorQueries.queries ++
      EventQueries.queries ++
      GeoQueries.queries ++
      DedupQueries.queries ++
      ExtendedQueries.queries ++
      PipelineQueries.queries ++
      SourceSinkQueries.queries ++
      ConsistencyQueries.queries ++
      ConsistencyQueries2.queries ++
      LiveSourceQueries.queries ++
      SurfaceQueries.queries ++
      CorpusQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      TextQueries.oracle ++
      VectorQueries.oracle ++
      EventQueries.oracle ++
      GeoQueries.oracle ++
      DedupQueries.oracle ++
      ExtendedQueries.oracle ++
      PipelineQueries.oracle ++
      SourceSinkQueries.oracle ++
      ConsistencyQueries.oracle ++
      ConsistencyQueries2.oracle ++
      LiveSourceQueries.oracle ++
      SurfaceQueries.oracle ++
      CorpusQueries.oracle
}
