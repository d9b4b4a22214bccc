package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive parallel read of the battery's parquet inputs.
  *
  * The sf fixtures ship as ONE parquet file with one row group per
  * table, so a bare `read.parquet` plans a single scan partition and
  * every map-heavy stage rooted at it (per-character anchor explodes,
  * bigram explodes, per-dimension vector unnests) runs on ONE core of
  * the whole machine until the first exchange — the classic
  * unsplittable-input skew of the optimization guide (§2.5 "one huge
  * unsplittable file … otherwise repartition immediately after the
  * read"; measured r19: the q228 bigram build ran 12 s in one task at
  * sf0.1 with 31 cores idle).
  *
  * The fix is layout-adaptive, not a constant: when the scan already
  * plans at least the session's default parallelism (the warehouse
  * case — many files / row groups), the read is returned UNCHANGED and
  * no exchange is added; only a scan narrower than the core count gets
  * one round-robin repartition right after the read. The decision is
  * memoized per (session, path, parallelism) so repeated per-query
  * constructions don't re-plan the probe scan.
  *
  * Determinism: round-robin repartition sorts partitions locally
  * before assignment (spark.sql.execution.sortBeforeRepartition,
  * default true — SPARK-23207), so the row-to-partition assignment is
  * reproducible across retries; every battery operator is
  * partitioning-independent by construction (the driver's oracle
  * hash-checks sorted rows).
  */
private[graft] object Inputs {

  private val narrowScan =
    scala.collection.concurrent.TrieMap[(Int, String, Int), Boolean]()

  def parquet(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val p = s.sparkContext.defaultParallelism
    val narrow = narrowScan.getOrElseUpdate(
      (System.identityHashCode(s), path, p),
      df.rdd.getNumPartitions < p)
    if (narrow) df.repartition(p) else df
  }
}
