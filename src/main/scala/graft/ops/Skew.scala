package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (builder brief: "salting for skew, AQE for
  * runtime re-plan"). AQE's skew-join handles sort-merge skew
  * automatically; explicit salting remains the tool when the skewed
  * side must hash-join a non-broadcastable dimension (e.g. a hot
  * h3_cell shared by millions of objects joining cell metadata).
  */
object Skew {

  /** Deterministic row salt in [0, saltFactor): a 64-bit hash of ALL
    * the row's columns. Spread comes from the non-key columns (hashing
    * the key ALONE would put every hot-key row in one bucket, so a
    * frame with no non-key column is rejected loudly rather than
    * silently degenerating). Unlike rand(seed), which assigns
    * per-partition and so varies with input partitioning, this depends
    * only on row VALUES: runs are bit-reproducible end-to-end
    * regardless of how the input was split.
    *
    * CONTRACT: rows that are bit-identical across EVERY column land in
    * the same bucket — no value-derived salt can separate true
    * duplicates. If the hot key's rows are mostly duplicates, dedup
    * (or count-compress) before joining; that is cheaper than any salt. */
  private def rowSalt(df: DataFrame, key: String, saltFactor: Int): Column = {
    val others = df.columns.filterNot(_ == key)
    require(others.nonEmpty,
      s"value-derived salting needs at least one non-key column " +
        s"(frame has only '$key'): every hot-key row would land in one " +
        s"salt bucket. Add a disambiguating column or pre-aggregate.")
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*),
      lit(saltFactor.toLong)).cast("int")
  }

  /** Salted inner equi-join: the skewed (big) side gets a deterministic
    * value-derived salt in [0, saltFactor); the small-ish side is
    * replicated saltFactor times. Hot keys spread over saltFactor
    * reducers at the cost of replicating the right side — use when
    * `right` is too big to broadcast but small enough to replicate. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    // saltFactor = 0 would be SILENT data loss, not an error: pmod by
    // zero is NULL under non-ANSI SQL, sequence(0, -1) descends, and
    // the equi-join on (key, NULL) matches nothing
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = left.withColumn("__salt", rowSalt(left, key, saltFactor))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-aware aggregation: partial aggregate on
    * (key, salt), then final aggregate on key — the manual form of
    * map-side combine for high-cardinality-value aggregations (e.g.
    * collect_set over a hot key). `partialAggs` must be re-aggregable
    * by `finalAggs`. */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df
      .withColumn("__salt", rowSalt(df, key, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)

  /** Top-N hot keys of a column — the diagnostic that decides whether
    * salting is needed at all. */
  def hotKeys(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(topN)
}
