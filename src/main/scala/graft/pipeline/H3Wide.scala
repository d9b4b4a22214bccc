package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide/hybrid H3 layouts from the reference's capacity analysis
  * (`docs/tasks.md:28-147`): the long EAV index (one row per
  * cell x object) pivots into per-cell wide rows — `MAX(CASE WHEN
  * klass='x' THEN 1 END)` columns — trading ~95% NULL sparsity for
  * 5-30x fewer rows and 0.5-2 s queries. The hybrid recommendation
  * (a handful of ~20-column tables) is `build` called once per
  * klass-group.
  */
object H3Wide {

  /** Long -> wide: one row per h3_cell, one presence/count column per
    * klass value. Distinct klass values must be enumerable (the
    * reference's design caps them at ~100 columns). */
  def build(index: DataFrame, klassValues: Seq[String]): DataFrame = {
    require(klassValues.nonEmpty, "need at least one klass column")
    val presence = klassValues.map(k =>
      max(when(col("klass") === k, 1).otherwise(0))
        .as(columnName(k)))
    val counts = klassValues.map(k =>
      sum(when(col("klass") === k, 1).otherwise(0)).cast("long")
        .as(columnName(k) + "_n"))
    index
      .groupBy("h3_cell")
      .agg((presence ++ counts).head, (presence ++ counts).tail: _*)
  }

  /** Discover the klass values (driver-side, bounded). */
  def klassValuesOf(index: DataFrame, max: Int = 100): Seq[String] = {
    val vals = index.select("klass").distinct().limit(max + 1)
      .collect().map(_.getString(0)).filter(_ != null).sorted.toSeq
    require(vals.size <= max,
      s"more than $max distinct klass values — use the hybrid split")
    vals
  }

  private def columnName(k: String): String =
    "k_" + k.toLowerCase.replaceAll("[^a-z0-9]+", "_").take(40)
}
