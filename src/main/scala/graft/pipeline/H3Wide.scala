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

  // ------------------------------------------------------ hybrid layout

  /** The reference's RECOMMENDED production layout (`docs/tasks.md:
    * 28-147`, never implemented there): a handful of per-CATEGORY wide
    * tables (~20 presence/count columns each) instead of one 100-column
    * monolith or the 5-10e9-row long EAV index. Each category table
    * holds only the cells with >=1 row of that category — DuckDB/parquet
    * columnar NULL-compression reasoning carried over: sparse cells
    * simply don't exist in the table, and a category query is ONE
    * narrow-table scan instead of a pivot over the long index
    * (tasks.md's estimate: 0.5-2 s hybrid vs 5-30 s long at 50-100M
    * cells).
    *
    * Returns category -> per-cell wide frame: the category's presence/
    * count columns exactly as [[build]] names them, plus an `n_<cat>`
    * total-rows column (the reference's `antal_restriktioner`).
    *
    * 100 TB shape: each table is one hash aggregate over the index rows
    * of ITS category (the `klass isin` filter prunes before the
    * shuffle); tables are independent jobs, and each output is keyed by
    * h3_cell — written `bucketBy(h3_cell)` the cross-category joins
    * below are exchange-free. */
  def hybrid(index: DataFrame, groups: Map[String, Seq[String]])
      : Map[String, DataFrame] = {
    require(groups.nonEmpty && groups.values.forall(_.nonEmpty),
      "hybrid split needs at least one non-empty category")
    val overlap = groups.values.flatten.toSeq
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(overlap.isEmpty,
      s"klass values in multiple categories: ${overlap.mkString(",")}")
    groups.map { case (cat, klasses) =>
      val presence = klasses.map(k =>
        max(when(col("klass") === k, 1).otherwise(0)).as(columnName(k)))
      val counts = klasses.map(k =>
        sum(when(col("klass") === k, 1).otherwise(0)).cast("long")
          .as(columnName(k) + "_n"))
      val catTotal = Seq(count(lit(1)).as("n_" + tableName(cat)))
      cat -> index
        .filter(col("klass").isin(klasses: _*))
        .groupBy("h3_cell")
        .agg((presence ++ counts ++ catTotal).head,
          (presence ++ counts ++ catTotal).tail: _*)
    }
  }

  /** Tables needed to answer a klass set, or None when some requested
    * klass is not materialized in any category (-> long-index fallback).
    * Single category = single narrow scan; spanning categories = join of
    * exactly those tables. */
  def route(groups: Map[String, Seq[String]], requested: Set[String])
      : Option[Seq[String]] = {
    val covering = requested.toSeq.map(k =>
      groups.find(_._2.contains(k)).map(_._1))
    if (covering.exists(_.isEmpty)) None
    else Some(covering.flatten.distinct.sorted)
  }

  /** Router entry: answer `requested` from the hybrid tables when they
    * cover it (1 category = the table itself; several = full-outer join
    * on h3_cell with absent-category cells coalesced to zero), else
    * fall back to pivoting the long index. Result schema is identical
    * on every path: h3_cell, then presence + count columns for
    * `requested` in the given order — and identical to
    * `build(index.filter(klass in requested), requested)`, the
    * long-layout ground truth the q169 driver oracle pins. */
  def routed(index: DataFrame, tables: Map[String, DataFrame],
      groups: Map[String, Seq[String]], requested: Seq[String]): DataFrame =
    route(groups, requested.toSet) match {
      case None =>
        build(index.filter(col("klass").isin(requested: _*)), requested)
      case Some(cats) =>
        val joined = cats.map(tables(_))
          .reduce(_.join(_, Seq("h3_cell"), "full_outer"))
        // presences then counts — the same column order build() emits,
        // so both router paths return byte-identical schemas
        val pres = requested.map(k =>
          coalesce(col(columnName(k)), lit(0)).as(columnName(k)))
        val cnts = requested.map(k =>
          coalesce(col(columnName(k) + "_n"), lit(0L))
            .as(columnName(k) + "_n"))
        // a category table holds every cell with >=1 row of the
        // CATEGORY; the request's contract (matching the long-layout
        // pivot of the requested slice) is cells with >=1 row of a
        // REQUESTED klass — drop the all-zero remainder
        joined.select(col("h3_cell") +: (pres ++ cnts): _*)
          .filter(requested.map(k => col(columnName(k))).reduce(_ + _) > 0)
    }

  /** Reassemble the FULL wide row from the hybrid tables — the identity
    * that makes the split safe: assemble(hybrid(idx, groups)) must equal
    * build(idx, all klasses) exactly (sparse cells re-densified to
    * zeros). Presence columns first, then counts, matching [[build]]'s
    * column order. */
  def assemble(tables: Map[String, DataFrame],
      groups: Map[String, Seq[String]]): DataFrame = {
    val klasses = groups.values.flatten.toSeq.sorted
    val joined = groups.keys.toSeq.sorted.map(tables(_))
      .reduce(_.join(_, Seq("h3_cell"), "full_outer"))
    val presence = klasses.map(k =>
      coalesce(col(columnName(k)), lit(0)).as(columnName(k)))
    val counts = klasses.map(k =>
      coalesce(col(columnName(k) + "_n"), lit(0L)).as(columnName(k) + "_n"))
    joined.select(col("h3_cell") +: (presence ++ counts): _*)
  }

  /** Deterministic category split when no domain knowledge exists:
    * round-robin over the sorted klass values into `n` categories —
    * every klass lands in exactly one category, categories stay
    * balanced, and the assignment is stable across runs. */
  def defaultGroups(klasses: Seq[String], n: Int = 2)
      : Map[String, Seq[String]] = {
    require(n >= 1 && klasses.nonEmpty, "need >=1 category and >=1 klass")
    klasses.sorted.zipWithIndex
      .groupBy { case (_, i) => s"cat_${(i % n) + 1}" }
      .view.mapValues(_.map(_._1)).toMap
  }

  private def columnName(k: String): String =
    "k_" + k.toLowerCase.replaceAll("[^a-z0-9]+", "_").take(40)

  private def tableName(cat: String): String =
    cat.toLowerCase.replaceAll("[^a-z0-9]+", "_").take(40)
}
