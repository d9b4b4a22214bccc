package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

import graft.functions.{GeoExpr, GFunctions}
import graft.h3.H3Core
import graft.spatial.{Crs, Geometry, Pt}

/** Mutable driver-side parameter for a prepared plan. Plain Java
  * serialization snapshots `current` at task-serialization time, and
  * Spark re-serializes the task binary on every job submission — so
  * each execution of the one prepared plan ships the CURRENT cell set
  * to executors, exactly the re-broadcast-a-variable pattern, without
  * building a new Dataset (≈300-400 ms fixed planning cost) per
  * polygon. */
final class CellSetHolder extends Serializable {
  // Long keys (the index is long-keyed): the hot probe is one boxed
  // HashSet lookup per row — no string materialization at all
  private var current: java.util.HashSet[java.lang.Long] =
    new java.util.HashSet
  def set(cells: Iterable[Long]): Unit = {
    val s = new java.util.HashSet[java.lang.Long]()
    cells.foreach(c => s.add(java.lang.Long.valueOf(c)))
    current = s
  }
  def containsCell(c: Long): Boolean =
    current.contains(java.lang.Long.valueOf(c))
  def size: Int = current.size
}

/** cell ∈ holder — deterministic=false so Catalyst never folds or
  * migrates it out of the Filter (its value legitimately changes
  * between executions of the same plan). */
case class ParamCellsContains(cell: Expression, holder: CellSetHolder)
    extends GeoExpr {
  override def children: Seq[Expression] = Seq(cell)
  override def dataType: DataType = BooleanType
  override lazy val deterministic: Boolean = false
  // direct eval: no argument-array boxing, no UTF8String->String copy —
  // this runs once per index row per query
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = cell.eval(input)
    if (v == null) null
    else java.lang.Boolean.valueOf(
      holder.containsCell(v.asInstanceOf[java.lang.Long].longValue))
  }
  // generated-code path (GeoExpr.doGenCode -> evalBoxed): same probe.
  // The codegen references array is re-serialized per job submission,
  // so `holder`'s CURRENT set still ships with every execution.
  override protected def evalNotNull(a: Array[Any]): Any =
    java.lang.Boolean.valueOf(
      holder.containsCell(a(0).asInstanceOf[java.lang.Long].longValue))
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(cell = c(0))
}

/** Interactive polygon-query handle: ONE analyzed+planned Dataset
  * serves every future polygon (`src/g_etl/h3_query.py:18-119` serves
  * arbitrary polygons per session the same way — one prepared DuckDB
  * relation, new parameters).
  *
  * SCALE ENVELOPE (measured, ProfileScale r9): each execution SCANS
  * the cached index — a runtime parameter cannot drive batch/row-group
  * pruning, so per-probe latency is linear in index size with a small
  * constant (~130M rows/s: 48 ms at 2.7M rows, 225 ms at 40M). This
  * is the right tool for hot repeated probes on a warehouse slice; for
  * arbitrary polygons over a BIG index, plan per query instead
  * (H3Query.objects) — the literal cell range reaches the scan, where
  * parquet row-group stats (or cached-batch stats) prune to the
  * polygon, and total latency stays at the ~0.3-0.5 s planning floor
  * at ANY index size.
  *
  * Correct-by-construction re-execution: the prepared plan is a pure
  * scan+filter+project — no shuffle below the collect and no broadcast
  * of the parameter side — so nothing in Spark's stage/broadcast reuse
  * machinery can serve stale results when the cell set changes; the
  * small distinct+sort runs on the driver over the (interactive-sized)
  * match set, mirroring the reference returning a result table to the
  * UI. */
final class PreparedPolygonQuery private[pipeline] (
    index: DataFrame, res: Int) {

  private val holder = new CellSetHolder

  private val plan: DataFrame = {
    val parentCol = s"h3_parent_$res"
    val keyed =
      if (index.columns.contains(parentCol)) col(parentCol)
      else GFunctions.h3_cell_to_parent(col("h3_cell"), lit(res))
    index
      .filter(toCol(ParamCellsContains(toExpr(keyed), holder)))
      .select(col("id"), col("dataset_id"), col("leverantor"), col("klass"))
  }

  /** Equivalent of H3Query.objects for a new polygon: distinct matching
    * objects with stable ordering. */
  def objects(wktSweref: String): Array[Row] = {
    holder.set(PreparedPolygonQuery.cellIds(wktSweref, res))
    plan.collect()
      .distinct
      .sortBy(r => (r.getString(1), r.getString(0)))
  }
}

object PreparedPolygonQuery {

  def apply(index: DataFrame, res: Int = H3Query.DefaultQueryRes): PreparedPolygonQuery =
    new PreparedPolygonQuery(index, res)

  /** Driver-side polyfill of a SWEREF99 polygon at `res`, as raw ids. */
  def cellIds(wktSweref: String, res: Int): Array[Long] = {
    val wgs = Geometry.mapCoords(Geometry.fromWkt(wktSweref), p => {
      val (lat, lng) = Crs.swerefToWgs84(p.x, p.y)
      Pt(lng, lat)
    })
    H3Core.polygonToCells(wgs, res)
  }

  /** Hex form of [[cellIds]] — the export/SQL-surface representation. */
  def cellStrings(wktSweref: String, res: Int): Array[String] =
    cellIds(wktSweref, res).map(H3Core.toHexString)
}
