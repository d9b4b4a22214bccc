package graft.ops

import org.apache.spark.sql.DataFrame

/** Mid-operator materialization seam, shared by the operators that must
  * evaluate a map-only stage once while feeding it to several plan
  * consumers (banded self-joins, removal/append seams): broadcast and
  * shuffle exchanges never unify under Spark's exchange reuse, so
  * without a materialization the stage re-executes per consumer.
  *
  * The DEFAULT is `localCheckpoint(eager = false)` — cheapest, no
  * configuration — but it truncates lineage onto executor-local blocks:
  * losing an executor then FAILS the job instead of recomputing, and
  * the blocks free only when the driver GCs the checkpointed RDD. A
  * long-running service can opt out per session via
  * `spark.graft.stage.mode`:
  *
  *  - `localCheckpoint` (default): lazy executor-local blocks, GC-freed.
  *  - `persist`: MEMORY_AND_DISK cache — lineage kept (fault-tolerant:
  *    lost blocks recompute), evictable under memory pressure, and
  *    releasable explicitly (`spark.catalog.clearCache()` or holding
  *    the returned frame and calling `unpersist`).
  *  - `checkpoint`: reliable checkpoint to `spark.checkpoint.dir`
  *    (must be set) — fault-tolerant across executor loss, freed by
  *    deleting the checkpoint dir.
  *  - `none`: no materialization; consumers recompute the stage
  *    (correct, possibly slower — the measurement knob).
  */
object Materialize {

  val ConfKey = "spark.graft.stage.mode"

  private[graft] def stage(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).getOrElse("localCheckpoint") match {
      case "localCheckpoint" => df.localCheckpoint(false)
      case "persist" =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case "checkpoint" => df.checkpoint(false)
      case "none" => df
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be localCheckpoint|persist|checkpoint|none, got '$other'")
    }
}
