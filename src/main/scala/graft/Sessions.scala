package graft

import org.apache.spark.sql.SparkSession

/** Shared local-session builder for every engine main (Bench, Verify,
  * the Profile* diagnostics) — r19 VERDICT What's-wrong #1 / Next #4.
  *
  * The one ENGINE-LEVEL setting that lived only in Bench's session is
  * `spark.sql.maxPlanStringLength`: every action renders its physical
  * plan into the SQLExecutionStart/AQE plan-update listener events even
  * with the UI disabled (r20 jstack: the driver main thread sits in
  * `AdaptiveSparkPlanExec.onUpdatePlan -> QueryExecution.explainString
  * -> generateTreeString` between jobs), and the incremental-state
  * entries' plans (persisted segment unions, InMemoryRelations with
  * statistics) render MEGABYTES, ~48 times per query. The cost is
  * scale-INDEPENDENT — it tracks plan size, not data size — so a
  * production service pays it exactly like the bench did. Capping at
  * 16 KiB (env-overridable via SPARK_GRAFT_MAX_PLAN_STR) bounds the
  * pathological renders while keeping every in-battery plan REQUIRE
  * (H3/range-join pin patterns sit in the first few KiB) intact —
  * the full battery validates them under this cap since r19.
  *
  * Everything else here is the common local-mode contract the mains
  * already shared: master from $SPARK_GRAFT_CPUS (the driver re-runs
  * the bench at a lower core count to measure scaling — never hardcode
  * the master), shuffle partitions = cores (AQE coalesces upward at
  * real scale), UTC, UI off.
  */
object Sessions {

  /** Default plan-string cap (bytes of rendered plan text). */
  val DefaultMaxPlanString = "16384"

  def maxPlanString: String =
    sys.env.getOrElse("SPARK_GRAFT_MAX_PLAN_STR", DefaultMaxPlanString)

  /** The shared builder: local[cpus] with the engine-wide confs. The
    * caller appends app-specific settings (appName, extra confs) and
    * calls getOrCreate(). */
  def localBuilder(appName: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", maxPlanString)
}
