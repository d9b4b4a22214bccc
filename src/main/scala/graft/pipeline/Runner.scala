package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.util.{Failure, Success, Try}

import graft.config.DatasetConfig
import graft.sources.{SourceConnector, Sources}

/** Batch pipeline runner (`src/g_etl/pipeline.py` + `services/
  * pipeline_runner.py`, SURVEY §3.1): Extract (parallel) -> per-dataset
  * Transform chain (parallel) -> merge-by-union -> post-merge
  * h3_index/h3_stats views.
  *
  * Parallelism mapping: the reference's per-dataset temp-DuckDB files +
  * thread semaphores (ncpu extract, ncpu/2 transform;
  * `settings.py:89-90`) become concurrent Spark job submission from a
  * driver thread pool — Spark schedules partition-level parallelism
  * inside each job, dataset-level concurrency comes from submitting
  * jobs in parallel. "Merge" (ATTACH + copy, pipeline_runner.py:968-
  * 1065) dissolves into reading the per-dataset parquet dirs and
  * unioning lazily.
  */
object Runner {

  final case class RunResult(
      extracted: Map[String, Try[Long]],
      transformed: Map[String, Try[Long]],
      indexRows: Long,
      statsRows: Long)

  def run(spark: SparkSession, datasets: Seq[DatasetConfig],
      registry: Map[String, SourceConnector], outDir: String,
      extractParallelism: Int = Runtime.getRuntime.availableProcessors(),
      transformParallelism: Int =
        math.max(2, Runtime.getRuntime.availableProcessors() / 2),
      ledger: Option[Ledger] = None): RunResult = {

    // ---- Extract (parallel, semaphore = ncpu)
    val extracted = parallel(datasets, extractParallelism) { cfg =>
      val rawPath = s"$outDir/raw/${cfg.datasetId}.parquet"
      val version = s"extract:${cfg.datasetId}"
      val stamp = s"${cfg.plugin}|${cfg.url}"
      if (ledger.exists(_.isApplied(version, stamp))) {
        spark.read.parquet(rawPath).count()
      } else {
        val connector = registry.getOrElse(cfg.plugin,
          throw new IllegalArgumentException(s"unknown plugin: ${cfg.plugin}"))
        val df = connector.read(spark, Map("url" -> cfg.url))
        df.write.mode("overwrite").option("compression", "zstd").parquet(rawPath)
        ledger.foreach(_.record(version, stamp))
        spark.read.parquet(rawPath).count()
      }
    }

    // ---- Transform (parallel, semaphore = max(2, ncpu/2))
    val okDatasets = datasets.filter(d => extracted(d.datasetId).isSuccess)
    val transformed = parallel(okDatasets, transformParallelism) { cfg =>
      val raw = Sources.normalizeGeometryColumn(
        spark.read.parquet(s"$outDir/raw/${cfg.datasetId}.parquet"))
      val staged = Stages.stage004(raw, cfg.h3)
      staged.write.mode("overwrite")
        .parquet(s"$outDir/staging_004/${cfg.datasetId}.parquet")
      val stagedBack =
        spark.read.parquet(s"$outDir/staging_004/${cfg.datasetId}.parquet")
      val normalized = cfg.pipeline match {
        case "avdelning" =>
          Stages.normalizeAvdelning(stagedBack, cfg.fieldMapping, cfg.datasetId)
        case _ =>
          Stages.normalizeExtRestr(stagedBack, cfg.fieldMapping, cfg.datasetId)
      }
      normalized.write.mode("overwrite")
        .parquet(s"$outDir/staging_${cfg.pipeline}_001/${cfg.datasetId}.parquet")
      val normBack = spark.read.parquet(
        s"$outDir/staging_${cfg.pipeline}_001/${cfg.datasetId}.parquet")
      val mart = Stages.martH3Cells(normBack, cfg.datasetId)
      // the measured probe-optimal layout IS the default (PERF.md r10:
      // clustered parquet probes flat at 116M rows; a cached
      // unclustered index goes linear past ~40M): materialized
      // query-res ancestor + range-clustered rows
      H3Index.writeClustered(mart,
        s"$outDir/mart/${cfg.datasetId}_h3.parquet")
      Stages.martH3Compact(normBack).write.mode("overwrite")
        .parquet(s"$outDir/mart/${cfg.datasetId}_h3_compact.parquet")
      spark.read.parquet(s"$outDir/mart/${cfg.datasetId}_h3.parquet").count()
    }

    // ---- layered-schema catalog: one temp view per (schema, dataset)
    // (`raw` -> `staging_004` -> `staging_{pipeline}_001` -> `mart`,
    // docs/architecture.md:233-275)
    okDatasets.filter(d => transformed(d.datasetId).isSuccess).foreach { d =>
      spark.read.parquet(s"$outDir/raw/${d.datasetId}.parquet")
        .createOrReplaceTempView(s"raw_${d.datasetId}")
      spark.read.parquet(s"$outDir/staging_004/${d.datasetId}.parquet")
        .createOrReplaceTempView(s"staging_004_${d.datasetId}")
      spark.read.parquet(s"$outDir/staging_${d.pipeline}_001/${d.datasetId}.parquet")
        .createOrReplaceTempView(s"staging_${d.pipeline}_001_${d.datasetId}")
      spark.read.parquet(s"$outDir/mart/${d.datasetId}_h3.parquet")
        .createOrReplaceTempView(s"mart_${d.datasetId}_h3")
    }

    // ---- Merge + post-merge: dynamic union view + stats pre-aggregate
    val marts = okDatasets
      .filter(d => transformed(d.datasetId).isSuccess)
      .map { d =>
        d.datasetId ->
          spark.read.parquet(s"$outDir/mart/${d.datasetId}_h3.parquet")
      }.toMap
    val index = H3Index.build(spark, marts)
    index.createOrReplaceTempView("h3_index")
    val stats = H3Index.stats(index)
    stats.write.mode("overwrite").parquet(s"$outDir/mart/h3_stats.parquet")
    val statsBack = spark.read.parquet(s"$outDir/mart/h3_stats.parquet")
    statsBack.createOrReplaceTempView("h3_stats")

    RunResult(extracted, transformed, index.count(), statsBack.count())
  }

  private def parallel[A](items: Seq[DatasetConfig], parallelism: Int)(
      f: DatasetConfig => A): Map[String, Try[A]] = {
    val pool = Executors.newFixedThreadPool(math.max(parallelism, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = items.map(cfg => cfg.datasetId -> Future(Try(f(cfg))))
      futures.map { case (id, fut) =>
        id -> Await.result(fut, 30.minutes)
      }.toMap
    } finally pool.shutdown()
  }
}
