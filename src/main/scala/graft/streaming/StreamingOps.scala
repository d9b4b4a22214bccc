package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.pipeline.{H3Config, Stages, FieldMapping}

/** Structured Streaming extension (SURVEY §1.1: the reference is
  * batch-only; this is the engine's incremental path, built on the same
  * stage transforms). Three shapes:
  *
  *  1. windowed event aggregation with watermarking — the streaming
  *     analogue of q40_time_buckets;
  *  2. incremental mart/h3_stats refresh: new raw geodata micro-batches
  *     run through the SAME Stage004→Normalize→MartH3 chain and append
  *     to the mart — at 100 TB this is how the index stays fresh
  *     without re-polyfilling history;
  *  3. stateful sessionization via flatMapGroupsWithState — the q43 gap
  *     sessionizer with per-user state instead of a window over all
  *     history.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts per event type. */
  def windowedEventCounts(events: DataFrame,
      window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Incremental mart maintenance: each micro-batch of raw features is
    * staged/normalized/exploded with the batch transforms and appended
    * to the mart parquet dir — the mart stays a plain table the batch
    * H3Index/H3Query layer reads as-is. */
  def incrementalMart(rawStream: DataFrame, fm: FieldMapping, datasetId: String,
      martPath: String, checkpoint: String,
      h3: H3Config = H3Config()): StreamingQuery =
    rawStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val staged = Stages.stage004(batch, h3)
        val normalized = Stages.normalizeExtRestr(staged, fm, datasetId)
        Stages.martH3Cells(normalized, datasetId)
          .write.mode("append").parquet(martPath)
      }
      .start()

  /** Streaming exact dedup — the incremental-ingest front gate of the
    * corpus pipeline (the streaming analogue of the q32 md5-groupBy
    * batch dedup): each content fingerprint is admitted once within the
    * watermark horizon. dropDuplicatesWithinWatermark keeps the
    * fingerprint state BOUNDED (entries older than the horizon are
    * evicted), so a re-crawl storm of known documents never grows state
    * or re-admits rows — no historical corpus scan per batch. */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(lastTs: Long, sessions: Int)
  final case class SessionUpdate(user_id: Long, n_sessions: Int, n_events: Long)

  /** Gap-based sessionization with keyed state (> gapSeconds of silence
    * starts a new session). State is one (lastTs, count) pair per user —
    * bounded, spill-free at any scale. */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapSeconds: Long = 1800): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"),
      col("ts").cast("timestamp")).as[SessionEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0))
          var n = 0L
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime / 1000
            if (st.lastTs == Long.MinValue || t - st.lastTs > gapSeconds)
              st = SessionState(t, st.sessions + 1)
            else st = SessionState(t, st.sessions)
            n += 1
          }
          state.update(st)
          Iterator(SessionUpdate(user, st.sessions, n))
      }
      .toDF()
  }
}
