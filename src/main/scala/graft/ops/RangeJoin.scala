package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (interval) join — pairs every left row with the
  * right rows whose timestamp falls in `[l.ts - before, l.ts + after]`.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin (or a
  * cartesian product): O(n·m) comparisons, a non-starter at corpus
  * scale. The scalable encoding is BUCKETIZED EQUI-JOIN: time is cut
  * into fixed buckets, the LEFT side explodes to the buckets its
  * window covers (bounded fan-out: window/bucket + 2), the RIGHT side
  * keys by its single bucket, the equi-join shuffles on (bucket [+
  * keys]) like any hash join, and the exact interval predicate filters
  * the survivors. Each qualifying pair meets in EXACTLY one bucket
  * (the right row's), so no dedup pass is needed. Pick `bucketUs` near
  * the window width: fan-out stays ~2-3 while each bucket holds only
  * rows that can possibly match.
  */
object RangeJoin {

  /** Left/right must share no column names except `keys`. `lts`/`rts`
    * are epoch-microsecond long columns; `beforeUs`/`afterUs` bound the
    * window relative to the left timestamp.
    *
    * INNER semantics only: the LEFT side is the exploded side here,
    * so a left-outer spelling cannot be bolted on (unmatched exploded
    * copies would multiply). For left-outer enrichment write the
    * declarative join and let [[graft.plans.RangeJoinRewrite]] replan
    * it — the rule supports left outer/semi/anti (and TIMESTAMP/DATE
    * points) whenever the exploded bound side is non-preserved.
    *
    * The per-left-row fan-out is `window/bucketUs + 2` exploded rows; a
    * bucket far smaller than the window silently multiplies the left
    * side (bucketUs = window/1000 -> 1000x row blowup before the join —
    * the quiet scale killer this operator exists to avoid), so the
    * ratio is guarded at 64. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lts: String, rts: String, beforeUs: Long, afterUs: Long,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0 && beforeUs >= 0 && afterUs >= 0)
    val fanOut = (beforeUs + afterUs) / bucketUs + 2
    require(fanOut <= 64,
      s"bucketUs=$bucketUs gives ~$fanOut exploded rows per left row for a " +
        s"${beforeUs + afterUs}us window; pick bucketUs near the window " +
        "width (fan-out 2-3) — a tiny bucket multiplies the left side " +
        "before the join")
    // integer `div`, not `/`: SQL division is double, and floor of a
    // ~1e15 epoch divided as double can misbucket at boundaries
    (left.columns ++ right.columns).foreach(c =>
      require(c != "_rj_bucket",
        "column name '_rj_bucket' is reserved by rangeJoin (a " +
          "pre-existing one would be silently overwritten and dropped)"))
    val l = left.withColumn("_rj_bucket",
      explode(sequence(expr(s"($lts - ${beforeUs}L) div ${bucketUs}L"),
        expr(s"($lts + ${afterUs}L) div ${bucketUs}L"))))
    val r = right.withColumn("_rj_bucket", expr(s"$rts div ${bucketUs}L"))
    l.join(r, keys :+ "_rj_bucket")
      .filter(col(rts).between(col(lts) - beforeUs, col(lts) + afterUs))
      .drop("_rj_bucket")
  }
}
