package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators (builder brief: 100 TB
  * efficiency levers). Z-ordering clusters rows so that a 2-D
  * predicate (spatial tile, time x key, customer x product) touches a
  * small, contiguous set of files instead of scattering across the
  * whole table — the standard lakehouse locality optimization for
  * min/max-pruned formats like parquet.
  */
object Layout {

  /** Morton (Z-order) interleave of two non-negative ints, `bits` bits
    * each: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Pure codegen'd integer arithmetic (shift/and/add — no UDF), and
    * the SAME closed form replays in ANSI SQL as a sum of
    * `((v >> i) & 1) << p` terms, so layouts are verifiable
    * cross-engine. `bits` <= 31 (result fits a long at 62 bits). */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Z-ordered layout: range-partition by the interleaved key into
    * `numFiles` partitions and sort within each — after a parquet
    * write, every file covers one compact Z-range, so each file's
    * min/max footer stats for BOTH dimensions are tight and a 2-D
    * range predicate prunes to the few files whose Z-curve segment
    * crosses the query box (O(perimeter) of the box in curve
    * segments, not O(table)).
    *
    * One range shuffle (sampled boundaries), one local sort — the
    * exact cost profile of `ORDER BY` writes; no driver-side state.
    * The write itself is the caller's (`.write.parquet(...)`): layout
    * is orthogonal to sink. */
  def zorder(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar, "Using name-based mappings to increase hit rates"
    * (IEEE/ACM ToN 1998): key k lands on argmax over shards of
    * md5(shard # key). The property a mod-N hash cannot give and an
    * incremental warehouse needs: adding (or removing) one shard
    * moves ONLY the keys whose argmax is the new shard — expected
    * 1/(n+1) of them — while EVERY key's shard survives under mod-N
    * growth only if n divides the new count. So a pipeline that
    * shards state by rendezvous re-processes O(1/n) of the corpus on
    * scale-out, not all of it (the q210 battery entry require's the
    * minimal-disruption law in-query).
    *
    * The weight is the md5 HEX STRING compared lexicographically —
    * fixed-width lowercase hex compares monotonically in the value
    * (the hashSplit/mixCorpus convention), so the argmax replays in
    * any engine with md5; ties are impossible short of an md5
    * collision, and the shard name breaks them deterministically
    * anyway (it is part of the compared struct). Pure map over a
    * shard-count-sized literal: no shuffle, no state, streaming-safe.
    * NULL keys get NULL shards (no silent bucket-0 pileup).
    *
    * Cross-engine note: the key is hashed through its STRING form, so
    * replay parity holds for string/integer keys (every engine
    * formats those identically); float keys would need a caller-fixed
    * text form first (formatting differs across engines). */
  def rendezvousShard(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty, "rendezvousShard needs at least one shard")
    require(shards.distinct.size == shards.size,
      s"duplicate shard names: ${shards.mkString(",")}")
    val cands = shards.map { sh =>
      struct(
        md5(concat(lit(sh), lit("#"), key.cast("string")).cast("binary"))
          .as("w"),
        lit(sh).as("s"))
    }
    when(key.isNotNull,
      array_max(array(cands: _*)).getField("s"))
  }

  /** [[rendezvousShard]] over a frame: returns `df` with a `shard`
    * column. */
  def rendezvousAssign(df: DataFrame, keyCol: String,
      shards: Seq[String]): DataFrame =
    df.withColumn("shard", rendezvousShard(col(keyCol), shards))
}
