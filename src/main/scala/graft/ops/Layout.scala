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
    * text form first (formatting differs across engines).
    *
    * COST/INTENDED RANGE: the argmax computes `shards.size` md5s per
    * row — right for the dozens-to-low-hundreds of shards a state
    * warehouse actually runs (at 100 shards that is ~100 16-byte
    * hashes per row, noise next to any I/O), and linear pain past
    * that. For fleet-scale shard counts (thousands+), use
    * [[rendezvousShard2]]: the two-level composition computes
    * O(groups + members) hashes per row — O(2·sqrt(n)) at a balanced
    * layout — and confines member churn to one group. */
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

  /** TWO-LEVEL rendezvous sharding for fleet-scale shard counts: HRW
    * over group names picks the group, HRW over that group's member
    * names picks the member — returned as `"group/member"`. Per-row
    * cost drops from n md5s (flat) to groups + chosen-group-members
    * (the CaseWhen evaluates only the selected branch), O(2·sqrt(n))
    * balanced; with 64 groups x 64 members that is 128 hashes for
    * 4,096 shards where flat HRW pays 4,096.
    *
    * Distribution: the group pick is uniform over groups and each
    * member pick uniform within its group (independent md5 argmaxes),
    * so a balanced layout is uniform over all n shards — same as flat
    * HRW (spec-pinned against the flat assignment's distribution on
    * the same 16 shards). Disruption is LEVEL-WISE minimal, and
    * strictly better-contained than flat on member churn: adding a
    * member to group X relocates ~1/(m+1) of X's OWN keys and — by
    * construction, not just in expectation — zero keys of any other
    * group (flat HRW moves an expected 1/(n+1) sliver of EVERY
    * shard); adding a whole group relocates ~1/(g+1) of all keys,
    * drawn evenly from everywhere, exactly like flat growth. The
    * trade: a group-level change redraws its keys' member assignment
    * (the member pick is conditioned on the group), which flat HRW
    * would not — so grow by members for routine scale-out and add
    * groups only at fleet-expansion granularity. NULL keys get NULL
    * shards, like the flat form. */
  def rendezvousShard2(key: Column,
      groups: Seq[(String, Seq[String])]): Column = {
    require(groups.nonEmpty, "rendezvousShard2 needs at least one group")
    require(groups.map(_._1).distinct.size == groups.size,
      s"duplicate group names: ${groups.map(_._1).mkString(",")}")
    groups.foreach { case (g, ms) =>
      require(ms.nonEmpty, s"group '$g' has no members")
      require(ms.distinct.size == ms.size,
        s"group '$g' has duplicate members: ${ms.mkString(",")}")
      require(!g.contains("/"),
        s"group name '$g' contains the '/' separator")
    }
    val groupPick = rendezvousShard(key, groups.map(_._1))
    groups.foldLeft(lit(null).cast("string")) {
      case (acc, (g, ms)) =>
        when(groupPick === g,
          concat(lit(g), lit("/"), rendezvousShard(key, ms)))
          .otherwise(acc)
    }
  }
}
