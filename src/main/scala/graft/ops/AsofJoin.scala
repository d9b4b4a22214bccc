package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join — "for each left row, the latest
  * right row at or before its timestamp, per key" — the standard
  * enrichment join of event pipelines (price-at-trade-time,
  * feature-at-label-time, config-at-event-time).
  *
  * Spark has no ASOF JOIN operator; the naive encodings are a range
  * join (O(n·m) cross-product per key before filtering) or a per-key
  * collect. This is the scalable shape: TAG both sides, UNION them,
  * and carry the last-seen right row forward with a window — ONE
  * shuffle on the key, a per-partition sort, zero row blowup, any key
  * cardinality. At 100 TB the cost is the same as a single
  * groupBy(key) — there is no cheaper lower bound for this semantics.
  *
  * Ties: a right row at exactly left.ts MATCHES (backward-inclusive,
  * the same convention as DuckDB's `ON l.ts >= r.ts` — q107 holds the
  * two engines hash-equal on that convention).
  */
object AsofJoin {

  /** For each row of `left`, attach the `valueCols` of the latest
    * `right` row with `right.ts <= left.ts` and equal `keys`; NULLs
    * when no prior right row exists. Right values come back prefixed
    * (`asof_<col>`), plus `asof_<ts>` = the matched right timestamp.
    *
    * Right rows are carried as ONE non-null struct per row, so right
    * value columns that are legitimately NULL do not make the window
    * reach further back than the true latest row. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, valueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val side = "_asof_side"
    val carry = "_asof_row"
    // naming preconditions (as RangeJoin documents its own): the
    // internal tag/carry columns would be silently overwritten by
    // withColumn, and a left column named like a prefixed output would
    // duplicate in the final projection
    val reserved = Set(side, carry)
    val prefixed = (ts +: valueCols).map(c => s"$prefix$c").toSet
    left.columns.foreach { c =>
      require(!reserved(c), s"left column name '$c' is reserved by asofBackward")
      require(!prefixed(c),
        s"left column '$c' collides with output column '$c' (prefix '$prefix')")
    }
    // the right side's SELECTED columns are just as capable of
    // colliding: a key/ts/value column named like the side tag would
    // be silently overwritten by the withColumn below (data replaced
    // by the constant 0) instead of failing
    (keys ++ (ts +: valueCols)).foreach { c =>
      require(!reserved(c),
        s"right column name '$c' is reserved by asofBackward")
    }
    val l = left.withColumn(side, lit(1))
    // NULL-ts / NULL-key right rows can never match under the DuckDB
    // convention (`l.ts >= r.ts` is never true for NULL; equi-keys drop
    // NULLs) — but the window encoding WOULD match them (ASC NULLS
    // FIRST sorts a null-ts row before everything; partitionBy groups
    // NULL keys). Filter them out so the two semantics stay identical.
    val r = right
      .select((keys :+ ts).map(col) ++ valueCols.map(col): _*)
      .na.drop("any", keys :+ ts)
      .withColumn(side, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right (0) sorts before left (1) at the same ts -> inclusive
    // match. The carried-struct third key makes DUPLICATE right
    // (keys, ts) rows deterministic: last() then always picks the MAX
    // (ts, values) struct among the tied rows instead of whichever
    // task order delivered — the bit-exact-replay convention (left
    // rows carry a NULL third key; their relative order is irrelevant
    // since the carry reads right rows only).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc,
        when(col(side) === 0,
          struct((ts +: valueCols).map(col): _*)).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(carry,
      last(when(col(side) === 0,
        struct((ts +: valueCols).map(col): _*)), ignoreNulls = true).over(w))
    val leftCols = left.columns.toSeq
    carried.filter(col(side) === 1)
      .select(leftCols.map(col) ++
        (ts +: valueCols).map(c => col(s"$carry.$c").as(s"$prefix$c")): _*)
  }
}
