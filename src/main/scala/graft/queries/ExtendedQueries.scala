package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Extended relational surface beyond the reference's inventory
  * (SURVEY §2.8 notes the reference needs no window operator — these
  * are the beyond-parity operators a general analytics engine carries,
  * each DuckDB-oracle-checked). */
object ExtendedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Running windowed aggregates + dense ranking.
    "q25_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      val wr = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("run_spend",
          sum(dec(col("o_totalprice"))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .withColumn("spend_rank", dense_rank().over(wr).cast("long"))
        .select("o_orderkey", "o_custkey", "run_spend", "spend_rank")
        .orderBy("o_custkey", "o_orderkey")
        .limit(2000)
    }),

    // lag(): per-customer days between consecutive orders.
    "q26_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days",
          datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date"))
            .cast("long"))
        .select("o_orderkey", "o_custkey", "gap_days")
        .orderBy("o_custkey", "o_orderkey")
        .limit(2000)
    }),

    // FILTER-style conditional aggregation.
    "q27_filtered_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_quantity") > 25, 1)).as("n_big"),
          count(when(col("l_discount") === 0.0, 1)).as("n_nodisc"),
          sum(when(col("l_linestatus") === "F", dec(col("l_extendedprice")))
            .otherwise(lit(0))).cast("double").as("f_revenue"))
        .orderBy("l_returnflag")
    }),

    // String function battery incl. levenshtein.
    "q28_string_ops" -> ((s, dir) => {
      t(s, dir, "nation")
        .select(
          col("n_nationkey"),
          upper(col("n_name")).as("up"),
          lower(col("n_name")).as("lo"),
          substring(col("n_name"), 1, 3).as("pre"),
          lpad(col("n_name"), 12, ".").as("padded"),
          regexp_replace(col("n_name"), "[AEIOU]", "_").as("devoweled"),
          levenshtein(col("n_name"), lit("SWEDEN")).cast("long").as("lev"),
          length(col("n_name")).cast("long").as("len"))
        .orderBy("n_nationkey")
    }),

    // ROLLUP over two dims (grouping-set machinery).
    "q29_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // Array ops over embeddings: slice + in-order reverse + element ops.
    // Final projection canonicalizes float arrays to scaled-integer
    // strings (floor(x*1e6) is exact IEEE math in both engines) so the
    // driver's pandas oracle can sort/hash the columns; the array ops
    // themselves still run on the raw float arrays.
    "q47_array_ops" -> ((s, dir) => {
      def canon(c: org.apache.spark.sql.Column) =
        concat_ws(",",
          transform(c, x => floor(x.cast("double") * 1000000).cast("string")))
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          canon(slice(col("embedding"), 1, 5)).as("head5"),
          canon(reverse(slice(col("embedding"), 1, 3))).as("rev3"),
          floor(element_at(col("embedding"), 64).cast("double") * 1000000)
            .as("last_elem"),
          canon(sort_array(slice(col("embedding"), 1, 4))).as("sorted4"))
        .orderBy("vec_id")
    }),

    // Regex extraction groups over document text.
    "q48_regexp_extract" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "(\\w+) (\\w+)", 1).as("w1"),
          regexp_extract(col("text"), "(\\w+) (\\w+)", 2).as("w2"),
          size(split(col("text"), "value", -1)).cast("long").minus(1).as("n_value"))
        .orderBy("doc_id")
    }),

    // Date arithmetic: datediff / date_add / truncation / extraction.
    "q49_date_arith" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          datediff(lit("1996-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_96"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          year(col("o_orderdate")).cast("long").as("yy"),
          month(col("o_orderdate")).cast("long").as("mm"),
          dayofmonth(col("o_orderdate")).cast("long").as("dd"))
        .orderBy("o_orderkey")
        .limit(2000)
    }),

    // Heatmap-with-empty-cells left join (h3_polygon_queries.sql:96-104)
    // — rows-only (H3 side not SQL-expressible in the oracle).
    "q69_heatmap_empty" -> ((s, dir) => {
      val idx = s.read.parquet(s"$dir/customer.parquet") // placeholder scan to bind dir
      val _ = idx
      val index = GeoQueriesBridge.index(s, dir)
      val stats = graft.pipeline.H3Query
        .heatmap(s, index, graft.pipeline.GeoFixture.queryPolygonWkt, 8)
        .select("h3_cell", "object_count")
      graft.pipeline.H3Query.heatmapWithEmpty(s, stats,
        graft.pipeline.GeoFixture.queryPolygonWkt, 8)
        .orderBy("h3_cell")
    })
  )

  val oracle: Map[String, String] = Map(
    "q25_window_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend,
        |  CAST(DENSE_RANK() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS spend_rank
        |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 2000""".stripMargin,
    "q26_lead_lag" ->
      """WITH w AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
        |  FROM orders
        |)
        |SELECT o_orderkey, o_custkey,
        |  CAST(date_diff('day', CAST(prev_date AS DATE), CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |FROM w ORDER BY o_custkey, o_orderkey LIMIT 2000""".stripMargin,
    "q27_filtered_agg" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS f_revenue
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q28_string_ops" ->
      """SELECT n_nationkey, UPPER(n_name) AS up, LOWER(n_name) AS lo,
        |  substring(n_name, 1, 3) AS pre, lpad(n_name, 12, '.') AS padded,
        |  REGEXP_REPLACE(n_name, '[AEIOU]', '_', 'g') AS devoweled,
        |  CAST(levenshtein(n_name, 'SWEDEN') AS BIGINT) AS lev,
        |  CAST(length(n_name) AS BIGINT) AS len
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q29_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q47_array_ops" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(embedding[1:5],
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT) AS VARCHAR)), ',') AS head5,
        |  array_to_string(list_transform(list_reverse(embedding[1:3]),
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT) AS VARCHAR)), ',') AS rev3,
        |  CAST(floor(CAST(embedding[64] AS DOUBLE)*1000000) AS BIGINT) AS last_elem,
        |  array_to_string(list_transform(list_sort(embedding[1:4]),
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT) AS VARCHAR)), ',') AS sorted4
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q48_regexp_extract" ->
      """SELECT doc_id,
        |  regexp_extract(text, '(\w+) (\w+)', 1) AS w1,
        |  regexp_extract(text, '(\w+) (\w+)', 2) AS w2,
        |  CAST(len(string_split(text, 'value')) - 1 AS BIGINT) AS n_value
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q49_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS BIGINT) AS days_to_96,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(year(o_orderdate) AS BIGINT) AS yy,
        |  CAST(month(o_orderdate) AS BIGINT) AS mm,
        |  CAST(day(o_orderdate) AS BIGINT) AS dd
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin
  )
}

/** Lets ExtendedQueries reuse GeoQueries' memoized index. */
private[queries] object GeoQueriesBridge {
  def index(s: SparkSession, dir: String): DataFrame =
    GeoQueries.sharedIndex(s, dir)
}
