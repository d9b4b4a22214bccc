package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory (SURVEY.md §2.3/§2.6/§2.7/§2.9/§2.10).
  *
  * Each entry mirrors an operator shape the reference engine executes in
  * DuckDB SQL (citations inline), re-expressed as a declarative Spark plan
  * so Catalyst handles pushdown/pruning/join planning. Conventions that
  * keep the DuckDB oracle hash-stable:
  *   - money/quantity sums go through DECIMAL(18,2) (exact, order-
  *     independent) and are cast back to DOUBLE at the end;
  *   - every result has a total ORDER BY;
  *   - every computed column is aliased identically in Spark and SQL.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal view of a double money/qty column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.7 hash aggregate over two grouping keys; mirrors the reference's
    // h3_stats-style GROUP BY (services/pipeline_runner.py:1144-1153).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.3 predicate pushdown to the parquet scan (filters reach
    // PushedFilters; verified via .explain in RelationalSpec).
    "q02_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"))
    }),

    // §2.3 `SELECT * EXCLUDE (...)` → drop (reference 004:31).
    "q03_project_exclude" -> ((s, dir) => {
      t(s, dir, "part")
        .drop("p_retailprice", "p_size")
        .orderBy("p_partkey")
    }),

    // §2.3 IN-list predicate (h3_query.py:100-103 dataset filter).
    "q04_isin_filter" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    // §2.3 CASE dispatch (mirrors geometry-type dispatch, 004:50-58).
    "q05_case_dispatch" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("size_class",
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large"))
        .groupBy("size_class")
        .agg(count(lit(1)).as("n_parts"),
          sum(dec(col("p_retailprice"))).cast("double").as("sum_price"))
        .orderBy("size_class")
    }),

    // §2.3 config-driven computed columns: `$col` →
    // COALESCE(col::VARCHAR,''), literal → 'v' (sql_generator.py:399-440).
    "q06_computed_cols" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          coalesce(col("c_name").cast("string"), lit("")).as("name_norm"),
          lit("tpch").as("source_lit"),
          coalesce(col("c_nationkey").cast("string"), lit("")).as("nation_str"))
        .orderBy("c_custkey")
    }),

    // §2.3 classification concat: COALESCE(NULLIF(x,''),'-') || '.' || ...
    // (aab_ext_restr/002:16).
    "q07_classification" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("classification",
          concat_ws(".",
            coalesce(nullif(col("p_brand"), lit("")), lit("-")),
            coalesce(nullif(col("p_type"), lit("")), lit("-"))))
        .groupBy("classification")
        .agg(count(lit(1)).as("n"))
        .orderBy("classification")
    }),

    // §2.3 round(TRY_CAST(x AS FLOAT),2) (aaa_avdelning/001:18-19) and
    // g_area_ha = area/10000 (003_db_makros.sql:32).
    "q08_round_trycast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice").cast("double") / 10000, 2).as("area_ha"),
          round(col("l_quantity").cast("double"), 1).as("qty_r"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.6 broadcast equi-join small dim × big fact (h3_query.py:116 uses
    // the same shape: tiny query-cell side × exploded index).
    "q09_join_broadcast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy("p_brand")
    }),

    // §2.6 left join keeping unmatched rows (heatmap left join vs
    // h3_stats, sql/examples/h3_polygon_queries.sql:100).
    "q10_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec(col("o_totalprice"))).cast("double"), lit(0.0))
            .as("sum_spent"))
        .orderBy("c_custkey")
    }),

    // §2.6 left-semi join — the reference's DISTINCT-after-join at
    // h3_query.py:109-118 is semantically this.
    "q11_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // §2.6 anti join (customers with no orders).
    // The synthetic orders table covers every customer, so the right
    // side deterministically drops one custkey residue class — the anti
    // join then returns real orphans instead of passing vacuously on an
    // empty result.
    "q12_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_custkey") % 100 =!= 7)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.6 multi-way star join with small dims broadcast (TPC-H Q5 shape;
    // at 100 TB the fact side stays shuffle-free because every dim
    // broadcasts).
    "q13_join_multi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // §2.10 UNION ALL of tagged branches (dynamic h3_index union view,
    // pipeline_runner.py:1067-1157).
    "q14_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val open = o.filter(col("o_orderstatus") === "O")
        .select(lit("open").as("src"), col("o_orderkey"), col("o_totalprice"))
      val done = o.filter(col("o_orderstatus") === "F")
        .select(lit("finished").as("src"), col("o_orderkey"), col("o_totalprice"))
      open.unionByName(done)
        .groupBy("src")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("src")
    }),

    // §2.7 DISTINCT dedup (h3_query.py:109).
    "q15_distinct" -> ((s, dir) => {
      t(s, dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // §2.9 top-k ORDER BY DESC LIMIT — Spark plans TakeOrderedAndProject,
    // no full sort at scale (export.py:38-39).
    "q16_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(15)
    }),

    // §2.8-adjacent extension: top-k per group via window (documented as
    // beyond-parity in SURVEY §2.8).
    "q17_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn").cast("long").as("rn"),
          col("c_custkey"), col("c_acctbal"))
        .orderBy("c_mktsegment", "rn")
    }),

    // Bounded top-k AGGREGATE (functions/TopKAgg) — q17's semantics
    // through the map-side-combinable k-heap instead of a row_number
    // window: the shuffle carries at most k entries per (group,
    // partition) instead of every candidate row, the shape a per-group
    // top-k needs at warehouse scale. Ordering contract identical
    // (score desc, id asc), hash-matched against the window replay.
    "q185_topk_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        .groupBy("o_orderpriority")
        .agg(graft.functions.TopKAgg.topKByScore(
          col("o_totalprice"), col("o_orderkey"), 5).as("__top"))
        .select(col("o_orderpriority"),
          posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("o_orderpriority"),
          (col("__pos") + 1).cast("long").as("rn"),
          col("__e.id").as("o_orderkey"),
          col("__e.score").as("o_totalprice"))
        .orderBy("o_orderpriority", "rn")
    }),

    // §2.7 pivot-style wide table (docs/tasks.md:28-141 wide design:
    // MAX(CASE WHEN klass='x' THEN 1 END)).
    "q18_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_linestatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("l_linestatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("l_linestatus") === "F", dec(col("l_quantity")))
            .otherwise(lit(0))).cast("double").as("qty_f"),
          sum(when(col("l_linestatus") === "O", dec(col("l_quantity")))
            .otherwise(lit(0))).cast("double").as("qty_o"))
        .orderBy("l_returnflag")
    }),

    // §2.7 LIST(DISTINCT x ORDER BY x) → sort_array(collect_set)
    // (pipeline_runner.py:1149-1151).
    "q19_collect_sorted" -> ((s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      // final projection stringifies the array (concat_ws) so the
      // driver's pandas-based oracle can sort/hash the column — the
      // list itself is still built distributed via collect_set
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws("|", sort_array(collect_set(col("n_name")))).as("nations"),
          countDistinct(col("n_nationkey")).as("n_nations"))
        .orderBy("r_name")
    }),

    // §2.7 COUNT(DISTINCT …) (h3_query.py:137-138).
    "q20_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_orderkey")).as("n_ord"))
        .orderBy("l_returnflag")
    }),

    // §2.7 ROUND(AVG(...)) (sql/examples/h3_polygon_queries.sql:185-188);
    // avg computed as exact-decimal sum / count for order-independence.
    "q21_avg_round" -> ((s, dir) => {
      t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(round(sum(dec(col("s_acctbal"))).cast("double") / count(lit(1)), 2)
          .as("avg_bal"),
          count(lit(1)).as("n_supp"))
        .orderBy("s_nationkey")
    }),

    // §2.9 stable multi-column ordering (h3_query.py:118).
    "q22_order_stable" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    }),

    // §2.4 g_format_date_iso (003_db_makros.sql:127) + month bucketing.
    "q23_date_format" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("month")
    }),

    // §2.4 g_generate_id-style deterministic md5 id
    // (003_db_makros.sql:124; timestamp seed dropped for determinism).
    "q24_md5_id" -> ((s, dir) => {
      t(s, dir, "supplier")
        .select(col("s_suppkey"),
          md5(concat_ws("|", col("s_name"), col("s_suppkey"))).as("gen_id"))
        .orderBy("s_suppkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_project_exclude" ->
      "SELECT p_partkey, p_name, p_brand, p_type FROM part ORDER BY p_partkey",
    "q04_isin_filter" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q05_case_dispatch" ->
      """SELECT CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_class,
        |  COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY 1 ORDER BY size_class""".stripMargin,
    "q06_computed_cols" ->
      """SELECT c_custkey, COALESCE(CAST(c_name AS VARCHAR), '') AS name_norm,
        |  'tpch' AS source_lit, COALESCE(CAST(c_nationkey AS VARCHAR), '') AS nation_str
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q07_classification" ->
      """SELECT COALESCE(NULLIF(p_brand,''),'-') || '.' || COALESCE(NULLIF(p_type,''),'-') AS classification,
        |  COUNT(*) AS n
        |FROM part GROUP BY 1 ORDER BY classification""".stripMargin,
    "q08_round_trycast" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(CAST(l_extendedprice AS DOUBLE) / 10000, 2) AS area_ha,
        |  ROUND(CAST(l_quantity AS DOUBLE), 1) AS qty_r
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q09_join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q10_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q11_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_custkey % 100 <> 7)
        |ORDER BY c_custkey""".stripMargin,
    "q13_join_multi" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q14_union_all" ->
      """SELECT src, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM (
        |  SELECT 'open' AS src, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT 'finished' AS src, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY src ORDER BY src""".stripMargin,
    "q15_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q16_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""".stripMargin,
    "q17_topk_per_group" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer
        |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q185_topk_agg" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey ASC)
        |      AS BIGINT) AS rn
        |  FROM orders
        |) WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin,
    "q18_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN l_linestatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN l_linestatus='F' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_f,
        |  CAST(SUM(CASE WHEN l_linestatus='O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q19_collect_sorted" ->
      """SELECT r_name,
        |  array_to_string(list_sort(list(DISTINCT n_name)), '|') AS nations,
        |  COUNT(DISTINCT n_nationkey) AS n_nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q20_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(DISTINCT l_orderkey) AS n_ord
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q21_avg_round" ->
      """SELECT s_nationkey,
        |  ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_bal,
        |  COUNT(*) AS n_supp
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q22_order_stable" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |ORDER BY o_custkey, o_orderkey LIMIT 100""".stripMargin,
    "q23_date_format" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q24_md5_id" ->
      """SELECT s_suppkey, md5(s_name || '|' || CAST(s_suppkey AS VARCHAR)) AS gen_id
        |FROM supplier ORDER BY s_suppkey""".stripMargin
  )
}
