package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GFunctions._
import graft.ops.VectorOps
import graft.pipeline.{GeoFixture, H3Index, H3Query, H3Wide}
import graft.spatial.Geometry

/** Consistency oracles for the operators whose OUTPUTS are not
  * SQL-expressible (H3 cell ids, IVF probes): the driver's DuckDB can't
  * recompute the result, but it CAN check the mathematical
  * RELATIONSHIPS the results must satisfy, and (because the geo fixture
  * is closed-form integer arithmetic, GeoFixture.scala:8-19) several
  * strong per-row memberships directly.
  *
  * Three oracle classes, strongest first:
  *  - closed-form: DuckDB derives the expected rows from `customer`
  *    with pure arithmetic (q78 object counts, q79 polygon membership
  *    for margin-safe objects, q58 per-object roundtrip laws);
  *  - identity: two independently-computed engine paths must agree
  *    exactly — the oracle pins the difference at zero rows / zero diff
  *    (q46 statsTop vs stats, q56 exact⊆candidates, q45/q57/q77 mass
  *    conservation);
  *  - exactness: an approximate operator configured to be exhaustive
  *    must equal the exact baseline, which HAS a SQL oracle (q59 IVF
  *    full-probe == q51 brute-force).
  */
object ConsistencyQueries {

  private val wkt = GeoFixture.queryPolygonWkt
  private val res = H3Query.DefaultQueryRes

  private def joinedPairs(s: SparkSession, dir: String): DataFrame = {
    val q = broadcast(H3Query.queryCells(s, wkt, res))
    GeoQueries.sharedIndex(s, dir)
      .withColumn("q_cell", col(s"h3_parent_$res"))
      .join(q, "q_cell")
  }

  private def stringified(df: DataFrame): DataFrame =
    df.withColumn("h3_cell", h3_hex(col("h3_cell")))
      .withColumn("datasets", concat_ws("|", col("datasets")))
      .withColumn("klasser", concat_ws("|", col("klasser")))
      .withColumn("leverantorer", concat_ws("|", col("leverantorer")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // h3_stats mass conservation: per-cell object_count sums to the
    // total index cardinality (pipeline_runner.py:1144-1153 aggregates
    // every index row into exactly one (cell, dataset) bucket).
    "q45_stats_mass" -> ((s, dir) => {
      val idx = GeoQueries.sharedIndex(s, dir)
      val lhs = H3Index.stats(idx)
        .agg(sum(col("object_count")).as("stats_total"))
      val rhs = idx.agg(count(lit(1)).as("index_total"))
      lhs.crossJoin(rhs)
        .select((col("stats_total") - col("index_total")).as("diff"))
    }),

    // statsTop's cheap-count + semi-join plan must equal the full
    // aggregate ordered-and-limited (H3Index.scala:78-87 claims this
    // identity; here the driver holds it to zero differing rows).
    // SYMMETRIC difference: a one-sided except would green on a
    // statsTop regression that DROPS rows (even an empty frame). Both
    // sides are <=50 rows post-limit, so each is computed ONCE and the
    // set diff runs on the driver — no persist to leak, no recompute.
    "q46_statstop_equiv" -> ((s, dir) => {
      // deterministic 1-in-5 cell subset: per-cell aggregates are
      // independent across cells, so the statsTop==stats identity holds
      // on ANY index — checking a fifth of the cells keeps the law at a
      // fifth of the full-aggregate cost (the full form was the #2
      // entry in the driver's r4 bench)
      val idx = GeoQueries.sharedIndex(s, dir)
        .filter(pmod(hash(col("h3_cell")), lit(5)) === 0)
      val viaTop = stringified(H3Index.statsTop(idx, 50))
      val viaFull = stringified(
        H3Index.stats(idx)
          .orderBy(desc("object_count"), asc("h3_cell"))
          .limit(50))
      // collect the two sides CONCURRENTLY — as one lazy except-plan
      // they executed as parallel subtrees of a single job; two serial
      // collects would give back that parallelism for nothing
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fTop = Future(viaTop.collect())
      val fFull = Future(viaFull.collect())
      val topRows = Await.result(fTop, Duration.Inf)
      val fullRows = Await.result(fFull, Duration.Inf)
      val topSet = topRows.map(_.toSeq).toSet
      val fullSet = fullRows.map(_.toSeq).toSet
      val diff = topRows.filterNot(r => fullSet(r.toSeq)) ++
        fullRows.filterNot(r => topSet(r.toSeq))
      s.createDataFrame(java.util.Arrays.asList(diff: _*), viaTop.schema)
    }),

    // Exact-refine is a strict subset of the candidate join
    // (docs/H3_POLYGON_ANALYSIS.md:337-355: refinement only FILTERS).
    // The two sides stay INDEPENDENT executions (sharing the candidate
    // join would make subset-ness structurally vacuous), but both are
    // small post-distinct object lists, so: collect them CONCURRENTLY
    // and take the difference on the driver — one pass per side, no
    // except-shuffle, same shape as q46's symmetric-diff law.
    "q56_exact_subset" -> ((s, dir) => {
      val idx = GeoQueries.sharedIndex(s, dir)
      val exact = H3Query.objectsExact(s, idx, wkt, res)
      val cand = H3Query.objects(s, idx, wkt, res)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fExact = Future(exact.collect())
      val fCand = Future(cand.collect())
      val exactRows = Await.result(fExact, Duration.Inf)
      val candSet = Await.result(fCand, Duration.Inf).map(_.toSeq).toSet
      val diff = exactRows.filterNot(r => candSet(r.toSeq))
      s.createDataFrame(java.util.Arrays.asList(diff: _*), exact.schema)
    }),

    // Heatmap mass conservation: sum of per-cell distinct-object counts
    // equals the number of distinct (query cell, object) pairs in the
    // join input (h3_query.py:147-171 partitions pairs by cell).
    "q57_heatmap_mass" -> ((s, dir) => {
      val lhs = H3Query.heatmap(s, GeoQueries.sharedIndex(s, dir), wkt, res)
        .agg(sum(col("object_count")).as("heat_total"))
      val rhs = joinedPairs(s, dir)
        .select("q_cell", "id").distinct()
        .agg(count(lit(1)).as("pair_total"))
      lhs.crossJoin(rhs)
        .select((col("heat_total") - col("pair_total")).as("diff"))
    }),

    // Per-object compaction law: uncompact(compact(cells), res) == cells
    // as sets, for every object (aab_ext_restr/003:10-16; closed-form:
    // the fixture yields exactly one object per customer row).
    "q58_compact_roundtrip" -> ((s, dir) => {
      GeoQueries.sharedNormalized(s, dir)
        .filter(col("h3_cells").isNotNull && size(col("h3_cells")) > 0)
        // deterministic 1-in-10 sample, replayed verbatim in the DuckDB
        // oracle: the roundtrip law is per-object (no cross-row
        // interaction), so 10% of objects buys the same evidence class
        // at 10% of the compact+uncompact+sort cost — this query was
        // the single most expensive entry in the driver's r4 bench
        .filter(col("source_id").cast("long") % 10 === 0)
        .select(
          col("source_id").cast("long").as("fid"),
          (sort_array(h3_uncompact_cells(
            h3_compact_cells(col("h3_cells")),
            h3_resolution(element_at(col("h3_cells"), 1)))) ===
            sort_array(array_distinct(col("h3_cells")))).as("ok"))
        .orderBy("fid")
    }),

    // IVF probing ALL cells is exhaustive search, so it must equal the
    // brute-force top-k — which has a real value-level SQL oracle
    // (VectorQueries q51). Exercises the KMeans assignment + probe path
    // end-to-end at the value level.
    "q59_ivf_exact" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val query = e.filter(col("vec_id") === 42)
        .select("embedding").head().getSeq[Float](0).toArray
      val (assigned, centroids) = DedupQueries.sharedIvf(s, dir)
      VectorOps.ivfSearch(assigned, centroids, "vec_id", "embedding",
          query, k = 11, nprobe = centroids.length)
        .filter(col("vec_id") =!= 42)
        .select(col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // Stats mass conservation: the per-(dataset, klass) distinct-object
    // counts sum to the objects-mode row count ((dataset, klass)
    // partitions the distinct objects; h3_query.py:122-144).
    "q77_query_mass" -> ((s, dir) => {
      val idx = GeoQueries.sharedIndex(s, dir)
      val lhs = H3Query.stats(s, idx, wkt, res)
        .agg(sum(col("object_count")).as("stats_total"))
      val rhs = H3Query.objects(s, idx, wkt, res)
        .agg(count(lit(1)).as("objects_total"))
      lhs.crossJoin(rhs)
        .select((col("stats_total") - col("objects_total")).as("diff"))
    }),

    // Mart explode object conservation, closed-form: every customer row
    // becomes exactly one object (all fixture geometries are valid and
    // produce cells), so distinct objects per klass == customers per
    // mktsegment — DuckDB counts them directly.
    "q78_mart_objects" -> ((s, dir) => {
      GeoQueries.sharedMart(s, dir)
        .groupBy("klass")
        .agg(countDistinct(col("id")).as("n_objects"))
        .orderBy("klass")
    }),

    // Closed-form polygon membership: for objects ≥2 km inside (or
    // outside) the query rectangle — beyond any res-8 cell's reach from
    // the boundary — candidate-join + exact-refine membership is decided
    // by pure integer arithmetic on c_custkey, which DuckDB replays
    // directly. Catches polyfill, parent-derivation, equi-join and
    // ST_Intersects bugs anywhere outside the ~1-cell boundary ring
    // (misses -> missing fid; exterior overreach -> unexpected fid).
    // Line-corridor membership law (g_h3_line_cells, the one geo
    // operator with no driver query until now): ~2 km SWEREF segments
    // from the customer key grid, 9 samples per segment — every
    // sample's res-9 point-cell must lie in the 400 m corridor.
    // Geometric, not empirical: the corridor includes a cell iff its
    // CENTER is within the buffer of the line (H3Core.lineToCells), a
    // res-9 cell center is within ~230 m (circumradius x worst-case
    // gnomonic distortion) of any point it contains, and an
    // on-segment sample transformed pointwise deviates < 1 m from the
    // transformed chord over 2 km — 230 + 1 << 400. Output = the
    // violating (fid, j) pairs; the law pins it empty.
    "q156_line_cells_law" -> ((s, dir) => {
      val k = col("c_custkey").cast("long")
      val x0 = ((k % 31) * 2000 + 560000).cast("double")
      val y0 = (((k * 7) % 23) * 3000 + 6440000).cast("double")
      val lineWkt = concat(
        lit("LINESTRING ("), x0, lit(" "), y0, lit(", "),
        x0 + 1800.0, lit(" "), y0 + 700.0, lit(")"))
      s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") <= 120)
        .select(k.as("fid"),
          g_h3_line_cells(st_geomfromtext(lineWkt), lit(400.0), lit(9))
            .as("line_cells"),
          x0.as("x0"), y0.as("y0"))
        .withColumn("j", explode(sequence(lit(0), lit(8))))
        .withColumn("px", col("x0") + col("j") * (1800.0 / 8))
        .withColumn("py", col("y0") + col("j") * (700.0 / 8))
        .withColumn("pcell", element_at(
          g_h3_point_cells(st_point(col("px"), col("py")), lit(9)), 1))
        // NULLs are violations, not three-valued-logic escapes: a
        // decode failure anywhere must surface as rows, never as a
        // vacuous pass
        .filter(col("pcell").isNull || col("line_cells").isNull ||
          !array_contains(col("line_cells"), col("pcell")))
        .select(col("fid"), col("j"))
        .orderBy("fid", "j")
    }),

    "q79_exact_closed" -> ((s, dir) => {
      val qcells = broadcast(H3Query.queryCells(s, wkt, res))
      val queryWkb = Geometry.toWkb(Geometry.fromWkt(wkt))
      val cand = GeoQueries.sharedNormalized(s, dir)
        .filter(col("h3_cells").isNotNull && size(col("h3_cells")) > 0)
        .select(col("source_id"), col("geom"),
          explode(col("h3_cells")).as("h3_cell"))
        .withColumn("q_cell", h3_cell_to_parent(col("h3_cell"), lit(res)))
        .join(qcells, "q_cell")
        .select("source_id", "geom").distinct()
      val k = col("source_id").cast("long")
      val x0 = (k % 31) * 2000 + 560000
      val y0 = ((k * 7) % 23) * 3000 + 6440000
      val interiorSafe =
        when(k % 3 === 0,
          x0.between(562000, 618000) && y0.between(6452000, 6498000))
          .when(k % 3 === 1,
            x0 >= 562000 && x0 + 800 <= 618000 &&
              y0 >= 6452000 && y0 + 800 <= 6498000)
          .otherwise(
            x0 >= 562000 && x0 + 1500 <= 618000 &&
              y0 >= 6452000 && y0 + 900 <= 6498000)
      // conservative: bbox (incl. max extent 1500x900) clear of the
      // rectangle expanded by 2 km; x always overlaps, only y can clear
      val exteriorSafe = (y0 + 900 < 6448000) || (y0 > 6502000)
      cand
        .filter(st_intersects(col("geom"), lit(queryWkb)))
        .filter(interiorSafe || exteriorSafe)
        .select(k.as("fid"))
        .orderBy("fid")
    }),

    // Hybrid mart layout (docs/tasks.md:28-147 — the reference's own
    // recommended production design, never implemented there): the long
    // index splits into per-category wide tables; THREE identities pin
    // the split + router against the long layout as ground truth:
    //  1. assemble(hybrid tables) == build(long index)  (full re-dense)
    //  2. routed single-category request == pivot of the category's
    //     long-index slice  (the one-narrow-scan fast path)
    //  3. routed CROSS-category request (one klass from each category,
    //     full-outer join + zero-coalesce path) == pivot of that slice
    // Diffs are full-row comparisons over a full-outer join on h3_cell
    // (missing cell / extra cell / any differing column all count).
    "q169_hybrid_identity" -> ((s, dir) => {
      // cell stratum (r11 Next #2 treatment): every H3Wide stage is
      // keyed by h3_cell with no cross-cell term, so the three-way
      // identity over a hash-chosen third of the cells carries the
      // full claim — the decomposition lemma is spec-pinned in
      // SkewWideSpec ("wide/hybrid layouts decompose by h3_cell
      // stratum"). xxhash64, not a modulus on the raw cell id: H3
      // cell ids have structured low bits, a hash stratum does not
      // correlate with spatial layout.
      val idx = GeoQueries.sharedIndex(s, dir)
        .filter(pmod(xxhash64(col("h3_cell")), lit(3)) === 0)
        .select("h3_cell", "klass", "dataset_id")
      val klasses = H3Wide.klassValuesOf(idx)
      val groups = H3Wide.defaultGroups(klasses, n = 2)
      // each hybrid table is read by all three identities (assemble +
      // both routed paths) — persist for the query's lifetime so the
      // per-category hash-aggregate runs once, not 2-3x
      val tables = H3Wide.hybrid(idx, groups)
        .map { case (k, df) => k -> df.persist() }
      Memos.track(s"geo:hybrid:$dir", Set("q169_hybrid_identity"),
        tables.values.head) { () =>
        tables.values.foreach(_.unpersist()); ()
      }

      // digest-narrowed diff (r10 Next #6, pure cost trim — coverage
      // unchanged): both layouts' rows are null-free by construction
      // (build's aggregates, the zero-coalesce assemble/routed paths),
      // so a row compares equal iff its xxhash64 over all non-key
      // columns matches — the q177 state-digest pattern (64-bit
      // collision ~2^-64, far below every other noise floor). The
      // full-outer join then shuffles (h3_cell, digest) instead of the
      // full 2 x klass-column width; an in-row NULL (would-be contract
      // break) is counted bad explicitly rather than digest-skipped.
      def wideDiff(a: DataFrame, b: DataFrame): DataFrame = {
        require(a.columns.sameElements(b.columns),
          s"schema drift: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
        val cols = a.columns.filterNot(_ == "h3_cell").toSeq
        def dig(df: DataFrame) = df.select(col("h3_cell"),
          xxhash64(cols.map(col): _*).as("__h"),
          cols.map(c => when(col(c).isNull, 1).otherwise(0))
            .reduce(_ + _).as("__nulls"))
        val rowBad = when(col("__h").isNull || col("__h_r").isNull ||
          col("__h") =!= col("__h_r") ||
          col("__nulls") > 0 || col("__nulls_r") > 0, 1).otherwise(0)
        dig(a).join(
            dig(b).withColumnRenamed("__h", "__h_r")
              .withColumnRenamed("__nulls", "__nulls_r"),
            Seq("h3_cell"), "full_outer")
          .agg(coalesce(sum(rowBad), lit(0)).cast("long").as("bad"),
            count(lit(1)).as("n"))
      }

      val d1 = wideDiff(H3Wide.assemble(tables, groups),
        H3Wide.build(idx, klasses))
      val cat = groups.keys.min
      val d2 = wideDiff(
        H3Wide.routed(idx, tables, groups, groups(cat)),
        H3Wide.build(idx.filter(col("klass").isin(groups(cat): _*)),
          groups(cat)))
      val span = groups.values.map(_.head).toSeq.sorted
      val d3 = wideDiff(H3Wide.routed(idx, tables, groups, span),
        H3Wide.build(idx.filter(col("klass").isin(span: _*)), span))

      d1.select(col("bad").as("diff_assemble"), col("n").as("n1"))
        .crossJoin(d2.select(col("bad").as("diff_single"), col("n").as("n2")))
        .crossJoin(d3.select(col("bad").as("diff_span"), col("n").as("n3")))
        // non-vacuity: every identity must have compared actual cells
        // (all THREE — a diff of two empty sides is vacuously zero)
        .select(col("diff_assemble"), col("diff_single"), col("diff_span"),
          (col("n1") > 0 && col("n2") > 0 && col("n3") > 0).as("nonempty"))
    })
  )

  private def emptySelect(cols: (String, String)*): String =
    cols.map { case (n, t) => s"CAST(NULL AS $t) AS $n" }
      .mkString("SELECT ", ", ", " WHERE 1=0")

  private val safeMembershipSql =
    """WITH t AS (
      |  SELECT c_custkey AS k,
      |         (c_custkey % 31) * 2000 + 560000 AS x0,
      |         ((c_custkey * 7) % 23) * 3000 + 6440000 AS y0
      |  FROM customer)
      |SELECT k AS fid FROM t
      |WHERE CASE
      |  WHEN k % 3 = 0 THEN x0 BETWEEN 562000 AND 618000
      |                  AND y0 BETWEEN 6452000 AND 6498000
      |  WHEN k % 3 = 1 THEN x0 >= 562000 AND x0 + 800 <= 618000
      |                  AND y0 >= 6452000 AND y0 + 800 <= 6498000
      |  ELSE x0 >= 562000 AND x0 + 1500 <= 618000
      |   AND y0 >= 6452000 AND y0 + 900 <= 6498000
      |END
      |ORDER BY fid""".stripMargin

  val oracle: Map[String, String] = Map(
    "q45_stats_mass" -> "SELECT CAST(0 AS BIGINT) AS diff",
    "q46_statstop_equiv" -> emptySelect(
      "h3_cell" -> "VARCHAR", "object_count" -> "BIGINT",
      "dataset_count" -> "BIGINT", "datasets" -> "VARCHAR",
      "klasser" -> "VARCHAR", "leverantorer" -> "VARCHAR"),
    "q56_exact_subset" -> emptySelect(
      "id" -> "VARCHAR", "dataset_id" -> "VARCHAR",
      "leverantor" -> "VARCHAR", "klass" -> "VARCHAR"),
    "q57_heatmap_mass" -> "SELECT CAST(0 AS BIGINT) AS diff",
    "q58_compact_roundtrip" ->
      """SELECT c_custkey AS fid, true AS ok FROM customer
        |WHERE c_custkey % 10 = 0 ORDER BY fid""".stripMargin,
    "q59_ivf_exact" -> VectorQueries.oracle("q51_knn_brute"),
    "q77_query_mass" -> "SELECT CAST(0 AS BIGINT) AS diff",
    "q169_hybrid_identity" ->
      ("SELECT CAST(0 AS BIGINT) AS diff_assemble, " +
        "CAST(0 AS BIGINT) AS diff_single, " +
        "CAST(0 AS BIGINT) AS diff_span, true AS nonempty"),
    "q78_mart_objects" ->
      """SELECT c_mktsegment AS klass, COUNT(*) AS n_objects
        |FROM customer GROUP BY 1 ORDER BY klass""".stripMargin,
    "q79_exact_closed" -> safeMembershipSql,
    "q156_line_cells_law" -> emptySelect(
      "fid" -> "BIGINT", "j" -> "INTEGER")
  )
}
