package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Second consistency-oracle battery: q69 (heatmap-with-empty) plus the
  * near-dup sketches q70/q72, whose hash functions are engine-internal
  * (murmur-based, not replayable in SQL) but whose RECALL ON IDENTICAL
  * TEXT is a hard law: identical documents have identical signatures,
  * identical signatures share every LSH band, so every identical-text
  * pair MUST surface as a candidate — and DuckDB can enumerate the
  * identical-text pairs directly with a self-join on md5(text).
  */
object ConsistencyQueries2 {

  private val wkt = graft.pipeline.GeoFixture.queryPolygonWkt

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** The recall corpus: the documents table plus a tagged duplicate of
    * every 50th doc (id offset far above the real id range). The
    * natural corpus has ZERO identical-text pairs at small SF, which
    * made the recall law vacuously green — seeding guaranteed
    * duplicates keeps the law exercised on >=10 real pairs at every
    * scale, and DuckDB replays the identical construction. */
  private def seededDocs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + lit(10000000L)))
  }

  /** Identical-text pairs in the seeded corpus (the DuckDB-checkable
    * ground truth for sketch recall). */
  private def dupPairs(s: SparkSession, dir: String): DataFrame = {
    val d = seededDocs(s, dir).select(col("doc_id"), md5(col("text")).as("h"))
    val a = d.as("a")
    val b = d.as("b")
    a.join(b, col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
  }

  private val dupPairsSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 50 = 0
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |FROM corpus a JOIN corpus b
      |  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // heatmapWithEmpty laws: (a) exactly one row per query cell —
    // polyfill count preserved through the left join; (b) total object
    // mass equals the heatmap's (empty cells contribute the coalesced
    // 0). Both sides computed through DIFFERENT paths.
    "q101_heatmap_empty_mass" -> ((s, dir) => {
      import s.implicits._
      val index = GeoQueries.sharedIndex(s, dir)
      // persist: both sides of the identity read the SAME heatmap — the
      // independence under test is the left-join path vs the raw
      // aggregate, not two computations of the aggregate itself. The
      // aggregates run eagerly so the cache can be RELEASED before the
      // builder returns (a long-lived harness calls this repeatedly).
      val hm = graft.pipeline.H3Query.heatmap(s, index, wkt, 8)
        .select("h3_cell", "object_count")
        .persist()
      try {
        val withEmpty = graft.pipeline.H3Query.heatmapWithEmpty(s, hm, wkt, 8)
        val nCells = graft.pipeline.H3Query.queryCells(s, wkt, 8).count()
        val e = withEmpty.agg(
          count(lit(1)).as("n_rows"),
          sum(col("object_count")).as("mass_empty")).head()
        // a NULL sum means zero rows -> zero mass (an empty heatmap is
        // CONSISTENT; non-emptiness is q66's rows check, not this law)
        def longOr0(r: org.apache.spark.sql.Row, i: Int): Long =
          if (r.isNullAt(i)) 0L else r.getLong(i)
        val massHm = longOr0(hm.agg(sum(col("object_count"))).head(), 0)
        Seq((e.getLong(0) - nCells, longOr0(e, 1) - massHm))
          .toDF("row_diff", "mass_diff")
      } finally hm.unpersist()
    }),

    // MinHash recall law: every identical-text pair is an LSH candidate
    // (identical signatures share every band). Output = the identical
    // pairs found among the candidates; oracle = ALL identical pairs,
    // so a single dropped pair breaks the row count and hash.
    "q102_minhash_dup_recall" -> ((s, dir) => {
      // UNCAPPED: the recall law only holds without the hot-bucket
      // guard — a capped (band,bucket) group may legitimately drop an
      // identical-text pair, which the oracle would flag as a miss
      val cands = TextDedup.minHashCandidates(seededDocs(s, dir), "doc_id", "text",
        maxBucket = Int.MaxValue)
        .select("id_a", "id_b")
      cands.join(dupPairs(s, dir), Seq("id_a", "id_b"))
        .orderBy("id_a", "id_b")
    }),

    // SimHash recall law: identical text -> identical 64-bit simhash ->
    // hamming 0 -> candidate at any banding threshold.
    "q103_simhash_dup_recall" -> ((s, dir) => {
      val cands = TextDedup.simHashCandidates(seededDocs(s, dir), "doc_id", "text",
        maxHamming = 16)
        .select("id_a", "id_b")
      cands.join(dupPairs(s, dir), Seq("id_a", "id_b"))
        .orderBy("id_a", "id_b")
    })
  )

  val oracle: Map[String, String] = Map(
    "q101_heatmap_empty_mass" ->
      "SELECT CAST(0 AS BIGINT) AS row_diff, CAST(0 AS BIGINT) AS mass_diff",
    "q102_minhash_dup_recall" -> dupPairsSql,
    "q103_simhash_dup_recall" -> dupPairsSql
  )
}
