package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operators over the `documents` table — the
  * training-data-pipeline side of the engine (SURVEY.md §7.4).
  *
  * The scalar pieces reuse the reference's text macros
  * (`g_clean_text` / `g_empty_to_null`, sql/migrations/003_db_makros.sql:98-104)
  * and extend them to token counting, quality scoring, language ID and
  * fingerprinting. Everything here is a narrow projection + hash
  * aggregation — shuffle volume at 100 TB is bounded by the digest/stat
  * columns, never the raw text.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** g_clean_text: TRIM(REGEXP_REPLACE(txt,'\s+',' ')) (003:98). */
  private def cleanText(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(c, "\\s+", " "))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 g_clean_text — emitted as md5 so the oracle compares digests,
    // not megabytes of text.
    "q30_clean_text" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), md5(cleanText(col("text"))).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // §2.4 g_empty_to_null + grouped null handling.
    "q31_empty_to_null" -> ((s, dir) => {
      docs(s, dir)
        .select(coalesce(nullif(trim(col("source")), lit("")), lit("(none)"))
          .as("source_norm"))
        .groupBy("source_norm")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source_norm")
    }),

    // Exact dedup: per-source distinct-text counts via md5 grouping — the
    // Stage004 `_attr_md5` pattern (004_staging_transform_template.sql:38)
    // as a dedup primitive. At scale this shuffles 16-byte digests only.
    "q32_exact_dedup" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_distinct"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
        .orderBy("source")
    }),

    // Exact-dedup keep-first: representative min(doc_id) per content hash
    // where duplicates exist. The raw corpus has no exact duplicates, so
    // the query input UNIONs a deterministic re-crawl slice (every 50th
    // doc re-ingested under a shifted id) — the green row then proves
    // the group-and-keep-first logic on real duplicate groups instead of
    // passing vacuously on zero rows.
    "q33_dedup_groups" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val recrawl = d.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      d.union(recrawl)
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
        .filter(col("n_copies") > 1)
        .orderBy("keep_id")
    }),

    // Token counting: whitespace tokenization over cleaned text + derived
    // word-bigram count.
    "q34_token_count" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("clean", cleanText(col("text")))
        .select(
          col("doc_id"),
          size(split(col("clean"), " ")).cast("long").as("n_tokens"),
          greatest(size(split(col("clean"), " ")) - 1, lit(0)).cast("long")
            .as("n_bigrams"),
          length(col("text")).cast("long").as("n_chars_calc"))
        .orderBy("doc_id")
    }),

    // Quality scoring: length/punct/uniqueness ratios + a CASE quality
    // bucket — the heuristic-score shape used by pretraining filters.
    "q35_quality_score" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("clean", cleanText(col("text")))
        .withColumn("n_tok", size(split(col("clean"), " ")))
        .withColumn("n_chr", length(col("clean")))
        .withColumn("n_punct", length(col("clean")) -
          length(regexp_replace(col("clean"), "[.!?,;:]", "")))
        .select(
          col("doc_id"), col("n_tok").cast("long").as("n_tok"),
          col("n_chr").cast("long").as("n_chr"),
          col("n_punct").cast("long").as("n_punct"),
          round(col("n_chr").cast("double") /
            greatest(col("n_tok"), lit(1)), 3).as("avg_tok_len"),
          when(col("n_tok") < 10, "too_short")
            .when(col("n_punct") * 10 > col("n_tok"), "punct_heavy")
            .otherwise("ok").as("quality"))
        .orderBy("doc_id")
    }),

    // Language ID: stopword-hit heuristic (n-gram-lite) compared against
    // the labeled lang column → per-lang confusion counts.
    "q36_lang_id" -> ((s, dir) => {
      // compute the normalized text ONCE behind an exchange boundary —
      // otherwise CollapseProject inlines the regexp into all 8
      // contains() branches (16x regex passes per row)
      val padded = concat(lit(" "), lower(cleanText(col("text"))), lit(" "))
      docs(s, dir)
        .select(col("lang"), padded.as("pt"))
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("pred",
          when(col("pt").contains(" the ") || col("pt").contains(" and "), "en")
            .when(col("pt").contains(" und ") || col("pt").contains(" der "), "de")
            .when(col("pt").contains(" el ") || col("pt").contains(" los "), "es")
            .when(col("pt").contains(" le ") || col("pt").contains(" les "), "fr")
            .otherwise("unknown"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }),

    // Document fingerprinting: md5 over aggressively normalized text
    // (lowercase, strip non-alnum) — catches whitespace/punct-variant
    // near-dups exactly; the cheap tier before MinHash.
    "q37_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
            .as("fingerprint"))
        .groupBy("fingerprint")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
        .orderBy("keep_id")
    }),

    // BPE-ish regex token counting (builder brief: "whitespace + a
    // BPE-ish regex"): letter runs, single digits, and punctuation
    // marks as separate tokens — the pre-tokenizer shape GPT-style
    // BPE vocabularies assume.
    "q39_bpe_tokens" -> ((s, dir) => {
      val pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
      docs(s, dir)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .cast("long").as("n_bpe_tokens"),
          size(split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
            .cast("long").as("n_ws_tokens"))
        .orderBy("doc_id")
    }),

    // Per-language corpus stats (the lang-distribution report every
    // data pipeline runs).
    "q38_lang_stats" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 2)
            .as("avg_chars"))
        .orderBy("lang")
    })
  )

  val oracle: Map[String, String] = Map(
    "q30_clean_text" ->
      """SELECT doc_id, md5(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS clean_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_empty_to_null" ->
      """SELECT COALESCE(NULLIF(TRIM(source), ''), '(none)') AS source_norm,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY source_norm""".stripMargin,
    "q32_exact_dedup" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(text)) AS n_distinct,
        |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q33_dedup_groups" ->
      """SELECT md5(text) AS text_md5, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
        |FROM (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
        |) GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY keep_id""".stripMargin,
    "q34_token_count" ->
      """WITH c AS (SELECT doc_id, text, TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')) AS clean FROM documents)
        |SELECT doc_id, len(string_split(clean, ' ')) AS n_tokens,
        |  GREATEST(len(string_split(clean, ' ')) - 1, 0) AS n_bigrams,
        |  length(text) AS n_chars_calc
        |FROM c ORDER BY doc_id""".stripMargin,
    "q35_quality_score" ->
      """WITH c AS (
        |  SELECT doc_id, TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')) AS clean FROM documents
        |), m AS (
        |  SELECT doc_id, len(string_split(clean, ' ')) AS n_tok, length(clean) AS n_chr,
        |    length(clean) - length(REGEXP_REPLACE(clean, '[.!?,;:]', '', 'g')) AS n_punct
        |  FROM c
        |)
        |SELECT doc_id, n_tok, n_chr, n_punct,
        |  ROUND(CAST(n_chr AS DOUBLE) / GREATEST(n_tok, 1), 3) AS avg_tok_len,
        |  CASE WHEN n_tok < 10 THEN 'too_short'
        |       WHEN n_punct * 10 > n_tok THEN 'punct_heavy'
        |       ELSE 'ok' END AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q36_lang_id" ->
      """WITH p AS (
        |  SELECT lang, ' ' || LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) || ' ' AS pt
        |  FROM documents
        |)
        |SELECT lang,
        |  CASE WHEN pt LIKE '% the %' OR pt LIKE '% and %' THEN 'en'
        |       WHEN pt LIKE '% und %' OR pt LIKE '% der %' THEN 'de'
        |       WHEN pt LIKE '% el %' OR pt LIKE '% los %' THEN 'es'
        |       WHEN pt LIKE '% le %' OR pt LIKE '% les %' THEN 'fr'
        |       ELSE 'unknown' END AS pred,
        |  COUNT(*) AS n
        |FROM p GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin,
    "q37_fingerprint" ->
      """SELECT md5(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
        |  COUNT(*) AS n, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q39_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(string_split(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q38_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
