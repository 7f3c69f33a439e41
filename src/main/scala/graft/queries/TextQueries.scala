package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators over `documents` (SURVEY.md §2.D D4 + the
  * training-data-pipeline brief): language ID, quality scoring, token
  * counting, and document fingerprinting. All pure column expressions
  * (whole-stage codegen, no UDFs), each with a DuckDB oracle.
  */
object TextQueries {
  import Q._

  /** English-ish stopwords present in the fixture vocabulary. */
  private val stop = Seq("the", "a", "of", "to", "and")
  private val stopSqlList = stop.map(s => s"'$s'").mkString("(", ", ", ")")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D4a — n-gram-free language ID heuristic: stopword hit-rate. The
    // decision rule is the operator; thresholds are corpus-calibrated.
    "d07_lang_id" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("tk", tokens(col("text")))
        .withColumn("n_tokens", size(col("tk")))
        .withColumn("n_stop",
          size(filter(col("tk"), x => x.isin(stop: _*))))
        .withColumn("stop_ratio",
          col("n_stop").cast("double") / col("n_tokens"))
        .withColumn("lang_guess",
          when(col("stop_ratio") >= 0.08, "en")
            .when(col("stop_ratio") >= 0.04, "mixed")
            .otherwise("other"))
        .select("doc_id", "n_tokens", "n_stop", "stop_ratio", "lang_guess")
        .orderBy("doc_id")
    },
    // D4b — quality scoring: length, lexical diversity, mean token length.
    "d08_text_quality" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("tk", tokens(col("text")))
        .withColumn("n_chars", length(col("text")))
        .withColumn("n_tokens", size(col("tk")))
        .withColumn("n_distinct", size(array_distinct(col("tk"))))
        .withColumn("distinct_ratio",
          col("n_distinct").cast("double") / col("n_tokens"))
        .withColumn("mean_tok_len",
          (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
        .withColumn("quality_ok",
          col("n_tokens").between(20, 400) && col("distinct_ratio") >= 0.15)
        .select("doc_id", "n_chars", "n_tokens", "n_distinct",
          "distinct_ratio", "mean_tok_len", "quality_ok")
        .orderBy("doc_id")
    },
    // D4c — token counting: whitespace + BPE-ish regex segmentation.
    "d09_token_count" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .as("bpeish_tokens"),
          length(col("text")).as("n_chars"))
        .withColumn("chars_per_token",
          col("n_chars").cast("double") / col("bpeish_tokens"))
        .orderBy("doc_id")
    },
    // Pipeline hygiene — PII-style redaction: normalize away digit runs and
    // shouty tokens before training. (Fixture text is clean, so the digit
    // branch exercises the no-match path; the transform itself is the op.)
    "d13_redact" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("text"), "[0-9]+", "<num>"),
            "\\b(key|hash)\\b", "<redacted>").as("clean_text"),
          size(expr("regexp_extract_all(text, '\\\\b(key|hash)\\\\b', 0)"))
            .as("n_redacted"))
        .orderBy("doc_id")
    },
    // Deterministic stratified sampling: keep k docs per (lang, source)
    // stratum, ranked by the md5 hash of the doc id — reproducible on any
    // engine, no RNG state, and at scale it's a single shuffle by stratum.
    "d14_stratified_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang", "source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("lang", "source", "rn", "doc_id", "n_chars")
        .orderBy("lang", "source", "rn")
    },
    // D4d — fingerprinting: whole-doc content hash + min-shingle rolling
    // fingerprint (winnowing-style representative hash).
    "d10_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("sh", shingles(tokens(col("text"))))
        .select(col("doc_id"),
          md5(lower(col("text"))).as("doc_fp"),
          array_min(transform(col("sh"), x => tokenHash60(x))).as("min_shingle_fp"))
        .orderBy("doc_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "d07_lang_id" ->
      s"""SELECT doc_id,
         |  CAST(len(tk) AS INT) AS n_tokens,
         |  CAST(len(list_filter(tk, x -> x IN $stopSqlList)) AS INT) AS n_stop,
         |  CAST(len(list_filter(tk, x -> x IN $stopSqlList)) AS DOUBLE) / len(tk) AS stop_ratio,
         |  CASE WHEN CAST(len(list_filter(tk, x -> x IN $stopSqlList)) AS DOUBLE) / len(tk) >= 0.08 THEN 'en'
         |       WHEN CAST(len(list_filter(tk, x -> x IN $stopSqlList)) AS DOUBLE) / len(tk) >= 0.04 THEN 'mixed'
         |       ELSE 'other' END AS lang_guess
         |FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t
         |ORDER BY doc_id""".stripMargin,
    "d08_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(tk)) AS INT) AS n_distinct,
        |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS distinct_ratio,
        |  CAST(length(text) - len(tk) + 1 AS DOUBLE) / len(tk) AS mean_tok_len,
        |  (len(tk) BETWEEN 20 AND 400)
        |    AND CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) >= 0.15 AS quality_ok
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "d09_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpeish_tokens,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(length(text) AS DOUBLE)
        |    / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d13_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text, '[0-9]+', '<num>', 'g'),
        |                 '\b(key|hash)\b', '<redacted>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(text, '\b(key|hash)\b')) AS INT) AS n_redacted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d14_stratified_sample" ->
      """SELECT lang, source, rn, doc_id, n_chars FROM (
        |  SELECT lang, source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY lang, source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 3 ORDER BY lang, source, rn""".stripMargin,
    "d10_fingerprint" ->
      s"""SELECT doc_id, md5(lower(text)) AS doc_fp,
         |  list_aggregate(list_transform(sh, x -> ${oTokenHash60("x")}), 'min') AS min_shingle_fp
         |FROM (
         |  SELECT doc_id, text,
         |    list_transform(range(len(string_split(text,' ')) - 2),
         |      i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3]) AS sh
         |  FROM documents) t
         |ORDER BY doc_id""".stripMargin
  )
}
