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

  /** k-anonymity threshold (d63) — one definition feeds both the Spark
    * side and the interpolated oracle SQL.
    */
  private val kAnon = 5

  /** English-ish stopwords present in the fixture vocabulary. */
  private val stop = Seq("the", "a", "of", "to", "and")
  private val stopSqlList = stop.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Per-(doc, token) term frequencies — the corpus tokenized ONCE,
    * persisted, and shared by every consumer (d31 TF-IDF, d47 BM25: term
    * joins, document frequencies, global term ranks all derive from it).
    */
  private[graft] def docTf(s: SparkSession, dir: String): DataFrame =
    Q.memo(s, dir, "docTf") {
      // UNCONDITIONAL repartition by doc_id BEFORE the tokenize+aggregate
      // (the docShingles placement, round-13 measured rationale): the agg
      // needs ONE exchange either way — raw text by doc_id (whose hash
      // partitioning satisfies the (doc_id, tok) group clustering, so no
      // further exchange exists), or the exploded (doc_id, tok) partial
      // rows after map-side combine. A doc is one input row, so partial
      // aggregation collapses duplicates exactly as well as the full agg
      // does — the exchanged-bytes comparison is text vs per-doc distinct
      // token STRINGS, and the text is ~3.4x smaller on this corpus
      // (d44's identical trade, measured at sf1: 14.8 MB text vs 50.1 MB
      // pair rows; at sf10 the pair form shuffled 583 MB). The
      // repartition also floors parallelism on the single-row-group
      // bench fixtures, where a plain scan plans one task. Width follows
      // the session's shuffle-partition sizing (Q.exchangeWidth) — core
      // count alone pinned per-task payload to corpus/cores, unbounded at
      // scale and invisible to the documented sizing lever.
      t(s, dir, "documents")
        .repartition(Q.exchangeWidth(s), col("doc_id"))
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        .persist()
    }

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
          col("n_tokens").between(qualityMinTokens, qualityMaxTokens) &&
            col("distinct_ratio") >= qualityMinDistinctRatio)
        .select("doc_id", "n_chars", "n_tokens", "n_distinct",
          "distinct_ratio", "mean_tok_len", "quality_ok")
        .orderBy("doc_id")
    },
    // D4c — token counting: whitespace + BPE-ish regex segmentation.
    "d09_token_count" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).as("ws_tokens"),
          bpeTokens(col("text")).as("bpeish_tokens"),
          length(col("text")).as("n_chars"))
        // a doc whose text matches zero BPE-ish tokens (empty, whitespace,
        // punctuation-only) must yield NULL like DuckDB's n/0, not abort
        // under Spark 4's ANSI DIVIDE_BY_ZERO (fixtures always match ≥1,
        // so the oracle is unaffected; the guard is for real corpora)
        .withColumn("chars_per_token",
          when(col("bpeish_tokens") === 0, lit(null).cast("double"))
            .otherwise(col("n_chars").cast("double") / col("bpeish_tokens")))
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
          expr("regexp_count(text, '\\\\b(key|hash)\\\\b')")
            .as("n_redacted"))
        .orderBy("doc_id")
    },
    // Deterministic stratified sampling: keep k docs per (lang, source)
    // stratum, ranked by the md5 hash of the doc id — reproducible on any
    // engine, no RNG state, and at scale it's a single shuffle by stratum.
    "d14_stratified_sample" -> { (s, dir) =>
      // k-per-stratum via the bounded `topk_structs` aggregate, NOT a
      // row_number window: strata are (lang, source) — a few dozen at any
      // corpus size — so the window funnels the ENTIRE corpus through one
      // sort task per stratum (the canonical low-cardinality-window
      // hazard at 100 TB). The aggregate keeps a k-slot heap per stratum
      // WITH map-side partial combine: every core scans its split, the
      // exchange carries ≤ strata×tasks×k rows, and no corpus-sized sort
      // exists anywhere. Rank order (md5 ASC, doc_id ASC) is the struct's
      // natural ascending order; posexplode's pos+1 is the window's
      // row_number (equality spec-pinned in TopKStructsSpec).
      t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(call_function("topk_structs",
          struct(md5(col("doc_id").cast("string")).as("mk"),
            col("doc_id"), col("n_chars")),
          lit(3)).as("top"))
        .select(col("lang"), col("source"), posexplode(col("top")))
        .select(col("lang"), col("source"),
          (col("pos") + 1).cast("int").as("rn"),
          col("col.doc_id").as("doc_id"), col("col.n_chars").as("n_chars"))
        .orderBy("lang", "source", "rn")
    },
    // Composite training-data prep pipeline: quality filter → exact dedup
    // (keep min doc_id per content hash) → deterministic stratified sample
    // (k per (lang, source), md5-ranked) → per-stratum summary. The
    // end-to-end shape a 100 TB corpus prep job runs: every stage is one
    // narrow filter or one keyed shuffle; nothing quadratic.
    "d15_pipeline_prep" -> { (s, dir) =>
      val quality = t(s, dir, "documents")
        .withColumn("tk", tokens(col("text")))
        .withColumn("n_tokens", size(col("tk")))
        .withColumn("distinct_ratio",
          size(array_distinct(col("tk"))).cast("double") / col("n_tokens"))
        .filter(col("n_tokens").between(qualityMinTokens, qualityMaxTokens) &&
          col("distinct_ratio") >= qualityMinDistinctRatio)
      // exact dedup = keep-min-doc_id per content hash: a min_by argmax
      // (map-side partial combine), not a per-hash row_number window —
      // same rows, no per-group sort, and partial aggregation collapses
      // duplicates before the exchange instead of shuffling every copy
      val deduped = quality
        .groupBy(md5(col("text")).as("__h"))
        .agg(min_by(struct(col("doc_id"), col("lang"), col("source"),
          col("n_tokens")), col("doc_id")).as("__r"))
        .select(col("__r.*"))
      // k-per-stratum via topk_structs — same low-cardinality-window
      // hazard and fix as d14 (strata = (lang, source); a window would
      // funnel the surviving corpus through one task per stratum)
      deduped
        .groupBy("lang", "source")
        .agg(call_function("topk_structs",
          struct(md5(col("doc_id").cast("string")).as("mk"),
            col("doc_id"), col("n_tokens")),
          lit(5)).as("top"))
        .select(col("lang"), col("source"), explode(col("top")).as("s"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_kept"),
          sum("s.n_tokens").as("total_tokens"),
          min("s.doc_id").as("min_doc"), max("s.doc_id").as("max_doc"))
        .orderBy("lang", "source")
    },
    // Vocabulary building: corpus-wide top-20 3-gram document frequency.
    // Scale shape: per-doc distinct map-side, one groupBy(ngram) with
    // partial aggregation, then TakeOrderedAndProject — no global sort.
    // Reuses the cached per-doc shingle sets (repartitioned before the
    // interpreted HOF shingling — shared with d02/d03).
    "d16_ngram_vocab" -> { (s, dir) =>
      DedupQueries.docShingles(s, dir)
        .select(explode(col("sh_arr")).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("ngram"))
        .limit(20)
    },
    // Sequence packing — greedy-pack documents into fixed token budgets
    // (256 here) for training-batch assembly: running token sum per shard
    // (source) → pack id = start-offset div budget. Packing WITHIN a
    // partition key keeps the window shuffle-parallel (a global pack order
    // would funnel the corpus through one partition at scale).
    "d19_sequence_pack" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("doc_id")
      t(s, dir, "documents")
        .withColumn("n_tok", bpeTokens(col("text")))
        .withColumn("cum", sum("n_tok").over(w))
        .withColumn("seq_id", expr("(cum - n_tok) div 256"))
        .groupBy("source", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("seq_tokens"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("source", "seq_id")
    },
    // Gopher-style repetition filter: duplicate-bigram / duplicate-trigram
    // ratios computed map-side per document (no shuffle at all until the
    // final order) — the "remove boilerplate / looping text" gate every
    // large-scale corpus prep pipeline runs. Ratios are single divisions of
    // exact integer counts, so both engines agree bit-for-bit.
    "d24_repetition" -> { (s, dir) =>
      t(s, dir, "documents")
        // single-pass byte-scan kernel: [n_tokens, uniq2, uniq3] without
        // materializing the token array (see RepetitionProfile)
        .withColumn("rp", repetitionProfile(col("text")))
        .withColumn("n_tokens", col("rp").getItem(0))
        .withColumn("uniq2", col("rp").getItem(1))
        .withColumn("uniq3", col("rp").getItem(2))
        .withColumn("dup2_ratio",
          when(col("n_tokens") > 1,
            lit(1.0) - col("uniq2").cast("double") / (col("n_tokens") - 1)))
        .withColumn("dup3_ratio",
          when(col("n_tokens") > 2,
            lit(1.0) - col("uniq3").cast("double") / (col("n_tokens") - 2)))
        .withColumn("is_repetitive",
          col("dup2_ratio") > 0.5 || col("dup3_ratio") > 0.4)
        .select("doc_id", "n_tokens", "uniq2", "uniq3",
          "dup2_ratio", "dup3_ratio", "is_repetitive")
        .orderBy("doc_id")
    },
    // Corpus length-distribution profiling: exact percentile_cont /
    // percentile_disc (inverse-distribution functions) of document length
    // per language, through the SQL surface (A4). Exact percentiles hold a
    // per-group value-count map in the aggregation buffer — fine when the
    // value domain is bounded (doc lengths); at 100 TB with unbounded
    // domains the approx_percentile sketch is the scale path.
    "d26_length_quantiles" -> { (s, dir) =>
      t(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql(
        """SELECT lang, COUNT(*) AS n_docs,
          |  CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE) AS p25,
          |  CAST(percentile_cont(0.5)  WITHIN GROUP (ORDER BY n_chars) AS DOUBLE) AS p50,
          |  CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE) AS p75,
          |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p95_disc,
          |  MAX(n_chars) AS max_chars
          |FROM graft_documents GROUP BY lang ORDER BY lang""".stripMargin)
    },
    // Domain-mixing weights: the sampling weight per language that turns
    // the corpus's actual token distribution into a uniform target mix —
    // the "data mixture" computation every pre-training run does before
    // sampling shards. Token counts aggregate as BIGINT (exact, order-
    // independent); shares and weights are single IEEE divisions of those
    // exact integers, so both engines agree bit-for-bit. Two tiny
    // aggregates + a broadcast of the 1-row total — nothing scales with
    // corpus size except the one groupBy(lang).
    "d28_mix_weights" -> { (s, dir) =>
      val perLang = t(s, dir, "documents")
        .withColumn("n_tok", size(tokens(col("text"))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("lang_tokens"))
      val tot = perLang.agg(sum("lang_tokens").as("total_tokens"),
        count(lit(1)).as("n_langs"))
      perLang.crossJoin(broadcast(tot))
        .withColumn("token_share",
          col("lang_tokens").cast("double") / col("total_tokens"))
        .withColumn("mix_weight",
          col("total_tokens").cast("double") /
            (col("n_langs") * col("lang_tokens")).cast("double"))
        .select("lang", "n_docs", "lang_tokens", "token_share", "mix_weight")
        .orderBy("lang")
    },
    // D4d — fingerprinting: whole-doc content hash + min-shingle rolling
    // fingerprint (winnowing-style representative hash). The min rides on
    // the shared JVM docShingles table: min over the per-doc DISTINCT
    // shingle hashes equals min over all shingles, so the interpreted
    // per-shingle md5 HOF (measured 9.9s at sf0.1 — transform lambdas
    // never enter codegen) collapses to an array_min over the persisted
    // arrays the dedup family already built.
    "d10_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), md5(lower(col("text"))).as("doc_fp"))
        .join(DedupQueries.docShingles(s, dir)
          .select(col("doc_id"), array_min(col("h_arr")).as("min_shingle_fp")),
          Seq("doc_id"), "left")
        .select("doc_id", "doc_fp", "min_shingle_fp")
        .orderBy("doc_id")
    },
    // D4h — per-doc keyword extraction by TF-IDF. The idf is the RATIONAL
    // form N/df (not ln(N/df)): ln is not correctly-rounded-specified, so
    // Java's Math.log and DuckDB's libm can disagree in the last ULP and
    // break cross-engine hash equality; multiplication and division are
    // IEEE-exact, so `tf * (N / df)` — the same monotone-in-df ranking
    // family — reproduces bit-identically. Shape: two hash aggs (term
    // freq, doc freq) + a broadcast of the 1-row corpus count + a top-k
    // window per doc — every stage keyed, no corpus-sized driver state.
    "d31_tfidf_keywords" -> { (s, dir) =>
      // tf first, then df FROM tf: tf has exactly one row per (doc, tok),
      // so per-token row counts of tf ARE document frequencies — the
      // corpus is tokenized once and the countDistinct expand disappears.
      // tf (not the exploded token table) is what persists: it feeds both
      // the join and the df agg, and it's the smaller frame. Memoized so
      // d47 (BM25) reuses the identical materialization.
      //
      // Top-3 per doc stays a row_number WINDOW — the bounded
      // `topk_structs` aggregate was measured here and REJECTED for this
      // corpus shape (round 10, sf10 solo min-of-2: window 6.45 s /
      // 626 MB shuffled vs aggregate 6.59 s / 689 MB): fixture docs
      // average only ~2 tf rows per (doc, map partition), UNDER the k=3
      // partial-buffer size, so map-side combine prunes nothing and the
      // length-framed partial buffers are fatter than the window's
      // UnsafeRow stream. The aggregate wins only when rows-per-group-
      // per-task ≫ k (see d05's corpus-sized groups, where exactly that
      // shape is routed to bounded heaps); doc_id groups at ~70 distinct
      // tokens over 32 tasks are the opposite regime.
      import org.apache.spark.sql.expressions.Window
      val tf = docTf(s, dir)
      val docFreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = t(s, dir, "documents").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("tok"))
      tf.join(docFreq, "tok").crossJoin(broadcast(n))
        .withColumn("score", col("tf").cast("double") *
          (col("n").cast("double") / col("df").cast("double")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tf", "df", "score")
        .orderBy("doc_id", "rnk")
    },
    // D4i — per-source corpus HEALTH report: the dashboard a curation run
    // publishes after ingesting a source — volume, token mass, exact-dup
    // incidence (vs the WHOLE corpus, not just within-source), quality
    // pass rate (d08's gate), language spread. Two hash aggs (corpus-wide
    // dup counts, then per-source rollup) — no pairwise anything.
    "d33_corpus_report" -> { (s, dir) =>
      // no parallelism floor (round-13 A/B, min-of-4: 0.68 s → 0.91 s):
      // docs feeds two branches, so the floor's repartition would run
      // twice and both exchanges outweigh the ~100 ms map pass
      val docs = t(s, dir, "documents")
      val hashes = docs
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"))
      docs
        .withColumn("content_hash", sha2(col("text"), 256))
        .withColumn("tk", tokens(col("text")))
        .withColumn("n_tokens", size(col("tk")))
        .withColumn("distinct_ratio",
          size(array_distinct(col("tk"))).cast("double") / col("n_tokens"))
        .join(hashes, "content_hash")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0)).cast("long")
            .as("total_tokens"),
          count(when(col("n_copies") >= 2, lit(1))).as("n_dup_docs"),
          count(when(
            col("n_tokens").between(qualityMinTokens, qualityMaxTokens) &&
              col("distinct_ratio") >= qualityMinDistinctRatio,
            lit(1))).as("n_quality_ok"),
          countDistinct("lang").as("n_langs"))
        .orderBy("source")
    },
    // D4j — per-source PII DENSITY report (the audit view next to d13's
    // redaction): incidence of digit runs, email-shaped tokens, and
    // blocklist terms, plus the fraction of fully clean docs. One
    // map-side regexp pass per doc, one hash agg — zero joins, so the
    // shape is corpus-scan-bound at any scale. Patterns stay in the
    // RE2 ∩ Java-regex common subset so both engines count identically.
    "d37_pii_stats" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("digit_runs",
          expr("regexp_count(text, '[0-9]+')"))
        .withColumn("email_hits",
          expr("regexp_count(text, '[a-z0-9.]+@[a-z0-9.]+')"))
        .withColumn("block_hits",
          expr("regexp_count(text, '\\\\b(key|hash|secret)\\\\b')"))
      d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("digit_runs") > 0, 1L).otherwise(0L)).as("docs_with_digits"),
        sum(col("digit_runs").cast("long")).as("total_digit_runs"),
        sum(col("email_hits").cast("long")).as("total_email_hits"),
        sum(col("block_hits").cast("long")).as("total_block_hits"),
        (sum(when(col("digit_runs") === 0 && col("email_hits") === 0 &&
          col("block_hits") === 0, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("clean_frac"))
        .orderBy("source")
    },
    // D4k/D5 — sliding context-window split: long documents become
    // overlapping 64-token training windows with stride 48 (16-token
    // overlap), the standard long-context windowing step before packing
    // (d19). Window geometry derives from the token COUNT alone —
    // integer-only arithmetic, no token array materialization — so the
    // op is a map-side explode whose output is O(total_tokens / stride)
    // rows; the fingerprint is the md5 the downstream shard writer keys
    // on. Short docs yield exactly one (possibly short) window.
    "d38_window_split" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_tok", size(tokens(col("text"))))
        .withColumn("n_win",
          expr("CASE WHEN n_tok <= 64 THEN 1 ELSE 1 + ((n_tok - 64 + 47) div 48) END"))
        .withColumn("w", explode(sequence(lit(0), col("n_win") - 1)))
        .select(col("doc_id"),
          col("w").cast("long").as("window_id"),
          (col("w") * 48).cast("long").as("start_tok"),
          least(lit(64), col("n_tok") - col("w") * 48).cast("long").as("win_len"),
          md5(concat_ws(":", col("doc_id"), col("w"))).as("window_fp"))
        .orderBy("doc_id", "window_id")
    },
    // D4l — per-source LEXICAL-DIVERSITY audit: vocabulary size,
    // type-token ratio, hapax fraction. The corpus-health signal d33's
    // volume report can't see — a source whose vocabulary stops growing
    // (low TTR, low hapax share) is templated/machine-generated content.
    // Shape: one explode + two hash aggs keyed by (source, token) then
    // source — partial aggregation collapses each executor's token counts
    // before the shuffle, so wire volume is vocab-sized, not token-sized.
    "d40_lexical_diversity" -> { (s, dir) =>
      val tf = t(s, dir, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      val perSrc = tf.groupBy("source").agg(
        sum("cnt").as("total_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax_tokens"))
      val docs = t(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
      docs.join(perSrc, "source")
        .withColumn("type_token_ratio",
          col("distinct_tokens").cast("double") / col("total_tokens"))
        .withColumn("hapax_fraction",
          col("hapax_tokens").cast("double") / col("distinct_tokens"))
        .select("source", "n_docs", "total_tokens", "distinct_tokens",
          "hapax_tokens", "type_token_ratio", "hapax_fraction")
        .orderBy("source")
    },
    // D5g — PADDING-WASTE report: for each candidate context length, how
    // many fixed-size sequences the corpus shards into and what fraction
    // of slots is padding. The capacity-planning query behind choosing a
    // packing strategy (d19) and window geometry (d38). Integer-only
    // (ceil-div in BIGINT), one map-side explode by context length + one
    // tiny hash agg — corpus-scan-bound.
    "d41_padding_waste" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(size(tokens(col("text"))).as("n_tok"))
        .select(col("n_tok"),
          explode(array(lit(16), lit(32), lit(64), lit(128))).as("ctx_len"))
        .withColumn("n_seq", expr("(n_tok + ctx_len - 1) div ctx_len"))
        .groupBy("ctx_len").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("total_tokens"),
          sum("n_seq").as("total_sequences"),
          sum(col("n_seq") * col("ctx_len") - col("n_tok")).as("padding_tokens"))
        .withColumn("padding_fraction",
          col("padding_tokens").cast("double") /
            (col("total_sequences") * col("ctx_len")).cast("double"))
        .orderBy("ctx_len")
    },
    // D4m — APPLY the mix weights (d28 computes them, this samples by
    // them): deterministic hash-threshold sampling toward a uniform
    // per-language token budget at half the corpus size. Every doc's
    // keep/drop decision is a pure function of (doc_id, lang threshold) —
    // md5-uniform, no RNG state, reproducible shard-by-shard on any
    // engine and any partitioning, which is what makes the sampled
    // corpus re-derivable at 100 TB. One agg for language masses, one
    // broadcast join back, one conditional agg — no corpus-sized shuffle.
    "d42_mix_sample" -> { (s, dir) =>
      val withTok = t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
      val perLang = withTok.groupBy("lang")
        .agg(sum("n_tok").as("lang_tokens"))
      val tot = perLang.agg(sum("lang_tokens").as("total_tokens"),
        count(lit(1)).as("n_langs"))
      // target per-lang budget = half the uniform share; p = target/mass,
      // capped at 1; threshold = floor(p * 65536) compared against the
      // first 16 bits of md5(doc_id) — all IEEE-exact on both engines
      val withP = perLang.crossJoin(broadcast(tot))
        .withColumn("target_tokens",
          expr("total_tokens div (2 * n_langs)"))
        .withColumn("p", least(lit(1.0),
          col("target_tokens").cast("double") / col("lang_tokens")))
        .withColumn("thresh", floor(col("p") * 65536).cast("long"))
        .select("lang", "lang_tokens", "thresh")
      val u16 = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long")
      withTok.join(broadcast(withP), "lang")
        .withColumn("keep", u16 < col("thresh"))
        .groupBy("lang").agg(
          max("lang_tokens").as("lang_tokens"),
          max("thresh").as("sample_threshold"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("kept_tokens"))
        .orderBy("lang")
    },
    // D4n — BPE MERGE-PAIR statistics (tokenizer induction, step 1): count
    // every adjacent token pair in the corpus and keep the top-20 merge
    // candidates — the pair a byte-pair-encoding trainer would merge first,
    // plus document spread (a pair frequent in ONE doc is repetition, d24's
    // signal; frequent across MANY docs is a unit worth a vocab slot).
    // Shape: pairs are built map-side inside the scan (the codegen'd
    // token_ngrams byte-span kernel — no self-join, no positional explode,
    // no interpreted zip_with/concat), then one hash agg on the pair
    // string with partial aggregation, then TakeOrdered(20). At 100 TB
    // the agg key space is vocab², bounded and skew-free.
    "d44_bpe_pairs" -> { (s, dir) =>
      // UNCONDITIONAL repartition by doc_id before the ngram explode
      // (docTf's rationale, measured HERE): the (pair, doc_id) agg needs
      // one exchange either way, and the raw text is the cheaper payload
      // — sf1: 14.8 MB text vs 50.1 MB exploded pair partials (3.4x);
      // sf10: the pair form shuffled 537.7 MB. doc_id partitioning
      // satisfies the first agg's clustering, so no second exchange
      // appears; it also floors fixture parallelism (the old one-task
      // explode ran 1.2 s CPU serialized). Width follows the session's
      // shuffle-partition sizing (Q.exchangeWidth), not core count — see
      // docTf.
      t(s, dir, "documents")
        .repartition(Q.exchangeWidth(s), col("doc_id"))
        .select(col("doc_id"),
          explode(tokenNgrams(col("text"), 2, 1)).as("pair"))
        // DECOMPOSED count + count-distinct (the q18 pattern): the fused
        // agg Expands every exploded pair row 2x through the exchange for
        // the distinct leg. Two-level instead: per-(pair, doc) partial
        // counts collapse map-side (duplicate pairs within a doc are
        // common in repetitive text), then one tiny pair-level agg gets
        // n_occurrences = sum and n_docs = count for free.
        .groupBy("pair", "doc_id").agg(count(lit(1)).as("in_doc"))
        .groupBy("pair").agg(
          sum("in_doc").as("n_occurrences"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("pair"))
        .limit(20)
    },
    // D4o — quality-filter FUNNEL: the per-stage retention accounting a
    // curation run publishes (how many docs survive length → diversity →
    // language → exact-dedup, cumulatively). One map-side flag pass + one
    // corpus hash agg for the dedup keeper + a single-row aggregate
    // stacked into per-stage rows — no stage reruns the corpus scan, so
    // adding funnel stages at 100 TB costs columns, not passes.
    "d46_quality_funnel" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("h", sha2(col("text"), 256))
        .withColumn("tk", tokens(col("text")))
        .withColumn("n_tokens", size(col("tk")))
        .withColumn("dr",
          size(array_distinct(col("tk"))).cast("double") / col("n_tokens"))
      val keepers = d.groupBy("h").agg(min("doc_id").as("keeper"))
      d.join(keepers, "h")
        .withColumn("f1",
          col("n_tokens").between(qualityMinTokens, qualityMaxTokens))
        .withColumn("f2", col("f1") && col("dr") >= qualityMinDistinctRatio)
        .withColumn("f3", col("f2") && col("lang") === "en")
        .withColumn("f4", col("f3") && col("doc_id") === col("keeper"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("f1"), 1L).otherwise(0L)).as("n_len"),
          sum(when(col("f2"), 1L).otherwise(0L)).as("n_div"),
          sum(when(col("f3"), 1L).otherwise(0L)).as("n_lang"),
          sum(when(col("f4"), 1L).otherwise(0L)).as("n_uniq"))
        .selectExpr(
          """stack(5,
            |  0, 'total',        n_total, CAST(n_total AS DOUBLE) / n_total,
            |  1, 'length',       n_len,   CAST(n_len   AS DOUBLE) / n_total,
            |  2, 'diversity',    n_div,   CAST(n_div   AS DOUBLE) / n_total,
            |  3, 'lang_en',      n_lang,  CAST(n_lang  AS DOUBLE) / n_total,
            |  4, 'exact_unique', n_uniq,  CAST(n_uniq  AS DOUBLE) / n_total
            |) AS (stage, stage_name, n_docs, retained)""".stripMargin)
        .orderBy("stage")
    },
    // D4p — BM25 retrieval scoring against the corpus's own top-3 global
    // terms (deterministic query set). idf uses the log-free rational
    // variant (N - df + ½)/(df + ½) — same ranking family, and exact
    // given identical IEEE inputs (ln is not cross-engine bit-stable).
    // Per-term scores quantize to nano-units (BIGINT) before the per-doc
    // sum, so the float-sum never crosses a partial-aggregation boundary.
    // Shape: tf hash agg → tiny broadcast query-term + corpus-stats
    // frames → map-side scoring → per-doc agg → TakeOrdered(10).
    "d47_bm25" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tf = docTf(s, dir)
      val dl = docs.select(col("doc_id"),
        size(tokens(col("text"))).as("dl"))
      val st = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tok"))
        .withColumn("avgdl",
          col("total_tok").cast("double") / col("n_docs"))
        .select("n_docs", "avgdl")
      val qterms = tf.groupBy("tok")
        .agg(sum("tf").as("n_occ"), count(lit(1)).as("df"))
        .orderBy(col("n_occ").desc, col("tok"))
        .limit(3)
      tf.join(broadcast(qterms), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(st))
        .withColumn("idf",
          (col("n_docs").cast("double") - col("df") + 0.5) /
            (col("df").cast("double") + 0.5))
        .withColumn("den",
          col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
        .withColumn("score_q",
          floor(col("idf") * ((col("tf").cast("double") * lit(2.2)) / col("den"))
            * lit(1000000000.0)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum("score_q").as("bm25_q"))
        .orderBy(col("bm25_q").desc, col("doc_id"))
        .limit(10)
    },
    // D4q — per-source TOKEN-BUDGET downsampling: materialize "take ~B
    // tokens from every source", the step after d28/d42 decide mixing
    // proportions. Selection order is a deterministic md5 rank (d14's
    // trick — RNG-free, reproducible across engines); the running token
    // total is a per-source window, i.e. a keyed shuffle that stays
    // partition-parallel at 100 TB (no global sort). A doc is kept while
    // the budget is unexhausted BEFORE it, so each source fills its
    // budget and overshoots by at most one document.
    "d49_token_budget" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val budget = 3000L
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).as("n_tokens"))
        .withColumn("cum", sum("n_tokens").over(w))
        .withColumn("kept", col("cum") - col("n_tokens") < budget)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("tokens_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L))
            .as("tokens_kept"))
        .withColumn("kept_frac",
          col("tokens_kept").cast("double") / col("tokens_total"))
        .orderBy("source")
    },
    // D4r — quality-score CALIBRATION curve: does the cheap lexical-
    // diversity score actually separate duplicates? Docs bucket by
    // floor(distinct_ratio × 10) and each bucket reports volume,
    // exact-dup incidence, and token mass — the "is this filter
    // threshold doing anything" audit run before a corpus-wide gate
    // ships. One map-side pass + one corpus hash agg + a 10-row rollup.
    "d54_quality_calibration" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // n_copies as a window count over the hash — ONE pass over the
      // sha256+tokenize projections (a groupBy+self-join formulation
      // re-evaluates that dominant scan lineage twice; no exchange reuse)
      t(s, dir, "documents")
        .withColumn("h", sha2(col("text"), 256))
        .withColumn("tk", tokens(col("text")))
        .withColumn("n_tokens", size(col("tk")))
        .withColumn("dr",
          size(array_distinct(col("tk"))).cast("double") / col("n_tokens"))
        .withColumn("n_copies",
          count(lit(1)).over(Window.partitionBy("h")))
        .withColumn("bucket",
          least(floor(col("dr") * 10).cast("int"), lit(9)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_copies") >= 2, 1L).otherwise(0L)).as("n_dup_docs"),
          sum("n_tokens").as("total_tokens"))
        .withColumn("dup_rate",
          col("n_dup_docs").cast("double") / col("n_docs"))
        .orderBy("bucket")
    },
    // D4s — per-column DATA PROFILE: the ANALYZE-style table report
    // (row count, null count, exact distinct count per column) a catalog
    // publishes after ingest. One aggregate pass (Spark expands the
    // multi-distinct into one Expand + agg); at 100 TB the exact
    // countDistincts swap for approx_count_distinct (HLL) — the profile
    // shape is the operator, exactness here is for the oracle.
    "d60_data_profile" -> { (s, dir) =>
      t(s, dir, "documents")
        .agg(count(lit(1)).as("n"),
          sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("nn_id"),
          countDistinct("doc_id").as("nd_id"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("nn_text"),
          countDistinct("text").as("nd_text"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("nn_lang"),
          countDistinct("lang").as("nd_lang"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("nn_src"),
          countDistinct("source").as("nd_src"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("nn_nc"),
          countDistinct("n_chars").as("nd_nc"))
        .selectExpr(
          """stack(5,
            |  'doc_id',  n, nn_id,   nd_id,
            |  'lang',    n, nn_lang, nd_lang,
            |  'n_chars', n, nn_nc,   nd_nc,
            |  'source',  n, nn_src,  nd_src,
            |  'text',    n, nn_text, nd_text
            |) AS (column_name, n_rows, n_nulls, n_distinct)""".stripMargin)
        .orderBy("column_name")
    },
    // D4t — K-ANONYMITY audit over quasi-identifiers: how many documents
    // sit in (lang, source, length-bucket) equivalence classes smaller
    // than k — the re-identification-risk check a governance review runs
    // before releasing or training on the corpus. One keyed agg over the
    // quasi-identifier tuple + a one-row rollup.
    "d63_k_anonymity" -> { (s, dir) =>
      t(s, dir, "documents")
        // integer DIV, not double-divide-and-truncate: floor semantics
        // must match the oracle's `//` on negatives / beyond-2^53 values
        .withColumn("len_bucket", expr("n_chars div 100"))
        .groupBy("lang", "source", "len_bucket")
        .agg(count(lit(1)).as("class_size"))
        .agg(count(lit(1)).as("n_classes"),
          sum("class_size").as("n_docs"),
          sum(when(col("class_size") < kAnon, 1L).otherwise(0L))
            .as("n_small_classes"),
          sum(when(col("class_size") < kAnon, col("class_size"))
            .otherwise(0L)).as("n_docs_at_risk"),
          min("class_size").as("min_class_size"))
        .withColumn("at_risk_frac",
          col("n_docs_at_risk").cast("double") / col("n_docs"))
        .select("n_classes", "n_docs", "n_small_classes", "n_docs_at_risk",
          "min_class_size", "at_risk_frac")
    }
  )

  val oracle: Map[String, String] = Map(
    "d24_repetition" ->
      """SELECT doc_id,
        |  CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(bg)) AS INT) AS uniq2,
        |  CAST(len(list_distinct(tg)) AS INT) AS uniq3,
        |  CASE WHEN len(tk) > 1
        |       THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / (len(tk) - 1) END AS dup2_ratio,
        |  CASE WHEN len(tk) > 2
        |       THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / (len(tk) - 2) END AS dup3_ratio,
        |  (CASE WHEN len(tk) > 1
        |        THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / (len(tk) - 1) END) > 0.5
        |    OR (CASE WHEN len(tk) > 2
        |        THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / (len(tk) - 2) END) > 0.4
        |    AS is_repetitive
        |FROM (
        |  SELECT doc_id, tk,
        |    list_transform(range(len(tk) - 1), i -> tk[i+1] || ' ' || tk[i+2]) AS bg,
        |    list_transform(range(len(tk) - 2), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]) AS tg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) raw) t
        |ORDER BY doc_id""".stripMargin,
    "d28_mix_weights" ->
      """WITH per_lang AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS lang_tokens
        |  FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
        |         COUNT(*) AS n_langs
        |  FROM per_lang)
        |SELECT lang, n_docs, lang_tokens,
        |       CAST(lang_tokens AS DOUBLE) / total_tokens AS token_share,
        |       CAST(total_tokens AS DOUBLE)
        |         / CAST(n_langs * lang_tokens AS DOUBLE) AS mix_weight
        |FROM per_lang CROSS JOIN tot ORDER BY lang""".stripMargin,
    "d26_length_quantiles" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE) AS p25,
        |  CAST(percentile_cont(0.5)  WITHIN GROUP (ORDER BY n_chars) AS DOUBLE) AS p50,
        |  CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE) AS p75,
        |  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p95_disc,
        |  MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
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
      s"""SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(tk)) AS INT) AS n_distinct,
        |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS distinct_ratio,
        |  CAST(length(text) - len(tk) + 1 AS DOUBLE) / len(tk) AS mean_tok_len,
        |  (len(tk) BETWEEN $qualityMinTokens AND $qualityMaxTokens)
        |    AND CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) >= $qualityMinDistinctRatio AS quality_ok
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "d09_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$bpeishRegex')) AS INT) AS bpeish_tokens,
         |  CAST(length(text) AS INT) AS n_chars,
         |  CAST(length(text) AS DOUBLE)
         |    / len(regexp_extract_all(text, '$bpeishRegex')) AS chars_per_token
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
    "d15_pipeline_prep" ->
      s"""WITH q AS (
         |  SELECT doc_id, text, lang, source,
         |         len(string_split(text, ' ')) AS n_tokens
         |  FROM documents
         |  WHERE len(string_split(text, ' ')) BETWEEN $qualityMinTokens AND $qualityMaxTokens
         |    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |        / len(string_split(text, ' ')) >= $qualityMinDistinctRatio),
        |d AS (
        |  SELECT * FROM (
        |    SELECT q.*, row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY doc_id) AS rn_dup FROM q) x WHERE rn_dup = 1),
        |s AS (
        |  SELECT * FROM (
        |    SELECT d.*, row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM d) y
        |  WHERE rn <= 5)
        |SELECT lang, source, COUNT(*) AS n_kept,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM s GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "d16_ngram_vocab" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS ngram
        |  FROM (SELECT doc_id, string_split(text, ' ') tk,
        |               unnest(range(len(string_split(text, ' ')) - 2)) AS i
        |        FROM documents) raw)
        |SELECT ngram, COUNT(*) AS df FROM sh GROUP BY ngram
        |ORDER BY df DESC, ngram LIMIT 20""".stripMargin,
    "d19_sequence_pack" ->
      s"""WITH tok AS (
         |  SELECT source, doc_id,
         |         len(regexp_extract_all(text, '$bpeishRegex')) AS n_tok
         |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM tok)
        |SELECT source, CAST((cum - n_tok) // 256 AS BIGINT) AS seq_id,
        |       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
        |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM c GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin,
    "d10_fingerprint" ->
      s"""SELECT doc_id, md5(lower(text)) AS doc_fp,
         |  list_aggregate(list_transform(sh, x -> ${oTokenHash60("x")}), 'min') AS min_shingle_fp
         |FROM (
         |  SELECT doc_id, text,
         |    list_transform(range(len(string_split(text,' ')) - 2),
         |      i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3]) AS sh
         |  FROM documents) t
         |ORDER BY doc_id""".stripMargin,
    "d31_tfidf_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
        |docfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df
        |            FROM tok GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.tok, tf, df,
        |         CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE))
        |           AS score
        |  FROM tf JOIN docfreq ON tf.tok = docfreq.tok CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY score DESC, tok) AS rnk
        |  FROM scored)
        |SELECT doc_id, rnk, tok, tf, df, score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "d33_corpus_report" ->
      s"""WITH d AS (
         |  SELECT source, lang, sha256(text) AS content_hash,
         |         len(string_split(text, ' ')) AS n_tokens,
         |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |           / len(string_split(text, ' ')) AS distinct_ratio
         |  FROM documents),
         |h AS (SELECT content_hash, COUNT(*) AS n_copies
         |      FROM d GROUP BY content_hash)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |       COUNT(*) FILTER (WHERE n_copies >= 2) AS n_dup_docs,
         |       COUNT(*) FILTER (WHERE n_tokens BETWEEN $qualityMinTokens
         |                          AND $qualityMaxTokens
         |                          AND distinct_ratio >= $qualityMinDistinctRatio)
         |         AS n_quality_ok,
         |       COUNT(DISTINCT lang) AS n_langs
         |FROM d JOIN h USING (content_hash)
         |GROUP BY source ORDER BY source""".stripMargin,
    "d37_pii_stats" ->
      """WITH d AS (
        |  SELECT source,
        |         len(regexp_extract_all(text, '[0-9]+')) AS digit_runs,
        |         len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+'))
        |           AS email_hits,
        |         len(regexp_extract_all(text, '\b(key|hash|secret)\b'))
        |           AS block_hits
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN digit_runs > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_with_digits,
        |  CAST(SUM(digit_runs) AS BIGINT) AS total_digit_runs,
        |  CAST(SUM(email_hits) AS BIGINT) AS total_email_hits,
        |  CAST(SUM(block_hits) AS BIGINT) AS total_block_hits,
        |  CAST(SUM(CASE WHEN digit_runs = 0 AND email_hits = 0
        |                 AND block_hits = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS clean_frac
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "d38_window_split" ->
      """WITH d AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, n_tok,
        |         CASE WHEN n_tok <= 64 THEN 1
        |              ELSE 1 + (n_tok - 64 + 47) // 48 END AS n_win
        |  FROM d)
        |SELECT doc_id,
        |       CAST(wi AS BIGINT) AS window_id,
        |       CAST(wi * 48 AS BIGINT) AS start_tok,
        |       CAST(least(64, n_tok - wi * 48) AS BIGINT) AS win_len,
        |       md5(CAST(doc_id AS VARCHAR) || ':' || CAST(wi AS VARCHAR))
        |         AS window_fp
        |FROM w, unnest(range(n_win)) AS t(wi)
        |ORDER BY doc_id, window_id""".stripMargin,
    "d40_lexical_diversity" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT source, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
        |per_src AS (
        |  SELECT source,
        |         CAST(SUM(cnt) AS BIGINT) AS total_tokens,
        |         COUNT(*) AS distinct_tokens,
        |         CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS hapax_tokens
        |  FROM tf GROUP BY source),
        |docs AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
        |SELECT d.source, n_docs, total_tokens, distinct_tokens, hapax_tokens,
        |       CAST(distinct_tokens AS DOUBLE) / total_tokens
        |         AS type_token_ratio,
        |       CAST(hapax_tokens AS DOUBLE) / distinct_tokens
        |         AS hapax_fraction
        |FROM docs d JOIN per_src p ON d.source = p.source
        |ORDER BY d.source""".stripMargin,
    "d41_padding_waste" ->
      """WITH d AS (
        |  SELECT len(string_split(text, ' ')) AS n_tok FROM documents),
        |x AS (
        |  SELECT n_tok, ctx_len, (n_tok + ctx_len - 1) // ctx_len AS n_seq
        |  FROM d, unnest([16, 32, 64, 128]) AS t(ctx_len))
        |SELECT CAST(ctx_len AS INT) AS ctx_len, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |       CAST(SUM(n_seq) AS BIGINT) AS total_sequences,
        |       CAST(SUM(n_seq * ctx_len - n_tok) AS BIGINT) AS padding_tokens,
        |       CAST(SUM(n_seq * ctx_len - n_tok) AS DOUBLE) /
        |         (CAST(SUM(n_seq) AS BIGINT) * ctx_len) AS padding_fraction
        |FROM x GROUP BY ctx_len ORDER BY ctx_len""".stripMargin,
    "d42_mix_sample" ->
      """WITH wt AS (
        |  SELECT lang, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |pl AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens
        |       FROM wt GROUP BY lang),
        |tot AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
        |               COUNT(*) AS n_langs
        |        FROM pl),
        |wp AS (
        |  SELECT lang, lang_tokens,
        |         CAST(FLOOR(
        |           LEAST(CAST(1.0 AS DOUBLE),
        |                 CAST(total_tokens // (2 * n_langs) AS DOUBLE)
        |                   / lang_tokens) * 65536) AS BIGINT) AS thresh
        |  FROM pl, tot)
        |SELECT w.lang,
        |       MAX(lang_tokens) AS lang_tokens,
        |       MAX(thresh) AS sample_threshold,
        |       CAST(SUM(CASE WHEN u16 < thresh THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_kept,
        |       CAST(SUM(CASE WHEN u16 < thresh THEN n_tok ELSE 0 END) AS BIGINT)
        |         AS kept_tokens
        |FROM (SELECT lang, n_tok,
        |             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |                  AS BIGINT) AS u16
        |      FROM wt) w
        |JOIN wp ON w.lang = wp.lang
        |GROUP BY w.lang ORDER BY w.lang""".stripMargin,
    "d44_bpe_pairs" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pairs AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(t)),
        |           i -> t[i] || ' ' || t[i + 1])) AS pair
        |  FROM tk)
        |SELECT pair,
        |       COUNT(*) AS n_occurrences,
        |       COUNT(DISTINCT doc_id) AS n_docs
        |FROM pairs GROUP BY pair
        |ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,
    "d46_quality_funnel" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, sha256(text) AS h,
         |         len(string_split(text, ' ')) AS n_tokens,
         |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |           / len(string_split(text, ' ')) AS dr
         |  FROM documents),
         |c AS (SELECT h, MIN(doc_id) AS keeper FROM d GROUP BY h),
         |f AS (
         |  SELECT d.*, keeper,
         |         (n_tokens BETWEEN $qualityMinTokens AND $qualityMaxTokens)
         |           AS f1
         |  FROM d JOIN c USING (h)),
         |a AS (
         |  SELECT COUNT(*) AS n_total,
         |    COUNT(*) FILTER (WHERE f1) AS n_len,
         |    COUNT(*) FILTER (WHERE f1 AND dr >= $qualityMinDistinctRatio)
         |      AS n_div,
         |    COUNT(*) FILTER (WHERE f1 AND dr >= $qualityMinDistinctRatio
         |                       AND lang = 'en') AS n_lang,
         |    COUNT(*) FILTER (WHERE f1 AND dr >= $qualityMinDistinctRatio
         |                       AND lang = 'en' AND doc_id = keeper) AS n_uniq
         |  FROM f)
         |SELECT * FROM (
         |  SELECT CAST(0 AS INT) AS stage, 'total' AS stage_name,
         |         n_total AS n_docs,
         |         CAST(n_total AS DOUBLE) / n_total AS retained FROM a
         |  UNION ALL SELECT CAST(1 AS INT), 'length', n_len,
         |         CAST(n_len AS DOUBLE) / n_total FROM a
         |  UNION ALL SELECT CAST(2 AS INT), 'diversity', n_div,
         |         CAST(n_div AS DOUBLE) / n_total FROM a
         |  UNION ALL SELECT CAST(3 AS INT), 'lang_en', n_lang,
         |         CAST(n_lang AS DOUBLE) / n_total FROM a
         |  UNION ALL SELECT CAST(4 AS INT), 'exact_unique', n_uniq,
         |         CAST(n_uniq AS DOUBLE) / n_total FROM a
         |) s ORDER BY stage""".stripMargin,
    "d47_bm25" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
        |       FROM documents),
        |st AS (SELECT COUNT(*) AS n_docs,
        |              CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |qt AS (SELECT tok, SUM(tf) AS n_occ, COUNT(*) AS df FROM tf
        |       GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 3),
        |sc AS (
        |  SELECT tf.doc_id,
        |    floor(
        |      ((CAST(n_docs AS DOUBLE) - df + 0.5)
        |         / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * 2.2)
        |         / (CAST(tf AS DOUBLE)
        |            + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      * 1000000000.0) AS score_q
        |  FROM tf JOIN qt USING (tok) JOIN dl USING (doc_id) CROSS JOIN st)
        |SELECT doc_id, COUNT(*) AS n_terms,
        |       CAST(SUM(CAST(score_q AS BIGINT)) AS BIGINT) AS bm25_q
        |FROM sc GROUP BY doc_id ORDER BY bm25_q DESC, doc_id LIMIT 10""".stripMargin,
    "d49_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         len(string_split(text, ' ')) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_tokens) OVER (PARTITION BY source
        |            ORDER BY rk, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
        |       CAST(SUM(CASE WHEN cum - n_tokens < 3000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_kept,
        |       CAST(SUM(CASE WHEN cum - n_tokens < 3000 THEN n_tokens
        |                     ELSE 0 END) AS BIGINT) AS tokens_kept,
        |       CAST(SUM(CASE WHEN cum - n_tokens < 3000 THEN n_tokens
        |                     ELSE 0 END) AS DOUBLE)
        |         / CAST(SUM(n_tokens) AS DOUBLE) AS kept_frac
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "d54_quality_calibration" ->
      """WITH d AS (
        |  SELECT doc_id, sha256(text) AS h,
        |         len(string_split(text, ' ')) AS n_tokens,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' ')) AS dr
        |  FROM documents),
        |c AS (SELECT h, COUNT(*) AS n_copies FROM d GROUP BY h)
        |SELECT CAST(least(floor(dr * 10), 9) AS INT) AS bucket,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_dup_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(SUM(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END)
        |            AS DOUBLE) / COUNT(*) AS dup_rate
        |FROM d JOIN c USING (h)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "d60_data_profile" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_id,
        |    COUNT(DISTINCT doc_id) AS nd_id,
        |    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_text,
        |    COUNT(DISTINCT text) AS nd_text,
        |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_lang,
        |    COUNT(DISTINCT lang) AS nd_lang,
        |    CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_src,
        |    COUNT(DISTINCT source) AS nd_src,
        |    CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_nc,
        |    COUNT(DISTINCT n_chars) AS nd_nc
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT 'doc_id' AS column_name, n AS n_rows, nn_id AS n_nulls,
        |         nd_id AS n_distinct FROM a
        |  UNION ALL SELECT 'lang', n, nn_lang, nd_lang FROM a
        |  UNION ALL SELECT 'n_chars', n, nn_nc, nd_nc FROM a
        |  UNION ALL SELECT 'source', n, nn_src, nd_src FROM a
        |  UNION ALL SELECT 'text', n, nn_text, nd_text FROM a
        |) s ORDER BY column_name""".stripMargin,
    "d63_k_anonymity" ->
      s"""WITH c AS (
         |  SELECT lang, source, n_chars // 100 AS len_bucket,
         |         COUNT(*) AS class_size
         |  FROM documents GROUP BY lang, source, len_bucket),
         |a AS (
         |  SELECT COUNT(*) AS n_classes,
         |         CAST(SUM(class_size) AS BIGINT) AS n_docs,
         |         CAST(SUM(CASE WHEN class_size < $kAnon THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_small_classes,
         |         CAST(SUM(CASE WHEN class_size < $kAnon THEN class_size
         |                       ELSE 0 END) AS BIGINT) AS n_docs_at_risk,
         |         MIN(class_size) AS min_class_size
         |  FROM c)
         |SELECT n_classes, n_docs, n_small_classes, n_docs_at_risk,
         |       min_class_size,
         |       CAST(n_docs_at_risk AS DOUBLE) / n_docs AS at_risk_frac
         |FROM a""".stripMargin
  )
}
