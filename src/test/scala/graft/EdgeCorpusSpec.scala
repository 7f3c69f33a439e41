package graft.queries

import graft.SparkSpec

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Degenerate-corpus hardening for the dedup battery: documents with null
  * text, empty text, and fewer than 3 tokens have no 3-shingles, so they
  * must flow through (never crash) and stay OUT of shingle-based candidate
  * generation — mirroring the DuckDB oracles, whose exploded-shingle CTEs
  * simply have no rows for them. The driver fixtures contain no such docs,
  * so this spec synthesizes a corpus that does.
  */
class EdgeCorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("edge-corpus-").toString
    val rows = Seq(
      // two exact near-dup long docs (share most 3-grams)
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0", 46L),
      (1L, "alpha beta gamma delta epsilon zeta eta iota", "en", "src1", 45L),
      // degenerate docs: 2 tokens, 1 token, empty string, null
      (2L, "alpha beta", "en", "src0", 10L),
      (3L, "alpha", "en", "src1", 5L),
      (4L, "", "en", "src0", 0L),
      (5L, null.asInstanceOf[String], "en", "src1", 0L),
      // an unrelated long doc
      (6L, "one two three four five six seven eight nine", "en", "src1", 44L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("docShingles keeps degenerate docs as empty sets (no crash on null text)") {
    val sh = DedupQueries.docShingles(spark, dir)
      .select(col("doc_id"), size(col("h_arr")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(sh.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    assert(sh(2L) == 0 && sh(3L) == 0 && sh(4L) == 0 && sh(5L) == 0)
    assert(sh(0L) > 0 && sh(1L) > 0 && sh(6L) > 0)
  }

  test("shingle-less docs never enter LSH banding or near-dup pairs") {
    val cand = DedupQueries.queries("d03_dedup_minhash_lsh")(spark, dir)
      .select("da", "db").as[(Long, Long)].collect()
    val est = DedupQueries.queries("d25_minhash_estimate")(spark, dir)
      .select("da", "db").as[(Long, Long)].collect()
    val pairs = DedupQueries.queries("d02_dedup_jaccard")(spark, dir)
      .select("da", "db").as[(Long, Long)].collect()
    val degenerate = Set(2L, 3L, 4L, 5L)
    (cand ++ est ++ pairs).foreach { case (a, b) =>
      assert(!degenerate(a) && !degenerate(b), s"degenerate doc in pair ($a,$b)")
    }
    // the two true near-dups are still found
    assert(pairs.contains((0L, 1L)))
  }

  test("d27 decontamination omits shingle-less eval docs like its oracle") {
    val out = DedupQueries.queries("d27_decontamination")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    // src0 docs: 0 (long), 2 (2 tokens), 4 (empty) -> only doc 0 qualifies
    assert(out == Set(0L))
  }
}
