package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.graph.{GraphLoader, GraphRunner}

/** Flagship integration: the training-data prep operators (§2.D) running as
  * a graph.yml APP on the engine itself — ingestion node → quality-filter +
  * exact-dedup node (keyed upsert) → SQL stats node, cascaded purely by
  * catalog events. The shape a devkit user would deploy: each stage is a
  * node, each hand-off a versioned table, and re-running is idempotent
  * because the write is an upsert on the content key.
  */
class CorpusPrepAppSpec extends SparkSpec {
  import spark.implicits._

  test("documents -> quality filter + dedup -> per-lang stats, via graph cascade") {
    val root = freshRoot()
    val dir = Files.createTempDirectory("prep-")
    Files.write(dir.resolve("stats.sql"),
      """SELECT lang, COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens
        |FROM {{ clean }} GROUP BY lang""".stripMargin
        .getBytes(StandardCharsets.UTF_8))

    val yaml =
      """functions:
        |  - node_file: ingest
        |    id: aaaaaaaa
        |    outputs: {out: raw_docs}
        |  - node_file: prep
        |    id: bbbbbbbb
        |    inputs:  {in: raw_docs}
        |    outputs: {out: clean_docs}
        |  - node_file: stats.sql
        |    id: cccccccc
        |    inputs:  {clean: clean_docs}
        |    outputs: {out: lang_stats}
        |stores:
        |  - table: raw_docs
        |  - table: clean_docs
        |  - table: lang_stats
        |""".stripMargin

    val fixtures = "/root/testdata/sf0.001"
    val runner = new GraphRunner(spark, GraphLoader.parse(yaml), root, Some(dir))
      .register("ingest", eng => {
        // ingestion stage: land the raw corpus (idempotent replace)
        val out = eng.table("out", "w")
        out.replace(spark.read.parquet(s"$fixtures/documents.parquet"))
      })
      .register("prep", eng => {
        // quality gate + exact dedup (keep min doc_id per content hash),
        // upserted on content_hash so re-runs merge instead of duplicating
        val out = eng.table("out", "w").init(uniqueOn = Seq("content_hash"))
        val docs = eng.table("in").read
          .withColumn("n_tokens", size(split(col("text"), " ")))
          .filter(col("n_tokens") >= 5)
          .withColumn("content_hash", sha2(col("text"), 256))
        val deduped = docs
          .groupBy("content_hash")
          .agg(min("doc_id").as("doc_id"), first("lang").as("lang"),
            first("n_tokens").as("n_tokens"))
        out.upsert(deduped)
      })

    runner.trigger("aaaaaaaa")

    val probe = new graft.api.GraftEngine(spark, root, "probe")
    val raw = probe.table("raw_docs").read.count()
    val clean = probe.table("clean_docs").read
    val cleanN = clean.count()
    assert(raw > 0 && cleanN > 0 && cleanN <= raw)
    // dedup really happened: content hashes are unique
    assert(clean.select("content_hash").distinct().count() == cleanN)
    // the SQL stats node ran off the cascade without a direct trigger
    val stats = probe.table("lang_stats").read
      .as[(String, Long, Long)].collect().map { case (l, n, _) => l -> n }.toMap
    assert(stats.values.sum == cleanN)
    assert(stats.keySet.subsetOf(Set("en", "de", "es", "fr", "zh")))

    // re-running the whole app is idempotent: upsert on content_hash merges
    runner.trigger("aaaaaaaa")
    val probe2 = new graft.api.GraftEngine(spark, root, "probe2")
    assert(probe2.table("clean_docs").read.count() == cleanN)
  }
}
