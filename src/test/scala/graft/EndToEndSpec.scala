package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.api.{GraftEngine, Webhook}
import graft.graph.{GraphLoader, GraphRunner}

/** Whole-engine integration: webhook ingestion → stream consumer that
  * dedupes + upserts under checkpointing → SQL node aggregation, wired by
  * graph.yml and driven purely by catalog events (SURVEY.md §3.3 trace).
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("ingest -> incremental dedupe/upsert -> sql aggregate pipeline") {
    val root = freshRoot()
    val dir = Files.createTempDirectory("e2e-")
    Files.write(dir.resolve("totals.sql"),
      """SELECT status, COUNT(*) AS n, SUM(amount) AS total
        |FROM {{ src }} GROUP BY status""".stripMargin
        .getBytes(StandardCharsets.UTF_8))

    val yaml =
      """functions:
        |  - webhook: ingest
        |    id: aaaaaaaa
        |  - node_file: consumer
        |    id: bbbbbbbb
        |    inputs:  {in: ingest}
        |    outputs: {out: orders_clean}
        |  - node_file: totals.sql
        |    id: cccccccc
        |    inputs:  {src: orders_clean}
        |    outputs: {out: totals}
        |stores:
        |  - table: ingest
        |  - table: orders_clean
        |  - table: totals
        |""".stripMargin

    val runner = new GraphRunner(spark, GraphLoader.parse(yaml), root, Some(dir))
      .register("consumer", eng => {
        // exactly-once incremental consumption off the webhook table,
        // keyed upsert into the clean table
        val out = eng.table("out", "w").init(uniqueOn = Seq("order_id"))
        val st = eng.table("in").asStream(orderBy = Webhook.requestKeyCol)
        val rows = st.consumeRecords().map { r =>
          val payload = r.getAs[String]("payload")
          val parsed = ujsonish(payload)
          (parsed("order_id").toLong, parsed("status"), parsed("amount").toDouble)
        }.toSeq
        if (rows.nonEmpty)
          out.upsert(rows.toDF("order_id", "status", "amount"))
        st.checkpoint()
      })

    // 1st webhook delivery (incl. a duplicate order that must upsert-merge)
    val ingestEngine = new GraftEngine(spark, root, "http")
    Webhook.ingest(ingestEngine, "ingest", "r1", """{"order_id":1,"status":"open","amount":10.5}""")
    Webhook.ingest(ingestEngine, "ingest", "r2", """{"order_id":2,"status":"open","amount":3.0}""")
    Webhook.ingest(ingestEngine, "ingest", "r3", """{"order_id":1,"status":"paid","amount":10.5}""")
    runner.trigger("bbbbbbbb")

    val probe = new GraftEngine(spark, root, "probe")
    val clean1 = probe.table("orders_clean").read
      .as[(Long, String, Double)].collect().map { case (k, s, a) => k -> ((s, a)) }.toMap
    assert(clean1 == Map(1L -> ("paid", 10.5), 2L -> ("open", 3.0)))
    val totals1 = probe.table("totals").read
      .as[(String, Long, Double)].collect().map { case (s, n, t) => s -> ((n, t)) }.toMap
    assert(totals1 == Map("open" -> ((1L, 3.0)), "paid" -> ((1L, 10.5))))

    // 2nd delivery: only the new record is consumed (cursor persisted)
    Webhook.ingest(ingestEngine, "ingest", "r4", """{"order_id":3,"status":"open","amount":7.0}""")
    runner.trigger("bbbbbbbb")
    val probe2 = new GraftEngine(spark, root, "probe2")
    assert(probe2.table("orders_clean").read.count() == 3)
    val totals2 = probe2.table("totals").read
      .as[(String, Long, Double)].collect().map { case (s, n, t) => s -> ((n, t)) }.toMap
    assert(totals2 == Map("open" -> ((2L, 10.0)), "paid" -> ((1L, 10.5))))
    // event log drove the cascade: totals updated twice without being
    // triggered directly
    assert(probe2.table("totals").manifest.events.nonEmpty)
  }

  /** Minimal flat-JSON field extractor for test payloads. */
  private def ujsonish(s: String): Map[String, String] =
    "\"?([a-z_]+)\"?\\s*:\\s*\"?([^,}\"]+)\"?".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap
}
