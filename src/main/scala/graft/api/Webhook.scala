package graft.api

import org.apache.spark.sql.functions._

/** Webhook ingestion semantics (reference edit.py:156-173,
  * create.py:177-197): an HTTP-ingestion node appends request payloads to
  * an output table of the same name; request/response correlation rides on
  * a `patterns_request_key` column (node.py:544-553).
  *
  * The HTTP listener itself is platform plumbing (out of engine scope) —
  * these helpers are the engine-side append/respond surface it would call.
  */
object Webhook {
  val requestKeyCol = "patterns_request_key"

  /** One keyed+stamped single-row append — the shared shape of both
    * directions; only the table handle and the payload/stamp column names
    * differ (and those differences are the INTENT, not drift).
    */
  private def appendKeyedRow(engine: GraftEngine, t: Table, requestKey: String,
      payloadCol: String, payloadJson: String, stampCol: String): Unit = {
    val spark = engine.spark
    import spark.implicits._
    t.append(Seq((requestKey, payloadJson)).toDF(requestKeyCol, payloadCol)
      .withColumn(stampCol, current_timestamp()))
    t.flush()
  }

  /** Ingest one payload into the webhook's same-named table — opened
    * through the engine's PORT bindings (the webhook table is an implicit
    * port of its node, B5).
    */
  def ingest(engine: GraftEngine, name: String, requestKey: String,
      payloadJson: String): Unit =
    appendKeyedRow(engine, engine.table(name, "w"), requestKey,
      "payload", payloadJson, "received_at")

  /** Reply to a pending request (A30, node.py:544-553): records the
    * response row keyed by request key in `<name>_responses`.
    *
    * This is a platform side channel, NOT a port of the calling node —
    * the reference posts responses by request key, outside the graph's
    * dataflow — so the table is opened directly, bypassing port bindings
    * (a graph-bound engine's bindings never list `<name>_responses`).
    */
  def respondToRequest(engine: GraftEngine, name: String, requestKey: String,
      payloadJson: String): Unit =
    appendKeyedRow(engine, new Table(engine, s"${name}_responses", "w"),
      requestKey, "response", payloadJson, "responded_at")
}
