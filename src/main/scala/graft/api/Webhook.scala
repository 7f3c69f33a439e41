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

  /** Ingest one payload into the webhook's same-named table. */
  def ingest(engine: GraftEngine, name: String, requestKey: String,
      payloadJson: String): Unit = {
    val spark = engine.spark
    import spark.implicits._
    val row = Seq((requestKey, payloadJson))
      .toDF(requestKeyCol, "payload")
      .withColumn("received_at", current_timestamp())
    val t = engine.table(name, "w")
    t.append(row)
    t.flush()
  }

  /** Reply to a pending request (A30, node.py:544-553): records the
    * response row keyed by request key in `<name>_responses`.
    *
    * This is a platform side channel, NOT a port of the calling node —
    * the reference posts responses by request key, outside the graph's
    * dataflow — so the table is opened directly, bypassing port bindings
    * (a graph-bound engine's bindings never list `<name>_responses`).
    */
  def respondToRequest(engine: GraftEngine, name: String, requestKey: String,
      payloadJson: String): Unit = {
    val spark = engine.spark
    import spark.implicits._
    val row = Seq((requestKey, payloadJson))
      .toDF(requestKeyCol, "response")
      .withColumn("responded_at", current_timestamp())
    val t = new Table(engine, s"${name}_responses", "w")
    t.append(row)
    t.flush()
  }
}
