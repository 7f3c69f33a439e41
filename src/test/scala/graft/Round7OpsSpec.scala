package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 pins: fixture-drift detection, the events.ts physical-type
  * dispatch, and Verify's loud-failure contract.
  *
  * Background: between rounds 5 and 6 the driver regenerated the fixtures
  * and `events.ts` changed physical type (int64 epoch-nanos →
  * timestamp[us]). The engine assumed the old type, 7 queries broke at
  * ANALYSIS time, and — because Verify wrote nothing on failure — they
  * silently vanished from the correctness report. These specs make each
  * link of that failure chain break loudly within seconds of a drift.
  */
class Round7OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- drift
  // One cheap read per fixture table at the smallest SF, asserting the
  // engine can compute each table's canonical derived values. Every assert
  // names the table/column/type it checked so the NEXT fixture drift is
  // diagnosed from the failure message alone.

  test("fixture drift: all tables readable with expected columns") {
    val expected = Map(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"),
    )
    for ((name, cols) <- expected.toSeq.sortBy(_._1)) {
      val df = graft.queries.Q.t(spark, dir, name)
      val missing = cols.filterNot(df.columns.contains)
      assert(missing.isEmpty,
        s"fixture drift in $name: missing columns $missing (found ${df.columns.toSeq})")
      assert(df.count() > 0, s"fixture drift: $name is empty")
    }
  }

  test("fixture drift: events.ts computes epoch-µs under either physical type") {
    val e = graft.queries.Q.t(spark, dir, "events")
    val tsType = e.schema("ts").dataType
    assert(tsType == LongType || tsType == TimestampType || tsType == TimestampNTZType,
      s"fixture drift: events.ts is $tsType — Q.epochUs handles LongType(ns)/" +
        "Timestamp(µs); a third physical type needs a new dispatch arm")
    val row = e.select(min(graft.queries.Q.epochUs(e)).as("lo"),
      max(graft.queries.Q.epochUs(e)).as("hi")).head
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // plausible epoch-µs window (2000-01-01 .. 2100-01-01): catches a
    // unit drift (ns read as µs is 1000x out; seconds are 1e6x out)
    assert(lo >= 946684800000000L && hi < 4102444800000000L,
      s"fixture drift: events.ts epoch-µs range [$lo, $hi] implausible — " +
        s"unit mismatch for physical type $tsType?")
  }

  test("fixture drift: events.props parses as a JSON object") {
    val e = graft.queries.Q.t(spark, dir, "events")
    assert(e.schema("props").dataType == StringType,
      s"fixture drift: events.props is ${e.schema("props").dataType}, expected JSON string")
    val bad = e.filter(col("props").isNotNull &&
      from_json(col("props"), MapType(StringType, StringType)).isNull).count()
    assert(bad == 0, s"fixture drift: $bad events.props rows fail to parse as JSON objects")
  }

  test("fixture drift: embeddings have one consistent non-zero dimension") {
    val em = graft.queries.Q.t(spark, dir, "embeddings")
    assert(em.schema("embedding").dataType.isInstanceOf[ArrayType],
      s"fixture drift: embeddings.embedding is ${em.schema("embedding").dataType}")
    val dims = em.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(dims.length == 1 && dims.head > 0,
      s"fixture drift: embedding dimensions $dims (expected one non-zero dim)")
  }

  test("fixture drift: documents.n_chars consistent with text length") {
    val d = graft.queries.Q.t(spark, dir, "documents")
    val bad = d.filter(col("n_chars") =!= length(col("text"))).count()
    assert(bad == 0,
      s"fixture drift: $bad documents rows where n_chars != length(text)")
  }

  test("fixture drift: date columns are date-valued") {
    val o = graft.queries.Q.t(spark, dir, "orders")
    val badO = o.filter(to_date(col("o_orderdate")).isNull).count()
    assert(badO == 0, s"fixture drift: $badO orders rows with non-date o_orderdate " +
      s"(type ${o.schema("o_orderdate").dataType})")
    val l = graft.queries.Q.t(spark, dir, "lineitem")
    val badL = l.filter(to_date(col("l_shipdate")).isNull).count()
    assert(badL == 0, s"fixture drift: $badL lineitem rows with non-date l_shipdate " +
      s"(type ${l.schema("l_shipdate").dataType})")
  }

  // ------------------------------------------------------------- epochUs
  test("epochUs dispatch: ns-long and µs-timestamp inputs agree") {
    import spark.implicits._
    // the same instants under both physical models the fixtures have used
    val us = Seq(1704067200000000L, 1704067200123456L, 1706745599999999L)
    val nsDf = us.map(_ * 1000L).toDF("ts") // int64 epoch-nanos file shape
    val tsDf = us.toDF("us")
      .select(timestamp_micros(col("us")).as("ts")) // timestamp[us] file shape
    val fromNs = nsDf.select(graft.queries.Q.epochUs(nsDf).as("us"))
      .collect().map(_.getLong(0)).toSeq
    val fromTs = tsDf.select(graft.queries.Q.epochUs(tsDf).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(fromNs == us, s"LongType(ns) arm: $fromNs != $us")
    assert(fromTs == us, s"Timestamp arm: $fromTs != $us")
    // TIMESTAMP_NTZ — the ACTUAL read type of the current timestamp[us]
    // fixtures, and the only arm whose exactness depends on the UTC
    // session timezone (NTZ wall-clock reinterpreted as a UTC instant).
    // An hours-level timezone regression passes the fixture-drift
    // plausibility window above, so pin exact µs values here.
    val ntzDf = us.toDF("us")
      .select(to_timestamp_ntz(timestamp_micros(col("us"))
        .cast("string")).as("ts"))
    assert(ntzDf.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val fromNtz = ntzDf.select(graft.queries.Q.epochUs(ntzDf).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(fromNtz == us, s"TIMESTAMP_NTZ arm: $fromNtz != $us")
    // a third fixture drift must fail FAST at the dispatch site, not null
    // out downstream — strings are the canonical silent-corruption type
    val strDf = Seq("2024-01-01 00:00:00").toDF("ts")
    val err = intercept[IllegalStateException] {
      graft.queries.Q.epochUs(strDf)
    }
    assert(err.getMessage.contains("StringType"),
      s"dispatch error must name the drifted type: ${err.getMessage}")
  }

  // ------------------------------------------------------------- verify
  test("Verify leaves a loud empty-dir marker when a query fails") {
    val out = freshRoot()
    // deliberately broken query: analysis error, the round-6 failure class
    val ok = Verify.dumpOne(spark, dir, out, "boom",
      (s, d) => graft.queries.Q.t(s, d, "events").select(expr("ts div 1000")))
    val marker = new java.io.File(s"$out/boom")
    if (ok) {
      // if a future fixture makes this analyzable again the spec must be
      // updated to a new deliberately-broken query — fail loudly
      fail("deliberately-broken query unexpectedly succeeded; update spec")
    }
    assert(marker.isDirectory,
      "failed query must leave its output dir as a FAIL marker")
    assert(Option(marker.listFiles()).getOrElse(Array.empty).isEmpty,
      "FAIL marker dir must be empty (no parquet part => checker FAILs the key)")
    // and a working query still writes parquet
    val ok2 = Verify.dumpOne(spark, dir, out, "fine",
      (s, d) => graft.queries.Q.t(s, d, "region"))
    assert(ok2)
    val parts = new java.io.File(s"$out/fine").listFiles()
    assert(parts != null && parts.exists(_.getName.endsWith(".parquet")))
  }

  // ------------------------------------------------------------- bench
  test("Bench.minOverPasses ignores failed runs in the per-query minimum") {
    val p1 = Seq(("a", 5.0, false), ("b", 0.01, true), ("c", 2.0, true))
    val p2 = Seq(("a", 3.0, false), ("b", 4.0, false), ("c", 1.5, true))
    val r = Bench.minOverPasses(Seq(p1, p2)).toMap
    assert(r("a") == 3.0, "plain min over successful runs")
    assert(r("b") == 4.0,
      "a failed run's (fast) elapsed time must not shadow a real time")
    assert(r("c") == 1.5, "all-failed keeps the min elapsed time, loudly")
    // single pass passes through
    assert(Bench.minOverPasses(Seq(p1)).toMap.apply("b") == 0.01)
  }

  test("Bench.allFailed surfaces only every-pass failures for the JSON fails key") {
    val p1 = Seq(("a", 5.0, false), ("b", 0.01, true), ("c", 2.0, true))
    val p2 = Seq(("a", 3.0, false), ("b", 4.0, false), ("c", 1.5, true))
    // b recovered in pass 2 => measured; c failed every pass => its "time"
    // is an error-throw time and must be machine-visible as a failure
    assert(Bench.allFailed(Seq(p1, p2)) == Seq("c"))
    assert(Bench.allFailed(Seq(p1)) == Seq("b", "c"))
    assert(Bench.allFailed(Seq(p2.map { case (n, v, _) => (n, v, false) }))
      .isEmpty)
  }
}
