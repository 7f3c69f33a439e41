package graft

import graft.api.GraftEngine

/** Stream cursor laws (SURVEY.md §5.2.1/§7.4.1, reference node.py:18-81). */
class StreamSpec extends SparkSpec {
  import spark.implicits._

  private def engineWithEvents(n: Int): GraftEngine = {
    val e = new GraftEngine(spark, freshRoot(), nodeId = "consumer")
    val t = e.table("ev", "w")
    t.append((1 to n).map(i => (i.toLong, s"e$i")).toDF("seq", "payload"))
    t.flush()
    e
  }

  test("consume yields all records in order; cursor advances per yielded row") {
    val e = engineWithEvents(5)
    val st = e.table("ev").asStream(orderBy = "seq")
    val got = st.consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(1L, 2L, 3L, 4L, 5L))
    assert(st.position == Some(5L))
  }

  test("exactly-once across executions via checkpoint") {
    val e1 = engineWithEvents(5)
    val root = e1.catalog.root.toString
    val st1 = e1.table("ev").asStream(orderBy = "seq")
    st1.consumeRecords().take(3).foreach(_ => ())
    st1.checkpoint()
    // new execution, same node + state dir
    val e2 = new GraftEngine(spark, root, nodeId = "consumer")
    val st2 = e2.table("ev").asStream(orderBy = "seq")
    val got = st2.consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(4L, 5L))
  }

  test("uncheckpointed progress is lost on a new execution (rollback-on-crash)") {
    val e1 = engineWithEvents(4)
    val root = e1.catalog.root.toString
    e1.table("ev").asStream(orderBy = "seq").consumeRecords()
      .take(2).foreach(_ => ())  // no checkpoint
    val e2 = new GraftEngine(spark, root, nodeId = "consumer")
    val got = e2.table("ev").asStream(orderBy = "seq")
      .consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(1L, 2L, 3L, 4L))
  }

  test("endExecution persists stream progress without an explicit checkpoint (node.py:41-47)") {
    val e1 = engineWithEvents(5)
    val root = e1.catalog.root.toString
    e1.table("ev").asStream(orderBy = "seq").consumeRecords()
      .take(3).foreach(_ => ())   // consume, never checkpoint
    e1.endExecution()             // clean finish → progress is durable
    val e2 = new GraftEngine(spark, root, nodeId = "consumer")
    val got = e2.table("ev").asStream(orderBy = "seq")
      .consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(4L, 5L))
  }

  test("rollback reverts to last checkpoint inside one execution") {
    val e = engineWithEvents(6)
    val st = e.table("ev").asStream(orderBy = "seq")
    st.consumeRecords().take(2).foreach(_ => ())
    st.checkpoint()                                  // at 2
    st.consumeRecords().take(2).foreach(_ => ())     // at 4, unpersisted
    st.rollback()
    val got = st.consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(3L, 4L, 5L, 6L))
  }

  test("rewind restarts from the beginning") {
    val e = engineWithEvents(3)
    val st = e.table("ev").asStream(orderBy = "seq")
    st.consumeRecords().foreach(_ => ())
    st.checkpoint()
    st.rewind()
    val got = st.consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(1L, 2L, 3L))
  }

  test("seek consumes strictly greater than the given value (node.py:71-76)") {
    val e = engineWithEvents(5)
    val st = e.table("ev").asStream(orderBy = "seq")
    st.seek(3L)
    val got = st.consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(4L, 5L))
  }

  test("late data below the cursor is never seen again (strictly-> semantics)") {
    val e = engineWithEvents(3)
    val t = e.table("ev")
    val st = t.asStream(orderBy = "seq")
    st.consumeRecords().foreach(_ => ())
    st.checkpoint()
    t.append(Seq((2L, "late"), (9L, "new")).toDF("seq", "payload")); t.flush()
    val st2 = e.table("ev").asStream(orderBy = "seq")
    val got = st2.consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(got == List(9L))   // seq=2 arrived late: dropped by design
  }

  test("default ordering resolves from schema roles, else errors (node.py:196-200)") {
    val e = new GraftEngine(spark, freshRoot())
    val bare = e.table("bare", "w")
    bare.append(Seq((1L, "x")).toDF("id", "v")); bare.flush()
    assertThrows[IllegalArgumentException] { bare.asStream() }
    val auto = e.table("auto", "w").init(addMonotonicId = "monotonic_id")
    auto.append(Seq((1L, "x")).toDF("id", "v")); auto.flush()
    assert(auto.asStream().orderByField == "monotonic_id")
  }

  test("consume . rewind . consume == consume twice (idempotent restart)") {
    val e = engineWithEvents(4)
    val st = e.table("ev").asStream(orderBy = "seq")
    val first = st.consumeRecords().map(_.getAs[Long]("seq")).toList
    st.rewind()
    val second = st.consumeRecords().map(_.getAs[Long]("seq")).toList
    assert(first == second)
  }

  test("rollback restores execution start INCLUDING a startingValue") {
    // regression: rollback used to reload only the persisted cursor,
    // discarding the constructor startingValue and replaying records the
    // caller had declared consumed
    val e = engineWithEvents(5)
    val st = e.table("ev").asStream(orderBy = "seq", startingValue = Some(2L))
    assert(st.consumeRecords().map(_.getAs[Long]("seq")).toList == List(3L, 4L, 5L))
    st.rollback()
    assert(st.consumeRecords().map(_.getAs[Long]("seq")).toList == List(3L, 4L, 5L))
  }

  test("rollback after checkpoint restores the checkpoint, not execution start") {
    val e = engineWithEvents(5)
    val st = e.table("ev").asStream(orderBy = "seq")
    st.consumeRecords().take(2).foreach(_ => ())
    st.checkpoint()
    st.consumeRecords().take(2).foreach(_ => ())
    st.rollback()
    assert(st.consumeRecords().map(_.getAs[Long]("seq")).toList == List(3L, 4L, 5L))
  }

  test("timestamp cursor round-trips through persisted state across executions") {
    // checkpoint normalizes a Timestamp cursor to an ISO-8601 string; the
    // next execution's plan compares the TimestampType column against that
    // string literal — this pins the implicit cast actually parsing it.
    import java.sql.Timestamp
    val root = freshRoot()
    val e1 = new GraftEngine(spark, root, nodeId = "consumer")
    val t1 = e1.table("ev", "w")
    t1.append(Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00.123456"), "a"),
      (Timestamp.valueOf("2024-01-02 00:00:00"), "b"),
      (Timestamp.valueOf("2024-01-03 12:34:56.789"), "c")).toDF("ts", "payload"))
    t1.flush()
    val st1 = t1.asStream(orderBy = "ts")
    st1.consumeRecords().take(2).foreach(_ => ())
    st1.checkpoint()
    val e2 = new GraftEngine(spark, root, nodeId = "consumer")
    val rest = e2.table("ev").asStream(orderBy = "ts")
      .consumeRecords().map(_.getAs[String]("payload")).toList
    assert(rest == List("c"))
  }

  test("consume_records(with_metadata) pairs each record with its stream position (node.py:40-41)") {
    val e = engineWithEvents(3)
    val st = e.table("ev").asStream(orderBy = "seq")
    val got = st.consumeRecordsWithMetadata()
      .map { case (r, pos) => (r.getAs[String]("payload"), pos) }.toList
    assert(got == List(("e1", 1L), ("e2", 2L), ("e3", 3L)))
    // metadata yield advances the cursor exactly like the plain form
    assert(st.position == Some(3L))
    val again = st.consumeRecordsWithMetadata().toList
    assert(again.isEmpty)
  }
}
