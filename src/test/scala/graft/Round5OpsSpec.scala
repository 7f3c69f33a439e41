package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, VectorQueries}

/** Round-5 scale-path equivalences: the broadcast-vs-index switches in d48
  * and d32 are picked by measured size at run time, so both branches are
  * pinned to the same answer here (the d21 size-adaptive CC pattern —
  * QueriesSmokeSpec).
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("d48 scale path: char-gram index hits == broadcast contains hits (fixture)") {
    val (train, needles) = DedupQueries.d48Inputs(spark, dir)
    val b = DedupQueries.substringHitsBroadcast(train, needles)
      .orderBy("doc_id").collect().map(_.getLong(0))
    val i = DedupQueries.substringHitsIndexed(train, needles)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(i.sameElements(b))
  }

  test("d48 index path keeps contains() semantics: non-token-boundary matches survive") {
    // the blocking key is the needle's first 8 chars against text 8-grams,
    // which is position-based, NOT token-based — a needle matching inside
    // a token run (doc 2) must still hit, exactly like contains()
    val train = Seq(
      (1L, "srcA", "the quick brown fox jumps over it"),
      (2L, "srcA", "xxthe quick brown fox jumps yy"),
      (3L, "srcB", "the quick brown")).toDF("doc_id", "source", "text")
    val needles = Seq("the quick brown fox jumps").toDF("needle")
    val b = DedupQueries.substringHitsBroadcast(train, needles)
      .orderBy("doc_id").collect().map(_.getLong(0))
    val i = DedupQueries.substringHitsIndexed(train, needles)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(b.toSeq == Seq(1L, 2L))
    assert(i.sameElements(b))
    // degenerate needle SHORTER than the 8-char block key (empty tokens
    // from doubled spaces): completeness must survive - the index path
    // routes it through the bounded contains probe
    val shortNeedle = Seq("x  y  z").toDF("needle")
    val train2 = Seq((9L, "srcA", "prefix x  y  z suffix"),
      (10L, "srcA", "no match here")).toDF("doc_id", "source", "text")
    val b2 = DedupQueries.substringHitsBroadcast(train2, shortNeedle)
      .collect().map(_.getLong(0))
    val i2 = DedupQueries.substringHitsIndexed(train2, shortNeedle)
      .collect().map(_.getLong(0))
    assert(b2.toSeq == Seq(9L) && i2.sameElements(b2))
  }

  test("d32 scale path: fragment-replicate nearest == broadcast nearest (fixture)") {
    val (tr, ev) = VectorQueries.d32Inputs(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("eval_id").collect()
        .map(r => (r.getAs[Any]("eval_id"), r.getAs[Any]("train_id"),
          r.getAs[Double]("cosine")))
    val b = rows(VectorQueries.nearestTrainBroadcast(tr, ev))
    // a fragment count that does NOT divide the id space evenly, to catch
    // any per-fragment argmax merge mistake
    val f = rows(VectorQueries.nearestTrainReplicated(tr, ev, fragments = 7))
    assert(b.nonEmpty)
    assert(f.sameElements(b))
    // replicated plan must not degenerate into a cartesian product
    val plan = VectorQueries.nearestTrainReplicated(tr, ev, fragments = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
