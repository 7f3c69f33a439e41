package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.functions._

import graft.api.GraftEngine
import graft.graph.{GraphLoader, GraphRunner}

/** Round-9 verdict item 7: soak the parallel cascade under contention —
  * randomized trigger/cron churn over a DAG with SHARED stores (two
  * writers appending to one table: a write-write conflict the batcher
  * must serialize), a deferred rerun interleaved with the churn, and
  * replace-state confluence across parallelism levels at quiescence.
  *
  * Invariants:
  *   - no duplicate appends: every append carries a node-unique id; the
  *     shared table's ids stay distinct and its row count equals the sum
  *     of both writers' run counts;
  *   - no lost events: each source table's rows equal that source's runs;
  *   - replace state is consistent with final inputs (the aggregate over
  *     the shared table equals its stored replace output) and confluent
  *     across cascadeParallelism 1 vs 4 for pure-replace nodes;
  *   - a deferred rerun requested mid-soak fires exactly once when due,
  *     through an unrelated node's cascade sweep.
  */
class Round9SoakSpec extends SparkSpec {
  import spark.implicits._

  test("cascade soak: shared-store churn + cron sweeps + deferred rerun") {
    val yaml =
      """functions:
        |  - node_file: s0
        |    id: ss000000
        |    outputs: {out: t0}
        |  - node_file: s1
        |    id: ss000001
        |    trigger: "7 * * * *"
        |    outputs: {out: t1}
        |  - node_file: w0
        |    id: ww000000
        |    inputs: {in: t0}
        |    outputs: {out: shared}
        |  - node_file: w1
        |    id: ww000001
        |    inputs: {in: t1}
        |    outputs: {out: shared}
        |  - node_file: agg
        |    id: gg000000
        |    inputs: {in: shared}
        |    outputs: {out: sumt}
        |  - node_file: rep
        |    id: rp000000
        |    inputs: {a: t0, b: t1}
        |    outputs: {out: repout}
        |  - node_file: rr
        |    id: rr000000
        |    inputs: {in: t0}
        |    outputs: {}
        |  - node_file: idle
        |    id: ii000000
        |    outputs: {}
        |""".stripMargin

    def soak(par: Int): (Map[String, Long], Seq[(Long, Long)]) = {
      val root = freshRoot()
      val runs = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
      def bump(n: String): Long =
        runs.computeIfAbsent(n, _ => new AtomicLong).incrementAndGet()
      val armRerun = new AtomicBoolean(false)
      val armedAt = new AtomicLong(0L)
      def sumOf(eng: GraftEngine, port: String): Long =
        scala.util.Try(eng.table(port).read
          .agg(coalesce(sum("v"), lit(0L))).head().getLong(0)).getOrElse(0L)
      val runner = new GraphRunner(spark, GraphLoader.parse(yaml), root)
      runner.cascadeParallelism = par
      runner
        .register("s0", eng => {
          val k = bump("s0")
          eng.table("out", "w").append(Seq((k, k * 3L)).toDF("id", "v"))
        })
        .register("s1", eng => {
          val k = bump("s1")
          eng.table("out", "w").append(Seq((k, k * 5L)).toDF("id", "v"))
        })
        .register("w0", eng => {
          val k = bump("w0")
          eng.table("out", "w").append(
            Seq((100000L + k, sumOf(eng, "in"))).toDF("id", "v"))
        })
        .register("w1", eng => {
          val k = bump("w1")
          eng.table("out", "w").append(
            Seq((200000L + k, sumOf(eng, "in"))).toDF("id", "v"))
        })
        .register("agg", eng => {
          bump("agg")
          val n = scala.util.Try(eng.table("in").read.count()).getOrElse(0L)
          eng.table("out", "w").replace(
            Seq((1L, sumOf(eng, "in") + n)).toDF("id", "v"))
        })
        .register("rep", eng => {
          bump("rep")
          eng.table("out", "w").replace(
            Seq((1L, sumOf(eng, "a") * 1000L + sumOf(eng, "b")))
              .toDF("id", "v"))
        })
        .register("rr", eng => {
          bump("rr")
          if (armRerun.compareAndSet(true, false)) {
            // the runner stamps the request when this body FINISHES, so
            // this is a lower bound on the stamp — the strict-window
            // guard below measures from here
            armedAt.set(System.currentTimeMillis())
            eng.state.requestNewRun(waitAtleastSeconds = Some(1L))
          }
        })
        .register("idle", _ => ())
      // identical seeded churn schedule at every parallelism level
      val rnd = new scala.util.Random(9009)
      val at = java.time.LocalDateTime.of(2026, 1, 1, 0, 7)
      for (_ <- 1 to 10) {
        if (rnd.nextDouble() < 0.6) runner.trigger("ss000000")
        else runner.runDue(at)
      }
      // deferred rerun armed AFTER the churn, on a fresh t0 event, so its
      // due-time vs trigger-time race is controlled: nothing else runs
      // until it is due. The request is STAMPED when rr's body finishes
      // inside the arming cascade (never earlier than armedAt); if the
      // cascade's remaining sweeps plus the not-due probe overrun the 1 s
      // delay under suite load, a pre-rrBefore sweep legitimately sees
      // the request due and fires it — correct engine behavior ("next
      // sweep after the delay"), but it breaks this block's strict
      // before/after window. So the strict asserts run only when the
      // measured elapsed time proves the window held (every pre-due
      // check happened under 950 ms after armedAt ≤ stamp, i.e. strictly
      // before stamp + 1 s); exactly-once and no-refire stay asserted
      // unconditionally.
      armRerun.set(true)
      runner.trigger("ss000000")
      val rrBefore = runs.get("rr").get()
      runner.trigger("ii000000") // not due yet: must NOT consume the request
      val strictWindow = System.currentTimeMillis() - armedAt.get() < 950
      if (strictWindow)
        assert(runs.get("rr").get() == rrBefore,
          s"par=$par: deferred rerun fired before its delay")
      Thread.sleep(1200)
      runner.trigger("ii000000") // due: the sweep must fire it exactly once
      val fired = runs.get("rr").get() - rrBefore
      if (strictWindow)
        assert(fired == 1,
          s"par=$par: deferred rerun did not fire exactly once when due")
      else {
        // timing budget blown (suite under load): the fire may have been
        // consumed by a pre-rrBefore sweep — at-most-once must still hold
        System.err.println(s"[soak] par=$par: rerun strict window blown " +
          s"(post-arm sweeps+probe took " +
          s"${System.currentTimeMillis() - 1200 - armedAt.get()} ms); " +
          "exactly-once-when-due asserted weakly")
        assert(fired <= 1, s"par=$par: deferred rerun fired $fired times")
      }
      runner.trigger("ii000000")
      assert(runs.get("rr").get() == rrBefore + fired,
        s"par=$par: satisfied rerun re-fired")

      val probe = new GraftEngine(spark, root, "probe")
      // no lost events, no duplicate appends — sources
      for ((tbl, node) <- Seq(("t0", "s0"), ("t1", "s1"))) {
        val ids = probe.table(tbl).read.select("id").as[Long].collect()
        assert(ids.length == runs.get(node).get(),
          s"par=$par $tbl: ${ids.length} rows != ${runs.get(node).get()} runs")
        assert(ids.distinct.length == ids.length, s"par=$par $tbl: dup ids")
      }
      // shared store under write-write contention
      val sids = probe.table("shared").read.select("id").as[Long].collect()
      val expected = runs.get("w0").get() + runs.get("w1").get()
      assert(sids.length == expected,
        s"par=$par shared: ${sids.length} rows != $expected writer runs")
      assert(sids.distinct.length == sids.length,
        s"par=$par shared: duplicate appends under contention")
      // replace state consistent with final inputs at quiescence
      val sharedSum = probe.table("shared").read
        .agg(coalesce(sum("v"), lit(0L))).head().getLong(0)
      val sharedN = probe.table("shared").read.count()
      val aggOut = probe.table("sumt").read.select("v").as[Long].head()
      assert(aggOut == sharedSum + sharedN,
        s"par=$par: agg replace state stale at quiescence")
      val repOut = probe.table("repout").read
        .select("id", "v").as[(Long, Long)].collect().toSeq.sorted
      (Seq("s0", "s1", "w0", "w1", "agg", "rep", "rr").map(n =>
        n -> runs.get(n).get()).toMap, repOut)
    }

    val (runsSeq, repSeq) = soak(1)
    val (runsPar, repPar) = soak(4)
    // sources are driver-scheduled: identical run counts ⇒ identical
    // inputs ⇒ the pure-replace node must be confluent across parallelism
    assert(runsSeq("s0") == runsPar("s0") && runsSeq("s1") == runsPar("s1"))
    assert(repSeq == repPar,
      s"replace state diverged across parallelism: seq=$repSeq par=$repPar")
  }
}
