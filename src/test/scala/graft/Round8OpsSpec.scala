package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.DedupQueries

/** Round-8 scale paths: d12's pair-budget escape hatch (the d32 pattern
  * applied to all-pairs near-dup). Within budget the budgeted scorer IS
  * the exact tile kernel; over budget it must produce a subset of the
  * exact pairs with bounded within-cell work and a riding recall audit.
  */
class Round8OpsSpec extends SparkSpec {

  private def embeddings(dir: String) = {
    graft.functions.FloatDotProduct.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", l2norm(col("embedding")))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("label", "va", "vb", "cosine").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("d12 budgeted scorer == exact tile kernel when within budget") {
    val v = embeddings("/root/testdata/sf0.01")
    val exact = pairSet(DedupQueries.embedNeardupBlocked(spark, v, 0.4))
    val budgeted = DedupQueries.embedNeardupBudgeted(spark, v, 0.4).collect()
    assert(exact.nonEmpty)
    assert(budgeted.map(r => (r.getAs[Int]("label"), r.getAs[Long]("va"),
      r.getAs[Long]("vb"), r.getAs[Double]("cosine"))).toSet == exact,
      "default budget leaves every fixture label on the exact path")
    assert(budgeted.forall(!_.getAs[Boolean]("approx_label")))
    assert(budgeted.forall(_.isNullAt(budgeted.head.fieldIndex("audit_recall"))))
    assert(budgeted.forall(_.getAs[Boolean]("recall_floor_met")),
      "exact-path rows trivially meet the recall floor")
    // exact path: realized work == the full candidate term
    val counts = v.groupBy("label").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[Any]("label").toString.toLong ->
        r.getAs[Long]("c")).toMap
    assert(budgeted.forall { r =>
      val c = counts(r.getAs[Int]("label").toLong)
      r.getAs[Long]("n_scored_pairs") == c * (c - 1) / 2
    })
  }

  test("d12 escape hatch: forced tiny budget bounds work, audits recall") {
    // thr=0.3 multiplies matching pairs ~20x (the Round6OpsSpec boundary
    // test's trick) so hatched labels actually HAVE pairs to find, and
    // auditMod=1 samples every vector — the riding audit then equals the
    // label's true hatch recall, which the spec recomputes independently
    val v = embeddings("/root/testdata/sf0.01")
    val exactAll = pairSet(DedupQueries.embedNeardupBlocked(spark, v, 0.3))
    val counts = v.groupBy("label").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[Any]("label").toString.toLong ->
        r.getAs[Long]("c")).toMap
    val budget = 300L
    val hatchedLabels = counts.filter { case (_, c) =>
      c * (c - 1) / 2 > budget }.keySet
    assert(hatchedLabels.nonEmpty, "tiny budget must hatch at least one label")
    val out = DedupQueries.embedNeardupBudgeted(spark, v, 0.3,
      budget = budget, auditMod = 1L).collect()
    val (approx, exactRows) = out.partition(_.getAs[Boolean]("approx_label"))
    // only over-budget labels take the hatch (a hatched label with no
    // surviving pairs simply emits no rows); a hatched label may appear
    // on the exact channel ONLY via the recall-floor escalation, in which
    // case its output must BE the complete exact pair set with
    // n_scored_pairs = the full term (round-9 recall contract)
    assert(approx.map(_.getAs[Int]("label").toLong).toSet
      .subsetOf(hatchedLabels))
    val escalatedExact = exactRows
      .map(_.getAs[Int]("label").toLong).toSet.intersect(hatchedLabels)
    escalatedExact.foreach { l =>
      val got = exactRows.filter(_.getAs[Int]("label").toLong == l)
        .map(r => (r.getAs[Int]("label"), r.getAs[Long]("va"),
          r.getAs[Long]("vb"), r.getAs[Double]("cosine"))).toSet
      assert(got == exactAll.filter(_._1.toLong == l),
        s"escalated-to-exact label $l must emit its complete exact set")
      assert(exactRows.filter(_.getAs[Int]("label").toLong == l).forall { r =>
        val c = counts(l)
        r.getAs[Long]("n_scored_pairs") == c * (c - 1) / 2 &&
          r.getAs[Boolean]("recall_floor_met")
      })
    }
    // va < vb invariant holds on the hatch path too
    assert(out.forall(r => r.getAs[Long]("va") < r.getAs[Long]("vb")))
    // hatch output is a SUBSET of the exact pair set, cosine bit-identical
    val approxSet = approx.map(r => (r.getAs[Int]("label"),
      r.getAs[Long]("va"), r.getAs[Long]("vb"), r.getAs[Double]("cosine"))).toSet
    assert(approxSet.subsetOf(exactAll),
      "every hatched pair must exist in the exact all-pairs set with an " +
        "identical cosine")
    assert(approxSet.nonEmpty, "the hatch must still find near-dup pairs")
    // within-budget labels are untouched: bit-identical to the exact path
    // (plus the complete sets of any escalated-to-exact labels)
    val exactSet = exactRows.map(r => (r.getAs[Int]("label"),
      r.getAs[Long]("va"), r.getAs[Long]("vb"), r.getAs[Double]("cosine"))).toSet
    assert(exactSet == exactAll.filter(p =>
      !hatchedLabels.contains(p._1.toLong) ||
        escalatedExact.contains(p._1.toLong)))
    // the recall floor is a CONTRACT: recall_floor_met on every row is
    // exactly (audit_recall is null || audit_recall >= floor)
    out.foreach { r =>
      val met = r.getAs[Boolean]("recall_floor_met")
      val expected = r.isNullAt(r.fieldIndex("audit_recall")) ||
        r.getAs[Double]("audit_recall") >= 0.95
      assert(met == expected,
        s"label ${r.getAs[Int]("label")}: recall_floor_met $met != $expected")
    }
    // the quadratic term is genuinely bounded: realized within-cell pairs
    // strictly below the label's all-pairs term
    approx.foreach { r =>
      val c = counts(r.getAs[Int]("label").toLong)
      assert(r.getAs[Long]("n_scored_pairs") < c * (c - 1) / 2,
        s"label ${r.getAs[Int]("label")}: hatch did not prune")
    }
    // the riding audit equals the TRUE per-label hatch recall (auditMod=1
    // samples everything, so the audit's exact reference is the full
    // exact pair set of the label)
    val trueRecall: Map[Long, Double] = hatchedLabels.map { l =>
      val ex = exactAll.filter(_._1.toLong == l)
      val got = approxSet.filter(_._1.toLong == l)
      l -> (if (ex.isEmpty) -1.0 else got.size.toDouble / ex.size)
    }.toMap
    val audited = approx.filter(r => !r.isNullAt(r.fieldIndex("audit_recall")))
    assert(audited.nonEmpty, "hatched labels must carry a recall audit")
    audited.foreach { r =>
      val l = r.getAs[Int]("label").toLong
      val a = r.getAs[Double]("audit_recall")
      assert(a >= 0.0 && a <= 1.0)
      assert(math.abs(a - trueRecall(l)) < 1e-12,
        s"label $l: audit_recall $a != independently computed ${trueRecall(l)}")
    }
  }

  test("tile kernel == plain join on randomized corpora (ragged, zero-norm)") {
    // fixtures are uniform 64-d unit-ish vectors; this drives the paths
    // they never exercise: ragged dims within a tile (mismatched-length
    // dot => no pair, float_dot NULL semantics), zero-norm vectors (NaN
    // cosine, ranked greatest), labels smaller than a tile, and tiny
    // tiles that split every label
    import spark.implicits._
    graft.functions.FloatDotProduct.register(spark)
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val dims = Seq(3, 5) // ragged mix
      val rows = (0 until 120).map { i =>
        val d = dims(rnd.nextInt(dims.length))
        val vec =
          if (i % 17 == 0) Array.fill(d)(0.0f) // zero-norm
          else Array.fill(d)((rnd.nextDouble() * 2 - 1).toFloat)
        (i.toLong, i % (trial + 2), vec)
      }
      val v = rows.toDF("vec_id", "label", "embedding")
        .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("embedding")))
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("label", "va", "vb", "cosine").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
            java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
      val j = key(DedupQueries.embedNeardupJoin(spark, v, 0.2)
        .select(col("label").cast("int").as("label"), col("va"), col("vb"), col("cosine")))
      val b = key(DedupQueries.embedNeardupBlocked(spark, v, 0.2, tile = 7))
      assert(b == j, s"trial $trial: tile kernel diverged from the join")
      // budgeted with a huge budget is the same exact set
      val bud = key(DedupQueries.embedNeardupBudgeted(spark, v, 0.2, tile = 7))
      assert(bud == j, s"trial $trial: budgeted(exact) diverged")
      // budgeted with a tiny budget stays a subset with identical bits
      val hatch = key(DedupQueries.embedNeardupBudgeted(spark, v, 0.2,
        budget = 20L, tile = 7, auditMod = 1L))
      assert(hatch.subsetOf(j), s"trial $trial: hatch emitted a non-pair")
    }
  }

  test("usum/uavg == dsum/davg on lattice values (incl. negatives, nulls)") {
    import spark.implicits._
    import graft.queries.Q
    val rnd = new scala.util.Random(88)
    // 2-, 4- and 6-decimal lattice values, mixed signs, up to the money
    // magnitude the fixtures carry; every 50th value null
    val vals: Seq[java.lang.Double] = (1 to 20000).map { i =>
      if (i % 50 == 0) null
      else {
        val scale = Seq(100.0, 10000.0, 1000000.0)(i % 3)
        val sign = if (i % 7 == 0) -1 else 1
        java.lang.Double.valueOf(
          sign * math.floor(rnd.nextDouble() * 1e5 * scale) / scale)
      }
    }
    val df = vals.toDF("x")
    val r = df.agg(
      Q.dsum(org.apache.spark.sql.functions.col("x")).as("d"),
      Q.usum(org.apache.spark.sql.functions.col("x")).as("u"),
      Q.davg(org.apache.spark.sql.functions.col("x")).as("da"),
      Q.uavg(org.apache.spark.sql.functions.col("x")).as("ua")).head()
    // both paths recover the same exact lattice sum; the final double may
    // differ only in the last ulp (two correctly-rounded steps vs one) —
    // the driver compare runs BOTH engines through the SAME path, so
    // equality there is structural; here we pin the numeric agreement
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <=
      math.ulp(r.getDouble(0)), s"usum ${r.getDouble(1)} vs dsum ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) <=
      math.ulp(r.getDouble(2)))
    // and on a small exactly-representable set, strict equality
    val small = Seq(1.25, -2.50, 3.75, 0.01, 100.00).toDF("x")
    val r2 = small.agg(Q.dsum(org.apache.spark.sql.functions.col("x")),
      Q.usum(org.apache.spark.sql.functions.col("x"))).head()
    assert(r2.getDouble(0) == r2.getDouble(1))
    assert(r2.getDouble(0) == 102.51)
  }

  test("d12 query output carries constant audit columns at oracle SF") {
    val df = DedupQueries.queries("d12_embed_neardup")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.forall(r =>
      r.getAs[Long]("n_scored_pairs") == r.getAs[Long]("n_candidate_pairs")))
    assert(rows.forall(!_.getAs[Boolean]("approx_label")))
  }
}
