package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.DedupQueries

/** Round-9 d12 hatch hardening: the TWO-LEVEL cell path (centroid
  * broadcast bounded at O(√cells) for giant labels) and the recall-floor
  * CONTRACT (escalation + annotation), both forced through synthetic
  * knobs the production defaults never hit at fixture scale.
  */
class Round9OpsSpec extends SparkSpec {

  private def embeddings(dir: String) = {
    graft.functions.FloatDotProduct.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", l2norm(col("embedding")))
  }

  private def pairKey(r: org.apache.spark.sql.Row) =
    (r.getAs[Int]("label"), r.getAs[Long]("va"), r.getAs[Long]("vb"),
      java.lang.Double.doubleToLongBits(r.getAs[Double]("cosine")))

  test("d12 two-level path: forced tiny cellsBound keeps the hatch contract") {
    val v = embeddings("/root/testdata/sf0.01")
    val exactAll = DedupQueries.embedNeardupBlocked(spark, v, 0.3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val counts = v.groupBy("label").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[Any]("label").toString.toLong -> r.getAs[Long]("c"))
      .toMap
    val budget = 300L
    val hatched = counts.filter { case (_, c) => c * (c - 1) / 2 > budget }
      .keySet
    assert(hatched.nonEmpty)
    // cellsBound = 4 forces every hatched label onto the two-level path
    // (their flat cell counts are ~17+ at this budget), exercising the
    // coarse broadcast + distributed fine-assignment join end to end
    val out = DedupQueries.embedNeardupBudgeted(spark, v, 0.3,
      budget = budget, auditMod = 1L, cellsBound = 4L).collect()
    val (approx, exactRows) = out.partition(_.getAs[Boolean]("approx_label"))
    assert(approx.nonEmpty, "two-level hatch must still emit pairs")
    // subset of the exact pair set, cosine bit-identical — the same
    // contract the flat path carries (the tile kernel is shared)
    assert(approx.map(pairKey).toSet.subsetOf(exactAll))
    assert(out.forall(r => r.getAs[Long]("va") < r.getAs[Long]("vb")))
    // the quadratic term is genuinely bounded on approx labels
    approx.foreach { r =>
      val c = counts(r.getAs[Int]("label").toLong)
      assert(r.getAs[Long]("n_scored_pairs") < c * (c - 1) / 2,
        s"label ${r.getAs[Int]("label")}: two-level hatch did not prune")
    }
    // audit rides (auditMod=1 ⇒ the audit IS the true recall) and the
    // floor column is consistent on every row
    val audited = approx.filter(r => !r.isNullAt(r.fieldIndex("audit_recall")))
    assert(audited.nonEmpty)
    val trueRecall: Map[Long, Double] = approx
      .map(_.getAs[Int]("label").toLong).distinct.map { l =>
        val ex = exactAll.count(_._1.toLong == l)
        val got = approx.count(_.getAs[Int]("label").toLong == l)
        l -> (if (ex == 0) 1.0 else got.toDouble / ex)
      }.toMap
    audited.foreach { r =>
      val l = r.getAs[Int]("label").toLong
      assert(math.abs(r.getAs[Double]("audit_recall") - trueRecall(l)) < 1e-12,
        s"label $l: two-level audit_recall diverged from true recall")
    }
    out.foreach { r =>
      val met = r.getAs[Boolean]("recall_floor_met")
      val expected = r.isNullAt(r.fieldIndex("audit_recall")) ||
        r.getAs[Double]("audit_recall") >= 0.95
      assert(met == expected)
    }
    // within-budget labels stay bit-identical exact (unless escalated to
    // exact by the floor, in which case they are ALSO complete)
    val exactSet = exactRows.map(pairKey).toSet
    val exactLabels = exactRows.map(_.getAs[Int]("label").toLong).toSet
    assert(exactSet == exactAll.filter(p => exactLabels(p._1.toLong)))
    exactLabels.foreach { l =>
      assert(exactAll.count(_._1.toLong == l) ==
        exactRows.count(_.getAs[Int]("label").toLong == l),
        s"label $l on the exact channel must emit its complete pair set")
    }
  }

  test("d12 recall floor: impossible floor forces escalation, annotates misses") {
    val v = embeddings("/root/testdata/sf0.01")
    val counts = v.groupBy("label").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[Any]("label").toString.toLong -> r.getAs[Long]("c"))
      .toMap
    val budget = 300L
    // floor > 1 can never be met: every audited hatched label must either
    // resolve exactly (term ≤ 4·budget, or hatch pruned nothing) or emit
    // recall_floor_met = false after the probe escalation
    val out = DedupQueries.embedNeardupBudgeted(spark, v, 0.3,
      budget = budget, auditMod = 1L, recallFloor = 1.1).collect()
    val approx = out.filter(_.getAs[Boolean]("approx_label"))
    val hatched = counts.filter { case (_, c) => c * (c - 1) / 2 > budget }
      .keySet
    // labels that stayed approximate must be term > 4·budget (the
    // escalation's exact fallback would have absorbed the rest)...
    approx.map(_.getAs[Int]("label").toLong).distinct.foreach { l =>
      assert(counts(l) * (counts(l) - 1) / 2 > 4 * budget,
        s"label $l should have been resolved exactly by the escalation")
    }
    // ...and every audited approx row is annotated as missing the floor
    approx.filter(r => !r.isNullAt(r.fieldIndex("audit_recall")))
      .foreach { r =>
        assert(!r.getAs[Boolean]("recall_floor_met"),
          s"label ${r.getAs[Int]("label")}: floor 1.1 cannot be met")
      }
    // escalation genuinely adds coverage: forced-escalation pairs ⊇ the
    // no-floor (floor=0) round-1 pairs on the labels that stayed hatched
    val base = DedupQueries.embedNeardupBudgeted(spark, v, 0.3,
      budget = budget, auditMod = 1L, recallFloor = 0.0).collect()
      .filter(_.getAs[Boolean]("approx_label"))
    val stillHatched = approx.map(_.getAs[Int]("label").toLong).toSet
    val basePairs = base.filter(r =>
      stillHatched(r.getAs[Int]("label").toLong)).map(pairKey).toSet
    val escPairs = approx.map(pairKey).toSet
    assert(basePairs.subsetOf(escPairs),
      "probe escalation must not lose pairs the first round found")
    assert(hatched.nonEmpty && out.nonEmpty)
  }

  test("hatch pair plan is WINDOW-FREE on both the flat and two-level paths") {
    // the round-8 hatch funneled each over-budget label's embedding rows
    // through one row_number task; round 9 removed every Window from the
    // hatch (hash-mod centroids + broadcast assignment kernel + count-join
    // tile blocking) — pin it on the physical plan of the hatch internals
    val v = embeddings("/root/testdata/sf0.01")
    val members = v.select(col("label").cast("long").as("lab"),
      col("vec_id"), col("nrm"), col("embedding"))
    val over = members.groupBy("lab")
      .agg(count(lit(1)).as("c"), min("vec_id").as("minv"))
      .filter(col("c") * (col("c") - 1) / 2 > 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(over.nonEmpty)
    for (bound <- Seq(200000L /* flat */, 4L /* two-level */)) {
      val plans = DedupQueries.hatchPlansOf(over, 2, 300L)
      val (pairs, scored) = DedupQueries.hatchRound(spark, members, plans,
        0.3, 1024, 2, bound)
      val pPlan = pairs.queryExecution.executedPlan.toString
      val sPlan = scored.queryExecution.executedPlan.toString
      assert(!pPlan.contains("Window"),
        s"bound=$bound: hatch pair plan contains a Window:\n$pPlan")
      assert(!sPlan.contains("Window"),
        s"bound=$bound: hatch scored plan contains a Window")
      assert(pairs.count() > 0)
    }
  }

  test("escalation route table: degenerate re-splits past 4x budget") {
    import DedupQueries._
    // pruning + audited fine → keep
    assert(escRouteOf(1e9, 1 << 20, degenerate = false, belowFloor = false) == EscKeep)
    // below floor: exact when cheap, probe escalation when the term is big
    assert(escRouteOf(4.0 * (1 << 20), 1 << 20, degenerate = false, belowFloor = true) == EscExact)
    assert(escRouteOf(1e9, 1 << 20, degenerate = false, belowFloor = true) == EscProbe)
    // degenerate: exact when cheap; RE-SPLIT (never straight exact) when
    // the term is big — falling back to exact there would surrender the
    // budget at extreme scale
    assert(escRouteOf(4.0 * (1 << 20), 1 << 20, degenerate = true, belowFloor = false) == EscExact)
    assert(escRouteOf(1e12, 1 << 20, degenerate = true, belowFloor = false) == EscResplit)
    // degeneracy dominates the floor signal (a degenerate label's audit
    // is meaningless — it scored everything)
    assert(escRouteOf(1e12, 1 << 20, degenerate = true, belowFloor = true) == EscResplit)
  }

  test("d12 duplicate-cluster label: re-split attempted, exact fallback completes") {
    // 120 IDENTICAL vectors: every pair is above threshold, so the ANSWER
    // is the full quadratic term — ties collapse every cell grid (all
    // members pick the same lowest-id cells at ANY fineness), so round 1
    // degenerates, the re-split (term > 4x budget) degenerates again, and
    // the contract must resolve the label EXACTLY with its complete pair
    // set rather than loop or emit a partial answer
    import spark.implicits._
    graft.functions.FloatDotProduct.register(spark)
    val base = Array.fill(8)(0.5f)
    val rows = (0 until 120).map(i => (i.toLong, 1, base))
    val v = rows.toDF("vec_id", "label", "embedding")
      .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("embedding")))
    val budget = 50L // term = 7140 > 4*budget = 200 → degenerate route is re-split
    val out = DedupQueries.embedNeardupBudgeted(spark, v, 0.4,
      budget = budget, auditMod = 1L).collect()
    assert(out.length == 120 * 119 / 2,
      s"complete exact pair set expected, got ${out.length}")
    assert(out.forall(!_.getAs[Boolean]("approx_label")),
      "duplicate-cluster label must resolve on the exact channel")
    assert(out.forall(_.getAs[Boolean]("recall_floor_met")))
    assert(out.forall(_.getAs[Long]("n_scored_pairs") == 7140L))
    assert(out.forall(_.getAs[Double]("cosine") > 0.99))
  }

  test("tilePairs tile=1: every pair crosses blocks, (min,max) emit holds") {
    // tile=1 makes every member its own block, so NO pair is same-block:
    // the hash-blocked kernel's cross-block path (which must order ids
    // explicitly since hash blocks don't) produces every pair
    import spark.implicits._
    graft.functions.FloatDotProduct.register(spark)
    val rnd = new scala.util.Random(777)
    val rows = (0 until 90).map { i =>
      (i.toLong, i % 3, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val v = rows.toDF("vec_id", "label", "embedding")
      .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("embedding")))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("label", "va", "vb", "cosine").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val j = key(DedupQueries.embedNeardupJoin(spark, v, 0.1)
      .select(col("label").cast("int").as("label"), col("va"), col("vb"),
        col("cosine")))
    val b1 = key(DedupQueries.embedNeardupBlocked(spark, v, 0.1, tile = 1))
    assert(b1 == j, "tile=1 kernel diverged from the join")
    assert(j.forall(p => p._2 < p._3))
  }

  test("hatch audit: broadcast and shuffle-join arms agree") {
    // past MaxProbeBytes the audit joins its sample by shuffle instead of
    // broadcast — same rows either way, pinned here by forcing the
    // estimate over the guard
    val v = embeddings("/root/testdata/sf0.01")
    val members = v.select(col("label").cast("long").as("lab"),
      col("vec_id"), col("nrm"), col("embedding"))
    val over = members.groupBy("lab")
      .agg(count(lit(1)).as("c"), min("vec_id").as("minv"))
      .filter(col("c") * (col("c") - 1) / 2 > 300)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val plans = DedupQueries.hatchPlansOf(over, 2, 300L)
    val (pairs, _) = DedupQueries.hatchRound(spark, members, plans,
      0.3, 1024, 2, 200000L)
    val p = pairs.persist()
    val mods = over.map(o => (o._1, 1L))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    val bcast = key(DedupQueries.hatchAudit(spark, members, p, 0.3, mods))
    val shuffled = key(DedupQueries.hatchAudit(spark, members, p, 0.3, mods,
      estSampleBytes = Long.MaxValue))
    assert(bcast.nonEmpty && bcast == shuffled,
      "audit result must not depend on the join strategy")
  }

  test("d12 adaptive audit: small hatched labels are never unaudited") {
    // the audit modulus is sized PER LABEL: a global modulus sized from
    // the largest hatched label (the round-9 first cut) starved labels
    // ≳128× smaller of samples entirely — they rode out with an
    // unchecked recall_floor_met=true. This corpus pins the fix: the
    // small label's members are all ODD vec_ids, so ANY even global
    // modulus samples nothing from it, while the per-label modulus
    // (max(1, 60/128) = 1) samples every member.
    import spark.implicits._
    graft.functions.FloatDotProduct.register(spark)
    val rnd = new scala.util.Random(99)
    def vec() = Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
    val big = (0 until 4096).map(i => (i.toLong, 1, vec()))
    val small = (0 until 60).map(i => (100000L + 2L * i + 1L, 2, vec()))
    val v = (big ++ small).toDF("vec_id", "label", "embedding")
      .withColumn("nrm",
        graft.functions.VectorFunctions.l2norm(col("embedding")))
    // auditMod = 0 → adaptive per-label moduli; thr = -1 makes every
    // sampled pair above threshold, so n_exact > 0 whenever a label was
    // actually sampled — a null audit_recall can only mean "unsampled"
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val out = DedupQueries.embedNeardupBudgeted(spark, v, -1.0,
      budget = 700L, recallFloor = 0.0).collect()
    val approx = out.filter(_.getAs[Boolean]("approx_label"))
    val approxLabs = approx.map(_.getAs[Int]("label")).toSet
    assert(approxLabs.contains(2), "small label must stay hatched")
    approx.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("audit_recall")),
        s"label ${r.getAs[Int]("label")} emitted without an audit")
    }
    // cache lifecycle: only the frames the FINAL plan reads may stay
    // cached (members + the round pair sets); the hatch's internal
    // scratch (centroids, per-batch assignments, member slices) must be
    // released — before the round-9 review fix one invocation leaked ~7
    // corpus-scale cached frames for the application lifetime
    val leaked = spark.sparkContext.getPersistentRDDs.size - cachedBefore
    assert(leaked <= 4, s"d12 left $leaked cached frames behind")
  }

  test("d12 hatch batching: many flat labels across multiple probe batches") {
    // randomized multi-label corpus small enough to verify against the
    // plain join, with MaxHatchProbeRows effectively forcing >1 batch via
    // a tiny budget (many labels hatch, each with its own centroid set)
    import spark.implicits._
    graft.functions.FloatDotProduct.register(spark)
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 600).map { i =>
      val vec = Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
      (i.toLong, i % 8, vec)
    }
    val v = rows.toDF("vec_id", "label", "embedding")
      .withColumn("nrm", graft.functions.VectorFunctions.l2norm(col("embedding")))
    val exact = DedupQueries.embedNeardupJoin(spark, v, 0.2)
      .select(col("label").cast("int").as("label"), col("va"), col("vb"),
        col("cosine")).collect().map(pairKey).toSet
    val out = DedupQueries.embedNeardupBudgeted(spark, v, 0.2,
      budget = 100L, auditMod = 1L, recallFloor = 0.0).collect()
    val approx = out.filter(_.getAs[Boolean]("approx_label"))
    assert(approx.nonEmpty)
    assert(approx.map(pairKey).toSet.subsetOf(exact))
    // every label emitted SOME channel and no label emitted both
    val aLabs = approx.map(_.getAs[Int]("label")).toSet
    val eLabs = out.filterNot(_.getAs[Boolean]("approx_label"))
      .map(_.getAs[Int]("label")).toSet
    assert(aLabs.intersect(eLabs).isEmpty,
      "a label must resolve on exactly one channel")
  }
}
