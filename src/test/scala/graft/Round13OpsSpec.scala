package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.{DedupQueries, Q, VectorKernels, VectorQueries}

/** Round-13 pins.
  *
  * §1 tilePairsQuant hardening: the no-false-negative bound swept as a
  * PROPERTY over 10k random/adversarial corpora (and shown tight —
  * weakened slack constants produce false negatives on directed
  * half-step corpora); rescore batching keyed on MEASURED bytes so a
  * mixed-width corpus cannot overshoot a broadcast batch; the empty
  * member frame degrades like the exact kernel instead of throwing.
  *
  * §2 Scratch lifecycle: the multi-batch rescore's persisted survivor
  * frame and member broadcasts register with Q's scratch queue and are
  * released by one drain — the deterministic replacement for "wait for
  * the ContextCleaner to notice under GC pressure".
  *
  * §3 Shuffle lifecycle: Bench's per-query
  * `RDD.cleanShuffleDependencies` must leave persisted shared memos
  * (and their consumers) intact, and a cleaned plan must recompute on
  * demand — the two invariants the sf100 battery fix rests on.
  *
  * §4 IVF re-split cap: on a pathological single-cell corpus (all
  * members identical) the [[VectorQueries.MaxCellSplit]] cap engages,
  * output stays bit-identical to the join formulation, and the
  * probe-side shuffle stays within the documented replication bound —
  * measured with task metrics, not inferred from plan shape.
  *
  * §5 Post-broadcast-crossing plans: with the auto-broadcast threshold
  * forced off (the shape q29/d47 land in at sf100), the equi-joins must
  * resolve to SortMergeJoin/ShuffledHashJoin — never a nested-loop.
  */
class Round13OpsSpec extends SparkSpec {

  import spark.implicits._

  private def vec(i: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { k =>
      val h = (i * 31 + k) * 2654435761L % 1000L
      ((if (h < 0) h + 1000 else h) / 1000.0f) - 0.5f
    }

  private def pairBits(df: DataFrame) =
    df.select("gkey", "va", "vb", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toSet

  // ---- §1a: the quantization mirror + property sweep --------------------

  /** Driver-side mirror of tilePairsQuant's member quantization (safety
    * gate, scale, int8 codes, |q| L1). Mirror-vs-frame drift is caught by
    * the end-to-end equality pins (Round12OpsSpec §2 and the mixed-width
    * corpus test below) — this exists so the BOUND can be swept at 10k
    * cases without 10k Spark jobs.
    */
  private def quantizeMirror(
      v: Array[Float]): (Array[Int], Int, Double, Double) = {
    val d = v.length
    val vd = v.map(_.toDouble)
    val nrm = math.sqrt(VectorKernels.fold(vd, vd))
    var maxabs = 0.0
    var bad = false
    var k = 0
    while (k < d) {
      val f = v(k)
      if (f.isNaN || f.isInfinite) bad = true
      val a = math.abs(f.toDouble)
      if (a > maxabs) maxabs = a
      k += 1
    }
    val safe = !bad && maxabs > 0 && !nrm.isNaN && nrm > 0 &&
      nrm != Double.PositiveInfinity
    val sclRaw = if (safe) 127.0 / maxabs else 0.0
    val scl = if (sclRaw != Double.PositiveInfinity) sclRaw else 0.0
    val q = new Array[Int](d)
    var l1 = 0
    if (scl != 0.0) {
      k = 0
      while (k < d) {
        // frame: floor(x·scl + ½) cast int, & 255, read back signed byte
        q(k) = (math.floor(vd(k) * scl + 0.5).toInt & 0xFF).toByte.toInt
        l1 += math.abs(q(k))
        k += 1
      }
    }
    (q, l1, scl, nrm)
  }

  private def codeDot(qx: Array[Int], qy: Array[Int]): Long = {
    var t = 0L
    var k = 0
    while (k < qx.length) { t += qx(k).toLong * qy(k); k += 1 }
    t
  }

  test("quant bound: 10k-case sweep — no false negative at thr just under the exact cosine") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genComp: Gen[Float] = Gen.frequency(
      (12, Gen.choose(-1.0, 1.0).map(_.toFloat)),
      // half-step lattice: scaled values land ~½ below an integer, the
      // worst case for per-component quantization error
      (4, for { m <- Gen.choose(1, 127); s <- Gen.oneOf(-1, 1) }
        yield (s * (m - 0.4999) / 127.0).toFloat),
      (1, Gen.oneOf(0.0f, -0.0f, 1.0f, -1.0f)))
    val genPair: Gen[(Array[Float], Array[Float])] = for {
      d <- Gen.choose(1, 64)
      exp <- Gen.choose(-36, 28)
      x <- Gen.listOfN(d, genComp)
      y <- Gen.listOfN(d, genComp)
      mode <- Gen.choose(0, 3)
      // per-VECTOR poisoning (2-in-20 pairs): keeps the unsafe branch
      // exercised without drowning the finite sweep the bound is for
      poison <- Gen.choose(0, 19)
      pidx <- Gen.choose(0, 63)
      pval <- Gen.oneOf(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, Float.MinPositiveValue, 3.4e38f, 0.0f)
    } yield {
      val sc = math.pow(10.0, exp)
      val xa = x.map(f => (f * sc).toFloat).toArray
      val ya = mode match {
        case 0 => y.map(f => (f * sc).toFloat).toArray
        case 1 => xa.clone() // exact duplicate (cosine 1 ties)
        case 2 => xa.map(-_) // antipode
        case _ => xa.map(f => f * 1.0000001f) // near-duplicate
      }
      if (poison == 0) xa(pidx % d) = pval
      else if (poison == 1) ya(pidx % d) = pval
      (xa, ya)
    }
    val pairs = Gen.listOfN(10000, genPair)(
      Gen.Parameters.default, Seed(1313L)).get
    var finiteChecked = 0
    pairs.foreach { case (x, y) =>
      val (qx, l1x, sx, nx) = quantizeMirror(x)
      val (qy, l1y, sy, ny) = quantizeMirror(y)
      val cos = VectorKernels.cosOf(
        VectorKernels.fold(x.map(_.toDouble), y.map(_.toDouble)), nx, ny)
      val qq = codeDot(qx, qy)
      if (!cos.isNaN && !cos.isInfinite) {
        // the adversarial regime: this pair IS a true positive, by the
        // thinnest possible margin — the bound may never drop it
        val thr = cos - 1e-9
        assert(DedupQueries.quantCandidate(qq, l1x, l1y, x.length,
          sx, sy, nx, ny, thr),
          s"false negative: cos=$cos sx=$sx sy=$sy l1x=$l1x l1y=$l1y " +
            s"q=$qq d=${x.length} x=${x.take(8).mkString(",")}")
        finiteChecked += 1
      } else {
        // a non-finite cosine can only arise from an UNSAFE member (the
        // gate zeroes its scale) or a non-finite denominator — both are
        // unconditional candidates at any threshold
        assert(DedupQueries.quantCandidate(qq, l1x, l1y, x.length,
          sx, sy, nx, ny, 0.999999))
      }
    }
    assert(finiteChecked > 5000, s"only $finiteChecked finite cases swept")
  }

  test("quant bound: weakened slacks produce false negatives on directed half-step corpora") {
    // weakened variants — what a future "optimization" of the constants
    // would look like; each must FAIL one of the directed constructions
    def weakL1(q: Long, l1a: Int, l1b: Int, d: Int, sa: Double, sb: Double,
        na: Double, nb: Double, thr: Double): Boolean = {
      val den = sa * sb * na * nb
      (q + (0.45 * (l1a + l1b) + 0.250001 * d)) / den + 1e-7 > thr
    }
    def weakQuarterD(q: Long, l1a: Int, l1b: Int, d: Int, sa: Double,
        sb: Double, na: Double, nb: Double, thr: Double): Boolean = {
      val den = sa * sb * na * nb
      (q + (0.500001 * (l1a + l1b) - 0.25 * d)) / den + 1e-7 > thr
    }
    def caseOf(x: Array[Float]): (Long, Int, Int, Double, Double, Double) = {
      val (qx, l1, s, n) = quantizeMirror(x)
      val cos = VectorKernels.cosOf(
        VectorKernels.fold(x.map(_.toDouble), x.map(_.toDouble)), n, n)
      (codeDot(qx, qx), l1, x.length, s, n, cos)
    }
    // Construction B (L1 term near its ceiling): max component scales to
    // exactly −127, every other to ~½ below −126 — per-component error
    // ≈ +½ with aligned signs, so |dot·s² − Q| ≈ ½·(L1ₓ+L1ᵧ)
    val xB = Array.tabulate(64)(k =>
      if (k == 0) -1.0f else (-(126.5 - 1e-3) / 127.0).toFloat)
    val (qB, l1B, dB, sB, nB, cosB) = caseOf(xB)
    val thrB = cosB - 1e-9
    assert(DedupQueries.quantCandidate(qB, l1B, l1B, dB, sB, sB, nB, nB, thrB),
      "correct bound must emit the L1-adversarial self-pair")
    assert(!weakL1(qB, l1B, l1B, dB, sB, sB, nB, nB, thrB),
      "0.45·L1 slack should have missed the L1-adversarial pair")
    // Construction A (¼d term dominates): every non-max component scales
    // to ~½ below zero — q = 0, so L1 ≈ |q_max| only and the error is
    // almost entirely the Σeₓe_y = ¼d term. Catches a sign error or
    // omission of ¼d.
    val xA = Array.tabulate(1024)(k =>
      if (k == 0) -1.0f else (-0.4999 / 127.0).toFloat)
    val (qA, l1A, dA, sA, nA, cosA) = caseOf(xA)
    assert(l1A == 127, s"construction A should quantize tails to 0 (l1=$l1A)")
    val thrA = cosA - 1e-9
    assert(DedupQueries.quantCandidate(qA, l1A, l1A, dA, sA, sA, nA, nA, thrA),
      "correct bound must emit the ¼d-adversarial self-pair")
    assert(!weakQuarterD(qA, l1A, l1A, dA, sA, sA, nA, nA, thrA),
      "a −¼d sign error should have missed the ¼d-adversarial pair")
  }

  // ---- §1b: measured-byte rescore batching ------------------------------

  test("rescoreBatches: multi-gkey batches never exceed the bound; oversized singletons isolate") {
    import DedupQueries.rescoreBatches
    assert(rescoreBatches(Nil, 100L) == Nil)
    assert(rescoreBatches(Seq((1L, 10L)), 100L) == List(List(1L)))
    assert(rescoreBatches(Seq((1L, 60L), (2L, 60L), (3L, 10L)), 100L) ==
      List(List(1L), List(2L, 3L)))
    // a gkey larger than the bound forms its own batch — it neither
    // splits (the rescore needs both members resident) nor absorbs others
    assert(rescoreBatches(Seq((1L, 500L), (2L, 10L)), 100L) ==
      List(List(1L), List(2L)))
    assert(rescoreBatches(Seq((1L, 10L), (2L, 500L), (3L, 10L)), 100L) ==
      List(List(1L), List(2L), List(3L)))
    // property: random size lists — batches partition the input in order
    // and every batch of ≥2 gkeys sums within the bound
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(400,
      Gen.zip(Gen.choose(1L, 300L), Gen.choose(0L, 250L)))
    (1 to 50).foreach { seed =>
      val sizes = gen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((_, b), i) => (i.toLong, b) }
      val bound = 400L
      val batches = rescoreBatches(sizes, bound)
      assert(batches.flatten == sizes.map(_._1), "batches must partition in order")
      val byG = sizes.toMap
      batches.filter(_.length > 1).foreach { b =>
        assert(b.map(byG).sum <= bound,
          s"multi-gkey batch over bound: $b -> ${b.map(byG).sum}")
      }
    }
  }

  test("tilePairsQuant: mixed-width corpus — measured bytes isolate the wide gkey, output == exact") {
    graft.functions.FloatDotProduct.register(spark)
    // gkey 0: 40 × dim-8 members; gkey 1: 40 × dim-256 members (32× the
    // bytes). The retired one-sampled-dim estimate would size BOTH gkeys
    // from whichever dim it sampled; measured gdim must split them.
    val rows = (0L until 80L).map { i =>
      val g = i % 2
      (g, i, vec(i, if (g == 0) 8 else 256))
    }
    val v = rows.toDF("gkey", "vec_id", "embedding")
      .withColumn("nrm", l2norm(col("embedding")))
      .select("gkey", "vec_id", "nrm", "embedding").persist()
    try {
      val sizes = Seq(
        (0L, 4L * 8 * 40 + 120L * 40), // 6,080 B measured
        (1L, 4L * 256 * 40 + 120L * 40)) // 45,760 B measured
      val bound = 10000L // between the two: only a measured split is legal
      val batches = DedupQueries.rescoreBatches(sizes, bound)
      assert(batches == List(List(0L), List(1L)))
      // end to end through the multi-batch broadcast arm at that bound
      val ex = pairBits(DedupQueries.tilePairs(spark, v, 0.0))
      val qz = pairBits(DedupQueries.tilePairsQuant(spark, v, 0.0,
        maxBatchBytes = bound))
      assert(ex.nonEmpty && qz == ex,
        s"missing=${(ex -- qz).take(5)} extra=${(qz -- ex).take(5)}")
    } finally { v.unpersist(); () }
  }

  test("tilePairsQuant: empty member frame degrades like the exact kernel") {
    val empty = Seq.empty[(Long, Long, Double, Array[Float])]
      .toDF("gkey", "vec_id", "nrm", "embedding")
    val qz = DedupQueries.tilePairsQuant(spark, empty, 0.4)
    val ex = DedupQueries.tilePairs(spark, empty, 0.4)
    assert(qz.collect().isEmpty && ex.collect().isEmpty)
    assert(qz.schema.map(f => (f.name, f.dataType)) ==
      ex.schema.map(f => (f.name, f.dataType)))
  }

  // ---- §2: scratch lifecycle --------------------------------------------

  test("scratch lifecycle: multi-batch rescore registers its cache+broadcasts; drain releases once") {
    graft.functions.FloatDotProduct.register(spark)
    Q.drainScratch(spark) // clear any leftovers from earlier suites
    val v = (0L until 40L).map(i => (i % 2, i, vec(i, 8)))
      .toDF("gkey", "vec_id", "embedding")
      .withColumn("nrm", l2norm(col("embedding")))
      .select("gkey", "vec_id", "nrm", "embedding")
    val df = DedupQueries.tilePairsQuant(spark, v, 0.0,
      maxBatchBytes = 1L, maxBatches = 1000)
    assert(df.collect().nonEmpty)
    // 2 gkeys at a 1-byte bound → 2 batches → 1 persisted survivor frame
    // + 2 member broadcasts registered
    val released = Q.drainScratch(spark)
    assert(released >= 3, s"expected candIn + 2 broadcasts, got $released")
    assert(Q.drainScratch(spark) == 0)
  }

  // ---- §3: per-query shuffle lifecycle ----------------------------------

  test("shuffle clean: shared memos survive a top-level clean; a cleaned plan recomputes") {
    val dir = "/root/testdata/sf0.001"
    // d34 consumes the shared gram-table memo (persisted) — its own
    // exchanges sit ABOVE the memo boundary
    val df = SparkEntry.queries("d34_ngram_coverage")(spark, dir)
    val r1 = df.collect().toSeq.map(_.toString)
    assert(r1.nonEmpty)
    df.queryExecution.toRdd.cleanShuffleDependencies(blocking = true)
    // the same handle recomputes through the cleaned shuffles (the
    // eviction-recompute path Bench's lifecycle relies on)
    assert(df.collect().toSeq.map(_.toString) == r1)
    // and a DIFFERENT consumer of the same persisted memo still answers
    assert(SparkEntry.queries("d02_dedup_jaccard")(spark, dir)
      .collect().length >= 0)
  }

  test("memo release: reset cleans build shuffles; a fresh consumer rebuilds identically") {
    val dir = "/root/testdata/sf0.001"
    // d34's answer flows through the persisted gram-table memo; capture it
    // with the memo warm, then reset (which now unpersists AND deletes the
    // memo's build shuffles — the residue the low-disk nudge existed for),
    // then rebuild from cold: same rows, and the rebuild must not trip on
    // the cleaned shuffle state (fresh frames register fresh shuffles).
    val warm = SparkEntry.queries("d34_ngram_coverage")(spark, dir)
      .collect().toSeq.map(_.toString).sorted
    assert(warm.nonEmpty)
    Q.reset(spark)
    val cold = SparkEntry.queries("d34_ngram_coverage")(spark, dir)
      .collect().toSeq.map(_.toString).sorted
    assert(cold == warm)
  }

  // ---- §4: IVF re-split cap on a degenerate corpus -----------------------

  private def nnRows(df: DataFrame): Seq[(Long, Long, Option[Double])] =
    df.orderBy("eval_id").collect().toSeq.map { r =>
      (r.getLong(r.fieldIndex("eval_id")),
        r.getLong(r.fieldIndex("train_id")),
        if (r.isNullAt(r.fieldIndex("cosine"))) None
        else Some(r.getDouble(r.fieldIndex("cosine"))))
    }

  private def sameNN(a: Seq[(Long, Long, Option[Double])],
      b: Seq[(Long, Long, Option[Double])]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((e1, t1, c1), (e2, t2, c2)) =>
      e1 == e2 && t1 == t2 && ((c1, c2) match {
        case (None, None) => true
        case (Some(x), Some(y)) =>
          java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(y)
        case _ => false
      })
    }

  test("IVF cells: MaxCellSplit cap on a single-cell corpus — equality + bounded probe shuffle") {
    graft.functions.FloatDotProduct.register(spark)
    val base = vec(3, 8)
    // 3,990 IDENTICAL members (one dominant cell — every centroid is the
    // same point, ties assign everything together) + 10 distinct tails
    val tr = (0L until 4000L).map { i =>
      (i, if (i >= 3990L) vec(i, 8) else base.clone())
    }.toDF("train_id", "embedding")
      .select(col("train_id"), col("embedding").as("te"),
        l2norm(col("embedding")).as("tn"))
    val ev = (9000L until 9030L).map { i =>
      (i, if (i % 3 == 0) base.clone() else vec(i, 8))
    }.toDF("eval_id", "embedding")
      .select(col("eval_id"), col("embedding").as("qe"),
        l2norm(col("embedding")).as("qn"))
    // the dominant cell wants f = members/target ≫ MaxCellSplit at
    // target 1 — the cap must engage
    val prof = VectorQueries.nearestTrainIvfCellsSplitProfile(tr)
    assert(prof.map(_._2).max > VectorQueries.MaxCellSplit,
      s"corpus not degenerate enough: $prof")
    val l = new TaskMetricsListener
    spark.sparkContext.addSparkListener(l)
    def drainBus(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        ()
      } catch { case _: Throwable => Thread.sleep(1500) }
    try {
      drainBus()
      val s0 = l.snapshot()
      val c = nnRows(VectorQueries.nearestTrainIvfCells(tr, ev, nprobe = 3,
        targetCellRows = Some(1L)))
      drainBus()
      val shufW = l.snapshot()(1) - s0(1)
      val j = nnRows(VectorQueries.nearestTrainIvfJoin(tr, ev, nprobe = 3))
      assert(c.nonEmpty && sameNN(c, j))
      // documented replication bound: |ev|·nprobe_eff·MaxCellSplit·rowBytes
      // ≈ 30·1·1024·~90 B ≈ 2.6 MB, plus one corpus-shaped member pass —
      // generous 32 MB ceiling still catches anything pair-shaped
      // (members×probes vectors would be ≥ 100 MB)
      assert(shufW > 0L && shufW < 32L * 1024 * 1024,
        s"probe-replication shuffle out of bounds: $shufW B")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  // ---- §5: post-broadcast-crossing plan pins ------------------------------

  test("q29/d47: with auto-broadcast off, equi-joins are SMJ/SHJ — never nested-loop") {
    val dir = "/root/testdata/sf0.001"
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // the adaptive plan's toString appends an "== Initial Plan ==" section
    // that would double-count operators — assert on the final section only
    def finalSection(p: String): String = {
      val i = p.indexOf("== Initial Plan ==")
      if (i >= 0) p.substring(0, i) else p
    }
    try {
      val q29 = SparkEntry.queries("q29_having")(s2, dir)
      assert(q29.collect().nonEmpty)
      val p29 = finalSection(q29.queryExecution.executedPlan.toString)
      assert(!p29.contains("BroadcastNestedLoopJoin") &&
        !p29.contains("CartesianProduct"), p29)
      assert(p29.contains("SortMergeJoin") || p29.contains("ShuffledHashJoin"),
        p29)
      val d47 = SparkEntry.queries("d47_bm25")(s2, dir)
      assert(d47.collect().nonEmpty)
      val p47 = finalSection(d47.queryExecution.executedPlan.toString)
      assert(!p47.contains("CartesianProduct"), p47)
      // the ONLY admissible nested-loop is the hinted 1-row stats cross
      // join; the tf⋈dl equi-join must be a shuffle join here
      assert("BroadcastNestedLoopJoin".r.findAllIn(p47).size <= 1, p47)
      assert(p47.contains("SortMergeJoin") || p47.contains("ShuffledHashJoin"),
        p47)
    } finally Q.reset(s2)
  }
}
