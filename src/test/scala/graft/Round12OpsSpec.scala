package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.VectorQueries

/** Round-12 pins.
  *
  * §1 The cogrouped-cell IVF path ([[graft.queries.VectorQueries
  * .nearestTrainIvfCells]]) — the new scale route for eval sets that
  * outgrow the broadcast guard — must be BIT-IDENTICAL to the join
  * formulation on the contract edges (zero-norm → NaN cosine ranked
  * greatest, duplicate vectors → lowest-id tie-break, ragged dims →
  * NULL-cosine fallback to the lowest id), and the degenerate-cell
  * re-split (forced via tiny `targetCellRows`) must not change a single
  * bit: subcells partition the members, probes replicate to every
  * subcell, and the cross-subcell max(struct) merge restores the exact
  * per-cell argmax.
  */
class Round12OpsSpec extends SparkSpec {

  import spark.implicits._

  private def vec(i: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { k =>
      val h = (i * 31 + k) * 2654435761L % 1000L
      ((if (h < 0) h + 1000 else h) / 1000.0f) - 0.5f
    }

  /** The Round8KernelSpec edge corpus: zero-norm, duplicate-pair, and
    * ragged rows on both sides.
    */
  private def edgeTrainEval(): (DataFrame, DataFrame) = {
    val train = (0L until 200L).map { i =>
      val e =
        if (i == 7) Array(0f, 0f, 0f, 0f)
        else if (i == 11) vec(5, 4)
        else if (i == 13) vec(13, 3)
        else vec(i, 4)
      (i, e)
    }
    val ev = (1000L until 1040L).map { i =>
      val e =
        if (i == 1003) Array(0f, 0f, 0f, 0f)
        else if (i == 1005) vec(17, 3)
        else vec(i, 4)
      (i, e)
    }
    val tr = train.toDF("train_id", "embedding")
      .select(col("train_id"), col("embedding").as("te"),
        l2norm(col("embedding")).as("tn"))
    val evd = ev.toDF("eval_id", "embedding")
      .select(col("eval_id"), col("embedding").as("qe"),
        l2norm(col("embedding")).as("qn"))
    graft.functions.FloatDotProduct.register(spark)
    (tr, evd)
  }

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

  test("IVF cells == IVF join on the edge corpus, split forced and default") {
    val (tr, ev) = edgeTrainEval()
    for (np <- Seq(1, 2, 1000); target <- Seq(None, Some(7L), Some(1L))) {
      val c = nnRows(VectorQueries.nearestTrainIvfCells(tr, ev, nprobe = np,
        targetCellRows = target))
      val j = nnRows(VectorQueries.nearestTrainIvfJoin(tr, ev, nprobe = np))
      assert(c.nonEmpty && sameNN(c, j),
        s"nprobe=$np target=$target cells vs join:\n$c\n$j")
    }
  }

  test("IVF cells == IVF join on fixture embeddings (sf0.01), re-split engaged") {
    val (tr, ev) = VectorQueries.d32Inputs(spark, "/root/testdata/sf0.01")
    // target=50 forces f > 1 on every real cell (cells are hundreds of
    // members at this SF) — the re-split arm is genuinely exercised
    val c = nnRows(VectorQueries.nearestTrainIvfCells(tr, ev,
      targetCellRows = Some(50L)))
    val j = nnRows(VectorQueries.nearestTrainIvfJoin(tr, ev))
    assert(c.nonEmpty && sameNN(c, j))
    // every eval answered (the liveness contract survives the re-split)
    assert(c.map(_._1).distinct.length ==
      ev.select("eval_id").distinct().count())
    // and the forced-split run really split: at least one cell must have
    // more than 50 members at this SF
    val counts = VectorQueries.nearestTrainIvfCellsSplitProfile(tr)
    assert(counts.exists(_._2 > 50L), s"no cell above target: $counts")
  }

  test("IVF cells degenerates to exact search at exhaustive nprobe") {
    val (tr, ev) = edgeTrainEval()
    val ex = nnRows(VectorQueries.nearestTrainIvfCells(tr, ev, nprobe = 1000,
      targetCellRows = Some(3L)))
    val b = nnRows(VectorQueries.nearestTrainBroadcast(tr, ev))
    assert(sameNN(ex, b))
  }

  // ---- §2: int8-quantized tile fabric (tilePairsQuant) ----

  import graft.queries.DedupQueries

  /** Member corpus exercising every branch of the quantization safety
    * gate: zero-norm (NaN cosines — kept by NaN-greatest), exact
    * duplicates (cosine 1 ties), ragged dims (no pair), huge magnitudes
    * (tiny scale, still safe), subnormal magnitudes (scale overflow →
    * non-finite bound denominator → rescore decides), NaN and Inf
    * components (unsafe members — every pair rescored), plus two gkey
    * groups so the group key stays load-bearing.
    */
  private def quantEdgeCorpus(): org.apache.spark.sql.DataFrame = {
    val rows: Seq[(Long, Long, Array[Float])] =
      (0L until 80L).map { i =>
        val g = i % 2
        val e: Array[Float] =
          if (i == 7) Array(0f, 0f, 0f, 0f)
          else if (i == 11) vec(5, 4)
          else if (i == 13) vec(13, 3)
          else if (i == 17) vec(17, 4).map(_ * 1e30f)
          else if (i == 19) vec(19, 4).map(_ * 1e-38f)
          else if (i == 23) { val a = vec(23, 4); a(1) = Float.NaN; a }
          else if (i == 29) { val a = vec(29, 4); a(2) = Float.PositiveInfinity; a }
          else vec(i, 4)
        (g, i, e)
      }
    graft.functions.FloatDotProduct.register(spark)
    rows.toDF("gkey", "vec_id", "embedding")
      .withColumn("nrm", l2norm(col("embedding")))
      .select("gkey", "vec_id", "nrm", "embedding")
  }

  private def pairBits(df: org.apache.spark.sql.DataFrame) =
    df.select("gkey", "va", "vb", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toSet

  test("quantized tile fabric == exact tile kernel on the edge corpus") {
    val v = quantEdgeCorpus().persist()
    try {
      for (thr <- Seq(-2.0, 0.0, 0.4, 0.99); tile <- Seq(7, 1024)) {
        val ex = pairBits(DedupQueries.tilePairs(spark, v, thr, tile))
        val qz = pairBits(DedupQueries.tilePairsQuant(spark, v, thr, tile))
        assert(qz == ex, s"thr=$thr tile=$tile: " +
          s"missing=${(ex -- qz).take(5)} extra=${(qz -- ex).take(5)}")
        if (thr <= 0.0) assert(ex.nonEmpty)
      }
    } finally v.unpersist()
  }

  test("quant rescore arms: multi-batch broadcast == single == join fallback") {
    val v = quantEdgeCorpus().persist()
    try {
      val ex = pairBits(DedupQueries.tilePairs(spark, v, 0.0))
      // tiny batch bound → one broadcast per gkey (multi-batch arm)
      val multi = pairBits(DedupQueries.tilePairsQuant(spark, v, 0.0,
        maxBatchBytes = 1L, maxBatches = 1000))
      // tiny batch bound + tiny cap → the shuffle-join fallback arm
      val joinArm = pairBits(DedupQueries.tilePairsQuant(spark, v, 0.0,
        maxBatchBytes = 1L, maxBatches = 0))
      assert(ex.nonEmpty && multi == ex && joinArm == ex)
    } finally v.unpersist()
  }

  test("quantized tile fabric == exact tile kernel on fixture embeddings") {
    graft.functions.FloatDotProduct.register(spark)
    val v = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("label").cast("long").as("gkey"), col("vec_id"),
        col("embedding"))
      .withColumn("nrm", l2norm(col("embedding")))
      .select("gkey", "vec_id", "nrm", "embedding").persist()
    try {
      val ex = pairBits(DedupQueries.tilePairs(spark, v, 0.3))
      val qz = pairBits(DedupQueries.tilePairsQuant(spark, v, 0.3))
      assert(ex.nonEmpty && qz == ex)
    } finally v.unpersist()
  }

  test("d12 budgeted: quantized fabric arm == exact fabric arm end to end") {
    graft.functions.FloatDotProduct.register(spark)
    val v = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", l2norm(col("embedding")))
    def rows(quant: Boolean) =
      DedupQueries.embedNeardupBudgeted(spark, v, 0.3, budget = 300L,
          auditMod = 1L, quantFabric = Some(quant))
        .orderBy("label", "va", "vb").collect().toSeq.map(_.toString)
    val q = rows(true)
    val e = rows(false)
    assert(q.nonEmpty && q == e)
  }

  // ---- §3: d27/d36 >63-source fallback + mask≡direct equivalence ----

  /** Synthetic corpus with `nSources` provenance labels: doc i belongs to
    * source `src<i % nSources>`, with engineered shingle overlap (docs
    * share 3-gram windows with their neighbors), a null-source doc, a
    * null-text doc, and a <3-token doc. Written as parquet so the real
    * queries run against it through the normal fixture-dir path.
    */
  private def writeSourceCorpus(nSources: Int, withSrc0: Boolean): String = {
    val dir = freshRoot()
    val words = (0 until 40).map(i => s"w$i")
    val rows = (0 until (nSources * 3)).map { i =>
      val src: String =
        if (i == 1) null
        else if (withSrc0) s"src${i % nSources}"
        else s"other${i % nSources}"
      val text: String =
        if (i == 2) null
        else if (i == 3) "only two"
        // sliding 8-word windows over a shared vocabulary — neighbors
        // overlap, so cross-source shared shingles exist by construction
        else (0 until 8).map(k => words((i + k) % words.length)).mkString(" ")
      (i.toLong, text, src)
    }
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Driver-side independent recomputation of d36's matrix from raw
    * (source → distinct shingle-hash set) maps — a different formulation
    * than both engine arms.
    */
  private def expectedOverlap(dir: String): Seq[(String, String, Long, Long, Long)] = {
    val perSrc = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("source").isNotNull && col("text").isNotNull)
      .collect().toSeq
      .groupBy(_.getAs[String]("source"))
      .map { case (src, docs) =>
        src -> docs.flatMap { r =>
          val tk = r.getAs[String]("text").split(" ", -1)
          if (tk.length >= 3)
            (0 to tk.length - 3).map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}")
          else Nil
        }.toSet
      }
    val srcs = perSrc.keys.toSeq.sorted
    for {
      a <- srcs; b <- srcs if a < b
      shared = (perSrc(a) & perSrc(b)).size.toLong if shared > 0
    } yield (a, b, shared, perSrc(a).size.toLong, perSrc(b).size.toLong)
  }

  test("d36: >63-source corpus routes to the set fallback and matches a driver oracle") {
    val dir = writeSourceCorpus(70, withSrc0 = true)
    val auto = DedupQueries.sourceOverlapOf(spark, dir)
      .collect().toSeq.map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = expectedOverlap(dir).sortBy(t => (t._1, t._2))
    assert(auto.nonEmpty && auto == expected)
    // the auto route IS the fallback here (70 > 63): forcing it changes
    // nothing; the bitmap arm is undefined past 63 bits by construction
    val forced = DedupQueries.sourceOverlapOf(spark, dir,
        forceRoute = Some(false))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(forced == auto)
  }

  test("d36: bitmap arm == set-fallback arm on a ≤63-source corpus") {
    val dir = writeSourceCorpus(9, withSrc0 = true)
    def rows(route: Option[Boolean]) =
      DedupQueries.sourceOverlapOf(spark, dir, forceRoute = route)
        .collect().toSeq.map(_.toString)
    val bitmap = rows(Some(true))
    val direct = rows(Some(false))
    val auto = rows(None)
    assert(bitmap.nonEmpty && bitmap == direct && auto == bitmap)
  }

  test("d27: mask route == direct route (fixture + synthetic), >63 fallback live") {
    // fixture: both corpus-hash routes produce the same hash set
    def hset(dir: String, route: Option[Boolean]) =
      DedupQueries.d27CorpusHashes(spark, dir, forceRoute = route)
        .collect().map(_.getLong(0)).toSet
    val fm = hset("/root/testdata/sf0.01", Some(true))
    val fd = hset("/root/testdata/sf0.01", Some(false))
    assert(fm.nonEmpty && fm == fd)
    // >63-source synthetic: the auto route is the direct fallback; the
    // full d27 query still answers every src0 doc
    val dir = writeSourceCorpus(70, withSrc0 = true)
    assert(hset(dir, None) == hset(dir, Some(false)))
    val out = SparkEntry.queries("d27_decontamination")(spark, dir).collect()
    assert(out.nonEmpty)
    // driver-side oracle for the contaminated fraction of each src0 doc
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect().toSeq
    def shingles(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      if (tk.length >= 3)
        (0 to tk.length - 3).map(i => s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}").toSet
      else Set.empty
    }
    val corpusSh = docs.filter(r => r.getAs[String]("source") != null &&
        r.getAs[String]("source") != "src0" && r.getAs[String]("text") != null)
      .flatMap(r => shingles(r.getAs[String]("text"))).toSet
    val expected = docs.filter(r => r.getAs[String]("source") == "src0" &&
        r.getAs[String]("text") != null)
      .map { r =>
        val sh = shingles(r.getAs[String]("text"))
        (r.getAs[Long]("doc_id"), sh.size.toLong, (sh & corpusSh).size.toLong)
      }
      .filter(_._2 > 0).sortBy(_._1)
    val got = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_contaminated"))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  // ---- §3b: ScaleUp replica embeddings — isometry within, decorrelated across ----

  test("ScaleUp replica embeddings: within-copy exact isometry, cross-copy decorrelation") {
    graft.functions.FloatDotProduct.register(spark)
    val base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .limit(400)
    val fanned = base.withColumn("__c",
        explode(sequence(lit(0L), lit(2L))))
      .withColumn("emb2", graft.ScaleUp.replicaEmbedding)
      .select(col("vec_id"), col("__c"), col("embedding"), col("emb2"))
      .collect()
    // copy 0 verbatim
    fanned.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getSeq[Float](2) == r.getSeq[Float](3))
    }
    def byCopy(c: Long): Map[Long, Array[Float]] =
      fanned.filter(_.getLong(1) == c)
        .map(r => r.getLong(0) -> r.getSeq[Float](3).toArray).toMap
    val c0 = byCopy(0L); val c1 = byCopy(1L); val c2 = byCopy(2L)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var t = 0.0; var k = 0
      while (k < a.length) { t += a(k).toDouble * b(k); k += 1 }
      t
    }
    // WITHIN-copy isometry: every pairwise dot in copy 1 is bit-identical
    // to the same pair's dot in copy 0 (sign² = +1 term-by-term, same
    // fold order) — the fixture's within-copy dup/ANN structure is
    // untouched by construction, not approximately
    val ids = c0.keys.toSeq.sorted.take(60)
    for (a <- ids; b <- ids if a < b) {
      assert(java.lang.Double.doubleToLongBits(dot(c1(a), c1(b))) ==
        java.lang.Double.doubleToLongBits(dot(c0(a), c0(b))))
    }
    // CROSS-copy decorrelation: the same original's replicas are NOT
    // near-duplicates (the additive-jitter bug left them at cos ≈ 0.99)
    val cosines = c0.keys.toSeq.sorted.map { id =>
      val x = c1(id); val y = c2(id)
      val n1 = math.sqrt(dot(x, x)); val n2 = math.sqrt(dot(y, y))
      if (n1 == 0.0 || n2 == 0.0) 0.0 else dot(x, y) / (n1 * n2)
    }
    assert(cosines.map(math.abs).sum / cosines.length < 0.25,
      "replica cosines are not decorrelated")
    assert(cosines.count(_ > 0.4).toDouble / cosines.length < 0.05,
      "same-original replicas still read as near-duplicates")
  }

  // ---- §4: bench gauge semantics under synthetic task events ----

  test("peak-task gauge: max-and-reset semantics under synthetic task ends") {
    import org.apache.spark.scheduler.{SparkListenerTaskEnd, TaskInfo, TaskLocality}
    val l = new TaskMetricsListener
    def end(peak: Long, shufWrite: Long): SparkListenerTaskEnd = {
      // TaskMetrics construction/setters are private[spark] at the Scala
      // level but public in bytecode — reflection builds a real event
      val cls = Class.forName("org.apache.spark.executor.TaskMetrics")
      val ctor = cls.getDeclaredConstructor()
      ctor.setAccessible(true)
      val m = ctor.newInstance()
        .asInstanceOf[org.apache.spark.executor.TaskMetrics]
      val incPeak =
        try cls.getMethod("incPeakExecutionMemory", classOf[Long])
        catch { case _: NoSuchMethodException =>
          cls.getMethod("setPeakExecutionMemory", classOf[Long]) }
      incPeak.invoke(m, java.lang.Long.valueOf(peak))
      val sw = cls.getMethod("shuffleWriteMetrics").invoke(m)
      sw.getClass.getMethod("incBytesWritten", classOf[Long])
        .invoke(sw, java.lang.Long.valueOf(shufWrite))
      val ti = new TaskInfo(0L, 0, 0, 0, 0L, "exec", "host",
        TaskLocality.ANY, false)
      SparkListenerTaskEnd(1, 0, "ResultTask", org.apache.spark.Success,
        ti, null, m)
    }
    // empty window: reset returns 0 and stays 0
    assert(l.peakTaskMemSinceReset() == 0L)
    val s0 = l.snapshot()
    l.onTaskEnd(end(100L, 5L))
    l.onTaskEnd(end(40L, 7L))
    // counters are SUMS across tasks…
    assert(l.snapshot()(1) - s0(1) == 12L)
    assert(l.snapshot()(7) - s0(7) == 2L)
    // …but the peak gauge is a MAX (the old sum semantics would say 140)
    assert(l.peakTaskMemSinceReset() == 100L)
    // and it RESETS per window — a second read is a fresh high-water mark
    assert(l.peakTaskMemSinceReset() == 0L)
    l.onTaskEnd(end(70L, 0L))
    assert(l.peakTaskMemSinceReset() == 70L)
  }

  // ---- §5: desc_key property sweep against Spark's own comparator ----

  test("desc_key: 10k random bit patterns order exactly like desc_nulls_last") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.functions.DescKey
    val gen = Gen.listOfN(10000, Gen.choose(Long.MinValue, Long.MaxValue))
    val bits = gen(Gen.Parameters.default, Seed(42L)).get
    // raw 64-bit patterns: normals, subnormals, ±0.0, ±inf, every NaN
    // payload class (negative-sign and signaling patterns included)
    val doubles = bits.map(java.lang.Double.longBitsToDouble) ++ Seq(
      0.0, -0.0, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.NaN, java.lang.Double.longBitsToDouble(0x7ff0000000000001L),
      java.lang.Double.longBitsToDouble(0xfff8000000000123L),
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      Double.MaxValue, Double.MinValue)
    // reference: Spark's own ascending double comparator (NaN greatest,
    // -0.0 == 0.0) — desc rank(a before b) ⟺ cmp(a,b) > 0
    val cmp = (a: Double, b: Double) =>
      org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(a, b)
    val keyed = doubles.map(d => (d, DescKey.key(d)))
    // pairwise order/tie agreement on a deterministic sample of pairs
    val n = keyed.length
    var i = 0
    while (i < n) {
      val (a, ka) = keyed(i)
      val (b, kb) = keyed((i * 2654435761L % n).toInt.abs)
      val c = cmp(a, b)
      assert(java.lang.Long.compare(ka, kb) == -c.sign,
        s"order disagreement: $a (key $ka) vs $b (key $kb), cmp=$c")
      i += 1
    }
    // injectivity modulo the documented canonicalizations: equal keys ⟺
    // comparator tie (all NaNs collapse, -0.0 == 0.0, nothing else)
    keyed.groupBy(_._2).foreach { case (_, vs) =>
      val h = vs.head._1
      assert(vs.forall(v => cmp(v._1, h) == 0))
    }
    // null sorts LAST under desc_nulls_last: its key is the maximum
    assert(keyed.forall(_._2 < Long.MaxValue) ||
      keyed.exists(v => cmp(v._1, Double.NaN) == 0 && v._2 < Long.MaxValue))
    assert(keyed.map(_._2).max < Long.MaxValue)
    // end-to-end: Spark's own sort agrees with sorting by the key
    import spark.implicits._
    graft.functions.DescKey.register(spark)
    val sample = doubles.take(2000).zipWithIndex
      .map { case (d, ix) => (ix.toLong, Option(d)) } ++
      Seq((9001L, Option.empty[Double]), (9002L, Option.empty[Double]))
    val df = sample.toDF("id", "x")
    val bySpark = df.orderBy(col("x").desc_nulls_last, col("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    val byKey = df.selectExpr("id", "desc_key(x) AS k")
      .orderBy("k", "id").select("id").collect().map(_.getLong(0)).toSeq
    assert(bySpark == byKey)
  }

  test("d27: src0-absent corpus — mask route's every-mask-is-corpus branch") {
    val dir = writeSourceCorpus(7, withSrc0 = false)
    // no src0 anywhere: the mask arm keeps every occupied mask, the
    // direct arm keeps every non-src0 gram — identical sets — and the
    // full query's eval side is empty
    val m = DedupQueries.d27CorpusHashes(spark, dir, forceRoute = Some(true))
      .collect().map(_.getLong(0)).toSet
    val d = DedupQueries.d27CorpusHashes(spark, dir, forceRoute = Some(false))
      .collect().map(_.getLong(0)).toSet
    assert(m.nonEmpty && m == d)
    val out = SparkEntry.queries("d27_decontamination")(spark, dir).collect()
    assert(out.isEmpty)
  }
}
