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
}
