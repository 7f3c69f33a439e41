package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Round-10 d12 audit hardening: the recall-audit sample is taken on a
  * SALTED hash residue (id structure can't dodge it, and it is
  * decorrelated from the centroid hash), `hatchAudit` reports how many
  * rows it actually sampled, and a label whose sample came back empty is
  * treated as floor-not-met instead of riding out with an unchecked
  * `recall_floor_met = true`.
  */
class Round10OpsSpec extends SparkSpec {

  private def withNorm(df: org.apache.spark.sql.DataFrame) = {
    graft.functions.FloatDotProduct.register(spark)
    df.withColumn("nrm",
      graft.functions.VectorFunctions.l2norm(col("embedding")))
  }

  test("hatch audit samples parity-biased ids (hash residue, not raw id)") {
    // 512 members, ALL vec_ids odd: the per-label modulus for this
    // cardinality is 512/128 = 4, and the pre-round-10 raw
    // `vec_id % 4 == 0` filter sampled NOTHING from it (odd ids never
    // hit residue 0 of an even modulus) — the label rode out unaudited.
    // The salted-hash residue is uniform over id structure: the sample
    // must be non-empty and n_sampled must say so.
    import spark.implicits._
    val rnd = new scala.util.Random(31337)
    val members = (0 until 512)
      .map(i => (7L, 2L * i + 1L, Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("lab", "vec_id", "embedding")
    val m = withNorm(members)
    val noPairs = Seq.empty[(Long, Long, Long)].toDF("lab", "va", "vb")
    // thr = -1 makes every exact sample pair above threshold, so
    // audit_recall is non-null whenever sampling produced any rows
    val row = DedupQueries.hatchAudit(spark, m, noPairs, -1.0,
        Seq((7L, 4L))).collect().head
    val nSampled = row.getAs[Long]("n_sampled")
    assert(nSampled > 0L,
      s"salted-hash sampling drew $nSampled rows from an all-odd id space")
    // no reported pairs at all => recall over the sample is exactly 0
    assert(!row.isNullAt(row.fieldIndex("audit_recall")))
    assert(row.getAs[Double]("audit_recall") == 0.0)
  }

  test("zero-sample labels never claim the recall floor") {
    // auditMod forced astronomically high: every label's expected sample
    // count is ~0, so round 1 marks them failing (unverified != verified),
    // they escalate probe x2, the re-audit draws zero samples again, and
    // the output must carry recall_floor_met = false — an unaudited label
    // may ride, but never silently.
    import spark.implicits._
    val rnd = new scala.util.Random(991)
    // SPREAD-OUT vectors (a tight cluster would make the label
    // degenerate — every member in one cell, scored >= term — and route
    // it to the exact channel, bypassing the annotation under test);
    // thr = -1 keeps every within-cell pair in the output
    val rows = (0 until 200).map { i =>
      (i.toLong, 3, Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val v = withNorm(rows.toDF("vec_id", "label", "embedding"))
    // term = 19900 > 4 x budget = 16000 => floor-failing routes to
    // probe x2 (not exact), keeping the label on the approximate channel
    val out = DedupQueries.embedNeardupBudgeted(spark, v, -1.0,
      budget = 4000L, auditMod = 1000000007L).collect()
    val approx = out.filter(_.getAs[Boolean]("approx_label"))
    assert(approx.nonEmpty, "escalated hatch emitted no pairs")
    approx.foreach { r =>
      assert(!r.getAs[Boolean]("recall_floor_met"),
        "a zero-sample label claimed the recall floor")
    }
  }

  test("audit broadcast-vs-shuffle arms still agree with n_sampled riding") {
    val dir = "/root/testdata/sf0.01"
    graft.functions.FloatDotProduct.register(spark)
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm",
        graft.functions.VectorFunctions.l2norm(col("embedding")))
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
    val mods = over.map(o => (o._1, 2L))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getLong(2))).toSet
    val bcast = key(DedupQueries.hatchAudit(spark, members, p, 0.3, mods))
    val shuffled = key(DedupQueries.hatchAudit(spark, members, p, 0.3, mods,
      estSampleBytes = Long.MaxValue))
    assert(bcast.nonEmpty && bcast == shuffled,
      "audit result must not depend on the join strategy")
    assert(bcast.forall(_._3 > 0L), "mod=2 must sample every label here")
    p.unpersist(false)
  }
}
