package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch profiler for bench hot spots (not part of the library surface).
  * `runMain graft.Prof q01|d32` picks the decomposition; SPARK_GRAFT_SF_DIR
  * picks the fixture.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mode = args.headOption.getOrElse("q01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("prof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Long = {
      df.queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) { it.next(); () })
      0L
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val timeF: (String, () => Long) => Unit = (n, f) => time(n)(f())

    mode match {
      case "d32" => profD32(spark, dir, force, timeF)
      case "d43" => profD43(spark, dir, force, timeF)
      case "d51" => profD51(spark, dir, force, timeF)
      case "d58" => profD58(spark, dir, timeF)
      case "stats" => println("PROF " + graft.queries.ProfKit.statsLine(spark, dir))
      case "pairw" => profPairWidths(spark, dir, force, timeF,
        args.drop(1).map(_.toInt))
      case "d22ab" => profD22AB(spark, dir, force, timeF)
      case "q49" => profQ49(spark, dir, force, timeF)
      case "pairplan" => profPairPlan(spark, dir)
      case _     => profQ01(spark, dir, force, timeF)
    }
    spark.stop()
  }

  /** Same-boot width A/B of the d02/d51 count-join self-join exchange:
    * w=0 is the stock ENSURE_REQUIREMENTS shape at the session default,
    * anything else an explicit same-key repartition at that width.
    */
  private def profPairWidths(spark: SparkSession, dir: String,
      force: org.apache.spark.sql.DataFrame => Long,
      time: (String, () => Long) => Unit, widths: Array[Int]): Unit = {
    val ws = if (widths.nonEmpty) widths else Array(0, 64, 128, 256)
    println("PROF " + graft.queries.ProfKit.statsLine(spark, dir))
    for (round <- 1 to 2; w <- ws) {
      time(s"r$round d51_w$w", () => force(
        graft.queries.ProfKit.containmentJoinAtWidth(spark, dir, w)))
      time(s"r$round d02_w$w", () => force(
        graft.queries.ProfKit.jaccardJoinAtWidth(spark, dir, w)))
    }
  }

  /** Execute the real d51/d02 count-join arms and print the AQE-final
    * plans (exchange count / reuse / join strategy / spill attribution).
    */
  private def profPairPlan(spark: SparkSession, dir: String): Unit = {
    for (q <- Seq("d51", "d02")) {
      val df = if (q == "d51")
        graft.queries.DedupQueries.containmentPairsJoin(spark, dir)
      else graft.queries.DedupQueries.nearDupPairsJoin(spark, dir)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) { it.next(); () })
      println(f"PROF $q wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      println(s"=== $q AQE-final executed plan ===")
      println(df.queryExecution.executedPlan.toString)
      println(s"=== $q per-operator metrics (nonzero spill/bytes/rows) ===")
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val interesting = p.metrics.filter { case (k, m) =>
          (k.contains("spill") || k.contains("Spill") || k == "numOutputRows" ||
            k.contains("dataSize") || k.contains("shuffleBytesWritten") ||
            k.contains("peakMemory")) && m.value != 0
        }
        if (interesting.nonEmpty)
          println(s"  ${p.nodeName}[${p.id}]: " + interesting.map {
            case (k, m) => s"$k=${m.value}"
          }.mkString(", "))
        p.children.foreach(walk)
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ =>
        }
      }
      walk(df.queryExecution.executedPlan)
    }
  }

  /** Same-boot A/B of d22 with vs without the round-13 size-ratio prune. */
  private def profD22AB(spark: SparkSession, dir: String,
      force: org.apache.spark.sql.DataFrame => Long,
      time: (String, () => Long) => Unit): Unit = {
    for (round <- 1 to 4) {
      time(s"r$round d22_pruned", () => force(
        graft.SparkEntry.queries("d22_incremental_dedup")(spark, dir)))
      time(s"r$round d22_noprune", () => force(
        graft.queries.ProfKit.d22NoPrune(spark, dir)))
    }
  }

  /** q49 framework-cost profile: wall time vs in-job time (gap = driver-side
    * per-step planning/submission), with AQE on vs off on the parent session
    * (the isolated q49 session clones the parent conf at build time).
    */
  private def profQ49(spark: SparkSession, dir: String,
      force: org.apache.spark.sql.DataFrame => Long,
      time: (String, () => Long) => Unit): Unit = {
    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(e.jobId, System.nanoTime())
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s0 = starts.remove(e.jobId)
        if (s0 != null) { jobs += 1; jobNanos += System.nanoTime() - s0 }
      }
    }
    spark.sparkContext.addSparkListener(l)
    for (round <- 1 to 3; aqe <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      jobs = 0; jobNanos = 0L
      val t0 = System.nanoTime()
      force(graft.SparkEntry.queries("q49_recursive_cte")(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener-bus drain before reading the counters
      println(f"PROF r$round q49 aqe=$aqe wall=$wall%.3f s jobs=$jobs " +
        f"inJob=${jobNanos / 1e9}%.3f s gap=${wall - jobNanos / 1e9}%.3f s")
    }
    spark.conf.set("spark.sql.adaptive.enabled", true)
    spark.sparkContext.removeSparkListener(l)
  }

  /** Stage decomposition of d32's IVF escape-hatch path. */
  private def profD32(spark: SparkSession, dir: String,
      force: org.apache.spark.sql.DataFrame => Long,
      time: (String, () => Long) => Unit): Unit = {
    import graft.queries.VectorQueries
    for (round <- 1 to 2) {
      val (tr, ev) = VectorQueries.d32Inputs(spark, dir)
      val trainN = tr.count()
      println(s"PROF trainN=$trainN evalN=${ev.count()}")
      time(s"r$round full_ivf", () => force(
        VectorQueries.nearestTrainIvf(tr, ev, knownTrainN = Some(trainN))))
      time(s"r$round audit_exact_sample", () => force(
        VectorQueries.nearestTrainReplicated(
          tr, ev.filter(pmod(col("eval_id"), lit(128L)) === 0))))
      time(s"r$round full_query", () => force(
        graft.SparkEntry.queries("d32_semantic_decontamination")(spark, dir)))
    }
  }

  /** Stage decomposition of d43 (quantized knn). */
  private def profD43(spark: SparkSession, dir: String,
      force: org.apache.spark.sql.DataFrame => Long,
      time: (String, () => Long) => Unit): Unit = {
    import graft.functions.VectorFunctions._
    graft.functions.FloatDotProduct.register(spark)
    for (round <- 1 to 2) {
      val v = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding"))
        .withColumn("nrm", l2norm(col("embedding")))
      time(s"r$round vecs_norms", () => force(v))
      val maxabs = array_max(transform(col("embedding"),
        x => abs(x.cast("double"))))
      val qv = v
        .withColumn("scl",
          when(maxabs > 0.0, lit(127.0) / maxabs).otherwise(lit(0.0)))
        .withColumn("qe", transform(col("embedding"),
          x => floor(x.cast("double") * col("scl") + 0.5).cast("float")))
        .select("vec_id", "qe")
      time(s"r$round quantize", () => force(qv))
      val q10 = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("nrm").as("qn"))
      val exScored = v.crossJoin(broadcast(q10))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          cosineWithNorms(dot(col("embedding"), col("qe")), col("nrm"), col("qn")))
        .select("q_id", "vec_id", "cosine")
      time(s"r$round exact_score_topk", () => force(
        graft.queries.VectorQueries.topKPerQuery(
          exScored, 3, "q_id", "cosine", "vec_id")))
      time(s"r$round full_query", () => force(
        graft.SparkEntry.queries("d43_quantized_knn")(spark, dir)))
    }
  }

  /** A/B of the containment/Jaccard count-join vs its bucket-kernel
    * execution (both arms equality-pinned in Round8KernelSpec).
    */
  private def profD51(spark: SparkSession, dir: String,
      force: org.apache.spark.sql.DataFrame => Long,
      time: (String, () => Long) => Unit): Unit = {
    import graft.queries.DedupQueries
    for (round <- 1 to 2) {
      time(s"r$round d51_join", () => force(
        DedupQueries.containmentPairsJoin(spark, dir)))
      time(s"r$round d51_bucketed", () => force(
        DedupQueries.containmentPairsBucketed(spark, dir)))
      time(s"r$round d02_join", () => force(
        DedupQueries.nearDupPairsJoin(spark, dir)))
      time(s"r$round d02_bucketed", () => force(
        DedupQueries.nearDupPairsBucketed(spark, dir)))
    }
  }

  /** d58 volume decomposition: bucket-size distribution and pair counts. */
  private def profD58(spark: SparkSession, dir: String,
      time: (String, () => Long) => Unit): Unit = {
    import graft.queries.DedupQueries
    val banded = DedupQueries.bandedSimhash(
      DedupQueries.docSimhash(spark, dir))
    val sizes = banded.groupBy("band", "bv").count()
    val agg = sizes.agg(count(lit(1)).as("n_buckets"),
      max("count").as("max_bucket"),
      sum(col("count") * (col("count") - 1) / 2).as("cand_pairs")).head()
    println(s"PROF buckets=${agg.getLong(0)} max=${agg.getLong(1)} candPairs=${agg.get(2)}")
    time("bucketed_pairs", () => {
      val n = DedupQueries.simhashBandPairsBucketed(spark, banded).count()
      println(s"PROF out_pairs=$n"); n
    })
  }

  private def profQ01(spark: SparkSession, dir: String,
      force: org.apache.spark.sql.DataFrame => Long,
      time: (String, () => Long) => Unit): Unit = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02")))
    val gb = () => li.groupBy("l_returnflag", "l_linestatus")

    // Decompose q01's cost: scan+group vs double sums vs decimal sums.
    for (round <- 1 to 3) {
      time(s"r$round scan_count", () => force(gb().agg(count(lit(1)).as("n"))))
      time(s"r$round double_sums", () => force(gb().agg(
        sum(col("l_quantity")).as("a"),
        sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("d"),
        sum(col("l_discount")).as("e"))))
      time(s"r$round decimal20_sums", () => force(gb().agg(
        sum(col("l_quantity").cast(DecimalType(20, 6))).as("a"),
        sum(col("l_extendedprice").cast(DecimalType(20, 6))).as("b"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(20, 6))).as("c"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(DecimalType(20, 6))).as("d"),
        sum(col("l_discount").cast(DecimalType(20, 6))).as("e"))))
      time(s"r$round longmicros_sums", () => force(gb().agg(
        sum(unscaled(col("l_quantity"))).as("a"),
        sum(unscaled(col("l_extendedprice"))).as("b"),
        sum(unscaled(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("c"),
        sum(unscaled(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("d"),
        sum(unscaled(col("l_discount"))).as("e"))))
    }
  }

  /** exact micro-units long: double -> Decimal(20,6) -> unscaled long */
  private def unscaled(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(20, 6)) * lit(1000000L)).cast("long")
}
