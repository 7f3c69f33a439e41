package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.api.GraftEngine

/** Property-based laws (SURVEY.md §5.2.4), sampled deterministically from
  * ScalaCheck generators (seeds 0..N). Case counts are small — every case
  * is a real Spark write/read cycle.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val cases = 6

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default.withSize(12), Seed(seed)).get

  private val kvBatch: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 20L), Gen.alphaStr.map(_.take(4))))

  private val kvNonEmpty: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 20L), Gen.alphaStr.map(_.take(4))))

  test("upsert idempotence: upsert(r); upsert(r) == upsert(r)") {
    for (i <- 1 to cases) {
      val batch = sample(kvNonEmpty, i)
      val e = new GraftEngine(spark, freshRoot())
      val t = e.table("t", "w").init(uniqueOn = Seq("id"))
      val df = batch.toDF("id", "v")
      t.upsert(df)
      val once = t.read.orderBy("id", "v").collect().toSeq
      t.upsert(df)
      val twice = t.read.orderBy("id", "v").collect().toSeq
      assert(once == twice, s"seed=$i")
      assert(t.read.select("id").distinct().count() == t.read.count(), s"seed=$i")
    }
  }

  test("upsert merge law: final key set = union of batch keys") {
    for (i <- 1 to cases) {
      val b1 = sample(kvNonEmpty, i)
      val b2 = sample(kvNonEmpty, i + 100)
      val e = new GraftEngine(spark, freshRoot())
      val t = e.table("t", "w").init(uniqueOn = Seq("id"))
      t.upsert(b1.toDF("id", "v"))
      t.upsert(b2.toDF("id", "v"))
      val keys = t.read.select("id").as[Long].collect().toSet
      assert(keys == (b1.map(_._1) ++ b2.map(_._1)).toSet, s"seed=$i")
    }
  }

  test("bucketed upsert ≡ unbucketed upsert (same merge, different layout)") {
    for (i <- 1 to cases) {
      val b1 = sample(kvNonEmpty, i + 300)
      val b2 = sample(kvNonEmpty, i + 400)
      val e = new GraftEngine(spark, freshRoot())
      val plain = e.table("p", "w").init(uniqueOn = Seq("id"))
      val bucketed = e.table("b", "w").init(uniqueOn = Seq("id"), bucketBy = 4)
      Seq(b1, b2).foreach { b =>
        plain.upsert(b.toDF("id", "v"))
        bucketed.upsert(b.toDF("id", "v"))
      }
      val pRows = plain.read.orderBy("id", "v").collect().toSeq
      val bRows = bucketed.read.orderBy("id", "v").collect().toSeq
      assert(pRows == bRows, s"seed=$i")
    }
  }

  test("append batching is associative: one flush == per-batch flushes") {
    for (i <- 1 to cases) {
      val b1 = sample(kvBatch, i)
      val b2 = sample(kvBatch, i + 200)
      val e = new GraftEngine(spark, freshRoot())
      val t1 = e.table("a", "w")
      if (b1.nonEmpty) t1.append(b1.toDF("id", "v"))
      if (b2.nonEmpty) t1.append(b2.toDF("id", "v"))
      t1.flush()
      val t2 = e.table("b", "w")
      if (b1.nonEmpty) { t2.append(b1.toDF("id", "v")); t2.flush() }
      if (b2.nonEmpty) { t2.append(b2.toDF("id", "v")); t2.flush() }
      assert(t1.read.orderBy("id", "v").collect().toSeq ==
        t2.read.orderBy("id", "v").collect().toSeq, s"seed=$i")
    }
  }

  test("stream exactly-once under random checkpoint/consume/crash interleavings") {
    val opGen = Gen.listOfN(6, Gen.oneOf("consume1", "consume2", "checkpoint", "crash"))
    for (i <- 1 to cases) {
      val script = sample(opGen, i)
      val e = new GraftEngine(spark, freshRoot(), nodeId = "n")
      val root = e.catalog.root.toString
      val t = e.table("ev", "w")
      t.append((1 to 8).map(j => (j.toLong, s"p$j")).toDF("seq", "p")); t.flush()
      var eng = e
      var st = eng.table("ev").asStream(orderBy = "seq")
      val yielded = scala.collection.mutable.ListBuffer.empty[Long]
      var confirmed = List.empty[Long] // yielded before the last checkpoint
      script.foreach {
        case op @ ("consume1" | "consume2") =>
          val n = if (op == "consume1") 1 else 2
          st.consumeRecords().take(n).foreach(r => yielded += r.getAs[Long]("seq"))
        case "checkpoint" =>
          st.checkpoint(); confirmed = yielded.toList
        case _ => // crash: new execution, unpersisted progress is lost
          eng = new GraftEngine(spark, root, nodeId = "n")
          st = eng.table("ev").asStream(orderBy = "seq")
          yielded.clear(); yielded ++= confirmed
      }
      st.checkpoint()
      val rest = eng.table("ev").asStream(orderBy = "seq")
        .consumeRecords().map(_.getAs[Long]("seq")).toList
      val total = yielded.toList ++ rest
      assert(total == total.sorted, s"out of order: $total (script=$script)")
      assert(total.distinct == total, s"duplicate delivery: $total (script=$script)")
      assert(total.toSet == (1L to 8L).toSet, s"lost records: $total (script=$script)")
    }
  }

  test("JVM bandSignatures == Catalyst expression minhash on random texts") {
    // The streaming LSH filter buckets with TextFunctions.bandSignatures
    // (plain JVM); the batch pipeline's oracle parity rests on the Column
    // functions (shingles -> tokenHash60 -> minhashPerm -> array_min).
    // This law pins the two implementations to identical signatures, so
    // "a doc lands in the same bucket via batch or stream" stays true.
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    val word = Gen.oneOf("the", "a", "fox", "dog", "spark", "row", "agg")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val texts = (1 to 24).map(i => sample(textGen, 200L + i)).distinct
    val df = texts.toDF("text")
      .withColumn("h_arr", transform(shingles(tokens(col("text"))),
        x => tokenHash60(x)))
    val params = minhashParams(16)
    val sigCols = params.map { case (i, a, b) =>
      array_min(transform(col("h_arr"),
        h => minhashPerm(h, lit(a), lit(b)))).as(s"mh$i")
    }
    val expr = df.select(col("text") +: sigCols: _*).collect().map { r =>
      r.getString(0) -> (if (r.isNullAt(1)) Nil
        else (0 until 4).map(bnd =>
          (bnd, (0 until 4).map(k => r.getLong(1 + bnd * 4 + k)).mkString(","))))
    }.toMap
    texts.foreach { t =>
      assert(bandSignatures(t) == expr(t), s"text='$t'")
    }
  }

  test("connected components: distributed loop == driver union-find on random graphs") {
    // d21/d30's size-adaptive componentsOf picks a path by edge count;
    // this law keeps the two paths interchangeable on arbitrary graph
    // shapes (stars, chains, parallel edges, self-referencing denseness),
    // not just the hand-built fixture in QueriesSmokeSpec.
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    for (i <- 1 to cases) {
      val edges = sample(edgeGen, 100L + i).filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val pairs = edges.toDF("da", "db")
        def labels(df: org.apache.spark.sql.DataFrame) =
          df.orderBy("doc_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val dist = labels(graft.queries.DedupQueries.distributedComponents(spark, pairs))
        val drv = labels(graft.queries.DedupQueries.driverComponents(spark, pairs))
        assert(dist == drv, s"seed=${100 + i} edges=$edges")
        // every label is the component's minimum member
        val byLabel = drv.groupBy(_._2)
        byLabel.foreach { case (label, members) =>
          assert(members.map(_._1).min == label, s"seed=${100 + i}")
        }
      }
    }
  }

  test("compact law: row multiset invariant, trigger counter invariant") {
    for (i <- 1 to cases) {
      val batches = sample(Gen.nonEmptyListOf(kvNonEmpty), i).take(4)
      val e = new GraftEngine(spark, freshRoot())
      val t = e.table("t", "w")
      batches.foreach { b => t.append(b.toDF("id", "v")); t.flush() }
      val before = t.read.as[(Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val counter = t.manifest.eventCounter
      t.compact()
      val after = t.read.as[(Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(after == before, s"seed=$i")           // exact multiset, dups kept
      assert(t.manifest.eventCounter == counter, s"seed=$i")
      // compacting twice is as safe as once
      t.compact()
      val again = t.read.as[(Long, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(again == before, s"seed=$i")
    }
  }

  test("hash60 law: JVM digest path == tokenHash60 Catalyst chain on random strings") {
    // docSimhash/docShingles/minhashSigs hash tokens in the JVM while the
    // oracles (and d29's chunk hashes) go through the md5→hex→conv
    // expression — this pins the two paths equal DIRECTLY, including
    // empty strings and non-ASCII (UTF-8 multi-byte) tokens, not just
    // transitively via the band-signature law.
    import org.apache.spark.sql.functions.col
    for (i <- 1 to cases) {
      val rnd = new scala.util.Random(100 + i)
      val strs = (0 until 40).map { _ =>
        val base = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
        if (rnd.nextBoolean()) base + "é∆雪" else base
      }
      val df = strs.toDF("s")
      val got = df
        .select(graft.functions.TextFunctions.tokenHash60(col("s")))
        .as[Long].collect()
      val ref = strs.map(graft.functions.TextFunctions.hash60)
      assert(got.sameElements(ref), s"seed=$i")
    }
  }

  test("quantCentroids law: Spark quantized means == single-threaded JVM fold") {
    // the exact-mean kernel behind d45/d52/d55 must be order-independent:
    // a partition-parallel Spark aggregation and a sequential JVM loop
    // over the same random vectors must produce bit-identical centroids
    // and norms, for any grouping
    for (i <- 1 to cases) {
      val rnd = new scala.util.Random(i)
      val dims = 8
      val rows = (0 until 20 + 5 * i).map { j =>
        (j % 4, Array.fill(dims)(rnd.nextFloat() * 2f - 1f))
      }
      val df = spark.createDataFrame(rows).toDF("k", "embedding")
        .repartition(7) // force multi-partition partial aggregation
      val got = graft.queries.VectorQueries.quantCentroids(df, "k")
        .collect()
        .map(r => r.getInt(0) ->
          ((r.getSeq[Double](1).toArray, r.getDouble(2))))
        .toMap
      rows.groupBy(_._1).foreach { case (k, vs) =>
        val sums = Array.fill(dims)(0L)
        vs.foreach { case (_, arr) =>
          var d = 0
          while (d < dims) {
            sums(d) += math.floor(arr(d).toDouble * 1000000).toLong; d += 1
          }
        }
        val denom = vs.length.toLong * 1000000
        val ce = sums.map(s => s.toDouble / denom)
        val cn = math.sqrt(ce.foldLeft(0.0)((acc, x) => acc + x * x))
        val (gce, gcn) = got(k)
        assert(gce.sameElements(ce), s"seed=$i key=$k centroid")
        assert(gcn == cn, s"seed=$i key=$k norm")
      }
    }
  }
}
