package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must be bit-equal to the row_number window
  * it replaces (same total order, same survivors, same ranks) across
  * partial-merge serialization, ties, and small groups.
  */
class TopKStructsSpec extends SparkSpec {

  private def tuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
      java.lang.Double.doubleToLongBits(r.getDouble(3)))).sorted.toSeq

  test("topk_structs equals the row_number window, ties and all") {
    import spark.implicits._
    graft.functions.TopKStructs.register(spark)
    val rnd = new scala.util.Random(7)
    // integer-valued scores from a small domain force EXACT score ties
    // within groups, so the tok tiebreak is load-bearing; 16 input
    // partitions force partial buffers through serialize/merge
    val rows = (0 until 5000).map { i =>
      (i % 97, s"tok${rnd.nextInt(40)}", rnd.nextInt(25).toDouble)
    }
    val df = rows.toDF("g", "tok", "score").repartition(16)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("tok"))
    val win = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5).select("g", "rnk", "tok", "score")
    val agg = df.groupBy("g")
      .agg(call_function("topk_structs",
        struct((-col("score")).as("ns"), col("tok"), col("score")),
        lit(5)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.tok").as("tok"), col("col.score").as("score"))
    assert(tuples(win) == tuples(agg))
  }

  test("k larger than the group emits the whole group, ranked") {
    import spark.implicits._
    graft.functions.TopKStructs.register(spark)
    val df = Seq((1, "b", 2.0), (1, "a", 2.0), (2, "z", 9.0))
      .toDF("g", "tok", "score").repartition(4)
    val out = df.groupBy("g")
      .agg(call_function("topk_structs",
        struct((-col("score")).as("ns"), col("tok"), col("score")),
        lit(100)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.tok").as("tok"), col("col.score").as("score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq((1, 1, "a", 2.0), (1, 2, "b", 2.0), (2, 1, "z", 9.0)))
  }

  test("null inputs are skipped, not ranked") {
    import spark.implicits._
    graft.functions.TopKStructs.register(spark)
    val df = Seq((1, Some(3.0)), (1, None), (1, Some(1.0)))
      .toDF("g", "score")
    val out = df.groupBy("g")
      .agg(call_function("topk_structs",
        when(col("score").isNotNull,
          struct((-col("score")).as("ns"))).otherwise(lit(null)),
        lit(2)).as("top"))
      .select(size(col("top")).as("n")).collect().head.getInt(0)
    assert(out == 2)
  }

  test("bare string child from a parquet scan is deep-copied, not aliased") {
    // a pointer-typed ATOMIC child (no struct wrapper): the evaluated
    // UTF8String points into the scan's reused row buffer, so a shallow
    // store would corrupt once the buffer advances — pinned against a
    // driver-side recomputation over the same parquet rows
    graft.functions.TopKStructs.register(spark)
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val agg = d.groupBy("lang")
      .agg(call_function("topk_structs", col("source"), lit(3)).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    val expected = d.select("lang", "source").collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getString(1)).sorted.take(3).toList }
    assert(agg == expected)
  }

  test("NaN sorts greatest: selected last by k-smallest (doc'd negation caveat)") {
    import spark.implicits._
    graft.functions.TopKStructs.register(spark)
    val df = Seq((1, 5.0), (1, Double.NaN), (1, 1.0), (1, 3.0))
      .toDF("g", "v").repartition(3)
    val out = df.groupBy("g")
      .agg(call_function("topk_structs", struct(col("v")), lit(3)).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.v")).collect().map(_.getDouble(0)).toSeq
    // ascending natural order, NaN greatest => the 3 smallest are the
    // finite values; NaN is excluded at k=3 (and would rank LAST at k=4)
    assert(out == Seq(1.0, 3.0, 5.0))
  }

  test("d14 on the aggregate matches the window formulation; no Window in plan") {
    val dir = "/root/testdata/sf0.01"
    val d14 = SparkEntry.queries("d14_stratified_sample")(spark, dir)
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val win = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("lang", "source", "rn", "doc_id", "n_chars")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(key(win) == key(d14))
    // the point of the rewrite: NO per-stratum window sort anywhere —
    // strata are low-cardinality, so a window would funnel the whole
    // corpus through one task per stratum at 100 TB
    assert(!d14.queryExecution.executedPlan.toString.contains("Window"),
      "d14 must not plan a Window")
  }

  test("d52 on the aggregate matches the window formulation; no Window in plan") {
    val dir = "/root/testdata/sf0.01"
    val d52 = SparkEntry.queries("d52_label_outliers")(spark, dir)
    // independent window recomputation of bottom-3-cosine per label over
    // the same scored frame shape (cosine ASC, vec_id ASC)
    graft.functions.FloatDotProduct.register(spark)
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm",
        graft.functions.VectorFunctions.l2norm(col("embedding")))
    val cent = graft.queries.VectorQueries.quantCentroids(
      v.select(col("label"), col("embedding")), "label")
    val w = Window.partitionBy("label")
      .orderBy(col("cosine").asc, col("vec_id"))
    val win = v.join(broadcast(cent), "label")
      .withColumn("cosine", graft.functions.VectorFunctions.cosineWithNorms(
        graft.functions.VectorFunctions.dotHof(col("embedding"), col("ce")),
        col("nrm"), col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("label", "rnk", "vec_id", "cosine")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0).toString, r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).sorted.toSeq
    assert(key(win) == key(d52))
    assert(!d52.queryExecution.executedPlan.toString.contains("Window"),
      "d52 must not plan a Window")
  }

  test("d15 plans no Window (stratum top-k and dedup are aggregates)") {
    val dir = "/root/testdata/sf0.01"
    val d15 = SparkEntry.queries("d15_pipeline_prep")(spark, dir)
    assert(!d15.queryExecution.executedPlan.toString.contains("Window"),
      "d15 must not plan a Window")
    assert(d15.collect().nonEmpty)
  }

  test("aggregate matches the window on the fixture tf frame (desc double + string tie)") {
    // the d31-shaped workload: rank (score DESC, tok ASC) over real
    // fixture term frequencies — descending encoded by double negation,
    // string tiebreak in natural order. (d31 itself stays on the window:
    // its ~2 rows per (doc, map task) sit under the k=3 buffer, so
    // map-side combine prunes nothing there — measured round 10.)
    graft.functions.TopKStructs.register(spark)
    val dir = "/root/testdata/sf0.01"
    val tf = graft.queries.TextQueries.docTf(spark, dir)
    val docFreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = spark.read.parquet(s"$dir/documents.parquet")
      .agg(count(lit(1)).as("n"))
    val scored = tf.join(docFreq, "tok").crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        (col("n").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    val win = scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("doc_id", "rnk", "tok", "tf", "df", "score")
    val agg = scored.groupBy("doc_id")
      .agg(call_function("topk_structs",
        struct((-col("score")).as("ns"), col("tok"), col("tf"),
          col("df"), col("score")),
        lit(3)).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.tok").as("tok"), col("col.tf").as("tf"),
        col("col.df").as("df"), col("col.score").as("score"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4),
        java.lang.Double.doubleToLongBits(r.getDouble(5)))).sorted.toSeq
    assert(key(win) == key(agg))
  }

  test("desc_key: NaN/inf/zero/null-safe descending equals desc_nulls_last window") {
    import spark.implicits._
    graft.functions.TopKStructs.register(spark)
    graft.functions.DescKey.register(spark)
    val rnd = new scala.util.Random(13)
    // every edge the naive -score negation gets wrong, plus exact ties:
    // NaN (greatest => rank FIRST desc), ±inf (negation collides -inf
    // with a real +inf score), -0.0/0.0 (Spark ties them; the tiebreak
    // must decide), null (desc default = NULLS LAST)
    val edge = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, 0.0)
    val rows = (0 until 4000).map { i =>
      val s: java.lang.Double =
        if (i % 11 == 0) null
        else if (i % 7 == 0) edge(rnd.nextInt(edge.length))
        else rnd.nextInt(20).toDouble
      (i % 53, i.toLong, s)
    }
    val df = rows.toDF("g", "id", "score").repartition(16)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val win = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5).select("g", "rnk", "id", "score")
    val agg = df.groupBy("g")
      .agg(call_function("topk_structs",
        struct(call_function("desc_key", col("score")).as("dk"),
          col("id"), col("score")),
        lit(5)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("id"), col("col.score").as("score"))
    def key(d: org.apache.spark.sql.DataFrame) =
      d.collect().map { r =>
        val s = if (r.isNullAt(3)) -1L
          else java.lang.Double.doubleToLongBits(r.getDouble(3))
        (r.getInt(0), r.getInt(1), r.getLong(2), s)
      }.sorted.toSeq
    assert(key(win) == key(agg))
  }

  test("desc_key is strictly order-reversing and collision-free on distinct values") {
    // interpreted twin (shared with codegen): total ascending key order
    // == Spark's desc_nulls_last; ties ONLY where Spark ties (-0.0/0.0)
    import graft.functions.DescKey.key
    val vs = Seq(Double.NegativeInfinity, -1.7e308, -2.0, -1.0,
      -java.lang.Double.MIN_VALUE, 0.0, java.lang.Double.MIN_VALUE,
      0.5, 1.0, 2.0, 1.7e308, Double.PositiveInfinity)
    vs.sliding(2).foreach { case Seq(a, b) =>
      assert(key(a) > key(b), s"key($a) must rank AFTER key($b) desc")
    }
    assert(key(-0.0) == key(0.0), "Spark ties -0.0 with 0.0")
    assert(key(Double.NaN) < key(Double.PositiveInfinity),
      "NaN is greatest => first in desc order")
    assert(vs.map(key).max < Long.MaxValue, "null sentinel stays above all keys")
  }

  test("null first struct field ranks nulls-first, ties fall to the next field") {
    import spark.implicits._
    // pins the fast-path ordering's null arm and both-null full-compare
    // fallback against the row_number window (asc = nulls first)
    graft.functions.TopKStructs.register(spark)
    val rnd = new scala.util.Random(29)
    val rows = (0 until 3000).map { i =>
      val s: java.lang.Double =
        if (i % 5 == 0) null else rnd.nextInt(8).toDouble
      (i % 31, i.toLong, s)
    }
    val df = rows.toDF("g", "id", "score").repartition(8)
    val w = Window.partitionBy("g")
      .orderBy(col("score").asc_nulls_first, col("id"))
    val win = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 4).select("g", "rnk", "id")
    val agg = df.groupBy("g")
      .agg(call_function("topk_structs",
        struct(col("score"), col("id")), lit(4)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("id"))
    def key(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .sorted.toSeq
    assert(key(win) == key(agg))
  }
}
