package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for scale-proof runs (`runMain graft.ScaleUp
  * <srcDir> <dstDir> [copies]`): writes `copies`× the source fixture with
  * key-shifted replicas.
  *
  * Design goals (what makes the output a fair 10× workload, not just 10×
  * the bytes):
  *   - join integrity: every replica's foreign keys point at that
  *     replica's copy of the referenced rows (stride = max(key)+1), so
  *     join selectivities and group cardinalities scale linearly;
  *   - region/nation stay fixed (TPC-H semantics: fixed dims);
  *   - realistic duplicate structure: `documents.text` gets a per-copy
  *     token prefix and `embeddings.embedding` a deterministic per-copy
  *     jitter, so WITHIN-copy dup/near-dup structure is preserved exactly
  *     while cross-copy rows are NOT near-duplicates — naive replication
  *     would square the near-dup pair count (10 identical twins per doc)
  *     and misrepresent how the dedup/ANN pipelines scale.
  *
  * Everything is deterministic (hash-based jitter, no RNG), so repeated
  * generations are bit-identical.
  */
object ScaleUp {

  /** The per-replica embedding transform (factored for the spec): reads
    * `embedding` and the replica tag `__c`, applies the per-(copy,
    * component) sign flip described at the write site. Copy 0 is
    * verbatim; within a copy the flip is a shared isometry (dot products
    * and norms bit-identical to copy 0); across copies ~half the signs
    * disagree, so cosines collapse to the base distribution's random-pair
    * tail.
    */
  private[graft] def replicaEmbedding: Column =
    when(col("__c") === 0, col("embedding")).otherwise(
      transform(col("embedding"), (x, j) =>
        when(pmod(hash(col("__c"), j), lit(2)) === 0, x)
          .otherwise(-x)))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [copies]")
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // The source fixture is a handful of parquet row groups; at the
      // default 128 MB split the `copies`-way explode runs on 1-2 cores
      // (measured: sf30's lineitem fan spent 40+ min single-threaded).
      // 8 MB splits give every core a map task — the fan is CPU-bound,
      // not IO-bound, so small splits are pure win here.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      // Large single-JVM fan-outs can starve the driver-executor
      // heartbeat thread for >120 s under full-box load (observed: the
      // heartbeat receiver killed the local executor mid-write); the
      // generator has no liveness concern worth dying for.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      // If events.ts is parquet TIMESTAMP(NANOS) (older fixture
      // generations), Spark 4 rejects it by default; nanosAsLong surfaces
      // it as epoch-nano longs — exactly how Q.t reads it, so the
      // rewritten (plain INT64) column is read-compatible. For the current
      // timestamp[us] fixtures this conf is a no-op and ts round-trips as
      // TIMESTAMP(MICROS); Q.epochUs dispatches on whichever type lands.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name done")
    }
    /** Fan each row out to `copies` replicas tagged 0..copies-1.
      *
      * The SOURCE repartitions to `parts` BEFORE the explode — two
      * measured pathologies in the old post-fan `repartition(parts)`:
      * (1) parquet splits cannot cut inside a row group, so map
      * parallelism was the source's row-group count (1-2 cores exploding
      * 180M+ rows — sf30's lineitem fan ran 40+ min single-threaded);
      * (2) the repartition shuffled the FULL exploded output (~copies ×
      * source bytes) just to set the output file count. Shuffling the
      * small source instead distributes the explode across `parts` tasks
      * and each task streams its replicas straight into its own output
      * file — zero post-fan shuffle at any scale.
      */
    def fan(df: DataFrame, parts: Int): DataFrame =
      df.repartition(parts)
        .withColumn("__c", explode(sequence(lit(0L), lit(copies - 1L))))
    def stride(name: String, key: String): Long =
      rd(name).agg(max(col(key))).head.getLong(0) + 1L
    def shifted(c: String, s: Long): Column = col(c) + col("__c") * s

    // fixed dims
    wr(rd("region").coalesce(1), "region")
    wr(rd("nation").coalesce(1), "nation")

    val custS = stride("customer", "c_custkey")
    val suppS = stride("supplier", "s_suppkey")
    val partS = stride("part", "p_partkey")
    val orderS = stride("orders", "o_orderkey")
    val eventS = stride("events", "event_id")
    val userS = rd("events").agg(max(col("user_id"))).head.getLong(0) + 1L
    val docS = stride("documents", "doc_id")
    val vecS = stride("embeddings", "vec_id")

    wr(fan(rd("customer"), 8)
      .withColumn("c_custkey", shifted("c_custkey", custS))
      .drop("__c"), "customer")
    wr(fan(rd("supplier"), 2)
      .withColumn("s_suppkey", shifted("s_suppkey", suppS))
      .drop("__c"), "supplier")
    wr(fan(rd("part"), 8)
      .withColumn("p_partkey", shifted("p_partkey", partS))
      .drop("__c"), "part")
    wr(fan(rd("orders"), 16)
      .withColumn("o_orderkey", shifted("o_orderkey", orderS))
      .withColumn("o_custkey", shifted("o_custkey", custS))
      .drop("__c"), "orders")
    wr(fan(rd("lineitem"), 32)
      .withColumn("l_orderkey", shifted("l_orderkey", orderS))
      .withColumn("l_partkey", shifted("l_partkey", partS))
      .withColumn("l_suppkey", shifted("l_suppkey", suppS))
      .drop("__c"), "lineitem")
    wr(fan(rd("events"), 16)
      .withColumn("event_id", shifted("event_id", eventS))
      .withColumn("user_id", shifted("user_id", userS))
      .drop("__c"), "events")

    // documents: copy 0 verbatim; copies ≥1 prefix every TOKEN with "c<i>"
    // — token counts and within-copy shingle relationships are unchanged,
    // but no shingle matches across copies (cross-copy Jaccard/SimHash/
    // containment all go to zero, like real independently-collected data)
    wr(fan(rd("documents"), 16)
      .withColumn("doc_id", shifted("doc_id", docS))
      .withColumn("text",
        when(col("__c") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), " ", -1),
            x => concat(format_string("c%d", col("__c")), x)))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__c"), "documents")

    // embeddings: copy 0 verbatim; copies ≥1 get a deterministic
    // per-(copy, component) SIGN FLIP — an isometry, so WITHIN-copy
    // geometry (every dot product, norm, label-cluster structure) is
    // preserved bit-exactly, while cross-copy cosines collapse to
    // ~N(0, 1/√d) — far below any near-dup threshold. The previous
    // additive ±0.04 jitter failed the stated goal for copies of the
    // SAME original vector (cos(v+j₁, v+j₂) ≈ 0.99 when |j| ≪ |v|),
    // which squared the near-dup pair count with scale — exactly the
    // misrepresentation this generator documents it must avoid (at 1000×
    // that bug alone made d12's answer a billion-row clique expansion).
    // The flip keys on (copy, component), NOT vec_id, so every vector of
    // a copy shares one orthogonal transform and within-copy relations
    // are untouched; ±x is exact in float, so copy semantics stay
    // deterministic and engine-independent.
    wr(fan(rd("embeddings"), 8)
      .withColumn("vec_id", shifted("vec_id", vecS))
      .withColumn("embedding", replicaEmbedding)
      .drop("__c"), "embeddings")

    println(s"[scaleup] wrote ${copies}x $src -> $dst")
    spark.stop()
  }
}
