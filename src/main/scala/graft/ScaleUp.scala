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
    def wr(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name done")
    }
    /** Fan each row out to `copies` replicas tagged 0..copies-1. */
    def fan(df: DataFrame): DataFrame =
      df.withColumn("__c", explode(sequence(lit(0L), lit(copies - 1L))))
    def stride(name: String, key: String): Long =
      rd(name).agg(max(col(key))).head.getLong(0) + 1L
    def shifted(c: String, s: Long): Column = col(c) + col("__c") * s

    // fixed dims
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    val custS = stride("customer", "c_custkey")
    val suppS = stride("supplier", "s_suppkey")
    val partS = stride("part", "p_partkey")
    val orderS = stride("orders", "o_orderkey")
    val eventS = stride("events", "event_id")
    val userS = rd("events").agg(max(col("user_id"))).head.getLong(0) + 1L
    val docS = stride("documents", "doc_id")
    val vecS = stride("embeddings", "vec_id")

    wr(fan(rd("customer"))
      .withColumn("c_custkey", shifted("c_custkey", custS))
      .drop("__c"), "customer", 8)
    wr(fan(rd("supplier"))
      .withColumn("s_suppkey", shifted("s_suppkey", suppS))
      .drop("__c"), "supplier", 2)
    wr(fan(rd("part"))
      .withColumn("p_partkey", shifted("p_partkey", partS))
      .drop("__c"), "part", 8)
    wr(fan(rd("orders"))
      .withColumn("o_orderkey", shifted("o_orderkey", orderS))
      .withColumn("o_custkey", shifted("o_custkey", custS))
      .drop("__c"), "orders", 16)
    wr(fan(rd("lineitem"))
      .withColumn("l_orderkey", shifted("l_orderkey", orderS))
      .withColumn("l_partkey", shifted("l_partkey", partS))
      .withColumn("l_suppkey", shifted("l_suppkey", suppS))
      .drop("__c"), "lineitem", 32)
    wr(fan(rd("events"))
      .withColumn("event_id", shifted("event_id", eventS))
      .withColumn("user_id", shifted("user_id", userS))
      .drop("__c"), "events", 16)

    // documents: copy 0 verbatim; copies ≥1 prefix every TOKEN with "c<i>"
    // — token counts and within-copy shingle relationships are unchanged,
    // but no shingle matches across copies (cross-copy Jaccard/SimHash/
    // containment all go to zero, like real independently-collected data)
    wr(fan(rd("documents"))
      .withColumn("doc_id", shifted("doc_id", docS))
      .withColumn("text",
        when(col("__c") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), " ", -1),
            x => concat(format_string("c%d", col("__c")), x)))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__c"), "documents", 16)

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
    wr(fan(rd("embeddings"))
      .withColumn("vec_id", shifted("vec_id", vecS))
      .withColumn("embedding", replicaEmbedding)
      .drop("__c"), "embeddings", 8)

    println(s"[scaleup] wrote ${copies}x $src -> $dst")
    spark.stop()
  }
}
