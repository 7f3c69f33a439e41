package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch accessors for `graft.Prof` A/B measurements (NOT a query path:
  * nothing in SparkEntry or the bench reaches this object). Lives in the
  * queries package only to see the `private[queries]` shared builds, so the
  * profiler can time alternative shapes of a query against the real one on
  * the same boot without touching the declared builders.
  */
private[graft] object ProfKit {

  def statsLine(s: SparkSession, dir: String): String = {
    val st = DedupQueries.gramDfStats(s, dir)
    val w = DedupQueries.pairJoinWidth(s, st)
    f"vocab=${st.vocab} gramRows=${st.gramRows}%.0f coPairs=${st.coPairs}%.0f " +
      f"rareVocabFrac=${st.rareVocabFrac}%.4f pairJoinWidth=${w} " +
      f"exchangeWidth=${Q.exchangeWidth(s)}"
  }

  /** d51's count-join arm with an explicit self-join exchange width.
    * `w = 0` reproduces the round-12 stock shape (ENSURE_REQUIREMENTS at the
    * session's shuffle-partition count, no explicit repartition).
    */
  def containmentJoinAtWidth(s: SparkSession, dir: String, w: Int): DataFrame = {
    val g0 = DedupQueries.gramTable(s, dir)
    val cnt = g0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val g = if (w > 0) g0.repartition(w, col("h")) else g0
    val shared = g.select(col("doc_id").as("da"), col("h"))
      .join(g.select(col("doc_id").as("db"), col("h")), "h")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("shared"))
    shared
      .join(cnt.select(col("doc_id").as("da"), col("n_sh").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n_sh").as("nb")), "db")
      .withColumn("containment",
        col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= 0.9)
      .select("da", "db", "shared", "containment")
  }

  /** d02's count-join arm with an explicit self-join exchange width
    * (w = 0 → stock shape, as above).
    */
  def jaccardJoinAtWidth(s: SparkSession, dir: String, w: Int): DataFrame = {
    val docsSh = DedupQueries.docShingles(s, dir)
    val sh0 = docsSh.select(col("doc_id"), size(col("h_arr")).as("n_sh"),
      explode(col("h_arr")).as("sh_h"))
    val sh = if (w > 0) sh0.repartition(w, col("sh_h")) else sh0
    sh.select(col("doc_id").as("da"), col("n_sh").as("na_r"), col("sh_h"))
      .join(sh.select(col("doc_id").as("db"), col("n_sh").as("nb_r"), col("sh_h")), "sh_h")
      .filter(col("da") < col("db"))
      .filter(col("na_r") <= col("nb_r") * 2 && col("nb_r") <= col("na_r") * 2)
      .groupBy("da", "db").agg(count(lit(1)).as("shared"),
        first("na_r").as("na"), first("nb_r").as("nb"))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select("da", "db", "shared", "jaccard")
  }

  /** d22 replica with the round-13 size-ratio prune removed — the A/B
    * counterpart for triaging the driver-observed regression (VERDICT r13
    * item 4). Everything else matches the declared builder.
    */
  def d22NoPrune(s: SparkSession, dir: String): DataFrame = {
    val base = DedupQueries.docShingles(s, dir)
    val docs = Q.t(s, dir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val exact = incoming.join(
        existing.select(col("content_hash")).distinct()
          .withColumn("is_exact_dup", lit(true)),
        Seq("content_hash"), "left")
      .select(col("doc_id"),
        coalesce(col("is_exact_dup"), lit(false)).as("is_exact_dup"))
    val shIn = base.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("da"), size(col("h_arr")).as("na"),
        explode(col("h_arr")).as("sh_h"))
    val shEx = base.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("db"), size(col("h_arr")).as("nb"),
        explode(col("h_arr")).as("sh_h"))
    val near = shIn.hint("shuffle_hash").join(shEx, "sh_h")
      .groupBy("da", "db").agg(count(lit(1)).as("shared"),
        first("na").as("na"), first("nb").as("nb"))
      .filter(col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")) >= 0.5)
      .groupBy(col("da").as("doc_id"))
      .agg(count(lit(1)).as("n_near_dups"))
    exact.join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_exact_dup"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"))
      .orderBy("doc_id")
  }
}
