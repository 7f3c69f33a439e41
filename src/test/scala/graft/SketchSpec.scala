package graft

import org.apache.spark.sql.functions._

/** The sketch path for 100 TB jobs — approximate structures whose outputs
  * are engine-specific (HLL++, KLL/GK quantiles, Bloom filters) and so
  * can't join the DuckDB-oracle battery; their contract is an error bound
  * against the exact answer, asserted here instead.
  *
  * Where each replaces an exact operator at scale:
  * - approx_count_distinct (HLL++): q18's COUNT(DISTINCT) without the
  *   per-group distinct expansion — fixed-size sketch, one pass, mergeable.
  * - approx_percentile: d26's exact percentile_cont holds a value→count map
  *   per group; the sketch is bounded memory for unbounded domains.
  * - Bloom filter: d22's incremental dedup anti-join without shuffling the
  *   corpus — ship a bits-sized summary of the existing keys to the
  *   incoming batch, exact-verify only the sketch hits.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact distinct within its rsd bound") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val both = li.groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey").as("exact"),
        approx_count_distinct("l_suppkey", rsd = 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (flag, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      // rsd is a standard deviation, not a hard cap; 3 sigma is safe
      assert(err <= 0.06, s"group $flag: exact=$exact approx=$approx")
    }
  }

  test("approx_percentile lands within accuracy of the exact percentile") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val row = docs.agg(
      expr("percentile(n_chars, 0.5)").as("exact_p50"),
      expr("approx_percentile(n_chars, 0.5, 1000)").as("approx_p50"),
      count(lit(1)).as("n")).head()
    val exact = row.getDouble(0)
    val approx = row.getLong(1).toDouble
    val n = row.getLong(2)
    // accuracy=1000 bounds rank error by n/1000; translate to a loose
    // value-band check via the empirical spread of the fixture
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"exact=$exact approx=$approx n=$n")
  }

  test("bloom-filtered incremental dedup: no false negatives, exact after verify") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    // exact ground truth: incoming docs whose content hash exists in corpus
    val exactDups = incoming.join(existing.select("h").distinct(), Seq("h"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    // sketch pass: Bloom summary of existing keys, shipped to the batch
    val bf = existing.stat.bloomFilter("h", expectedNumItems = 1000L, fpp = 0.03)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((h: String) => bfB.value.mightContainString(h))
    val candidates = incoming.filter(mightContain(col("h")))
    val candidateIds = candidates.select("doc_id").as[Long].collect().toSet
    // Bloom filters have NO false negatives: every true dup is a candidate
    assert(exactDups.subsetOf(candidateIds))
    // false-positive rate stays near fpp (loose bound: 5x)
    val fps = candidateIds.size - exactDups.size
    val nonDups = incoming.count() - exactDups.size
    assert(nonDups == 0 || fps.toDouble / nonDups <= 0.15,
      s"fps=$fps nonDups=$nonDups")
    // exact verification of candidates only recovers the exact answer
    val verified = candidates.join(existing.select("h").distinct(), Seq("h"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(verified == exactDups)
  }
}
