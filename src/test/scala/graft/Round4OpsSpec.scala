package graft

/** Semantic invariants for the round-4 additions (beyond the smoke run and
  * the DuckDB oracle): recursive-CTE hierarchy accounting (q49), k-means
  * partition laws (d45), funnel monotonicity (d46), and BM25 ranking
  * sanity (d47).
  */
class Round4OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q49 recursive CTE: depth histogram partitions all customers") {
    val rows = run("q49_recursive_cte").collect()
    val total = rows.map(_.getLong(1)).sum
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(total == nCust)
    // parent(k) = k DIV 2 ⇒ depth(k) = floor(log2(k)) for k ≥ 1; the max
    // depth row must match the largest key's bit length.
    val maxKey = spark.read.parquet(s"$dir/customer.parquet")
      .agg(org.apache.spark.sql.functions.max("c_custkey")).head.getLong(0)
    val maxDepth = rows.map(_.getInt(0)).max
    assert(maxDepth == 63 - java.lang.Long.numberOfLeadingZeros(maxKey))
  }

  test("d45 k-means: clusters partition the corpus, seeds self-assign") {
    val rows = run("d45_kmeans").collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nVecs) // every vector assigned once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // cluster ids are seed vec_ids
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8))
  }

  test("d46 funnel: retention is monotone non-increasing from total") {
    val rows = run("d46_quality_funnel").orderBy("stage").collect()
    val counts = rows.map(_.getLong(2))
    assert(rows.head.getString(1) == "total")
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(rows.head.getDouble(3) == 1.0)
    val total = counts.head.toDouble
    rows.foreach(r => assert(r.getDouble(3) == r.getLong(2) / total))
  }

  test("d48 substring decontamination: eval source excluded, bounded counts") {
    val rows = run("d48_substring_decontamination").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) != "src0"))
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
  }

  test("d49 token budget: each source fills its budget or keeps everything") {
    val budget = 3000L
    val d49rows = run("d49_token_budget").collect()
    assert(d49rows.nonEmpty)
    d49rows.foreach { r =>
      val (nDocs, total, nKept, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nKept >= 1 && nKept <= nDocs && kept <= total)
      // either the whole source fit, or the kept set reached the budget
      assert(nKept == nDocs || kept >= budget)
      assert(r.getDouble(5) == kept.toDouble / total)
    }
  }

  test("d50 novelty curve: cumulative news converge to the distinct-gram total") {
    val rows = run("d50_novelty_curve").orderBy("bucket").collect()
    assert(rows.length == 10)
    // cum_new is the running sum of n_new and ends at the corpus-wide
    // distinct gram count (every gram is first-seen exactly once)
    var cum = 0L
    rows.foreach { r =>
      cum += r.getLong(3)
      assert(r.getLong(4) == cum)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getLong(3) <= r.getLong(2)) // new ≤ instances in bucket
    }
  }

  test("d51 containment: bounded by 1, consistent with set sizes") {
    val d51rows = run("d51_containment").collect()
    assert(d51rows.nonEmpty)
    d51rows.foreach { r =>
      val (da, db, shared, na, nb, c) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(da < db)
      assert(shared <= math.min(na, nb))
      assert(c >= 0.9 && c <= 1.0)
      assert(c == shared.toDouble / math.min(na, nb))
    }
  }

  test("d52 label outliers: 3 per label, ascending similarity") {
    val byLabel = run("d52_label_outliers").collect()
      .groupBy(_.getInt(0))
    assert(byLabel.nonEmpty)
    byLabel.values.foreach { rs =>
      assert(rs.length == 3)
      assert(rs.sortBy(_.getInt(1)).map(_.getDouble(3)).sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      })
    }
  }

  test("d53 dup agreement: audits exactly the lexical pairs with vectors") {
    val d53rows = run("d53_dup_agreement").collect()
    assert(d53rows.nonEmpty) // join keys align: the pair set has vectors
    d53rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5) // came from the J >= 0.5 pair set
      assert(r.getDouble(3) <= 1.0000001)
      assert(r.getBoolean(4) == (r.getDouble(3) >= 0.9))
    }
  }

  test("q50 bit flags: masks are 5-bit, n_types is the popcount") {
    val q50rows = run("q50_bit_flags").collect()
    assert(q50rows.length > 1) // the sample must leave VARIED masks
    q50rows.foreach { r =>
      val mask = r.getLong(0)
      assert(mask >= 1 && mask <= 31)
      assert(r.getInt(1) == java.lang.Long.bitCount(mask))
      assert(r.getLong(2) >= 1)
    }
  }

  test("d54 calibration: buckets within range, rates consistent") {
    val d54rows = run("d54_quality_calibration").collect()
    assert(d54rows.nonEmpty)
    d54rows.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 9)
      assert(r.getLong(2) <= r.getLong(1)) // dups <= docs
      assert(r.getDouble(4) == r.getLong(2).toDouble / r.getLong(1))
    }
  }

  test("d55 drift: deciles partition the vectors, similarity bounded by 1") {
    val rows = run("d55_embedding_drift").collect()
    assert(rows.length == 10)
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nVecs)
    rows.foreach(r => assert(r.getDouble(2) <= 1.0000001))
  }

  test("d57 1-NN accuracy: probe counts partition the probe set, rates bounded") {
    val rows = run("d57_knn_accuracy").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == 200) // every probe classified once
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1))
    }
  }

  test("d58 simhash banding is COMPLETE at radius 3 (pigeonhole check)") {
    // every pair the exact O(n²) scan finds within Hamming ≤ 3 must be in
    // the banded candidate output — on the small fixture we can afford
    // the exhaustive reference
    val sims = graft.queries.DedupQueries.docSimhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = (for {
      (da, sa) <- sims; (db, sb) <- sims
      if da < db && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (da, db)).toSet
    val banded = run("d58_simhash_hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact)
  }

  test("d47 BM25: scores are positive and strictly rank-ordered") {
    val rows = run("d47_bm25").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getLong(2))
    assert(scores.forall(_ > 0))
    // ordered by (score desc, doc_id asc) — ties must not reorder
    val ids = rows.map(_.getLong(0))
    assert(scores.zip(scores.tail).zipWithIndex.forall { case ((a, b), i) =>
      a > b || (a == b && ids(i) < ids(i + 1))
    })
    // 1..3 query terms can match a doc
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
  }
}
