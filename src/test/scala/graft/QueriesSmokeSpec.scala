package graft

/** Every SparkEntry query must run at the smallest fixture scale (t1 smoke
  * tier, TESTDATA.md) — catches runtime errors and empty-input edge cases
  * the sf0.01 oracle round would hit later.
  */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs at sf0.001") {
      SparkEntry.queries(name)(spark, dir).count() // just must not throw
    }
  }

  test("d21 scale path: distributed CC matches driver union-find") {
    // d21's size-adaptive componentsOf routes the fixture graph to the
    // driver union-find; this pins the >threshold (100 TB) branch to the
    // same answer on a graph with a long chain, a clique, and singleton
    // pairs — shapes where pointer doubling and min-label order matter.
    import spark.implicits._
    val pairs = (
      (1L to 40L).map(i => (i, i + 1)) ++ // chain 1..41
        (for (a <- 100L to 105L; b <- (a + 1) to 105L) yield (a, b)) ++ // clique
        Seq((200L, 201L), (300L, 301L), // singleton pairs
          (42L, 100L)) // 42 bridges into the clique => its min label
      ).toDF("da", "db")
    val dist = graft.queries.DedupQueries.distributedComponents(spark, pairs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val drv = graft.queries.DedupQueries.driverComponents(spark, pairs)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dist.sameElements(drv))
    // chain nodes all label 1; clique+bridge all label 42
    assert(dist.toMap.apply(41L) == 1L && dist.toMap.apply(105L) == 42L)
    // the loop's lineage pins must be RELIABLE checkpoints (survive
    // executor loss), not localCheckpoint blocks: local mode mints a
    // checkpoint dir on demand and rdd-* state lands in it on disk
    val ckptDir = spark.sparkContext.getCheckpointDir
    assert(ckptDir.isDefined, "CC loop must establish a checkpoint dir")
    val rddDirs = new java.io.File(new java.net.URI(ckptDir.get).getPath)
      .listFiles()
    assert(rddDirs != null && rddDirs.nonEmpty,
      "reliable checkpoint state must exist under the checkpoint dir")
  }
}
