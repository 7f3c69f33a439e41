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
}
