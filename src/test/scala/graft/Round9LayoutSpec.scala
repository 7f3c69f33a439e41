package graft

/** Round-9 lake-layout scratch contract: per-query generation retention.
  * The round-9 review found the generation counter was GLOBAL, so 4+
  * interleaved round-trip queries aged out a tag's previous dump on its
  * very next invocation — this pins the fixed per-parent behavior: a
  * returned round-trip DataFrame stays collectible through three further
  * same-query runs (with other round-trip queries interleaved), and the
  * per-query scratch parent never holds more than 4 generations.
  */
class Round9LayoutSpec extends SparkSpec {

  // same fixture files as sf0.001, but a distinct dir STRING: roundTripDir
  // keys scratch parents by dir.hashCode, so the alias isolates this
  // test's generation counters from suites running the battery in
  // parallel in the same JVM
  private val dir = "/root/testdata/./sf0.001"

  test("round-trip generations: prior lineage survives 3 same-query reruns") {
    val first = SparkEntry.queries("q57_csv_roundtrip")(spark, dir)
    val expected = first.collect().map(_.toString).sorted.toSeq
    // interleaved OTHER round-trip queries must not age q57's generations
    // (the pre-fix global counter failed exactly here)
    SparkEntry.queries("q58_json_roundtrip")(spark, dir).collect()
    SparkEntry.queries("q59_orc_roundtrip")(spark, dir).collect()
    SparkEntry.queries("q60_partition_pruned")(spark, dir).collect()
    (1 to 3).foreach { i =>
      SparkEntry.queries("q57_csv_roundtrip")(spark, dir).collect()
      assert(first.collect().map(_.toString).sorted.toSeq == expected,
        s"the original q57 lineage became unreadable after rerun $i")
    }
    // bounded disk: at most 4 generations under the q57 parent
    val key = s"${spark.sparkContext.applicationId}-" +
      Integer.toHexString(dir.hashCode)
    val parent = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft-q57-$key")
    val gens = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("gen-"))
    assert(gens.length <= 4,
      s"q57 scratch holds ${gens.length} generations (retention is 4)")
  }
}
