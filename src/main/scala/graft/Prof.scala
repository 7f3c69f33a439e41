package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for bench hot spots (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("prof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    // warmup
    time("warmup_d01")(graft.queries.DedupQueries.queries("d01_dedup_exact")(spark, dir).count())
    time("d02_jaccard")(graft.queries.DedupQueries.queries("d02_dedup_jaccard")(spark, dir).count())
    time("d03_minhash")(graft.queries.DedupQueries.queries("d03_dedup_minhash_lsh")(spark, dir).count())
    spark.catalog.clearCache()
    time("d03_cold")(graft.queries.DedupQueries.queries("d03_dedup_minhash_lsh")(spark, dir).count())
    spark.catalog.clearCache()
    time("d02_cold")(graft.queries.DedupQueries.queries("d02_dedup_jaccard")(spark, dir).count())
    spark.stop()
  }
}
