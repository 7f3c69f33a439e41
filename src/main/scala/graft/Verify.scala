package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration helper: SPARK_GRAFT_ONLY=d43,d44 dumps a subset
    // (the driver never sets it, so the per-round verify is unaffected).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        SparkEntry.queries.filter(kv => names.exists(kv._1.startsWith))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      dumpOne(spark, sfDir, outDir, name, fn)
      // release query-scoped scratch (persisted caches, kernel
      // broadcasts) now that the result is on disk — same lifecycle
      // contract as Bench's per-query drain
      graft.queries.Q.drainScratch(spark)
      ()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Dump one query result to `outDir/name`; returns whether it succeeded.
    *
    * On ANY failure (analysis error, runtime error, write error) it leaves
    * an EMPTY `outDir/name` directory — no parquet part — so the driver's
    * checker reports the key as a FAIL instead of the key silently
    * vanishing from the correctness report (round 6 lost 7
    * analysis-broken queries to silent absence), and prints a single-line
    * `[verify] FAIL <name>: <error>` on BOTH stdout and stderr (stderr
    * alone can be swallowed by the driver's output capture).
    */
  private[graft] def dumpOne(spark: SparkSession, sfDir: String,
      outDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
        f.delete(); ()
      }
      val d = new java.io.File(s"$outDir/$name")
      // a failed run can leave committed part files / _temporary trees —
      // clear them so the marker dir is unambiguously empty
      if (d.exists()) rmTree(d)
      // the marker dir is the failure CONTRACT — if it can't be (re)made
      // empty, say so rather than silently reverting to round-6's
      // key-vanishes behavior
      if (!d.mkdirs() && !(d.isDirectory && Option(d.list()).forall(_.isEmpty)))
        println(s"[verify] FAIL-MARKER UNWRITABLE for $name at $d")
      val msg = s"[verify] FAIL $name: ${e.toString.takeWhile(_ != '\n')}"
      println(msg)
      System.err.println(msg)
      false
    }
}
