package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Targeted `explain("formatted")` dumps for the plans/rNN evidence files.
  * Usage: `PlanDump <outDir> <suffix> <query>[,<query>...]`
  * Env: SPARK_GRAFT_SF_DIR (fixture), SPARK_GRAFT_CPUS (master width,
  * default 8), SPARK_GRAFT_SHUFFLE_PARTS (spark.sql.shuffle.partitions,
  * default = cpus — set it ABOVE the core count to show conf-followed
  * exchange widths in the dumped plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus.toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("plandump")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new File(outDir).mkdirs()
    names.foreach { name =>
      val pw = new PrintWriter(new File(outDir, s"${name}_$suffix.txt"))
      pw.println(s"# $name — $suffix @ $dir, local[$cpus], " +
        s"spark.sql.shuffle.partitions=$parts")
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        pw.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => pw.println(s"ERROR: ${e.getMessage}")
      }
      pw.close()
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
