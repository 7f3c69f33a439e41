package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for every SparkEntry query into EXPLAINS.md —
  * the plan-quality audit trail (pushdown, broadcast choice, codegen spans).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("EXPLAINS.md")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("plans")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pw = new PrintWriter(new File(out))
    pw.println("# EXPLAINS — physical plans of the query battery")
    pw.println()
    pw.println(s"`explain(formatted)` per SparkEntry query over `$dir` " +
      "(regenerate: `sbt \"runMain graft.Plans\"`). Audit targets: " +
      "`PushedFilters`/`ReadSchema` on scans, BroadcastHashJoin on dim " +
      "joins, WholeStageCodegen span width, no unexpected CartesianProduct.")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      pw.println(s"\n## $name\n")
      pw.println("```")
      try {
        val df = fn(spark, dir)
        pw.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => pw.println(s"ERROR: ${e.getMessage}")
      }
      pw.println("```")
    }
    pw.close()
    println(s"wrote $out")
    spark.stop()
  }
}
