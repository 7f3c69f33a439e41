package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val q4 = SparkEntry.queries("q04_broadcast_star")(spark, dir)
    println("=== q04 plan ===")
    println(q4.queryExecution.executedPlan.toString.split("\n").filter(l =>
      l.contains("Broadcast") || l.contains("PushedFilters") || l.contains("Scan")).mkString("\n").take(3000))
    val q2 = SparkEntry.queries("q02_filter_revenue")(spark, dir)
    println("=== q02 scan line ===")
    println(q2.queryExecution.executedPlan.toString.split("\n").filter(l =>
      l.contains("Scan") || l.contains("PushedFilters")).mkString("\n").take(2000))
    // stream cursor pushdown
    val eng = new graft.api.GraftEngine(spark, java.nio.file.Files.createTempDirectory("aud").toString)
    import spark.implicits._
    val t = eng.table("ev","w"); t.append(Seq((1L,"a"),(2L,"b")).toDF("seq","v")); t.flush()
    val st = t.asStream(orderBy="seq"); st.seek(1L)
    val it = st.consumeRecords() // forces plan build lazily; just explain the table read
    println("=== stream filter plan ===")
    val plan = t.read.filter(org.apache.spark.sql.functions.col("seq") > 1L)
    println(plan.queryExecution.executedPlan.toString.split("\n").filter(l=>l.contains("Scan")||l.contains("Pushed")).mkString("\n").take(1500))
    spark.stop()
  }
}
