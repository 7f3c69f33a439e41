package graft

/** GraftExtensions: custom expressions arrive via the SparkSessionExtensions
  * hook (SparkSpec's builder uses withExtensions — no imperative register
  * call anywhere in this spec).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("float_dot resolves from SQL through the extensions injection") {
    val v = spark.sql(
      """SELECT float_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                 array(cast(3.0 as float), cast(4.0 as float))) AS d
        |""".stripMargin).as[Double].head()
    assert(v == 11.0)
  }

  test("injected builder matches the imperative register path") {
    // register() over the injected entry must not change resolution
    graft.functions.FloatDotProduct.register(spark)
    val v = spark.sql(
      "SELECT float_dot(array(cast(0.5 as float)), array(cast(4.0 as float)))")
      .as[Double].head()
    assert(v == 2.0)
    // arity misuse fails analysis, not execution
    intercept[Exception](spark.sql("SELECT float_dot(array(cast(1.0 as float)))").collect())
  }

  test("length mismatch yields NULL, not a partial dot product") {
    val r = spark.sql(
      """SELECT float_dot(array(cast(1.0 as float)),
        |                 array(cast(1.0 as float), cast(2.0 as float))) AS d
        |""".stripMargin).select("d").collect().head
    assert(r.isNullAt(0))
  }
}
