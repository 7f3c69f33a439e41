package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C depth extensions: LATERAL correlated subqueries (A4 SQL
  * surface), exact statistical moments, and navigation window functions.
  *
  * Exactness rule for the stats battery: variance / stddev / correlation are
  * NOT order-independent in IEEE floating point, so the distributed and the
  * single-node engine would disagree in the last bits if computed the naive
  * way. Instead both sides compute the raw moments (n, Σx, Σx², Σxy …) in
  * BIGINT — exact and order-independent — and apply the closed-form formula
  * as the same literal sequence of double operations, which IEEE specifies
  * exactly. `l_quantity` carries integral values (verified), so the BIGINT
  * cast is lossless on both engines.
  */
object RelationalQueries3 {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A4/C10 — LATERAL correlated subquery with ORDER BY + LIMIT (top-2
    // orders per sampled customer). Catalyst decorrelates this into a
    // ranked-window join — no per-row subquery execution, same shuffle
    // shape as a window top-k at scale.
    "q37_lateral_topn" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("graft_customer")
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
          |FROM graft_customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_orders o
          |         WHERE o.o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |WHERE c.c_custkey % 100 = 0
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    },
    // C14 stats — exact variance/stddev/correlation from BIGINT moments
    // (see the object Scaladoc for why the built-in var_samp/corr would
    // break cross-engine hash equality).
    "q38_exact_stats" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          col("l_linenumber").cast("long").as("y"))
      // Row-level products and their BIGINT sums are safe to ~10^15 rows
      // (x ≤ 2500 per row), but the MOMENT COMBINATIONS are not: n·sxx
      // overflowed 2^63 at the sf100 pass (n ≈ 2·10^8 per group × sxx ≈
      // 4·10^11 → 10^20) and ANSI mode threw ARITHMETIC_OVERFLOW — found
      // by running one SF past the gate, exactly like q14's 2^63 cliff.
      // The combination is widened to DECIMAL(38,0): exact for every
      // product of two <10^19 BIGINTs, good to ~10^19-row groups; the
      // oracle widens the same step to HUGEINT (int128) — both compute
      // the exact integer, then round once to double.
      def w(c: Column) = c.cast("decimal(38,0)")
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          col("sx"),
          ((w(col("n")) * w(col("sxx")) - w(col("sx")) * w(col("sx"))).cast("double") /
            (w(col("n")) * w(col("n") - 1)).cast("double")).as("var_qty"),
          sqrt((w(col("n")) * w(col("sxx")) - w(col("sx")) * w(col("sx"))).cast("double") /
            (w(col("n")) * w(col("n") - 1)).cast("double")).as("stddev_qty"),
          ((w(col("n")) * w(col("sxy")) - w(col("sx")) * w(col("sy"))).cast("double") /
            (sqrt((w(col("n")) * w(col("sxx")) - w(col("sx")) * w(col("sx"))).cast("double")) *
              sqrt((w(col("n")) * w(col("syy")) - w(col("sy")) * w(col("sy"))).cast("double"))))
            .as("corr_qty_line"))
        .orderBy("l_returnflag")
    },
    // C31 inverse — UNPIVOT (melt): wide per-group aggregates back to long
    // (group, metric, value) rows. Narrow map-side transform in Spark
    // (Expand node) — no extra shuffle beyond the aggregation's own.
    "q40_unpivot" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(usum(col("l_quantity")).as("sum_qty"),
          usum(col("l_extendedprice")).as("sum_price"),
          usum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric")
    },
    // C18 — navigation windows: first_value / last_value / nth_value over
    // the full partition frame (the default frame stops at CURRENT ROW,
    // which makes last_value a no-op — the explicit frame is the point).
    "q39_window_nav" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .withColumn("first_key", first("o_orderkey").over(w))
        .withColumn("last_key", last("o_orderkey").over(full))
        .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(full))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "first_key", "last_key", "second_key")
        .orderBy("o_custkey", "rn")
    }
  )

  val oracle: Map[String, String] = Map(
    "q37_lateral_topn" ->
      """SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        |FROM customer c CROSS JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey % 100 = 0
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q38_exact_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
        |    CAST(SUM(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS syy,
        |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, sx,
        |  CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) AS var_qty,
        |  sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) AS stddev_qty,
        |  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |    (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
        |     * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
        |    AS corr_qty_line
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q40_unpivot" ->
      s"""SELECT l_returnflag, metric, value FROM (
         |  UNPIVOT (
         |    SELECT l_returnflag,
         |           ${oUSum("l_quantity")} AS sum_qty,
         |           ${oUSum("l_extendedprice")} AS sum_price,
         |           ${oUSum("l_discount")} AS sum_disc
         |    FROM lineitem GROUP BY l_returnflag)
         |  ON sum_qty, sum_price, sum_disc
         |  INTO NAME metric VALUE value)
         |ORDER BY l_returnflag, metric""".stripMargin,
    "q39_window_nav" ->
      """SELECT o_custkey, rn, o_orderkey, first_key, last_key, second_key
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    first_value(o_orderkey) OVER w AS first_key,
        |    last_value(o_orderkey) OVER wf AS last_key,
        |    nth_value(o_orderkey, 2) OVER wf AS second_key,
        |    row_number() OVER w AS rn
        |  FROM orders
        |  WINDOW
        |    w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  )
}
