package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C breadth extensions, round 3: a TPC-H Q5-shaped
  * six-table join (the join-reorder / broadcast-selection stress case),
  * relational division (the "for all" quantifier), and calendar gap-fill
  * (dimension-complete time series from sparse facts).
  */
object RelationalQueries4 {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C6/C7/C14 — TPC-H Q5 shape: local-supplier revenue by nation for one
    // region-year. Six tables; the c_nationkey = s_nationkey term makes the
    // supplier join a two-key equi-join, not a filter. Scale shape: only
    // the FIXED-cardinality dims (region 5 rows, nation 25) carry explicit
    // broadcast hints; customer/orders/lineitem/supplier all grow with SF
    // and stay shuffle-join-able (AQE broadcasts them at small SF on its
    // own). The region filter prunes nation before it touches the fact
    // side, and column pruning reaches every scan.
    "q41_local_supplier_revenue" -> { (s, dir) =>
      val nations = t(s, dir, "nation").as("n")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate").cast("date")
          .between("1996-01-01", "1996-12-31"))
        .select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    // C9/C14 — relational DIVISION ("for all"): suppliers that shipped
    // every distinct brand of STANDARD-type parts. Count-matching form:
    // per-supplier distinct-brand count vs the universe count — two hash
    // aggregations and one broadcast of a single-row frame, no
    // quantifier-style double anti-join (which needs two shuffles of the
    // fact table instead of one).
    "q42_division_all_brands" -> { (s, dir) =>
      val std = t(s, dir, "part").filter(col("p_type") === "STANDARD")
        .select("p_partkey", "p_brand")
      val universe = std.agg(countDistinct("p_brand").as("total_brands"))
      val perSupp = t(s, dir, "lineitem").select("l_suppkey", "l_partkey")
        .join(std, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(countDistinct("p_brand").as("n_brands"))
      perSupp.crossJoin(broadcast(universe))
        .filter(col("n_brands") === col("total_brands"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_name"), "s_suppkey")
        .select("s_suppkey", "s_name", "n_brands")
        .orderBy("s_suppkey")
    },
    // C25/C27 — calendar GAP-FILL: monthly order counts per priority with
    // explicit zero rows for empty months. The month spine comes from
    // sequence() over the global [min, max] month — one 1-row aggregate,
    // exploded, cross-joined with the (tiny, fixed-cardinality) priority
    // dim; the fact-side aggregation is a plain hash agg. Scale shape: the
    // spine is O(months × priorities), independent of fact cardinality.
    "q43_month_gapfill" -> { (s, dir) =>
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("prio"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      val spine = o.agg(min("month").as("lo"), max("month").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("month"))
      val prios = o.select("prio").distinct()
      val counts = o.groupBy("prio", "month").agg(count(lit(1)).as("n_orders"))
      prios.crossJoin(broadcast(spine))
        .join(counts, Seq("prio", "month"), "left")
        .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
        .orderBy("prio", "month")
    }
  )

  val oracle: Map[String, String] = Map(
    "q41_local_supplier_revenue" ->
      s"""SELECT n_name,
         |       ${oSum("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
         |                                    AND DATE '1996-12-31'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q42_division_all_brands" ->
      """WITH std AS (
        |  SELECT p_partkey, p_brand FROM part WHERE p_type = 'STANDARD'),
        |universe AS (SELECT COUNT(DISTINCT p_brand) AS total_brands FROM std),
        |per_supp AS (
        |  SELECT l_suppkey AS s_suppkey, COUNT(DISTINCT p_brand) AS n_brands
        |  FROM lineitem JOIN std ON l_partkey = p_partkey
        |  GROUP BY l_suppkey)
        |SELECT p.s_suppkey, s_name, n_brands
        |FROM per_supp p CROSS JOIN universe u
        |JOIN supplier ON p.s_suppkey = supplier.s_suppkey
        |WHERE n_brands = total_brands
        |ORDER BY p.s_suppkey""".stripMargin,
    "q43_month_gapfill" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month
        |  FROM orders),
        |b AS (SELECT MIN(month) AS lo, MAX(month) AS hi FROM o),
        |months AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE)
        |           AS month
        |  FROM b),
        |prios AS (SELECT DISTINCT prio FROM o),
        |cnt AS (SELECT prio, month, COUNT(*) AS n_orders
        |        FROM o GROUP BY prio, month)
        |SELECT p.prio, m.month, COALESCE(c.n_orders, 0) AS n_orders
        |FROM prios p CROSS JOIN months m
        |LEFT JOIN cnt c ON c.prio = p.prio AND c.month = m.month
        |ORDER BY p.prio, m.month""".stripMargin
  )
}
