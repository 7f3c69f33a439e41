package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.C rows C1–C21 (scan/filter/project/joins/agg/window/sort).
  *
  * The reference's relational surface is "any SQL the backing store runs"
  * (reference node.py:168-189 `Table.read_sql`, node.py:356-373
  * `Table.execute_sql`, SQL nodes create.py:239-244); each query here
  * exercises one operator class through the idiomatic Spark DataFrame API and
  * is paired with a DuckDB oracle in [[oracle]].
  */
object RelationalQueries {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1/C4/C5/C14/C20 — TPC-H Q1 shape: scan→filter→hash agg→sort.
    "q01_lineitem_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // fixed-point micro-unit sums (Q.usum): exact like the decimal
          // path, but long arithmetic under codegen — ~2x on this query,
          // the battery's most expensive relational aggregate
          usum(col("l_quantity")).as("sum_qty"),
          usum(col("l_extendedprice")).as("sum_base_price"),
          usum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          usum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          uavg(col("l_quantity")).as("avg_qty"),
          uavg(col("l_extendedprice")).as("avg_price"),
          uavg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // C5 — TPC-H Q6 shape: BETWEEN + IN predicates pushed into the scan.
    "q02_filter_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1998-01-01")) &&
          col("l_shipdate") <  to_timestamp(lit("2000-01-01")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24 &&
          col("l_returnflag").isin("A", "N"))
        .agg(usum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n_rows"))
    },
    // C6/C14 — 3-way shuffle equi-join, revenue per market segment.
    // The aggregate is pushed below the CUSTOMER join (the q05 trick):
    // only c_mktsegment survives to the output, so the lineitem⋈orders
    // result pre-aggregates per custkey and the second join shuffles
    // |customer| slim rows instead of the full joined lineitem stream —
    // against a corpus-sized customer table no one can broadcast at
    // 100 TB. (Pushing a second agg below the ORDERS join — per-orderkey
    // partials — was measured SLOWER at sf10, 45 s vs 34 s: ScaleUp's
    // remapped orderkeys aren't clustered in the fixture, so the 60 M-row
    // map-side hash agg collapses nothing and just adds a pass; on a
    // lineitem laid out orderkey-clustered it would win.) Partial sums
    // stay DECIMAL(20,6)-exact until ONE final cast — decimal addition
    // is associative, so bit-identical to the single-level dsum (oracle
    // hash unchanged).
    "q03_join_revenue" -> { (s, dir) =>
      // partial sums ride as LONG micro-units (Q.usum's lattice recovery,
      // applied per row BEFORE the two-level agg): integer addition is
      // associative at both levels, so the nested sum equals the oracle's
      // single-level sum bit-for-bit, with none of the decimal path's
      // per-row BigDecimal traffic
      val perCust = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          floor((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            * lit(1000000.0) + lit(0.5)).as("disc_micros"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum("disc_micros").as("rev"), count(lit(1)).as("n"))
      perCust
        .join(t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        // top level re-sums per-customer micro totals across the whole
        // segment — the one leg that grows with corpus size, so it takes
        // Q.usum's wide hi/lo accumulator (per-customer totals ≤ ~2⁵⁰:
        // shifted legs stay in long range past any realistic SF); the
        // recombined value is Σu, bit-identical to the oracle's
        // single-level sum
        .agg(((sum(shiftright(col("rev"), 20)).cast(DecimalType(38, 0))
            * lit(1048576L)
          + sum(col("rev").bitwiseAND(lit(1048575L))).cast(DecimalType(38, 0)))
          .cast("double") / lit(1000000.0)).as("revenue"),
          sum("n").as("n_items"))
        .orderBy("c_mktsegment")
    },
    // C7 — broadcast the small dims: supplier→nation→region star join.
    "q04_broadcast_star" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(usum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("n_name")
    },
    // C8 — left outer join keeps customers without orders. Orders are
    // pre-aggregated per custkey BEFORE the join (aggregate pushdown below
    // the join): the join input shrinks from |orders| to |customers| rows,
    // and the per-key decimal partial sums re-aggregate exactly (decimal
    // addition is associative) — same result, a fraction of the shuffle.
    "q05_left_outer" -> { (s, dir) =>
      val perCust = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(col("o_orderkey")).as("n_o"),
          // micro-unit partials (see q03): exact, associative, codegen
          sum(floor(col("o_totalprice") * lit(1000000.0) + lit(0.5)))
            .as("price_part"))
      t(s, dir, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(coalesce(col("n_o"), lit(0L))).as("n_orders"),
          (sum(col("price_part")).cast("double") / lit(1000000.0))
            .as("total_price"))
        .orderBy("c_mktsegment")
    },
    // C9 — left-semi: customers having an open order, per nation.
    "q06_semi_join" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), min("c_custkey").as("min_custkey"))
        .orderBy("c_nationkey")
    },
    // C9 — left-anti: customers with no orders at all (upsert kernel, A14).
    "q07_anti_join" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), min("c_custkey").as("min_custkey"))
        .orderBy("c_mktsegment")
    },
    // C10/C13 — theta self-join: unordered nation pairs within a region.
    "q08_theta_pairs" -> { (s, dir) =>
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("k1"),
        col("n_name").as("nation_a"), col("n_regionkey").as("r1"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("k2"),
        col("n_name").as("nation_b"), col("n_regionkey").as("r2"))
      n1.join(n2, col("r1") === col("r2") && col("k1") < col("k2"))
        .join(broadcast(t(s, dir, "region")), col("r1") === col("r_regionkey"))
        .select(col("r_name"), col("nation_a"), col("nation_b"))
        .orderBy("r_name", "nation_a", "nation_b")
    },
    // C21 — global top-k (Catalyst → TakeOrderedAndProject, no full sort).
    "q09_topk_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },
    // C17 — ranking window: each customer's single largest order.
    "q10_window_top_order" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "q01_lineitem_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${oUSum("l_quantity")} AS sum_qty,
         |  ${oUSum("l_extendedprice")} AS sum_base_price,
         |  ${oUSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${oUSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${oUAvg("l_quantity")} AS avg_qty,
         |  ${oUAvg("l_extendedprice")} AS avg_price,
         |  ${oUAvg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_revenue" ->
      s"""SELECT ${oUSum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
         |  AND l_returnflag IN ('A', 'N')""".stripMargin,
    "q03_join_revenue" ->
      s"""SELECT c_mktsegment,
         |  ${oUSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_broadcast_star" ->
      s"""SELECT n_name,
         |  ${oUSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q05_left_outer" ->
      s"""SELECT c_mktsegment,
         |  COUNT(DISTINCT c_custkey) AS n_cust,
         |  COUNT(o_orderkey) AS n_orders,
         |  ${oUSum("o_totalprice")} AS total_price
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust, MIN(c_custkey) AS min_custkey
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust, MIN(c_custkey) AS min_custkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q08_theta_pairs" ->
      """SELECT r_name, n1.n_name AS nation_a, n2.n_name AS nation_b
        |FROM nation n1
        |JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
        |               AND n1.n_nationkey < n2.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |ORDER BY r_name, nation_a, nation_b""".stripMargin,
    "q09_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q10_window_top_order" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) sub
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin
  )
}
