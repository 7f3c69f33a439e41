package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C rows C11–C32: range/as-of joins, grouping sets, analytic
  * windows + frames, set ops, scalar function families, pivot, subqueries,
  * and the UDF/UDAF extension surface.
  *
  * Timestamp rule: all `events.ts` time arithmetic goes through integer
  * epoch-microseconds via [[Q.epochUs]] (≡ DuckDB `epoch_us`) — exact on
  * both engines, and robust to the fixture's physical type (the driver has
  * shipped both timestamp[ns] and timestamp[us] generations).
  */
object RelationalQueries2 {
  import Q._

  /** 30-minute session window in µs (range-join bucket width). */
  private val W_US = 1800000000L

  private def ev(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      epochUs(e).as("us"))
  }

  /** Above this many rows in the largest year, q34 abandons the
    * partitioned window (one task per year) for the selection plan.
    * The window is fine while a year sorts in-memory on one core in ~a
    * second; the selection's ~5 extra slim scans only pay off past that.
    */
  private val NtileWindowMaxGroupRows = 1000000L

  private[graft] def ntileDistInput(s: SparkSession, dir: String) = {
    import s.implicits._
    t(s, dir, "orders")
      .withColumn("y", year(col("o_orderdate")).cast("int"))
      .select(col("y"), col("o_totalprice"), col("o_orderkey"))
      .as[(Int, Double, Long)]
  }

  /** q34, window form — the readable ground truth (and the small-data
    * plan): ntile/percent_rank/cume_dist over (price DESC, key) per year.
    */
  private[graft] def ntileDistWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("y")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("y", year(col("o_orderdate")).cast("int"))
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .filter(col("decile") === 1)
      .groupBy("y")
      .agg(count(lit(1)).as("n_top"),
        usum(col("o_totalprice")).as("top_decile_total"),
        max("pct_rank").as("max_pct_rank"),
        max("cume").as("max_cume"))
      .orderBy("y")
  }

  /** q34, selection form — no per-year sort at any scale. With the unique
    * (price DESC, orderkey ASC) order: ntile(10)=1 ⟺ rank ≤ k=⌈n/10⌉
    * (ntile hands the first n mod 10 buckets the extra rows, so bucket 1
    * always holds ⌈n/10⌉); max percent_rank over those rows is
    * (k−1)/(n−1) (0 when n=1, Spark's convention) and max cume_dist is
    * k/n — closed forms, same IEEE divisions Spark's window operators
    * perform. The only distributed work is [[GroupedTopK.kthLargest]]
    * for the per-year threshold pair and one filtered count+dsum.
    */
  private[graft] def ntileDistSelect(s: SparkSession,
      ds: org.apache.spark.sql.Dataset[(Int, Double, Long)],
      stats: Map[Int, GroupedTopK.Stats]): DataFrame = {
    import s.implicits._
    val kBy = stats.map { case (g, st) => g -> ((st.n + 9) / 10) }
    val thr = GroupedTopK.kthLargest(ds, kBy, stats)
    val bc = s.sparkContext.broadcast(thr)
    val top = ds.filter { r: (Int, Double, Long) =>
      bc.value.get(r._1).exists { case (p, key) =>
        r._2 > p || (r._2 == p && r._3 <= key) }
    }.toDF("y", "o_totalprice", "o_orderkey")
    val scalars = stats.toSeq.map { case (g, st) =>
      val n = st.n
      val k = (n + 9) / 10
      (g, if (n == 1L) 0.0 else (k - 1).toDouble / (n - 1).toDouble,
        k.toDouble / n.toDouble)
    }.toDF("y", "max_pct_rank", "max_cume")
    top.groupBy("y")
      .agg(count(lit(1)).as("n_top"),
        usum(col("o_totalprice")).as("top_decile_total"))
      .join(broadcast(scalars), "y")
      .select("y", "n_top", "top_decile_total", "max_pct_rank", "max_cume")
      .orderBy("y")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C11 — range join done scale-right: bucketed equi-join (each left row
    // explodes to 2 candidate buckets) instead of an O(n²) theta join.
    "q11_range_join" -> { (s, dir) =>
      val e = ev(s, dir)
      val a = e.select(col("user_id"), col("us").as("a_us"))
        .withColumn("bkt", explode(array(expr(s"a_us div $W_US"), expr(s"a_us div $W_US") + 1)))
      val b = e.select(col("user_id"), col("us").as("b_us"))
        .withColumn("bkt", expr(s"b_us div $W_US"))
      a.join(b, Seq("user_id", "bkt"))
        .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + W_US)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"), min(col("b_us") - col("a_us")).as("min_gap_us"))
        .orderBy("user_id")
    },
    // C12 — as-of join (nearest past click per purchase) as a single
    // shuffle-by-user + in-partition sort: last(ignoreNulls) over an
    // unbounded-preceding frame — the sort-merge as-of pattern.
    "q12_asof_join" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev(s, dir)
        .withColumn("click_id", when(col("event_type") === "click", col("event_id")))
        .withColumn("click_us", when(col("event_type") === "click", col("us")))
        .withColumn("prev_click_id", last("click_id", ignoreNulls = true).over(w))
        .withColumn("prev_click_us", last("click_us", ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"),
          col("prev_click_id"), (col("us") - col("prev_click_us")).as("gap_us"))
        .orderBy("event_id")
    },
    // C16 — rollup with subtotal rows surfaced as 'ALL'.
    "q13_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), usum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },
    // C16 — cube over order status × priority.
    "q14_cube" -> { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), usum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total"))
        .orderBy("status", "priority")
    },
    // C16 + A4 — GROUPING SETS through the SQL surface (Table.read_sql path,
    // reference node.py:168-189).
    "q15_grouping_sets" -> { (s, dir) =>
      // graft_-prefixed view names: never clobber a host application's views
      t(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          |       COALESCE(l_linestatus, 'ALL') AS linestatus,
          |       COUNT(*) AS n_rows,
          |       CAST(SUM(CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_qty
          |FROM graft_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY returnflag, linestatus""".stripMargin)
    },
    // C18 — lag/lead per user over the event stream.
    "q16_window_lag_lead" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      ev(s, dir)
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("next_value", lead("value", 1).over(w))
        .withColumn("delta", col("value") - col("prev_value"))
        .select("event_id", "user_id", "value", "prev_value", "next_value", "delta")
        .orderBy("event_id")
    },
    // C19 — aggregate windows: running total (ROWS unbounded), 3-row moving
    // average, and a 30-day trailing RANGE frame over epoch days.
    "q17_window_frames" -> { (s, dir) =>
      val byDate = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val run = byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = byDate.rowsBetween(-2, Window.currentRow)
      val rng = Window.partitionBy("o_custkey").orderBy(col("epoch_day"))
        .rangeBetween(-30, Window.currentRow)
      // window sums ride as long micro-units (the Q.usum lattice trick):
      // exact prefix/frame sums in primitive arithmetic instead of a
      // BigDecimal-backed buffer per frame evaluation
      t(s, dir, "orders")
        .withColumn("epoch_day", unix_date(to_date(col("o_orderdate"))))
        .withColumn("micros", floor(col("o_totalprice") * lit(1000000.0) + lit(0.5)))
        .withColumn("running_total",
          (sum(col("micros")).over(run).cast("double") / lit(1000000.0)))
        .withColumn("moving_avg3",
          (sum(col("micros")).over(mov).cast("double") / lit(1000000.0)) /
            count(lit(1)).over(mov))
        .withColumn("trailing_30d",
          (sum(col("micros")).over(rng).cast("double") / lit(1000000.0)))
        .select("o_custkey", "o_orderkey", "running_total", "moving_avg3", "trailing_30d")
        .orderBy("o_custkey", "o_orderkey")
    },
    // C15 — exact distinct + count-distinct per group.
    "q18_count_distinct" -> { (s, dir) =>
      // DECOMPOSED multi-column count-distinct: two count-distincts in
      // one agg make Catalyst Expand the fact table 2x (120 M rows at
      // sf10) through a two-level distinct aggregate. Splitting into one
      // pre-distinct pipeline per key keeps each pass map-side-collapsed
      // (partial distinct shrinks 60 M rows to ~|group x key| before any
      // exchange) and joins at the 6-row group level. Each pipeline scans
      // only its own 3 columns (parquet column pruning).
      val li = t(s, dir, "lineitem")
      def dcount(key: String, as: String) =
        li.select(col("l_returnflag"), col("l_linestatus"), col(key))
          .distinct()
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as(as))
      val keys = Seq("l_returnflag", "l_linestatus")
      dcount("l_suppkey", "n_supp")
        .join(dcount("l_partkey", "n_part"), keys)
        .join(li.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n_rows")), keys)
        .select("l_returnflag", "l_linestatus", "n_supp", "n_part", "n_rows")
        .orderBy("l_returnflag", "l_linestatus")
    },
    // C23 — INTERSECT / EXCEPT over customer key sets.
    "q19_set_ops" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      def keys(st: String) =
        o.filter(col("o_orderstatus") === st).select("o_custkey").distinct()
      keys("O").intersect(keys("F")).except(keys("P")).orderBy("o_custkey")
    },
    // C22 — UNION ALL of two order slices.
    "q20_union_all" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val early = o.filter(year(col("o_orderdate")) < 1999)
        .select("o_orderstatus", "o_totalprice")
      val big = o.filter(col("o_totalprice") > 300000.0)
        .select("o_orderstatus", "o_totalprice")
      early.unionByName(big)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), usum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")
    },
    // C24 — string function family over part.
    "q21_string_fns" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("%e%"))
        .select(col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("int").as("brand_num"),
          upper(col("p_type")).as("type_u"),
          lower(col("p_name")).as("name_l"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_name")).as("name_len"),
          element_at(split(col("p_name"), " "), 1).as("first_tok"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          concat_ws("|", col("p_brand"), col("p_type")).as("tag"),
          trim(lit("  pad  ")).as("trimmed"))
        .orderBy("p_partkey")
    },
    // C25 — date/time function family over orders.
    "q22_date_fns" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_orders"),
          usum(col("o_totalprice")).as("total"),
          min(to_date(col("o_orderdate"))).as("first_day"),
          max(date_add(to_date(col("o_orderdate")), 30)).as("due_max"),
          max(datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))).as("max_age_days"))
        .orderBy("y", "m")
    },
    // C26 — math + conditional family with discount banding.
    "q23_math_cond" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("band",
          when(col("l_discount") <= 0.02, "low")
            .when(col("l_discount") <= 0.06, "mid")
            .otherwise("high"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_rows"),
          // fixed-point micro-unit sums (Q.usum) — every aggregated
          // expression here sits on the 1e-6 lattice (2-decimal money,
          // 2-decimal rates, (1+d)^2 with 4 decimals, multiples of 100)
          usum(col("l_extendedprice")).as("total"),
          max(ceil(col("l_extendedprice"))).as("max_ceil"),
          min(floor(col("l_extendedprice"))).as("min_floor"),
          usum(greatest(col("l_tax"), col("l_discount"))).as("sum_max_rate"),
          uavg(nullif(col("l_discount"), lit(0.0))).as("avg_nonzero_disc"),
          usum(round(col("l_extendedprice"), -2)).as("sum_rounded"),
          usum(pow(lit(1.0) + col("l_discount"), 2)).as("sum_pow"))
        .orderBy("band")
    },
    // C27 — array / higher-order function family over embeddings.
    "q24_array_fns" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          // float -> double is exact; keeps both engines' output types equal
          element_at(col("embedding"), 1).cast("double").as("first_v"),
          element_at(col("embedding"), size(col("embedding"))).cast("double").as("last_v"),
          array_max(col("embedding")).cast("double").as("max_v"),
          array_min(col("embedding")).cast("double").as("min_v"),
          size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")).as("norm_sq"))
        .orderBy("vec_id")
    },
    // C29 — JSON extraction from the events.props payload column.
    "q25_json_fns" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          countDistinct("k").as("n_distinct_k"))
        .orderBy("event_type")
    },
    // C28 — MapType round-trip: per-user map(event_type→count) built with
    // map_from_entries, then exploded back to rows.
    "q26_map_fns" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
        .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")))
        .orderBy("user_id", "event_type")
    },
    // C31 — pivot year × order status into fixed columns.
    "q27_pivot" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("y"), coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("F"), lit(0L)).as("F"), coalesce(col("P"), lit(0L)).as("P"))
        .orderBy("y")
    },
    // Scalar subquery through the SQL surface (A4/A17).
    "q28_scalar_subquery" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n_big,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total
          |FROM graft_orders
          |WHERE o_totalprice > (
          |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
          |  FROM graft_orders)
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },
    // C14 post-aggregation filter (HAVING).
    "q29_having" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"), usum(col("l_quantity")).as("total_qty"))
        .filter(col("n_items") > 580)
        .orderBy("s_name")
    },
    // C30 — deterministic systematic sample + keep-first dedup (groupBy min
    // instead of dropDuplicates: same semantics, deterministic row choice).
    "q30_sample_dedup" -> { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") % 10 === 0)
        .groupBy("user_id", "event_type")
        .agg(min("event_id").as("first_event"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"), min("first_event").as("min_first"))
        .orderBy("event_type")
    },
    // C32 — scalar UDF registration surface. A native expression (q21) is
    // the preferred form; this exists to prove the extension point.
    "q31_udf_surface" -> { (s, dir) =>
      val brandNum = udf((b: String) => b.split("#")(1).toInt)
      t(s, dir, "part")
        .select(col("p_partkey"), brandNum(col("p_brand")).as("brand_num"),
          col("p_retailprice"))
        .groupBy("brand_num")
        .agg(count(lit(1)).as("n_parts"), usum(col("p_retailprice")).as("total_price"))
        .orderBy("brand_num")
    },
    // C32 — typed Aggregator (UDAF) surface: integer-exact accumulation.
    // C5/C28 + A4 — correlated EXISTS / NOT EXISTS through the SQL surface
    // (Catalyst plans these as semi/anti ExistenceJoins — no per-row
    // subquery execution, same hash-join shape as q06/q07 at scale).
    "q33_correlated_exists" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("graft_customer")
      t(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT c_mktsegment,
          |  COUNT(*) AS n_cust,
          |  COUNT(CASE WHEN has_big THEN 1 END) AS n_with_big
          |FROM (
          |  SELECT c_mktsegment,
          |    EXISTS (SELECT 1 FROM graft_orders o
          |            WHERE o.o_custkey = c.c_custkey
          |              AND o.o_totalprice > 200000) AS has_big
          |  FROM graft_customer c
          |  WHERE NOT EXISTS (SELECT 1 FROM graft_orders o2
          |                    WHERE o2.o_custkey = c.c_custkey
          |                      AND o2.o_orderstatus = 'P')) t
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    },
    // C17/C18 — distribution windows: ntile / percent_rank / cume_dist
    // per order-year. The window form partitions by ~7 YEARS — a
    // low-cardinality exchange that funnels every row of a year onto one
    // task however many executors exist, the classic 100 TB window cliff.
    // Past a measured per-group size the query switches to
    // [[ntileDistSelect]]: with the unique (price DESC, orderkey) tie
    // break, decile 1 is exactly rank ≤ ⌈n/10⌉ and max_pct_rank/max_cume
    // are closed-form in (n, k), so the whole query reduces to an exact
    // distributed k-th-element selection ([[GroupedTopK]]) + one filtered
    // aggregation — every scan parallel, no per-year sort anywhere.
    // Branch equality spec-pinned (Round6OpsSpec).
    "q34_ntile_dist" -> { (s, dir) =>
      val ds = ntileDistInput(s, dir)
      val stats = GroupedTopK.groupStats(ds)
      // empty input: Map.max would throw; the window form returns the
      // correct empty frame
      if (stats.isEmpty ||
          stats.valuesIterator.map(_.n).max <= NtileWindowMaxGroupRows)
        ntileDistWindow(s, dir)
      else ntileDistSelect(s, ds, stats)
    },
    // Skew-handling pattern — salted join: a hot key on the fact side is
    // spread over S reducers by joining on (key, salt) against S replicated
    // dim rows. Result is identical to the plain key join (every fact row
    // matches exactly its salt copy); what changes is the physical shape —
    // no single reducer sees a whole hot key. AQE's skew-join split handles
    // the same problem adaptively; salting is the explicit, planner-
    // independent form a 100 TB pipeline reaches for on known-hot keys.
    "q35_salted_join" -> { (s, dir) =>
      val S = 8
      val e = ev(s, dir)
      val dim = e.groupBy("user_id")
        .agg(min("event_type").as("first_type")) // small per-key dim
      val dimSalted = dim.withColumn("salt",
        explode(sequence(lit(0), lit(S - 1))))
      val fact = e.withColumn("salt", pmod(hash(col("event_id")), lit(S)))
      fact.join(dimSalted, Seq("user_id", "salt"))
        .groupBy(col("first_type"), (col("user_id") % 10).cast("long").as("user_mod"))
        .agg(count(lit(1)).as("n_events"), usum(col("value")).as("total"))
        .orderBy("first_type", "user_mod")
    },
    // Sessionization — assign events to sessions by inactivity gap
    // (> 30 min starts a new session): lag + cumulative sum over one
    // per-user window, then a per-session rollup. One shuffle keyed by
    // user; the canonical batch counterpart of the streaming
    // mapGroupsWithState sessionizer (streaming/StreamingPipelines).
    "q36_sessionize" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("gap", col("us") - lag("us", 1).over(w))
        .withColumn("new_sess",
          when(col("gap").isNull || col("gap") > W_US, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(cum))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          min("us").as("start_us"), max("us").as("end_us"),
          usum(col("value")).as("total_value"))
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "sess_id")
    },
    "q32_udaf_surface" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Aggregator
      import org.apache.spark.sql.Encoders
      val countAbove = new Aggregator[java.lang.Double, Long, Long] {
        def zero: Long = 0L
        def reduce(acc: Long, x: java.lang.Double): Long =
          if (x != null && x > 0.05) acc + 1 else acc
        def merge(a: Long, b: Long): Long = a + b
        def finish(acc: Long): Long = acc
        def bufferEncoder = Encoders.scalaLong
        def outputEncoder = Encoders.scalaLong
      }
      val deepDiscount = udaf(countAbove, Encoders.DOUBLE)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(deepDiscount(col("l_discount")).as("n_deep_discount"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }
  )

  val oracle: Map[String, String] = Map(
    "q11_range_join" ->
      """SELECT a.user_id AS user_id, COUNT(*) AS n_pairs,
        |       MIN(epoch_us(b.ts) - epoch_us(a.ts)) AS min_gap_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND epoch_us(b.ts) > epoch_us(a.ts)
        |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 1800000000
        |GROUP BY a.user_id ORDER BY user_id""".stripMargin,
    "q12_asof_join" ->
      """SELECT event_id, user_id, value, prev_click_id,
        |       epoch_us(ts) - prev_click_us AS gap_us
        |FROM (
        |  SELECT event_id, user_id, value, event_type, ts,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER w AS prev_click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS) OVER w AS prev_click_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |) sub WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q13_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |       COALESCE(l_linestatus, 'ALL') AS linestatus,
         |       COUNT(*) AS n_rows, ${oUSum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "q14_cube" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |       COALESCE(o_orderpriority, 'ALL') AS priority,
         |       COUNT(*) AS n_orders, ${oUSum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q16_window_lag_lead" ->
      """SELECT event_id, user_id, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  value - lag(value, 1) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY event_id""".stripMargin,
    "q17_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(micros) OVER run AS DOUBLE) / 1000000 AS running_total,
        |  CAST(SUM(micros) OVER mov AS DOUBLE) / 1000000
        |    / COUNT(*) OVER mov AS moving_avg3,
        |  CAST(SUM(micros) OVER rng AS DOUBLE) / 1000000 AS trailing_30d
        |FROM (SELECT *, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
        |             CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT) AS micros FROM orders) o
        |WINDOW
        |  run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  rng AS (PARTITION BY o_custkey ORDER BY epoch_day
        |          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q18_count_distinct" ->
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q19_set_ops" ->
      """SELECT o_custkey FROM (
        |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |   INTERSECT
        |   SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |) sub ORDER BY o_custkey""".stripMargin,
    "q20_union_all" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows, ${oUSum("o_totalprice")} AS total
         |FROM (
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE year(o_orderdate) < 1999
         |  UNION ALL
         |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 300000.0
         |) sub GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q21_string_fns" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
        |  upper(p_type) AS type_u,
        |  lower(p_name) AS name_l,
        |  substring(p_name, 1, 5) AS name5,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  string_split(p_name, ' ')[1] AS first_tok,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  concat_ws('|', p_brand, p_type) AS tag,
        |  trim('  pad  ') AS trimmed
        |FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey""".stripMargin,
    "q22_date_fns" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS y,
         |  CAST(month(o_orderdate) AS INT) AS m,
         |  COUNT(*) AS n_orders, ${oUSum("o_totalprice")} AS total,
         |  MIN(CAST(o_orderdate AS DATE)) AS first_day,
         |  MAX(CAST(o_orderdate AS DATE) + 30) AS due_max,
         |  CAST(MAX(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS INT) AS max_age_days
         |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q23_math_cond" ->
      s"""SELECT CASE WHEN l_discount <= 0.02 THEN 'low'
         |            WHEN l_discount <= 0.06 THEN 'mid'
         |            ELSE 'high' END AS band,
         |  COUNT(*) AS n_rows,
         |  ${oUSum("l_extendedprice")} AS total,
         |  CAST(MAX(ceil(l_extendedprice)) AS BIGINT) AS max_ceil,
         |  CAST(MIN(floor(l_extendedprice)) AS BIGINT) AS min_floor,
         |  ${oUSum("greatest(l_tax, l_discount)")} AS sum_max_rate,
         |  ${oUAvg("nullif(l_discount, 0.0)")} AS avg_nonzero_disc,
         |  ${oUSum("round(l_extendedprice, -2)")} AS sum_rounded,
         |  ${oUSum("pow(1.0 + l_discount, 2)")} AS sum_pow
         |FROM lineitem GROUP BY band ORDER BY band""".stripMargin,
    "q24_array_fns" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_v,
        |  CAST(embedding[len(embedding)] AS DOUBLE) AS last_v,
        |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_v,
        |  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_v,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q25_json_fns" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q26_map_fns" ->
      """SELECT user_id, event_type, COUNT(*) AS cnt
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q27_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY y ORDER BY y""".stripMargin,
    "q28_scalar_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q29_having" ->
      s"""SELECT s_name, COUNT(*) AS n_items, ${oUSum("l_quantity")} AS total_qty
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name HAVING COUNT(*) > 580 ORDER BY s_name""".stripMargin,
    "q30_sample_dedup" ->
      """SELECT event_type, COUNT(*) AS n_users, MIN(first_event) AS min_first
        |FROM (
        |  SELECT user_id, event_type, MIN(event_id) AS first_event
        |  FROM events WHERE event_id % 10 = 0
        |  GROUP BY user_id, event_type
        |) sub GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q31_udf_surface" ->
      s"""SELECT CAST(string_split(p_brand, '#')[2] AS INT) AS brand_num,
         |  COUNT(*) AS n_parts, ${oUSum("p_retailprice")} AS total_price
         |FROM part GROUP BY brand_num ORDER BY brand_num""".stripMargin,
    "q33_correlated_exists" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_cust,
        |  COUNT(CASE WHEN has_big THEN 1 END) AS n_with_big
        |FROM (
        |  SELECT c_mktsegment,
        |    EXISTS (SELECT 1 FROM orders o
        |            WHERE o.o_custkey = c.c_custkey
        |              AND o.o_totalprice > 200000) AS has_big
        |  FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o2
        |                    WHERE o2.o_custkey = c.c_custkey
        |                      AND o2.o_orderstatus = 'P')) t
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q34_ntile_dist" ->
      s"""SELECT y, COUNT(*) AS n_top,
         |  ${oUSum("o_totalprice")} AS top_decile_total,
         |  MAX(pct_rank) AS max_pct_rank,
         |  MAX(cume) AS max_cume
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS INT) AS y, o_totalprice,
         |    ntile(10) OVER w AS decile,
         |    percent_rank() OVER w AS pct_rank,
         |    cume_dist() OVER w AS cume
         |  FROM orders
         |  WINDOW w AS (PARTITION BY year(o_orderdate)
         |               ORDER BY o_totalprice DESC, o_orderkey)) t
         |WHERE decile = 1 GROUP BY y ORDER BY y""".stripMargin,
    "q35_salted_join" ->
      s"""WITH dim AS (
         |  SELECT user_id, MIN(event_type) AS first_type
         |  FROM events GROUP BY user_id)
         |SELECT first_type, CAST(user_id % 10 AS BIGINT) AS user_mod,
         |       COUNT(*) AS n_events, ${oUSum("value")} AS total
         |FROM events JOIN dim USING (user_id)
         |GROUP BY first_type, user_mod ORDER BY first_type, user_mod""".stripMargin,
    "q36_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
         |g AS (
         |  SELECT user_id, event_id, value, us,
         |         us - lag(us) OVER w AS gap,
         |         CASE WHEN lag(us) OVER w IS NULL
         |                OR us - lag(us) OVER w > $W_US
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT user_id, event_id, value, us,
         |         CAST(SUM(new_sess) OVER (PARTITION BY user_id
         |           ORDER BY us, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS BIGINT) AS sess_id
         |  FROM g)
         |SELECT user_id, sess_id, COUNT(*) AS n_events,
         |       MIN(us) AS start_us, MAX(us) AS end_us,
         |       ${oUSum("value")} AS total_value,
         |       MAX(us) - MIN(us) AS duration_us
         |FROM sess GROUP BY user_id, sess_id
         |ORDER BY user_id, sess_id""".stripMargin,
    "q32_udaf_surface" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_deep_discount,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
