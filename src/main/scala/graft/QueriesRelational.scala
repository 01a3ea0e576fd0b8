package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface over the driver testdata (SURVEY.md §2.3
  * joins / §2.4 aggregations / §2.5 windows / §2.6 sorts / §2.7 set ops /
  * §2.8 scalar functions): the operators the reference lacks natively but
  * a user of the Spark engine gets first-class, each with a DuckDB oracle.
  *
  * Scale notes are per-query; the common ones: dimension joins broadcast
  * (region/nation/part/supplier are config-scale), fact-fact joins shuffle
  * on the join key and AQE re-plans skew, aggregations are partial
  * (map-side) before the exchange.
  */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Filter + projection with pushdown (scan reads 4 columns, predicate
    * reaches parquet row groups).
    */
  private def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1995-01-01") && col("l_discount") > 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber", "net_price")

  /** Fact-fact-dim join + grouped agg + top-k (TPC-H Q3 shape). */
  private def q3JoinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)

  /** Broadcast dimension join (part is config-scale next to lineitem). */
  private def q4BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")

  /** 6-way star join (TPC-H Q5 shape): broadcast the dim chain, shuffle
    * only on the fact keys.
    */
  private def q5MultiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .where(col("c_nationkey") === col("s_nationkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("r_name", "n_name")

  /** Scalar function surface: string/math/date built-ins (§2.8 analog). */
  private def q6Scalar(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        length(col("o_orderstatus")).as("status_len"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
        round(abs(col("o_totalprice") - 100000.0), 2).as("price_dist"),
        (col("o_custkey") % 97).as("cust_bucket"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        when(col("o_totalprice") > 200000.0, "big")
          .when(col("o_totalprice") > 50000.0, "mid")
          .otherwise("small").as("size_class"))
      .orderBy("o_orderkey")

  /** Analytic window functions over the events stream table. */
  private def q7Window(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        row_number().over(byUser).as("rn"),
        round(lag("value", 1).over(byUser), 6).as("prev_value"),
        round(sum("value").over(byUser.rowsBetween(Window.unboundedPreceding, 0)), 6)
          .as("running_value"))
      .orderBy("user_id", "rn")
  }

  /** Top-k: TakeOrderedAndProject, no full sort at scale. */
  private def q8SortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** Set operations: intersect + except with distinct semantics. */
  private def q9SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val building = c.where(col("c_mktsegment") === "BUILDING").select("c_nationkey")
    val machinery = c.where(col("c_mktsegment") === "MACHINERY").select("c_nationkey")
    val auto = c.where(col("c_mktsegment") === "AUTOMOBILE").select("c_nationkey")
    building.intersect(machinery)
      .unionByName(building.except(auto).withColumn("c_nationkey", col("c_nationkey") + 1000))
      .orderBy("c_nationkey")
  }

  /** Distinct + count distinct + approx variant sanity-bounded. */
  private def q10Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderpriority")).as("n_pris"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** Semi and anti joins (EXISTS / NOT EXISTS). */
  private def q11SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("with_orders"))
    val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .withColumn("kind", lit("without_orders"))
    withOrders.unionByName(withoutOrders).orderBy("kind", "c_mktsegment")
  }

  /** Rollup with grouping flags (subtotal/grand-total lattice). */
  private def q12Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping("l_returnflag").as("g_rf"),
        grouping("l_linestatus").as("g_ls"))
      .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")

  /** Generic pivot: per-user event-type sums (wide export, §2.3 analog). */
  private def q13PivotEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(round(sum("value"), 6))
      .orderBy("user_id")

  /** Event-time tumbling window aggregation (batch form of the streaming
    * windowed agg; epoch-aligned, matches DuckDB time_bucket).
    */
  private def q14TimeWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Union + distinct (§2.7 merge with dedup upgrade). */
  private def q15UnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.where(col("event_type") === "click").select("user_id")
      .unionByName(e.where(col("value") > 50.0).select("user_id"))
      .distinct()
      .orderBy("user_id")
  }

  /** Cube over two grouping columns with grouping flags. */
  private def q16Cube(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .cube("event_type", "user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("v"),
        grouping("event_type").as("g_et"), grouping("user_id").as("g_u"))
      .orderBy(col("g_et"), col("g_u"), col("event_type").asc_nulls_first,
        col("user_id").asc_nulls_first)

  /** As-of join (no Spark built-in; Events.asOfJoin composes it as one
    * window pass): each click matched with the user's most recent
    * purchase at-or-before it. Oracle: DuckDB's native ASOF JOIN.
    */
  private def q17AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.where(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), round(col("value"), 6).as("purchase_value"))
    operators.Events.asOfJoin(clicks, purchases, "user_id", "ts",
        Seq("purchase_value"))
      .select("user_id", "event_id", "asof_purchase_value")
      .orderBy("user_id", "event_id")
  }

  /** Sessionization: 30-minute-gap sessions per user, then per-session
    * aggregates (gap flag + running sum window composition).
    */
  private def q18Sessionize(s: SparkSession, dir: String): DataFrame =
    operators.Events.sessionize(Tables.events(s, dir), "user_id", "ts", 1800L)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("session_value"))
      .orderBy("user_id", "session_id")

  /** Sketch aggregates (HLL++ count-distinct, approximate percentiles).
    * Raw sketch values are engine-specific, so the query emits the
    * EXACT aggregates plus booleans asserting the sketch landed within
    * its error bound; the oracle computes the exact side identically
    * and asserts the booleans as literal TRUE — a sketch drifting out
    * of bound flips a flag and breaks the hash (the quantitative curve
    * is additionally asserted in ApproxSpec).
    */
  private def q19Approx(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    // exact median via the BANDED exact quantile
    // (TextAnalysis.quantileThresholdBanded): the `percentile`
    // aggregate buffers every group's full value list in executor
    // memory (corpus/3 per buffer here), and the plain x24 window
    // quantile sorts each of the 3 groups in ONE task (27.5 s at sf1).
    // The banded pass approx-brackets the median, exact-counts below
    // the bracket, and sorts only the tiny band — exact, bounded
    // memory, fully parallel. Same quantile_cont math, oracle
    // unchanged.
    val med = operators.TextAnalysis
      .quantileThresholdBanded(o, 0.5, "o_orderstatus", "o_totalprice")
      .select(col("o_orderstatus"), col("threshold").as("em"))
    // the sketches are aggregated SEPARATELY from countDistinct: a
    // distinct aggregate forces Spark's distinct rewrite, which keys
    // the FIRST aggregation stage by (group, distinct-col) — so the
    // HLL's ~2^12 registers and the percentile buffer get maintained
    // once per DISTINCT CUSTOMER, not once per status group (measured:
    // 21-38 s combined vs ~1.5 s split at sf1). Two cheap aggs + a
    // 3-row join beat one pathological plan.
    val sketches = o.groupBy("o_orderstatus")
      .agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("ac"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("am"))
    o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      .join(sketches, Seq("o_orderstatus"))
      .join(med, Seq("o_orderstatus"), "left")
      .select(col("o_orderstatus"), col("exact_custs"),
        col("em").as("exact_median"),
        (abs(col("ac") - col("exact_custs"))
          <= col("exact_custs") * lit(0.05)).as("custs_ok"),
        (abs(col("am") - col("em")) <= abs(col("em")) * lit(0.05)).as("median_ok"))
      .orderBy("o_orderstatus")
  }

  /** Skew-salted join (operators/Scale.saltedJoin): the pathological
    * single-hot-key shape AQE cannot split further. Salting must be
    * result-invariant — the oracle is the PLAIN join, so any deviation
    * (lost rows on a salt boundary, duplicated right rows) hash-fails.
    */
  private def q29SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("partkey"), col("l_quantity"), col("l_extendedprice"))
    val pt = t(s, dir, "part")
      .select(col("p_partkey").as("partkey"), col("p_brand"))
    graft.operators.Scale.saltedJoin(li, pt, "partkey", saltFactor = 8)
      .groupBy("p_brand")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** Analytic window functions not covered by q7/q25: ntile,
    * percent_rank, cume_dist, running first_value, lead. One window
    * pass per status partition; the (price, orderkey) order is total
    * so every rank is deterministic.
    */
  private def q30Analytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"))
      .orderBy("o_orderstatus", "price", "o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_analytics" -> (q30Analytics(_, _)),
    "q29_salted_join" -> (q29SaltedJoin(_, _)),
    "q19_approx" -> (q19Approx(_, _)),
    "q16_cube" -> (q16Cube(_, _)),
    "q17_asof_join" -> (q17AsofJoin(_, _)),
    "q18_sessionize" -> (q18Sessionize(_, _)),
    "q2_filter_project" -> (q2FilterProject(_, _)),
    "q3_join_agg" -> (q3JoinAgg(_, _)),
    "q4_broadcast_join" -> (q4BroadcastJoin(_, _)),
    "q5_multi_join" -> (q5MultiJoin(_, _)),
    "q6_scalar" -> (q6Scalar(_, _)),
    "q7_window" -> (q7Window(_, _)),
    "q8_sort_limit" -> (q8SortLimit(_, _)),
    "q9_setops" -> (q9SetOps(_, _)),
    "q10_distinct" -> (q10Distinct(_, _)),
    "q11_semi_anti" -> (q11SemiAnti(_, _)),
    "q12_rollup" -> (q12Rollup(_, _)),
    "q13_pivot_events" -> (q13PivotEvents(_, _)),
    "q14_time_window" -> (q14TimeWindow(_, _)),
    "q15_union_distinct" -> (q15UnionDistinct(_, _)))

  val oracles: Map[String, String] = Map(
    "q30_analytics" ->
      """SELECT o_orderkey, o_orderstatus,
        |  round(o_totalprice, 2) AS price,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_orderkey) OVER
        |    (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
        |  lead(o_orderkey, 1) OVER w AS next_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, price, o_orderkey""".stripMargin,
    "q29_salted_join" ->
      """SELECT p_brand,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q19_approx" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS exact_custs,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS exact_median,
        |  TRUE AS custs_ok, TRUE AS median_ok
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q16_cube" ->
      """SELECT event_type, user_id, count(*) AS n, round(sum(value), 6) AS v,
        |  CAST(grouping(event_type) AS TINYINT) AS g_et,
        |  CAST(grouping(user_id) AS TINYINT) AS g_u
        |FROM events GROUP BY CUBE (event_type, user_id)
        |ORDER BY g_et, g_u, event_type NULLS FIRST, user_id NULLS FIRST""".stripMargin,
    "q17_asof_join" ->
      """SELECT c.user_id, c.event_id,
        |  round(p.value, 6) AS asof_purchase_value
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY c.user_id, c.event_id""".stripMargin,
    "q18_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
        |         THEN 1 ELSE 0 END
        |      AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessions AS (
        |  SELECT user_id, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 6) AS session_value
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber, net_price""".stripMargin,
    "q3_join_agg" ->
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "q4_broadcast_join" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q5_multi_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q6_scalar" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS pri_upper,
        |  substring(o_orderpriority, 1, 1) AS pri_code,
        |  length(o_orderstatus) AS status_len,
        |  concat(o_orderstatus, '-', o_orderpriority) AS status_pri,
        |  round(abs(o_totalprice - 100000.0), 2) AS price_dist,
        |  o_custkey % 97 AS cust_bucket,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  CASE WHEN o_totalprice > 200000.0 THEN 'big'
        |       WHEN o_totalprice > 50000.0 THEN 'mid'
        |       ELSE 'small' END AS size_class
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q7_window" ->
      """SELECT user_id, event_id, event_type,
        |  row_number() OVER w AS rn,
        |  round(lag(value, 1) OVER w, 6) AS prev_value,
        |  round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin,
    "q8_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q9_setops" ->
      """SELECT c_nationkey FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |) i
        |UNION ALL
        |SELECT c_nationkey + 1000 FROM (
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |) e
        |ORDER BY c_nationkey""".stripMargin,
    "q10_distinct" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(DISTINCT o_orderpriority) AS n_pris,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q11_semi_anti" ->
      """SELECT c_mktsegment, n, kind FROM (
        |  SELECT c_mktsegment, count(*) AS n, 'with_orders' AS kind
        |  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY c_mktsegment
        |  UNION ALL
        |  SELECT c_mktsegment, count(*) AS n, 'without_orders' AS kind
        |  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY c_mktsegment
        |) ORDER BY kind, c_mktsegment""".stripMargin,
    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
        |  CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS TINYINT) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q13_pivot_events" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 6) AS "view",
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 6) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q14_time_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q15_union_distinct" ->
      """SELECT DISTINCT user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id FROM events WHERE value > 50.0
        |) ORDER BY user_id""".stripMargin)
}
