package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with matching DuckDB oracle SQL where the
  * semantics are ANSI-expressible.
  *
  * Determinism rules (SURVEY.md §7.5):
  *  - every query ends in ORDER BY on a unique key (row order is part
  *    of the hash compare);
  *  - double aggregates go through exact DECIMAL arithmetic (Ops.*) so
  *    Spark and DuckDB produce bit-identical doubles;
  *  - `events.ts` is ns in parquet — Spark truncates to micros, so the
  *    oracle SQL always works on CAST(ts AS TIMESTAMP);
  *  - every computed column is aliased identically in both engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Aggregation surface (SURVEY §2.5: A1-A8 + grouped extension) ----
    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          Ops.decSum($"l_quantity").as("sum_qty"),
          Ops.decSum($"l_extendedprice").as("sum_base_price"),
          Ops.decRevenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
          Ops.decAvg($"l_quantity").as("avg_qty"),
          Ops.decAvg($"l_extendedprice").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // ---- Global run-summary aggregates (reference spotify_etl2.py:271-278,
    // new.py:250-263: count, nunique, avg, conditional count, min-max range) ----
    "q2_events_summary" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events").agg(
        count(lit(1)).as("total_events"),
        countDistinct($"user_id").as("unique_users"),
        Ops.decAvg($"value").as("avg_value"),
        count(when($"event_type" === "error", lit(1))).as("error_events"),
        concat_ws(" to ",
          date_format(min($"ts"), "yyyy-MM-dd"),
          date_format(max($"ts"), "yyyy-MM-dd")).as("date_range"))
    }),

    // ---- Filter + projection + string-slice date + null-default
    // (reference P2/P4/P6: spotify_etl2.py:102-117,170) ----
    "q3_recent_events" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .filter($"ts" >= lit("2024-01-08 00:00:00").cast("timestamp"))
        .select(
          $"event_id", $"user_id", $"event_type",
          date_format($"ts", "yyyy-MM-dd").as("event_date"),
          coalesce($"value", lit(0.0)).as("value"))
        .orderBy($"event_id")
    }),

    // ---- Ranking window (reference W1: new.py:114), partitioned for scale ----
    "q4_rank_events" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.load(s, dir, "events")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"user_id", $"rnk", $"event_id", $"event_type")
        .orderBy($"user_id", $"rnk")
    }),

    // ---- Top-k (reference L3: spotify_etl.py:146 top-tracks) →
    // TakeOrderedAndProject, no global sort ----
    "q5_top_parts" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "part")
        .select($"p_partkey", $"p_name", $"p_retailprice")
        .orderBy($"p_retailprice".desc, $"p_partkey")
        .limit(10)
    }),

    // ---- Broadcast equi-join chain (SURVEY §2.4) ----
    "q6_region_customers" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .join(broadcast(Tables.load(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.load(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_customers"), Ops.decSum($"c_acctbal").as("total_acctbal"))
        .orderBy($"r_name")
    }),

    // ---- Large-side shuffle join + grouped agg (sort-merge at scale) ----
    "q7_order_revenue" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_orderkey").as("n_orders"),
          Ops.decRevenue($"l_extendedprice", $"l_discount").as("revenue"))
        .orderBy($"o_orderpriority")
    }),

    // ---- Anti join (NOT EXISTS) with pushed filter ----
    "q8_customers_without_orders" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = Tables.load(s, dir, "orders").filter($"o_totalprice" > 450000.0)
      Tables.load(s, dir, "customer")
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // ---- Semi join (EXISTS) with pushed filter ----
    "q9_big_spender_customers" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = Tables.load(s, dir, "orders").filter($"o_totalprice" > 450000.0)
      Tables.load(s, dir, "customer")
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_events_summary" ->
      """SELECT COUNT(*) AS total_events,
        | COUNT(DISTINCT user_id) AS unique_users,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(value) AS avg_value,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_events,
        | strftime(MIN(CAST(ts AS TIMESTAMP)), '%Y-%m-%d') || ' to ' || strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS date_range
        |FROM events""".stripMargin,

    "q3_recent_events" ->
      """SELECT event_id, user_id, event_type,
        | strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
        | COALESCE(value, 0.0) AS value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q4_rank_events" ->
      """SELECT user_id, rnk, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rnk
        |  FROM events) t
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,

    "q5_top_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,

    "q6_region_customers" ->
      """SELECT r_name, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q7_order_revenue" ->
      """SELECT o_orderpriority,
        | COUNT(DISTINCT o_orderkey) AS n_orders,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q8_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q9_big_spender_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
  )
}
