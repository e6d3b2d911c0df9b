package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables, Tsdb}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- B. analytics -------------------------------------------------
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // ---- A. tsdb core -------------------------------------------------
    "ts_track_rollup" -> ((s, dir) => Tsdb.trackRollup(t(s, dir, "events"))),
    "ts_fetch_exact" -> ((s, dir) =>
      Tsdb.fetch(Tsdb.trackRollup(t(s, dir, "events")),
        lit("2024-01-05"), lit("2024-01-20"), Seq(Some("purchase"), Some("12")))),
    "ts_fetch_wildcard" -> ((s, dir) =>
      Tsdb.fetch(Tsdb.trackRollup(t(s, dir, "events")),
        lit("2024-01-05"), lit("2024-01-20"), Seq(None, Some("12")))),
    "ts_fetch_prefix" -> ((s, dir) =>
      Tsdb.fetch(Tsdb.trackRollup(t(s, dir, "events")),
        lit("2024-01-05"), lit("2024-01-20"), Seq(Some("purchase")))),
  )

  /** DuckDB-equivalent SQL per query (driver's correctness oracle). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
         round(avg(l_quantity),2) AS avg_qty,
         round(avg(l_extendedprice),2) AS avg_price,
         round(avg(l_discount),4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "ts_track_rollup" ->
      """SELECT event_type AS f1, CAST(user_id AS VARCHAR) AS f2,
         date_trunc('hour', ts) AS bucket,
         round(sum(value),2) AS total, count(*) AS cnt,
         CASE WHEN GROUPING(CAST(user_id AS VARCHAR)) = 1 THEN 1 ELSE 2 END AS depth
         FROM events
         GROUP BY GROUPING SETS ((event_type, date_trunc('hour', ts)),
                                 (event_type, CAST(user_id AS VARCHAR), date_trunc('hour', ts)))""",

    "ts_fetch_exact" ->
      """SELECT event_type AS f1, CAST(user_id AS VARCHAR) AS f2,
         date_trunc('hour', ts) AS bucket,
         round(sum(value),2) AS total, count(*) AS cnt, 2 AS depth
         FROM events
         WHERE event_type = 'purchase' AND CAST(user_id AS VARCHAR) = '12'
           AND date_trunc('hour', ts) >= TIMESTAMP '2024-01-05'
           AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-20'
         GROUP BY 1, 2, 3""",

    "ts_fetch_wildcard" ->
      """SELECT event_type AS f1, CAST(user_id AS VARCHAR) AS f2,
         date_trunc('hour', ts) AS bucket,
         round(sum(value),2) AS total, count(*) AS cnt, 2 AS depth
         FROM events
         WHERE CAST(user_id AS VARCHAR) = '12'
           AND date_trunc('hour', ts) >= TIMESTAMP '2024-01-05'
           AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-20'
         GROUP BY 1, 2, 3""",

    "ts_fetch_prefix" ->
      """SELECT event_type AS f1, CAST(NULL AS VARCHAR) AS f2,
         date_trunc('hour', ts) AS bucket,
         round(sum(value),2) AS total, count(*) AS cnt, 1 AS depth
         FROM events
         WHERE event_type = 'purchase'
           AND date_trunc('hour', ts) >= TIMESTAMP '2024-01-05'
           AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-20'
         GROUP BY 1, 2, 3""",
  )
}
