package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.functions.Scalars._

/** Event-time windowing, sessionization and statistical aggregates — the
  * batch renditions of the streaming-shaped operators (SURVEY.md §2.9)
  * plus the distribution statistics the reference lacks but a 100 TB
  * engine needs (§2.4 note: percentiles/rollup offered as scale-goal
  * extensions).
  */
object WindowsAndStats extends QueryModule {

  /** A6 (fractional-hours variant): the reference's Python-side delay
    * metric (EXTRACT(EPOCH...)/3600, src/aggregations.py:330-334) —
    * deliberately DIFFERENT from q3's truncating Trino semantics; the
    * reference is internally inconsistent and we implement BOTH
    * (SURVEY.md §7.4-1).
    */
  def a6FracDelay(s: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
      .filter(col("o_orderdate") <= col("l_shipdate"))
      .select(
        year(col("o_orderdate")).cast("long").as("order_year"),
        hourDiffFrac(col("o_orderdate"), col("l_shipdate")).as("delay_hours"))
      .groupBy("order_year")
      .agg(
        roundTo(avg(col("delay_hours")), 2).as("avg_delay_hours_frac"),
        roundTo(max(col("delay_hours")), 2).as("max_delay_hours_frac"))
      .orderBy("order_year")
  }

  val a6Oracle: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
      | floor(avg(delay_hours) * 1e2 + 0.5) / 1e2 AS avg_delay_hours_frac,
      | floor(max(delay_hours) * 1e2 + 0.5) / 1e2 AS max_delay_hours_frac
      |FROM (
      | SELECT o_orderdate, (epoch(l_shipdate) - epoch(o_orderdate)) / 3600 AS delay_hours
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | WHERE o_orderdate <= l_shipdate)
      |GROUP BY 1 ORDER BY order_year""".stripMargin

  /** W3: tumbling event-time window (epoch-aligned, the shape a streaming
    * `groupBy(window($"ts", "6 hours"))` produces — here in batch so it is
    * oracle-checkable).
    */
  def w3TumblingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "6 hours"))
      .agg(
        count(lit(1)).as("n_events"),
        roundTo(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("w_start_us"),
        unix_micros(col("window.end")).as("w_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("w_start_us")

  val w3Oracle: String =
    """SELECT b * 1000000 AS w_start_us,
      | (b + 21600) * 1000000 AS w_end_us,
      | count(*) AS n_events,
      | floor(sum(value) * 1e2 + 0.5) / 1e2 AS sum_value
      |FROM (SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS b, value FROM events)
      |GROUP BY b ORDER BY w_start_us""".stripMargin

  /** Sessionization: 30-minute-gap sessions per user — the batch twin of
    * `session_window`/`flatMapGroupsWithState` state logic, expressed as
    * lag + cumulative flag sum so both engines agree exactly (gap compare
    * at microsecond precision on both sides).
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000L, 1)
        .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeOracle: String =
    """WITH g AS (
      | SELECT user_id, ts,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      | SELECT user_id, ts,
      |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      | epoch_us(min(ts)) AS session_start_us, epoch_us(max(ts)) AS session_end_us
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin

  /** A13: exact interpolated percentiles (the reference has none; at scale
    * the approx_percentile sketch is the default and is registered
    * rows-only below). 4dp rounding: the median of an even count averages
    * two 2-decimal values, putting 2dp rounding exactly on a half
    * boundary.
    */
  def a13Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        roundTo(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"),
        roundTo(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
      .orderBy("l_returnflag")

  val a13Oracle: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      | floor(quantile_cont(l_extendedprice, 0.5) * 1e4 + 0.5) / 1e4 AS p50_price,
      | floor(quantile_cont(l_extendedprice, 0.9) * 1e4 + 0.5) / 1e4 AS p90_price
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** A13 scale path: t-digest/GK sketch percentiles (approx_percentile) —
    * single-pass, mergeable, no global sort. Rows-only (sketch-specific).
    */
  def a13Approx(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("approx_pcts"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .select(
        col("approx_pcts").getItem(0).as("p50"),
        col("approx_pcts").getItem(1).as("p90"),
        col("approx_pcts").getItem(2).as("p99"),
        col("approx_parts"))

  /** A14: rollup (hierarchical grouping sets) — subtotals + grand total in
    * one pass, the OLAP shape the reference's flat GROUP BYs never reach.
    */
  def a14Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        roundTo(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val a14Oracle: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      | floor(sum(l_quantity) * 1e2 + 0.5) / 1e2 AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** A15: second-moment statistics (stddev / correlation / covariance) —
    * single-pass mergeable moment aggregates, the numeric profiling a
    * training-data pipeline runs next to count/avg. 4dp rounding absorbs
    * the engines' different update formulas (~1e-10 relative).
    */
  def a15Moments(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        roundTo(stddev_samp(col("l_extendedprice")), 4).as("std_price"),
        roundTo(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
        roundTo(covar_samp(col("l_discount"), col("l_tax")), 4).as("disc_tax_covar"))
      .orderBy("l_linestatus")

  val a15Oracle: String =
    """SELECT l_linestatus, count(*) AS n_rows,
      | floor(stddev_samp(l_extendedprice) * 1e4 + 0.5) / 1e4 AS std_price,
      | floor(corr(l_quantity, l_extendedprice) * 1e4 + 0.5) / 1e4 AS qty_price_corr,
      | floor(covar_samp(l_discount, l_tax) * 1e4 + 0.5) / 1e4 AS disc_tax_covar
      |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin

  /** A14b: cube — all grouping-set combinations in one pass. */
  def a14Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        roundTo(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  val a14CubeOracle: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      | floor(avg(o_totalprice) * 1e2 + 0.5) / 1e2 AS avg_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("a6_frac_delay", a6FracDelay, Some(a6Oracle)),
    RegisteredQuery("a14_cube", a14Cube, Some(a14CubeOracle)),
    RegisteredQuery("a15_moments", a15Moments, Some(a15Oracle)),
    RegisteredQuery("w3_tumbling_window", w3TumblingWindow, Some(w3Oracle)),
    RegisteredQuery("sessionize", sessionize, Some(sessionizeOracle)),
    RegisteredQuery("a13_percentiles", a13Percentiles, Some(a13Oracle)),
    RegisteredQuery("a13_approx", a13Approx, None),
    RegisteredQuery("a14_rollup", a14Rollup, Some(a14Oracle)),
  )
}
