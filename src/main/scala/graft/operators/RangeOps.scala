package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Pure range (interval) join — the other join shape vanilla Spark has no
  * scalable physical plan for: with NO equi-key, `a JOIN b ON x BETWEEN lo
  * AND hi` plans as BroadcastNestedLoopJoin (or worse, CartesianProduct),
  * O(|a|·|b|) comparisons regardless of how selective the ranges are. The
  * scale path is bucketize-and-refine: quantize the range dimension at a
  * granularity g, explode each interval into the buckets it overlaps
  * (fan-out = interval span / g, bounded and known), equi-join on the
  * bucket — a plain hash/broadcast join Catalyst already knows how to
  * shuffle, skew-handle and AQE-coalesce — then re-check the exact
  * predicate to discard same-bucket non-overlaps. Cost becomes
  * O(|a| + |b|·span/g + candidate pairs), the same contract as the
  * LSH/banding family: candidates first, exact verify second.
  *
  * Exercise: "in-flight lineitems per order date" — each lineitem is in
  * transit over [ship, ship + (orderkey % 30 + 1) days] (receipt date
  * derived deterministically; the synthetic fixture carries no second
  * date column — mirrored verbatim in the oracle), and every distinct
  * order date counts the lineitems whose transit interval contains it.
  * DuckDB executes the same query with its native inequality join (IEJoin)
  * as the oracle. Week buckets: avg span ~16 days → fan-out ~3.4 bucket rows per
  * interval, but only ~7 probe days co-bucket with each — ~2× fewer
  * false candidates than month buckets (measured ~10% on the full
  * query; matched pairs dominate the remaining cost).
  */
object RangeOps extends QueryModule {

  /** Lineitem transit intervals [ship, recv]. */
  private def intervals(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_shipdate").as("ship"),
      expr("timestampadd(DAY, CAST(l_orderkey % 30 + 1 AS INT), l_shipdate)").as("recv"))

  private def orderDates(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_orderdate").as("d")).distinct()

  /** Bucketed range join (the registered scale path). */
  def rangeJoinInflight(s: SparkSession, dir: String): DataFrame = {
    val iv = intervals(s, dir)
      .withColumn("b", explode(sequence(
        date_trunc("week", col("ship")),
        date_trunc("week", col("recv")),
        expr("interval 1 week"))))
    orderDates(s, dir)
      .withColumn("b", date_trunc("week", col("d")))
      .join(iv, "b")
      .filter(col("d").between(col("ship"), col("recv")))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_inflight"))
      .orderBy("d")
  }

  /** The naive non-equi formulation — BroadcastNestedLoopJoin, O(|days|·|li|).
    * Spec-only twin proving the bucketed rewrite is semantics-preserving;
    * never registered (it is the plan the operator exists to avoid).
    */
  def rangeJoinInflightNaive(s: SparkSession, dir: String): DataFrame =
    orderDates(s, dir)
      .join(intervals(s, dir), col("d").between(col("ship"), col("recv")))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_inflight"))
      .orderBy("d")

  /** Sweep-line tier of the SAME query — when only interval COUNTS are
    * needed (not the matched pairs), the candidate-pair join is beatable:
    * each interval emits +1 at `ship` and -1 at `recv + 1 day`, the
    * deltas aggregate per boundary date, and a running prefix sum turns
    * boundaries into inflight counts; each probe date then reads the
    * running sum at the latest boundary at-or-before it — which falls out
    * of ONE window pass over the unioned (boundary, probe) stream,
    * boundaries sorting before probes at equal timestamps (inclusive
    * ship). Cost: one map over the intervals, one aggregate keyed on
    * ~|distinct days| boundaries, one window over boundaries+probes.
    * The bucketed join materializes every (day, interval) match — ~9M
    * rows at sf0.1, growing with data × span — where the sweep's window
    * stream is bounded by DISTINCT DAYS, which time itself keeps small
    * at any corpus size (the unpartitioned window is deliberate and
    * safe for exactly that reason). Probes with zero inflight drop
    * (inner-join parity).
    */
  def rangeCountSweep(s: SparkSession, dir: String): DataFrame = {
    val iv = intervals(s, dir)
    val deltas = iv.select(col("ship").as("t"), lit(1L).as("net"))
      .unionAll(iv.select(expr("timestampadd(DAY, 1, recv)").as("t"), lit(-1L).as("net")))
      .groupBy(col("t")).agg(sum(col("net")).as("net"))
    val probes = orderDates(s, dir)
      .select(col("d").as("t"), lit(0L).as("net"), lit(1).as("is_probe"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t"), col("is_probe"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    deltas.select(col("t"), col("net"), lit(0).as("is_probe"))
      .unionAll(probes)
      .withColumn("inflight", sum(col("net")).over(w))
      .filter(col("is_probe") === 1 && col("inflight") > 0)
      .select(col("t").as("d"), col("inflight").as("n_inflight"))
      .orderBy("d")
  }

  val rangeJoinOracle: String =
    """WITH iv AS (
      | SELECT l_shipdate AS ship,
      |  l_shipdate + (l_orderkey % 30 + 1) * INTERVAL 1 DAY AS recv
      | FROM lineitem),
      |d AS (SELECT DISTINCT o_orderdate AS d FROM orders)
      |SELECT d.d AS d, count(*) AS n_inflight
      |FROM d JOIN iv ON d.d BETWEEN iv.ship AND iv.recv
      |GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("range_join_inflight", rangeJoinInflight, Some(rangeJoinOracle)),
    RegisteredQuery("range_count_sweep", rangeCountSweep, Some(rangeJoinOracle)),
  )
}
