package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Scalars._

/** Reshape operators — pivot (long→wide), unpivot (wide→long), and explicit
  * GROUPING SETS. The reference reshapes only implicitly (its snapshot row
  * is a hand-built wide record over aggregate scalars,
  * /root/reference/src/aggregations.py:83-116); these are the declarative
  * renditions a warehouse user expects, each with an exact DuckDB oracle.
  *
  * Scale notes:
  *  - [[pivotStatusMatrix]] passes the pivot values EXPLICITLY. Without
  *    them, `pivot(col)` runs an eager distinct-scan job at plan time to
  *    discover the columns — an extra full pass over the fact table at
  *    100 TB, and a nondeterministic schema if values drift. With explicit
  *    values the plan is a single hash aggregate (map-side partial, one
  *    shuffle on the group key) — same cost as a plain groupBy.
  *  - [[unpivotMetrics]] expands W metric columns into W rows per group —
  *    an Expand node, no shuffle beyond the source aggregation.
  *  - [[groupingSetsAgg]] computes all four grouping sets in ONE pass
  *    (Spark's Expand + single aggregate — not four scans unioned).
  */
object ReshapeOps extends QueryModule {

  /** Pivot: return-flag × line-status matrix — count and total quantity per
    * cell, statuses as columns. Explicit value list keeps the plan
    * scan-free (see scale note above).
    */
  def pivotStatusMatrix(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)).as("n"), roundTo(sum(col("l_quantity")), 2).as("qty"))
      // Spark's pivot fills an EMPTY cell with NULL even for count, while
      // the oracle's `count(*) FILTER` yields 0 — coalesce the count cells
      // so a fixture where some (flag, status) combo is absent still
      // hash-matches (sum cells stay NULL on both sides, as SQL sums do)
      .select(col("l_returnflag"),
        coalesce(col("F_n"), lit(0L)).as("F_n"), col("F_qty"),
        coalesce(col("O_n"), lit(0L)).as("O_n"), col("O_qty"))
      .orderBy("l_returnflag")

  val pivotOracle: String =
    """SELECT l_returnflag,
      | count(*) FILTER (WHERE l_linestatus = 'F') AS F_n,
      | floor(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') * 1e2 + 0.5) / 1e2 AS F_qty,
      | count(*) FILTER (WHERE l_linestatus = 'O') AS O_n,
      | floor(sum(l_quantity) FILTER (WHERE l_linestatus = 'O') * 1e2 + 0.5) / 1e2 AS O_qty
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** Unpivot (melt): the wide per-flag aggregate back to long
    * (flag, metric, value) rows. Value columns share one DOUBLE type —
    * unpivot requires a common value type, and counts are exact in double
    * far past any realistic group count.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n_items"),
        roundTo(sum(col("l_quantity")), 2).as("sum_qty"),
        roundTo(sum(col("l_extendedprice")), 2).as("sum_price"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("n_items"), col("sum_qty"), col("sum_price")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")

  val unpivotOracle: String =
    """WITH w AS (SELECT l_returnflag,
      |  CAST(count(*) AS DOUBLE) AS n_items,
      |  floor(sum(l_quantity) * 1e2 + 0.5) / 1e2 AS sum_qty,
      |  floor(sum(l_extendedprice) * 1e2 + 0.5) / 1e2 AS sum_price
      | FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'n_items' AS metric, n_items AS value FROM w
      |UNION ALL SELECT l_returnflag, 'sum_qty', sum_qty FROM w
      |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
      |ORDER BY l_returnflag, metric""".stripMargin

  /** Explicit GROUPING SETS — the four-set lattice (both dims, each dim,
    * grand total) with `grouping()` markers, one ANSI text through BOTH
    * engines (same federation-collapse shape as [[Extras.sqlQ4]]).
    * `grouping()` is cast to BIGINT on both sides (Spark returns TINYINT,
    * DuckDB INTEGER-ish — BIGINT is the shared canonical form).
    */
  val groupingSetsText: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      | CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
      | count(*) AS n_orders,
      | floor(avg(o_totalprice) * 1e2 + 0.5) / 1e2 AS avg_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |  (o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority,
      |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(groupingSetsText)
  }

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("pivot_status_matrix", pivotStatusMatrix, Some(pivotOracle)),
    RegisteredQuery("unpivot_metrics", unpivotMetrics, Some(unpivotOracle)),
    RegisteredQuery("a14_grouping_sets", groupingSetsAgg, Some(groupingSetsText)),
  )
}
