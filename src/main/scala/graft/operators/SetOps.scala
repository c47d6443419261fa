package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables

/** Relational edge semantics the reference's SQL surface implies but never
  * exercises head-on: bag (multiset) set operations, correlated-subquery
  * decorrelation, NOT IN's three-valued-logic null trap, and a running
  * DISTINCT count without per-row set state. The reference delegates these
  * to Postgres/Trino semantics (its queries are ANSI SQL over views —
  * the per-query .sql files under /root/reference/sql/queries/); an
  * engine replacing that stack must
  * reproduce the same ANSI behavior, so each is pinned against the DuckDB
  * oracle rather than assumed.
  *
  * Scale notes live per-operator; the common theme is that each query's
  * plan is the shape that survives 100 TB — decorrelated joins instead of
  * per-row subqueries, cumulative flags instead of set-valued window
  * state, and an explicit record of where NOT IN's null-aware anti join
  * stops scaling and NOT EXISTS takes over.
  */
object SetOps extends QueryModule {

  // ---------------------------------------------------------------------
  // Bag set operations: INTERSECT ALL / EXCEPT ALL
  // ---------------------------------------------------------------------

  /** Multiset overlap between two halves of the event stream: which
    * (user_id, event_type) observations repeat across the time split, with
    * multiplicity min(m_a, m_b) (INTERSECT ALL), and which are left over
    * (EXCEPT ALL, multiplicity m_a - m_b clamped at 0). DISTINCT-flavored
    * set ops are already covered (`dedup_exact`, `j2_new_keys`); the ALL
    * variants are different semantics — they preserve multiplicity, which
    * is what a pipeline diffing two ingest snapshots actually wants.
    *
    * Scale: Spark plans both ops as a count-aggregate per side + generate
    * (replicate by min/difference of counts) — one hash exchange per side
    * on the full row, no sort, no pairwise compare. That is the same cost
    * class as `groupBy(user_id, event_type).count()` and parallelizes by
    * key at any scale. The final per-(op,key) count aggregate reuses the
    * same partitioning.
    */
  def bagIntersectExcept(s: SparkSession, dir: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val ev  = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val a   = ev.filter(col("ts") < cut).drop("ts")
    val b   = ev.filter(col("ts") >= cut).drop("ts")
    a.intersectAll(b).withColumn("op", lit("intersect_all"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
      .groupBy("op", "user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("op", "user_id", "event_type")
  }

  val bagOracle: String =
    """WITH a AS (SELECT user_id, event_type FROM events
      |           WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
      |     b AS (SELECT user_id, event_type FROM events
      |           WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
      |     ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
      |     ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      |SELECT op, user_id, event_type, n FROM (
      |  SELECT 'intersect_all' AS op, user_id, event_type, count(*) AS n
      |  FROM ia GROUP BY 2, 3
      |  UNION ALL
      |  SELECT 'except_all' AS op, user_id, event_type, count(*) AS n
      |  FROM ea GROUP BY 2, 3)
      |ORDER BY op, user_id, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Correlated scalar subquery → decorrelated aggregate join
  // ---------------------------------------------------------------------

  /** Orders priced above 1.5× their own customer's average — written as a
    * correlated scalar subquery in SQL text, exactly as an analyst would.
    *
    * Scale: this is the decorrelation showcase. Executed naively the
    * subquery is O(orders²/customers) — one aggregate scan per outer row.
    * Catalyst's subquery rewrite (RewriteCorrelatedScalarSubquery) turns
    * it into ONE `Aggregate(o_custkey, avg)` over orders plus an equi-join
    * back on `o_custkey`: two scans + one shuffle, the plan you would
    * hand-write at 100 TB. `SetOpsSpec` pins that the physical plan is a
    * join over an aggregate, not a per-row subquery.
    */
  def correlatedAboveAvg(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(correlatedSql)
  }

  /** The SAME ANSI text runs through spark.sql and DuckDB. */
  val correlatedSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
      |                      FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // NOT IN vs NOT EXISTS under NULLs (three-valued logic)
  // ---------------------------------------------------------------------

  /** The classic silent-wrong-answer trap, pinned as a 1-row digest. The
    * probe list (`CASE WHEN user_id % 7 <> 3 THEN user_id END` over error
    * events) deterministically contains NULLs at every SF. ANSI then
    * requires: `IN` finds matches regardless of the NULLs; `NOT IN`
    * returns NO rows (x <> NULL is UNKNOWN, so no row ever passes);
    * `NOT EXISTS` — the shape people actually mean — returns the real
    * complement. A library that "optimizes" NOT IN into a plain anti join
    * corrupts every decontamination/blocklist query its users run; the
    * digest proves this engine keeps all three semantics straight, and
    * n_not_in is pinned to the value ANSI demands (0 here) by the oracle.
    *
    * Scale: Spark plans NOT IN as a null-aware anti join, which REQUIRES
    * the list side to broadcast (BroadcastHashJoin with
    * isNullAwareAntiJoin) — it cannot shuffle, because every probe row
    * must see every NULL. NOT EXISTS carries no null obligation and plans
    * a regular left-anti join that shuffles and scales to any list size.
    * That asymmetry is the 100 TB guidance: blocklists with possible
    * NULLs must either be null-filtered explicitly (then anti-join) or
    * kept broadcast-small; `SetOpsSpec` pins both plan shapes.
    */
  def notInNullTrap(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(notInSql)
  }

  /** The SAME ANSI text runs through spark.sql and DuckDB. */
  val notInSql: String =
    """WITH probe AS (SELECT CASE WHEN user_id % 7 <> 3 THEN user_id END AS uid
      |               FROM events WHERE event_type = 'error')
      |SELECT
      |  (SELECT count(*) FROM customer
      |   WHERE c_custkey IN (SELECT uid FROM probe)) AS n_in,
      |  (SELECT count(*) FROM customer
      |   WHERE c_custkey NOT IN (SELECT uid FROM probe)) AS n_not_in,
      |  (SELECT count(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM probe p
      |                     WHERE p.uid = c.c_custkey)) AS n_not_exists,
      |  (SELECT count(*) FROM probe WHERE uid IS NULL) AS n_probe_nulls""".stripMargin

  // ---------------------------------------------------------------------
  // Running DISTINCT count without set-valued state
  // ---------------------------------------------------------------------

  /** Per-user running count of distinct event types seen so far — the
    * "how diverse is this user's behavior to date" curve. Neither Spark
    * nor most engines allow COUNT(DISTINCT) over a running window; the
    * common workaround (`size(collect_set() OVER ...)`) carries a
    * per-row SET in window state. This plan instead flags each row's
    * FIRST occurrence of (user_id, event_type) with one row_number
    * window, then takes a cumulative SUM of the flag over the user's
    * timeline — two windows, O(1) state per row.
    *
    * Scale: two hash exchanges — (user_id, event_type) for the
    * first-seen flag, then user_id for the cumulative sum — both
    * key-parallel with cardinality that grows with the data, and no
    * operator holds state proportional to the distinct-value count. The same trick is how the 100 TB "new users
    * per day" and "first-seen dedup" curves are computed. Ties on ts are
    * broken by event_id so the running value is total-order deterministic.
    */
  def runningDistinct(s: SparkSession, dir: String): DataFrame = {
    val byKey  = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("first_seen",
        when(row_number().over(byKey) === 1, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        sum(col("first_seen")).over(byUser).as("distinct_types_so_far"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  val runningDistinctOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |                                 ORDER BY ts, event_id) = 1
      |         THEN 1 ELSE 0 END AS first_seen
      |  FROM events)
      |SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS distinct_types_so_far
      |FROM flagged
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** The NAIVE running-distinct spelling — `size(collect_set() OVER ...)`,
    * what an analyst actually types. Registered to drive
    * [[graft.plans.RewriteRunningDistinct]] end-to-end through the driver
    * gate: the optimizer must transform this into the first-seen-flag plan
    * (no set-valued window state) AND the result must still hash-match the
    * same DuckDB oracle as the hand-written [[runningDistinct]].
    */
  def runningDistinctNaive(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        size(collect_set(col("event_type")).over(byUser)).cast("long")
          .as("distinct_types_so_far"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("bag_intersect_except", bagIntersectExcept, Some(bagOracle)),
    RegisteredQuery("correlated_above_avg", correlatedAboveAvg, Some(correlatedSql)),
    RegisteredQuery("not_in_null_trap", notInNullTrap, Some(notInSql)),
    RegisteredQuery("w8_running_distinct", runningDistinct, Some(runningDistinctOracle)),
    RegisteredQuery("w8_running_distinct_naive", runningDistinctNaive, Some(runningDistinctOracle)),
  )
}
