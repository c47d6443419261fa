package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.functions.Scalars._

/** Core relational operator library — the reference's scans, filters, joins,
  * aggregates, top-k and window shapes (SURVEY.md §2.1–§2.8) re-expressed as
  * declarative DataFrame programs over the shared TPC-H-ish fixtures.
  *
  * Scale notes (100 TB design):
  *  - dimension sides of joins (`customer`, `part`) are broadcast — at
  *    production scale these stay far below `autoBroadcastJoinThreshold`
  *    relative to the fact tables, and a broadcast hash join removes the
  *    shuffle entirely on the fact side;
  *  - all aggregations are hash-aggregates with map-side partial
  *    aggregation (Spark default for these shapes);
  *  - filters/projections sit directly on the scan so Catalyst pushes them
  *    into the parquet reader (verify with .explain: PushedFilters/ReadSchema);
  *  - global top-k compiles to TakeOrderedAndProject — no full sort.
  */
object Relational extends QueryModule {

  /** Q1 rendition (launch_performance_over_time.sql:1-21): tri-state
    * success-rate by calendar year. `o_orderstatus`: 'F'→success,
    * 'O'→failure, other→NULL (unknown) — NULLs count toward the
    * denominator but neither class (src/aggregations.py:345-350).
    */
  def q1PerfOverTime(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderdate"), col("o_orderstatus"))
    o.select(
        year(col("o_orderdate")).cast("long").as("order_year"),
        triState(col("o_orderstatus"), "F", "O").as("success"))
      .groupBy("order_year")
      .agg(
        count(lit(1)).as("total_launches"),
        countTrue(col("success")).as("successful_launches"),
        countFalse(col("success")).as("failed_launches"))
      .withColumn("success_rate", ratioPct(col("successful_launches"), col("total_launches")))
      .orderBy("order_year")
  }

  val q1Oracle: String =
    """SELECT order_year, total_launches, successful_launches, failed_launches,
      | floor((100.0::DOUBLE * successful_launches / total_launches) * 1e2 + 0.5) / 1e2 AS success_rate
      |FROM (
      | SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  count(*) AS total_launches,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS successful_launches,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS failed_launches
      | FROM orders GROUP BY 1)
      |ORDER BY order_year""".stripMargin

  /** Q2 rendition (top_payload_masses.sql:1-17): global top-5 by a nullable
    * derived metric (P10 zero→NULL convention folded in), with a unique
    * tiebreak so the limit boundary is deterministic. Plans as
    * TakeOrderedAndProject (no global sort).
    */
  def q2TopMass(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      // filter on the STORED column first: `payload_mass IS NOT NULL` on
      // the derived when() can't reach the scan, `l_discount <= 0.05`
      // lands in PushedFilters (row-group pruning at scale)
      .filter(col("l_discount") <= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_shipdate"),
        when(col("l_discount") <= 0.05, col("l_extendedprice")).as("payload_mass"))
      .filter(col("payload_mass").isNotNull)
      .orderBy(col("payload_mass").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(5)

  val q2Oracle: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate,
      | l_extendedprice AS payload_mass
      |FROM lineitem WHERE l_discount <= 0.05
      |ORDER BY payload_mass DESC, l_orderkey, l_linenumber LIMIT 5""".stripMargin

  /** Q3 rendition (time_between_engine_test_and_actual_launch.sql): grouped
    * truncating hour-delta stats between two timestamps across a join, under
    * the P6 sanity predicate. Uses the Trino-compatible TRUNCATING hour diff
    * (SURVEY.md §2.8 semantic trap). `orders` is the smaller side → broadcast.
    */
  def q3ShipDelay(s: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
      .filter(
        col("l_shipdate").isNotNull && col("o_orderdate").isNotNull &&
        col("o_orderdate") <= col("l_shipdate"))
      .select(
        year(col("o_orderdate")).cast("long").as("order_year"),
        hourDiffTrunc(col("o_orderdate"), col("l_shipdate")).as("delay_hours"))
      .groupBy("order_year")
      .agg(
        count(lit(1)).as("n_shipments"),
        roundTo(avg(col("delay_hours")), 2).as("avg_delay_hours"),
        max(col("delay_hours")).as("max_delay_hours"))
      .orderBy("order_year")
  }

  val q3Oracle: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
      | count(*) AS n_shipments,
      | floor(avg(delay_hours) * 1e2 + 0.5) / 1e2 AS avg_delay_hours,
      | max(delay_hours) AS max_delay_hours
      |FROM (
      | SELECT o_orderdate,
      |  CAST(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 3600) AS BIGINT) AS delay_hours
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
      |  AND o_orderdate <= l_shipdate)
      |GROUP BY 1 ORDER BY order_year""".stripMargin

  /** Q4 rendition (launch_site_utilization.sql:1-14): per-"site" utilization
    * — enrichment join to a broadcast dimension, grouped count + rounded
    * conditional average, presentation sort.
    */
  def q4SegmentUtil(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("total_orders"),
        roundTo(avg(col("o_totalprice")), 2).as("avg_order_price"))
      .orderBy(col("total_orders").desc, col("c_mktsegment"))
  }

  val q4Oracle: String =
    """SELECT c_mktsegment, count(*) AS total_orders,
      | floor(avg(o_totalprice) * 1e2 + 0.5) / 1e2 AS avg_order_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY total_orders DESC, c_mktsegment""".stripMargin

  /** Q5-shape rendition (beyond the reference; the TPC-H "local supplier
    * volume" star topology): revenue per (region, order year) through the
    * full five-table chain lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    * region. Join-strategy ladder on display: the fact-to-fact
    * lineitem⋈orders edge stays a shuffled join (at 100 TB both sides are
    * fact-scale — bucket by orderkey to make it exchange-free);
    * nation/region carry explicit `broadcast()` hints (dimension-scale at
    * ANY corpus size); customer is deliberately UN-hinted — it grows with
    * the corpus, so the strategy is left to the planner (size estimate +
    * AQE pick broadcast at fixture scale and a shuffled join once customer
    * outgrows the threshold). `PlanGuardSpec` pins exactly-two hints so a
    * refactor can't quietly re-force the customer broadcast. Catalyst
    * prunes every table to its join keys + the two aggregate inputs.
    */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
    val r = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        count(lit(1)).as("n_items"),
        roundTo(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("r_name", "order_year")
  }

  val q5Oracle: String =
    """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
      | count(*) AS n_items,
      | floor(sum(l_extendedprice * (1 - l_discount)) * 1e2 + 0.5) / 1e2 AS revenue
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY r_name, order_year""".stripMargin

  /** Q6-shape rendition (TPC-H "forecasting revenue change"): pure
    * scan-filter-aggregate with every predicate eligible for parquet
    * pushdown — the zero-join showcase that at 100 TB reads only the
    * row groups whose footer min/max overlap the date/discount/quantity
    * bands, and only the four referenced columns.
    */
  def q6RevenueBand(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      // timestamp-flavor coercion is ASYMMETRIC: an NTZ literal against
      // the (session-UTC LTZ) column casts the LITERAL — constant-folded,
      // predicate still reaches PushedFilters (pinned in PLANS.md) — while
      // an LTZ literal against an NTZ column would cast the COLUMN and
      // keep the band out of the scan. LocalDateTime literals are safe
      // under both fixture flavors; see Sessions.tuneConf on why the
      // session pins inferTimestampNTZ=false.
      .filter(col("l_shipdate") >= lit(java.time.LocalDateTime.of(1996, 1, 1, 0, 0)) &&
        col("l_shipdate") < lit(java.time.LocalDateTime.of(1997, 1, 1, 0, 0)) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        count(lit(1)).as("n_items"),
        roundTo(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue_delta"))

  val q6Oracle: String =
    """SELECT count(*) AS n_items,
      | floor(sum(l_extendedprice * l_discount) * 1e2 + 0.5) / 1e2 AS revenue_delta
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** S2: latest-row point lookup (fetch_latest_launch, src/api.py:17-46) —
    * `ORDER BY ts DESC LIMIT 1` plans as TakeOrderedAndProject.
    * Timestamps are emitted as epoch-micros BIGINT (`unix_micros`): the
    * driver's oracle compare is tz/unit-strict and Spark's UTC-adjusted
    * parquet timestamps never byte-match DuckDB's naive ones (VERDICT r1).
    */
  def s2LatestEvent(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy(col("ts_us").desc, col("event_id").desc).limit(1)

  val s2Oracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
      |FROM events ORDER BY ts_us DESC, event_id DESC LIMIT 1""".stripMargin

  /** S3/P3: watermark-filtered sorted scan (fetch_launches_after_date,
    * src/api.py:80-174). The `>=` predicate is pushed into the parquet scan
    * by Catalyst (PushedFilters) — the 80%-transfer-reduction optimization
    * the reference hand-rolls (README.md:188) is free here.
    */
  val watermark = "2024-01-25 00:00:00"

  def s3WatermarkScan(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSince(s, dir, Tables.utcTs(watermark))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  val s3Oracle: String =
    s"""SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM events
       |WHERE ts >= TIMESTAMP '$watermark' ORDER BY event_id""".stripMargin

  /** P2: validation filter with drop-counting (_validate_launches,
    * src/ingest.py:314-357 semantics — DROPMALFORMED with metrics): a row is
    * valid iff its JSON props parse to an integer `k`, `value` is present
    * and non-negative, and `ts` is present. Single-pass conditional counts,
    * no second scan.
    */
  def p2ValidateCount(s: SparkSession, dir: String): DataFrame = {
    val valid =
      expr("try_cast(get_json_object(props, '$.k') AS INT)").isNotNull &&
      col("value").isNotNull && col("value") >= 0 && col("ts").isNotNull
    Tables.events(s, dir)
      .agg(
        count(lit(1)).as("total_rows"),
        count(when(valid, 1)).as("valid_rows"),
        (count(lit(1)) - count(when(valid, 1))).as("dropped_rows"))
  }

  val p2Oracle: String =
    """SELECT count(*) AS total_rows,
      | count(CASE WHEN ok THEN 1 END) AS valid_rows,
      | count(*) - count(CASE WHEN ok THEN 1 END) AS dropped_rows
      |FROM (
      | SELECT (TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
      |   AND value IS NOT NULL AND value >= 0 AND ts IS NOT NULL) AS ok
      | FROM events)""".stripMargin

  /** J1: enrichment join + re-aggregation (the reference's N+1 payload-mass
    * lookup loop, src/ingest.py:335-346 + src/api.py:211-283, collapsed to a
    * broadcast join): per-order sum of positive dimension prices, with the
    * P10 zero→NULL mapping on the result.
    */
  def j1Enrichment(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_retailprice"))
    Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left")
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(col("p_retailprice") > 0, col("p_retailprice"))).as("raw_total"))
      .select(
        col("l_orderkey"), col("n_items"),
        when(col("raw_total") > 0, roundTo(col("raw_total"), 2)).as("total_part_price"))
      .orderBy("l_orderkey")
  }

  val j1Oracle: String =
    """SELECT l_orderkey, count(*) AS n_items,
      | CASE WHEN sum(CASE WHEN p_retailprice > 0 THEN p_retailprice END) > 0
      |  THEN floor(sum(CASE WHEN p_retailprice > 0 THEN p_retailprice END) * 1e2 + 0.5) / 1e2
      | END AS total_part_price
      |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY l_orderkey""".stripMargin

  /** J2: new-key detection via anti-join (the `ON CONFLICT` new-vs-existing
    * split, src/database.py:164-190): users first seen at/after the cutoff.
    */
  val j2Cutoff = "2024-01-01 06:00:00"

  def j2NewKeys(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val existing = ev.filter(col("ts") < to_timestamp(lit(j2Cutoff))).select("user_id").distinct()
    val incoming = ev.filter(col("ts") >= to_timestamp(lit(j2Cutoff))).select("user_id").distinct()
    incoming.join(existing, Seq("user_id"), "left_anti")
      .agg(count(lit(1)).as("new_users"))
  }

  val j2Oracle: String =
    s"""SELECT count(*) AS new_users FROM (
       | SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '$j2Cutoff'
       |  AND user_id NOT IN
       |   (SELECT user_id FROM events WHERE ts < TIMESTAMP '$j2Cutoff'))""".stripMargin

  /** A4: exact distinct counts (count_unique_launch_sites,
    * src/aggregations.py:368-381). The approx (HLL) scale variant is
    * registered separately without an oracle.
    */
  def a4DistinctExact(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).agg(
      countDistinct(col("c_nationkey")).as("n_nations"),
      countDistinct(col("c_mktsegment")).as("n_segments"))

  val a4Oracle: String =
    """SELECT count(DISTINCT c_nationkey) AS n_nations,
      | count(DISTINCT c_mktsegment) AS n_segments FROM customer""".stripMargin

  /** A4 scale path: HLL sketch distinct count — at 100 TB an exact
    * countDistinct shuffles every key; approx_count_distinct keeps the
    * aggregation map-side and mergeable. Not SQL-COMPUTABLE by DuckDB
    * (different sketch impls), but fully DETERMINISTIC and
    * partition-independent: HLL++ registers are a pure function of each
    * value's hash and the merge is an elementwise register max —
    * commutative, associative, idempotent — so the estimate does not
    * depend on partition count or task order. The oracle therefore PINS
    * the sf0.01 estimates (the sim_recall_report pattern): a sketch or
    * hash change flips the driver entry red instead of hiding in a
    * rows-only check.
    */
  def a4DistinctApprox(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      approx_count_distinct(col("event_id")).as("approx_events"))

  /** Pinned at sf0.01 (exact values: 150 users / 10000 events). */
  val a4ApproxOracle: String =
    """SELECT CAST(151 AS BIGINT) AS approx_users,
      | CAST(9571 AS BIGINT) AS approx_events""".stripMargin

  /** A5/P5: conditional average over a nullable-by-convention metric
    * (_calculate_average_payload_mass, src/aggregations.py:383-397).
    */
  def a5CondAvg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      roundTo(avg(when(col("l_discount") > 0, col("l_extendedprice"))), 2).as("avg_discounted_price"),
      roundTo(avg(col("l_extendedprice")), 2).as("avg_price"),
      count(when(col("l_discount") > 0, 1)).as("n_discounted"))

  val a5Oracle: String =
    """SELECT floor(avg(CASE WHEN l_discount > 0 THEN l_extendedprice END) * 1e2 + 0.5) / 1e2 AS avg_discounted_price,
      | floor(avg(l_extendedprice) * 1e2 + 0.5) / 1e2 AS avg_price,
      | count(CASE WHEN l_discount > 0 THEN 1 END) AS n_discounted
      |FROM lineitem""".stripMargin

  /** E2/A1-A7 one-pass snapshot aggregate: the reference computes these
    * eight metrics in 4-5 separate Postgres round-trips
    * (src/aggregations.py:310-366); here it is ONE hash aggregate over one
    * scan — the single-pass shape its own SQL proves possible.
    */
  def aggSnapshotFull(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderdate"), col("o_totalprice"), col("o_orderpriority"),
        triState(col("o_orderstatus"), "F", "O").as("success"))
      .agg(
        count(lit(1)).as("total_launches"),
        countTrue(col("success")).as("successful_launches"),
        countFalse(col("success")).as("failed_launches"),
        min(col("o_orderdate")).as("earliest_launch_date"),
        max(col("o_orderdate")).as("latest_launch_date"),
        countDistinct(col("o_orderpriority")).as("total_sites"),
        roundTo(avg(when(col("o_totalprice") > 0, col("o_totalprice"))), 2).as("average_payload_mass"))
      .withColumn("success_rate", ratioPct(col("successful_launches"), col("total_launches")))

  val aggSnapshotOracle: String =
    """SELECT total_launches, successful_launches, failed_launches,
      | earliest_launch_date, latest_launch_date, total_sites, average_payload_mass,
      | floor((100.0::DOUBLE * successful_launches / total_launches) * 1e2 + 0.5) / 1e2 AS success_rate
      |FROM (
      | SELECT count(*) AS total_launches,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS successful_launches,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS failed_launches,
      |  min(o_orderdate) AS earliest_launch_date,
      |  max(o_orderdate) AS latest_launch_date,
      |  count(DISTINCT o_orderpriority) AS total_sites,
      |  floor(avg(CASE WHEN o_totalprice > 0 THEN o_totalprice END) * 1e2 + 0.5) / 1e2 AS average_payload_mass
      | FROM orders)""".stripMargin

  /** W1: latest row per key (the reference's ORDER BY ... DESC LIMIT 1
    * lookups generalized per-key, SURVEY.md §2.5-W1) — `max_by` over a
    * (ts, event_id) ordering struct. Unlike the row_number() window (which
    * shuffles AND sorts every event inside each user partition), max_by is
    * a hash aggregate with map-side partial aggregation: at 100 TB each
    * executor reduces its events to one candidate row per local user
    * before the exchange, and nothing is ever sorted.
    */
  def w1LatestPerUser(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .groupBy("user_id")
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("value")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        unix_micros(col("m.ts")).as("ts_us"), col("m.value").as("value"))
      .orderBy("user_id")

  /** The W1 fidelity twin: the reference's literal ORDER BY ... LIMIT 1
    * shape as a row_number window — kept for API completeness; the
    * headline path is the aggregate above.
    */
  def w1LatestPerUserWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .orderBy("user_id")
  }

  val w1Oracle: String =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM (
      | SELECT user_id, event_id, ts, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** T3: history page — ORDER BY ... DESC LIMIT n
    * (get_aggregation_history, src/aggregations.py:192-234).
    */
  def t3HistoryPage(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .limit(100)

  val t3Oracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |ORDER BY ts_us DESC, event_id DESC LIMIT 100""".stripMargin

  /** JSON extraction from the props column (the JSONB boundary,
    * src/database.py:110-119/158) + grouped aggregate.
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        roundTo(avg(col("k")), 2).as("avg_k"),
        max(col("k")).cast("long").as("max_k"))
      .orderBy("event_type")

  val jsonPropsOracle: String =
    """SELECT event_type, count(*) AS n_events,
      | floor(avg(k) * 1e2 + 0.5) / 1e2 AS avg_k, CAST(max(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("q1_perf_over_time", q1PerfOverTime, Some(q1Oracle)),
    RegisteredQuery("q2_top_mass", q2TopMass, Some(q2Oracle)),
    RegisteredQuery("q3_ship_delay", q3ShipDelay, Some(q3Oracle)),
    RegisteredQuery("q4_segment_util", q4SegmentUtil, Some(q4Oracle)),
    RegisteredQuery("q5_region_revenue", q5RegionRevenue, Some(q5Oracle)),
    RegisteredQuery("q6_revenue_band", q6RevenueBand, Some(q6Oracle)),
    RegisteredQuery("s2_latest_event", s2LatestEvent, Some(s2Oracle)),
    RegisteredQuery("s3_watermark_scan", s3WatermarkScan, Some(s3Oracle)),
    RegisteredQuery("p2_validate_count", p2ValidateCount, Some(p2Oracle)),
    RegisteredQuery("j1_enrichment", j1Enrichment, Some(j1Oracle)),
    RegisteredQuery("j2_new_keys", j2NewKeys, Some(j2Oracle)),
    RegisteredQuery("a4_distinct_exact", a4DistinctExact, Some(a4Oracle)),
    RegisteredQuery("a4_distinct_approx", a4DistinctApprox, Some(a4ApproxOracle)),
    RegisteredQuery("a5_cond_avg", a5CondAvg, Some(a5Oracle)),
    RegisteredQuery("agg_snapshot_full", aggSnapshotFull, Some(aggSnapshotOracle)),
    RegisteredQuery("w1_latest_per_user", w1LatestPerUser, Some(w1Oracle)),
    // headline since r11 (VERDICT r10 #7): plan-twins get a recorded
    // timing too — it was the only registered query with none
    RegisteredQuery("w1_latest_window", w1LatestPerUserWindow, Some(w1Oracle)),
    RegisteredQuery("t3_history_page", t3HistoryPage, Some(t3Oracle)),
    RegisteredQuery("json_props", jsonProps, Some(jsonPropsOracle)),
  )
}
