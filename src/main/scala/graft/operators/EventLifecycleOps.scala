package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Scalars._

/** Event-lifecycle analytics: ordered funnels, cohort retention, type-2
  * slowly-changing-dimension intervals and time-series gap-filling — the
  * warehouse staples a pipeline like the reference's (event ingest →
  * incremental aggregates, `/root/reference/src/aggregations.py`) grows
  * into once analysts ask "did the user come back?" rather than "how many
  * rows arrived?".
  *
  * The funnel/cohort/SCD2/gap-fill operators share one scale discipline:
  * the event stream is shuffled AT MOST ONCE, keyed on `user_id`, and
  * every later stage works on either that partitioning (chained
  * `WindowExec`s over the same key reuse the single exchange) or on an
  * aggregate that is orders of magnitude smaller than the stream
  * (cohort/week matrices, per-user spans). Nothing here materializes
  * per-user state proportional to history length except the explicit
  * per-day grid, whose size is the OUTPUT size. The fifth operator,
  * [[rollingActiveUsers]], is the deliberate exception: it trades the
  * single exchange for a FIXED 28× fan-out of the (already tiny)
  * user-day aggregate — see its scaladoc.
  */
object EventLifecycleOps extends QueryModule {

  /** Microseconds per day — grid buckets are pure integer arithmetic on
    * `unix_micros` so Spark and the oracle agree bit-exactly (no
    * engine-specific calendar or timezone semantics involved).
    */
  private val usPerDay = 86400000000L

  /** Epoch-day bucket as exact integer FLOOR division, spelled the same
    * way on both engines: `pmod`/the `%+d)%d` adjustment is non-negative,
    * so the adjusted numerator is exactly divisible and truncating integer
    * division equals floor — day buckets stay correct for pre-epoch
    * timestamps too. (Measured r8: Spark's bare `div` and DuckDB's integer
    * `//` BOTH truncate toward zero — `-5 // 3 = -1` in DuckDB 1.0 — so
    * the engines never diverged as ADVICE r7 presumed; the floor form is
    * used anyway because a day bucket should floor, not truncate.)
    */
  private val epochDaySpark: String =
    s"(unix_micros(ts) - pmod(unix_micros(ts), $usPerDay)) div $usPerDay"
  private val epochDayDuck: String =
    s"(epoch_us(ts) - ((epoch_us(ts) % $usPerDay) + $usPerDay) % $usPerDay) // $usPerDay"

  // ---------------------------------------------------------------------
  // Ordered funnel
  // ---------------------------------------------------------------------

  /** Strictly-ordered three-step funnel (view → click → purchase): a user
    * converts step k only with an event AFTER their step-(k-1) time.
    * Per-user step times are three chained conditional-min windows over
    * the same `user_id` partitioning — Catalyst plans one exchange feeding
    * three consecutive `WindowExec`s (each step's predicate references the
    * previous window column, which a self-join formulation would compute
    * by re-scanning the stream twice per step). The final shape is a
    * 3-row census: users reaching each step + conversion vs step 1.
    */
  /** Per-user strict funnel step times (t1 ≤ first view, t2 ≤ first
    * later click, t3 ≤ first later purchase) — shared by [[funnelSteps]]
    * (counts) and [[funnelLag]] (conversion-time distribution); one
    * user_id exchange for all three chained conditional-min windows.
    */
  private[graft] def funnelTimes(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") > col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
        min(col("t3")).as("t3"))
  }

  /** Shared oracle CTE prefix yielding u1/u2/u3 (the per-step times). */
  private val funnelCteSql: String =
    """u1 AS (
      | SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t1
      | FROM events GROUP BY 1),
      |u2 AS (
      | SELECT e.user_id, min(e.ts) AS t2
      | FROM events e JOIN u1 USING (user_id)
      | WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1),
      |u3 AS (
      | SELECT e.user_id, min(e.ts) AS t3
      | FROM events e JOIN u2 USING (user_id)
      | WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1)""".stripMargin

  def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    val staged = funnelTimes(s, dir)
    val counts = staged.agg(
      count(col("t1")).as("n1"), count(col("t2")).as("n2"),
      count(col("t3")).as("n3"))
    counts
      .select(explode(array(
        struct(lit("1_view").as("step"), col("n1").as("n_users")),
        struct(lit("2_click").as("step"), col("n2").as("n_users")),
        struct(lit("3_purchase").as("step"), col("n3").as("n_users")))).as("r"),
        col("n1"))
      .select(col("r.step").as("step"), col("r.n_users").as("n_users"),
        // nullif guard: a corpus with zero step-1 events must yield NULL on
        // BOTH engines (unguarded, DuckDB errors on integer /0 while Spark
        // yields NULL — the oracle gate itself would disagree; ADVICE r7)
        roundTo(col("r.n_users").cast("double") / nullif(col("n1"), lit(0)), 6)
          .as("conv_rate"))
      .orderBy("step")
  }

  val funnelStepsOracle: String =
    s"""WITH $funnelCteSql,
      |c AS (
      | SELECT (SELECT count(t1) FROM u1) AS n1,
      |        (SELECT count(*) FROM u2) AS n2,
      |        (SELECT count(*) FROM u3) AS n3)
      |SELECT step, n_users,
      | floor(n_users::DOUBLE / nullif(n1, 0) * 1e6 + 0.5) / 1e6 AS conv_rate
      |FROM (
      | SELECT '1_view' AS step, n1 AS n_users, n1 FROM c
      | UNION ALL SELECT '2_click', n2, n1 FROM c
      | UNION ALL SELECT '3_purchase', n3, n1 FROM c)
      |ORDER BY step""".stripMargin

  /** Conversion-time distribution over the strict funnel: exact
    * interpolated p50/p95 of the view→click and click→purchase lags (in
    * fractional hours) across converting users — the "how long does the
    * funnel take" companion to [[funnelSteps]]' "how many make it".
    * Percentile parity recipe is [[WindowsAndStats.a13Percentiles]]':
    * Spark `percentile` ≡ DuckDB `quantile_cont` (both ignore the
    * non-converting users' NULL lags). Scale: the shared one-exchange
    * [[funnelTimes]] staging plus a single global aggregate whose
    * percentile state is per-converting-user — funnel conversions, not
    * raw events, reach the reduce side.
    */
  def funnelLag(s: SparkSession, dir: String): DataFrame = {
    val t = funnelTimes(s, dir)
    val lags = t.select(
      ((unix_micros(col("t2")) - unix_micros(col("t1"))) / lit(3.6e9)).as("lag12"),
      ((unix_micros(col("t3")) - unix_micros(col("t2"))) / lit(3.6e9)).as("lag23"))
    lags.agg(
      count(col("lag12")).as("n_click_conv"),
      roundTo(expr("percentile(lag12, 0.5)"), 4).as("p50_view_click_h"),
      roundTo(expr("percentile(lag12, 0.95)"), 4).as("p95_view_click_h"),
      count(col("lag23")).as("n_purchase_conv"),
      roundTo(expr("percentile(lag23, 0.5)"), 4).as("p50_click_purchase_h"),
      roundTo(expr("percentile(lag23, 0.95)"), 4).as("p95_click_purchase_h"))
  }

  val funnelLagOracle: String =
    s"""WITH $funnelCteSql,
      |t AS (
      | SELECT u1.user_id, u1.t1, u2.t2, u3.t3
      | FROM u1 LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)),
      |l AS (
      | SELECT (epoch_us(t2) - epoch_us(t1)) / 3.6e9 AS lag12,
      |        (epoch_us(t3) - epoch_us(t2)) / 3.6e9 AS lag23
      | FROM t)
      |SELECT count(lag12) AS n_click_conv,
      | floor(quantile_cont(lag12, 0.5) * 1e4 + 0.5) / 1e4 AS p50_view_click_h,
      | floor(quantile_cont(lag12, 0.95) * 1e4 + 0.5) / 1e4 AS p95_view_click_h,
      | count(lag23) AS n_purchase_conv,
      | floor(quantile_cont(lag23, 0.5) * 1e4 + 0.5) / 1e4 AS p50_click_purchase_h,
      | floor(quantile_cont(lag23, 0.95) * 1e4 + 0.5) / 1e4 AS p95_click_purchase_h
      |FROM l""".stripMargin

  // ---------------------------------------------------------------------
  // Cohort retention
  // ---------------------------------------------------------------------

  /** Daily cohort-retention matrix over the CONVERSION event: users
    * grouped by first-purchase day, tracked by distinct-purchasing count
    * at each later day offset (the D1/D7/D30 product-analytics shape; the
    * all-events variant is degenerate on a dense fixture — every user is
    * active every bucket). Day buckets are epoch-day indices (integer
    * division of `unix_micros`) — no calendar semantics to disagree on.
    *
    * Dataflow: the event-type filter lands in the parquet scan's
    * PushedFilters, then one keyed aggregate for first-purchase, one
    * distinct over (user, day) — both shuffled on `user_id` — then a join
    * whose BOTH sides are per-user aggregates (tiny vs the stream) and a
    * final aggregate over the cohort×offset matrix, which is bounded by
    * days² regardless of corpus size. The denominator (cohort size) is a
    * window max over that matrix — offset 0 always exists because the
    * first purchase itself is activity.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val pd = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr(epochDaySpark).as("day"))
    val cohort = pd.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val active = pd.distinct()
    val matrix = active.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val w = Window.partitionBy(col("cohort_day"))
    matrix
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active"))).over(w))
      .select(col("cohort_day"), col("day_offset"),
        col("n_active"),
        roundTo(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention_rate"))
      .orderBy("cohort_day", "day_offset")
  }

  val cohortRetentionOracle: String =
    s"""WITH pd AS (
       | SELECT user_id, $epochDayDuck AS day
       | FROM events WHERE event_type = 'purchase'),
       |cohort AS (SELECT user_id, min(day) AS cohort_day FROM pd GROUP BY 1),
       |active AS (SELECT DISTINCT user_id, day FROM pd),
       |m AS (
       | SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
       |  count(DISTINCT a.user_id) AS n_active
       | FROM active a JOIN cohort c USING (user_id) GROUP BY 1, 2)
       |SELECT cohort_day, day_offset, n_active,
       | floor(n_active::DOUBLE /
       |   max(CASE WHEN day_offset = 0 THEN n_active END)
       |     OVER (PARTITION BY cohort_day) * 1e6 + 0.5) / 1e6 AS retention_rate
       |FROM m ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------------
  // SCD Type-2 intervals
  // ---------------------------------------------------------------------

  /** `valid_to` sentinel for the open (current) interval: 9999-12-31T00:00Z
    * in microseconds. A NULL-free output keeps the hash compare trivial and
    * matches how warehouse SCD2 tables are actually stored (range scans on
    * `valid_to` need a comparable value, not NULL).
    */
  private val openEndUs = 253402214400000000L

  /** Type-2 slowly-changing-dimension build: treat each user's event-type
    * sequence as attribute updates and emit one row per STATE RUN —
    * version number, state, [valid_from, valid_to) interval, is_current —
    * the standard dimension-history shape (the reference's upsert DAL,
    * `/root/reference/src/database.py:133-202`, is the type-1 overwrite
    * twin of this). Consecutive equal states collapse; `valid_to` is the
    * next change's `valid_from`, open intervals get [[openEndUs]].
    *
    * One exchange on `user_id`: the change filter is a `lag` window, the
    * version/interval columns a `row_number` + `lead` over the SAME
    * partitioning and ordering (the filter preserves both, so no second
    * shuffle; ordering ties broken by `event_id` for determinism).
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_next", lead(unix_micros(col("ts")), 1).over(w))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"),
        unix_micros(col("ts")).as("valid_from_us"),
        coalesce(col("valid_to_next"), lit(openEndUs)).as("valid_to_us"),
        when(col("valid_to_next").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy("user_id", "version")
  }

  val scd2IntervalsOracle: String =
    s"""WITH chg AS (
       | SELECT user_id, event_id, ts, event_type
       | FROM (
       |  SELECT user_id, event_id, ts, event_type,
       |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |     AS prev_type
       |  FROM events)
       | WHERE prev_type IS NULL OR prev_type <> event_type),
       |v AS (
       | SELECT user_id, event_type, ts,
       |  CAST(row_number() OVER w AS BIGINT) AS version,
       |  lead(epoch_us(ts)) OVER w AS valid_to_next
       | FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, version, event_type AS state,
       | epoch_us(ts) AS valid_from_us,
       | coalesce(valid_to_next, $openEndUs) AS valid_to_us,
       | CASE WHEN valid_to_next IS NULL THEN 1 ELSE 0 END::BIGINT AS is_current
       |FROM v ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------------
  // Point-in-time join against the SCD2 dimension
  // ---------------------------------------------------------------------

  /** Point-in-time (PIT) enrichment: each click event joined to the SCD2
    * state row valid AT its timestamp — the "what did the dimension say
    * when the fact happened" join that makes or breaks training-data
    * temporal correctness (joining facts to the CURRENT dimension row
    * leaks the future into features). Intervals are built from the
    * user's non-click events (the [[scd2Intervals]] topology); clicks
    * before any state carry 'none'.
    *
    * Scale: the textbook spelling is an inequality join
    * (`from <= ts < to`), which plans as a nested loop at any scale.
    * Half-open SCD2 intervals make PIT a BACKWARD AS-OF on interval
    * starts — per user, the last interval whose `valid_from <= ts` is
    * exactly the containing one (its `valid_to` is the next change or
    * the open end, both `> ts`; zero-length [t,t) versions lose the
    * at-t tie to the later version by construction). So the plan is the
    * union + running last_value carry: ONE exchange on user_id, O(1)
    * window state, no range join anywhere — while the DuckDB oracle runs
    * the literal inequality-join spelling, proving the equivalence.
    * Dimension rows order before same-timestamp facts (tag 0 < 1), so a
    * click at the exact change instant sees the NEW state, matching the
    * half-open semantics.
    */
  /** Shared derivation for both PIT spellings: the SCD2 change-row
    * dimension (user_id, t_us, version, state) built from non-click
    * events, and the click facts (user_id, click_id, t_us). One
    * definition so the two registered queries — which the driver proves
    * equal through a shared oracle — can never silently diverge on the
    * change-detection predicate or tie-break.
    */
  private def pitDimAndFacts(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val wd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = base.filter(col("event_type") =!= "click")
      .withColumn("prev_type", lag(col("event_type"), 1).over(wd))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(wd).cast("long"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("version"), col("event_type").as("state"))
    val facts = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("t_us"))
    (dim, facts)
  }

  def scd2PitJoin(s: SparkSession, dir: String): DataFrame = {
    val (dimBase, factsBase) = pitDimAndFacts(s, dir)
    val dim = dimBase
      .select(col("user_id"), col("t_us"), col("version"), col("state"),
        lit(0).as("tag"), lit(null).cast("long").as("click_id"))
    val facts = factsBase
      .select(col("user_id"), col("t_us"),
        lit(null).cast("long").as("version"),
        lit(null).cast("string").as("state"),
        lit(1).as("tag"), col("click_id"))
    val carry = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us"), col("tag"),
        coalesce(col("version"), lit(Long.MaxValue)),
        coalesce(col("click_id"), lit(-1L)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(facts)
      .withColumn("state_at_click", last(col("state"), ignoreNulls = true).over(carry))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("click_id"), col("t_us").as("ts_us"),
        coalesce(col("state_at_click"), lit("none")).as("state_at_click"))
      .orderBy("user_id", "click_id")
  }

  val scd2PitJoinOracle: String =
    s"""WITH chg AS (
       | SELECT user_id, event_id, ts, event_type
       | FROM (
       |  SELECT user_id, event_id, ts, event_type,
       |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |     AS prev_type
       |  FROM events WHERE event_type <> 'click')
       | WHERE prev_type IS NULL OR prev_type <> event_type),
       |v AS (
       | SELECT user_id, event_type AS state, epoch_us(ts) AS valid_from_us,
       |  coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id), $openEndUs) AS valid_to_us
       | FROM chg)
       |SELECT c.user_id, c.event_id AS click_id, epoch_us(c.ts) AS ts_us,
       | coalesce(i.state, 'none') AS state_at_click
       |FROM (SELECT * FROM events WHERE event_type = 'click') c
       |LEFT JOIN v i ON i.user_id = c.user_id
       | AND i.valid_from_us <= epoch_us(c.ts)
       | AND epoch_us(c.ts) < i.valid_to_us
       |ORDER BY c.user_id, click_id""".stripMargin

  /** [[scd2PitJoin]] through the native [[graft.plans.AsofJoinExec]] —
    * the same PIT semantics as one custom-operator call instead of the
    * union-carry composition, sharing the SAME DuckDB inequality-join
    * oracle. This is the reuse claim for the custom node: backward as-of
    * with inclusive boundary and greatest-tie-break-wins IS point-in-time
    * lookup against half-open SCD2 intervals (a same-instant click sees
    * the newest version at that instant, zero-length [t,t) versions lose
    * the tie by construction).
    *
    * Scale: two co-partitioned exchanges + per-side sorts (SMJ topology,
    * AQE-managed) instead of the carry's union+window — each side sorts
    * its own stream, preferable when the fact stream dwarfs the dimension.
    */
  def scd2PitJoinNative(s: SparkSession, dir: String): DataFrame = {
    val (dim, factsBase) = pitDimAndFacts(s, dir)
    val facts = factsBase.select(col("user_id"), col("click_id"), col("t_us"))
    AsofOps.asofJoinNative(facts, dim, "user_id", "t_us", "t_us", "version")
      .toDF("user_id", "click_id", "ts_us", "d_user_id", "d_t_us", "version", "state")
      .select(col("user_id"), col("click_id"), col("ts_us"),
        coalesce(col("state"), lit("none")).as("state_at_click"))
      .orderBy("user_id", "click_id")
  }

  // ---------------------------------------------------------------------
  // Time-series gap-fill / resample
  // ---------------------------------------------------------------------

  /** Per-user daily resample with forward-fill: aggregate the stream to
    * (user, day) once, build each user's complete day grid between their
    * first and last active day, and carry the last observed daily value
    * across gaps — the regularization step before any fixed-step
    * time-series model. The grid `explode` is output-proportional (one row
    * per emitted day) and the forward-fill is a `last(ignoreNulls)` running
    * window over the `user_id` partitioning the daily aggregate already
    * has. Day buckets are epoch-day integers, as in [[cohortRetention]].
    */
  def tsGapfill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("user_id"),
        expr(epochDaySpark).as("day"), col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        roundTo(sum(col("value")), 2).as("day_value"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_events").isNull, 1L).otherwise(0L).as("is_gap"),
        last(col("day_value"), ignoreNulls = true).over(w).as("ff_value"))
      .orderBy("user_id", "day")
  }

  val tsGapfillOracle: String =
    s"""WITH daily AS (
       | SELECT user_id, $epochDayDuck AS day,
       |  count(*) AS n_events,
       |  floor(sum(value) * 1e2 + 0.5) / 1e2 AS day_value
       | FROM events GROUP BY 1, 2),
       |span AS (
       | SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
       |grid AS (
       | SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM span)
       |SELECT g.user_id, g.day,
       | coalesce(d.n_events, 0) AS n_events,
       | CASE WHEN d.n_events IS NULL THEN 1 ELSE 0 END::BIGINT AS is_gap,
       | last_value(d.day_value IGNORE NULLS) OVER (
       |   PARTITION BY g.user_id ORDER BY g.day
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_value
       |FROM grid g LEFT JOIN daily d USING (user_id, day)
       |ORDER BY g.user_id, g.day""".stripMargin

  // ---------------------------------------------------------------------
  // Rolling active users (DAU / WAU / MAU)
  // ---------------------------------------------------------------------

  /** Trailing-window active-user counts per day — DAU, 7-day and 28-day
    * distinct actives, the engagement triple every event warehouse serves.
    * Windowed COUNT(DISTINCT) has no streaming-friendly window form, so
    * this uses the bucketize-explode shape (the [[RangeOps]] contract on
    * the time axis): each (user, active-day) PAIR — already an aggregate,
    * orders of magnitude smaller than the event stream — fans out to the
    * 28 trailing-window end-days it contributes to, and one aggregate per
    * end-day counts distinct users under each horizon (`countDistinct`
    * absorbs multi-day activity; the conditional variants null out rows
    * beyond their horizon). Fan-out is a FIXED 28× of the user-day
    * aggregate, never of the raw stream; the three distinct aggregates
    * expand 3× before the exchange, bounded the same way.
    *
    * The stream really is scanned (and distinct-shuffled) exactly ONCE:
    * the day cap — trailing windows past the last active day are partial
    * and must not be emitted — is applied AFTER the daily aggregate, as a
    * max-over-the-daily-series window (days-bounded at any corpus scale,
    * the same tiny-aggregate argument as [[tsAnomalyDays]]). The previous
    * formulation derived the cap from a second aggregate over the user-day
    * set, which re-scanned and re-shuffled the stream (ADVICE r7). The
    * last active day is exactly the last day with `n_dau > 0` (its own
    * o=0 row), so the cap needs no extra input; the ≤27 partial rows
    * beyond it are aggregated and then dropped — noise next to the grid.
    */
  def rollingActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"),
        expr(epochDaySpark).as("d"))
      .distinct()
    val w = Window.partitionBy()
    ud
      .select(col("user_id"), col("d"),
        explode(expr("sequence(0, 27)")).as("o"))
      .select(col("user_id"), (col("d") + col("o")).as("day"), col("o"))
      .groupBy(col("day"))
      .agg(
        countDistinct(when(col("o") === 0, col("user_id"))).as("n_dau"),
        countDistinct(when(col("o") <= 6, col("user_id"))).as("n_wau"),
        countDistinct(col("user_id")).as("n_mau"))
      .withColumn("d1", max(when(col("n_dau") > 0, col("day"))).over(w))
      .filter(col("day") <= col("d1"))
      .drop("d1")
      .orderBy("day")
  }

  val rollingActiveUsersOracle: String =
    s"""WITH ud AS (
       | SELECT DISTINCT user_id, $epochDayDuck AS d FROM events),
       |mx AS (SELECT max(d) AS d1 FROM ud),
       |x AS (
       | SELECT user_id, d + o AS day, o
       | FROM ud, unnest(generate_series(0, 27)) AS t(o))
       |SELECT day,
       | count(DISTINCT CASE WHEN o = 0 THEN user_id END) AS n_dau,
       | count(DISTINCT CASE WHEN o <= 6 THEN user_id END) AS n_wau,
       | count(DISTINCT user_id) AS n_mau
       |FROM x, mx WHERE day <= d1
       |GROUP BY day ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // Daily percentile bands + anomaly days
  // ---------------------------------------------------------------------

  /** Daily metric bands: per epoch-day count, exact p50/p95 and max of the
    * event value — the latency/size-band monitoring query every ops
    * dashboard serves. One keyed aggregate; the exact percentiles are the
    * oracle-checked baseline (at 100 TB the `approx_percentile` sketch is
    * the default, as with [[graft.operators.WindowsAndStats]] A13's two
    * tiers). 4dp rounding: percentile interpolation between 2-decimal
    * values can land exactly on a half at 2dp.
    */
  def valueBandsDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(expr(epochDaySpark).as("day"), col("value"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        roundTo(expr("percentile(value, 0.5)"), 4).as("p50_value"),
        roundTo(expr("percentile(value, 0.95)"), 4).as("p95_value"),
        roundTo(max(col("value")), 2).as("max_value"))
      .orderBy("day")

  val valueBandsDailyOracle: String =
    s"""SELECT $epochDayDuck AS day, count(*) AS n_events,
       | floor(quantile_cont(value, 0.5) * 1e4 + 0.5) / 1e4 AS p50_value,
       | floor(quantile_cont(value, 0.95) * 1e4 + 0.5) / 1e4 AS p95_value,
       | floor(max(value) * 1e2 + 0.5) / 1e2 AS max_value
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** Anomalous-volume days: flag days whose total value deviates more
    * than 2 sample standard deviations from the series mean — the
    * monitoring alarm over the daily aggregate. The z-score statistics
    * are an unpartitioned window over the DAILY series (days-bounded at
    * any corpus scale — the same tiny-aggregate argument as
    * [[cohortRetention]]'s matrix), never over the raw stream; the
    * stream itself is touched by exactly one keyed aggregate.
    */
  def tsAnomalyDays(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(expr(epochDaySpark).as("day"), col("value"))
      .groupBy(col("day"))
      .agg(sum(col("value")).as("day_total"))
    val w = Window.partitionBy()
    daily
      .withColumn("mu", avg(col("day_total")).over(w))
      .withColumn("sigma", stddev_samp(col("day_total")).over(w))
      .withColumn("z", (col("day_total") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) > 2.0)
      .select(col("day"), roundTo(col("day_total"), 2).as("day_total"),
        roundTo(col("z"), 4).as("z_score"),
        when(col("z") > 0, lit("high")).otherwise(lit("low")).as("direction"))
      .orderBy("day")
  }

  val tsAnomalyDaysOracle: String =
    s"""WITH daily AS (
       | SELECT $epochDayDuck AS day, sum(value) AS day_total
       | FROM events GROUP BY 1),
       |scored AS (
       | SELECT day, day_total,
       |  (day_total - avg(day_total) OVER ()) / stddev_samp(day_total) OVER () AS z
       | FROM daily)
       |SELECT day, floor(day_total * 1e2 + 0.5) / 1e2 AS day_total,
       | floor(z * 1e4 + 0.5) / 1e4 AS z_score,
       | CASE WHEN z > 0 THEN 'high' ELSE 'low' END AS direction
       |FROM scored WHERE abs(z) > 2.0 ORDER BY day""".stripMargin

  /** First-order Markov transition census over each user's event stream:
    * for every (from → to) event-type pair, how often does it occur, and
    * what share of the outgoing transitions from `from` does it carry?
    * The session-flow / behavioral-model primitive (and, on token
    * streams, exactly the bigram LM estimation step [[LexiconOps.lmScore]]
    * applies).
    *
    * Ordering inside a user's stream is (ts, event_id) — the event_id
    * tiebreak makes `lead` deterministic under same-timestamp bursts on
    * both engines. Scale: one shuffle keyed by user (the per-user window
    * sort is bounded by a user's history, never global), then a keyed
    * census whose cardinality is |event types|² — the row-probability
    * window runs on that tiny table.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    tr.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_next",
        roundTo(col("n_trans") / sum(col("n_trans")).over(Window.partitionBy(col("from_type"))), 6))
      .orderBy("from_type", "to_type")
  }

  val eventTransitionsOracle: String =
    """WITH tr AS (
      | SELECT event_type AS from_type,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      | FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n_trans
      |      FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_trans,
      | floor((n_trans / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT))
      |   * 1e6 + 0.5) / 1e6 AS p_next
      |FROM c ORDER BY from_type, to_type""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("funnel_steps", funnelSteps, Some(funnelStepsOracle)),
    RegisteredQuery("event_transitions", eventTransitions, Some(eventTransitionsOracle)),
    RegisteredQuery("funnel_lag", funnelLag, Some(funnelLagOracle)),
    RegisteredQuery("cohort_retention", cohortRetention, Some(cohortRetentionOracle)),
    RegisteredQuery("scd2_intervals", scd2Intervals, Some(scd2IntervalsOracle)),
    RegisteredQuery("scd2_pit_join", scd2PitJoin, Some(scd2PitJoinOracle)),
    // same oracle as the union-carry spelling: the custom as-of node IS
    // point-in-time lookup, proven independently by the driver
    RegisteredQuery("scd2_pit_join_native", scd2PitJoinNative, Some(scd2PitJoinOracle)),
    RegisteredQuery("ts_gapfill", tsGapfill, Some(tsGapfillOracle)),
    RegisteredQuery("rolling_active_users", rollingActiveUsers,
      Some(rollingActiveUsersOracle)),
    RegisteredQuery("value_bands_daily", valueBandsDaily, Some(valueBandsDailyOracle)),
    RegisteredQuery("ts_anomaly_days", tsAnomalyDays, Some(tsAnomalyDaysOracle)),
  )
}
