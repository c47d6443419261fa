package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Scalars._

/** Skew-mitigation operators: salted join and two-phase (salted) aggregation.
  *
  * The 100 TB story: a handful of hot keys (the one mega-customer, the empty
  * string, the null-ish sentinel) can put an entire shuffle partition on one
  * executor while the other 999 idle. The mitigation ladder is:
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  *     [[graft.engine.Sessions]]) — handles sort-merge-join skew at runtime
  *     with no code change ([[graft.SkewJoinAqeSpec]] proves it engages);
  *  2. salting, when AQE can't help: a skewed AGGREGATION (partial state is
  *     per-partition, but one final-agg key still lands on one task), or a
  *     skewed shuffled hash join, or a build side AQE won't split.
  *
  * Both renditions here produce EXACTLY the plain operator's result (the
  * oracle is the unsalted SQL), so salting is a drop-in plan rewrite, not a
  * semantic change.
  *
  * Salt discipline: the salt must be a DETERMINISTIC function of row
  * identity (here `xxhash64` of the row key, not `rand()`): re-runs and
  * retried tasks salt identically, so the operators stay idempotent and
  * spec-able. In production the replication factor tracks the observed hot
  * keys (salt only those; broadcast the hot-key list); these renditions
  * salt uniformly, the worst case for overhead, and still plan as two
  * codegen'd hash aggregates / one shuffled join.
  */
object SkewOps extends QueryModule {

  val saltFactor = 8

  /** J4: salted large×large join — lineitem⨝orders on the order key with
    * the fact side salted `xxhash64(orderkey, linenumber) % 8` and the
    * dimension side replicated ×8 (explode over the salt domain), joined on
    * (key, salt). A hot order key's rows now spread across 8 shuffle
    * partitions instead of 1. Broadcast is disabled for the replicated side
    * so the shuffled-join shape under test is the one that actually plans
    * (at real scale orders wouldn't broadcast anyway).
    */
  def saltedJoin(s: SparkSession, dir: String): DataFrame =
    saltedJoinWith(s, dir, saltFactor)

  private def saltedJoinWith(s: SparkSession, dir: String, factor: Int): DataFrame = {
    val salts = (0 until factor).map(lit(_))
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(factor)).as("salt"))
    val dim = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(array(salts: _*)))
      .hint("shuffle_hash") // pin the non-broadcast shape the pattern targets
    fact.join(dim, fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        roundTo(sum(col("l_extendedprice")), 2).as("total_price"))
      .orderBy("o_orderpriority")
  }

  /** The skew ladder composed end-to-end (VERDICT r12 #7): the salted
    * join's replication factor comes from [[skewProfile]]'s
    * recommendation instead of a hardcoded constant — the pipeline a real
    * user runs: profile the key distribution, then configure the
    * mitigation from the measurement. The factor is a ONE-ROW driver
    * fetch (index metadata, like the ANN centroid reads — at 100 TB the
    * profile runs once per table/day, its single-row output broadcast
    * into every downstream job config). The emitted `salt_factor` column
    * makes the wiring part of the gate: the oracle recomputes the
    * recommendation from the same histogram arithmetic, so a guided join
    * that silently fell back to a default factor fails the compare, and
    * the aggregate result must STILL equal the plain unsalted join —
    * salting at the profiled factor remains a pure plan rewrite.
    */
  def skewGuidedJoin(s: SparkSession, dir: String): DataFrame = {
    val rec = skewProfile(s, dir).select(col("salt_factor")).head().getLong(0)
    val factor = math.max(1L, rec).toInt
    saltedJoinWith(s, dir, factor)
      .withColumn("salt_factor", lit(factor.toLong))
  }

  val skewGuidedJoinOracle: String =
    """WITH c AS (SELECT l_orderkey, count(*) AS freq FROM lineitem GROUP BY 1),
      |h AS (SELECT freq, count(*) AS nk FROM c GROUP BY 1),
      |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n_keys, max(freq) AS max_freq FROM h),
      |cum AS (SELECT freq, sum(nk) OVER (ORDER BY freq) AS ck FROM h),
      |p99 AS (SELECT min(freq) AS p99_freq FROM cum, tot
      |        WHERE ck >= CAST(floor((n_keys - 1) * CAST(0.99 AS DOUBLE)) AS BIGINT) + 1),
      |rec AS (SELECT greatest(1, (max_freq + p99_freq - 1) // p99_freq) AS salt_factor
      |        FROM tot, p99)
      |SELECT o_orderpriority, count(*) AS n_items,
      | floor(sum(l_extendedprice) * 1e2 + 0.5) / 1e2 AS total_price,
      | salt_factor
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey, rec
      |GROUP BY 1, 4 ORDER BY o_orderpriority""".stripMargin

  val saltedJoinOracle: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      | floor(sum(l_extendedprice) * 1e2 + 0.5) / 1e2 AS total_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** A17: two-phase salted aggregation — partial aggregate on
    * (key, salt), final aggregate on key. Count and sum re-aggregate
    * losslessly (sum-of-counts, sum-of-sums), so the result is the plain
    * groupBy's. At scale this is the fix when ONE group key dominates the
    * final aggregate (map-side partials already spread the pre-shuffle
    * work, but every partial for the hot key still meets on one reducer —
    * the salt splits that reducer ×8, and the second aggregate only sees
    * 8 rows per key).
    */
  def saltedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("value"),
        pmod(xxhash64(col("event_id")), lit(saltFactor)).as("salt"))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"), roundTo(sum(col("pv")), 2).as("total_value"))
      .orderBy("user_id")

  val saltedAggOracle: String =
    """SELECT user_id, count(*) AS n_events,
      | floor(sum(value) * 1e2 + 0.5) / 1e2 AS total_value
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Skew DETECTION — the profiler a user runs BEFORE configuring the
    * mitigation ladder above: the join-key frequency distribution of
    * lineitem's l_orderkey (the key [[saltedJoin]] salts), summarized as
    * exact quantiles plus the salt factor the max/p99 ratio recommends.
    *
    * Scale shape: per-key counts are one keyed shuffle; everything after
    * runs on the FREQUENCY-OF-FREQUENCIES histogram — a table bounded by
    * the maximum key multiplicity (tens of rows at any corpus size), so
    * the exact p50/p99 of the frequency distribution come from a
    * cumulative sum over that tiny histogram, never a sort of the key
    * domain (billions of keys at 100 TB). The selection rule is the
    * [[ProfilingOps.bottomkQuantileSketch]] rank convention; all
    * arithmetic is exact integer (ceil-div for the salt), so the oracle
    * recomputes every cell.
    */
  def skewProfile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("freq"))
      .groupBy(col("freq")).agg(count(lit(1)).as("nk"))
    val tot = h.agg(sum(col("nk")).as("n_keys"),
      sum(col("freq") * col("nk")).as("total_rows"),
      max(col("freq")).as("max_freq"))
    val cum = h.withColumn("ck",
      sum(col("nk")).over(Window.orderBy(col("freq"))))
    def rankOf(p: Double) =
      floor((col("n_keys") - 1) * p).cast("long") + 1
    def quantile(p: Double, out: String): DataFrame =
      cum.crossJoin(broadcast(tot))
        .filter(col("ck") >= rankOf(p))
        .agg(min(col("freq")).as(out))
    tot.crossJoin(broadcast(quantile(0.5, "p50_freq")))
      .crossJoin(broadcast(quantile(0.99, "p99_freq")))
      .select(col("n_keys"), col("total_rows"), col("max_freq"),
        col("p50_freq"), col("p99_freq"),
        expr("max_freq * 10000L div total_rows").as("top1_share_bp"),
        expr("(max_freq + p99_freq - 1) div p99_freq").as("salt_factor"))
  }

  val skewProfileOracle: String =
    """WITH c AS (SELECT l_orderkey, count(*) AS freq FROM lineitem GROUP BY 1),
      |h AS (SELECT freq, count(*) AS nk FROM c GROUP BY 1),
      |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n_keys,
      |        CAST(sum(freq * nk) AS BIGINT) AS total_rows,
      |        max(freq) AS max_freq FROM h),
      |cum AS (SELECT freq, sum(nk) OVER (ORDER BY freq) AS ck FROM h),
      |p50 AS (SELECT min(freq) AS p50_freq FROM cum, tot
      |        WHERE ck >= CAST(floor((n_keys - 1) * CAST(0.5 AS DOUBLE)) AS BIGINT) + 1),
      |p99 AS (SELECT min(freq) AS p99_freq FROM cum, tot
      |        WHERE ck >= CAST(floor((n_keys - 1) * CAST(0.99 AS DOUBLE)) AS BIGINT) + 1)
      |SELECT n_keys, total_rows, max_freq, p50_freq, p99_freq,
      | max_freq * 10000 // total_rows AS top1_share_bp,
      | (max_freq + p99_freq - 1) // p99_freq AS salt_factor
      |FROM tot, p50, p99""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("j4_salted_join", saltedJoin, Some(saltedJoinOracle)),
    RegisteredQuery("a17_salted_agg", saltedAgg, Some(saltedAggOracle)),
    RegisteredQuery("skew_profile", skewProfile, Some(skewProfileOracle)),
    RegisteredQuery("skew_guided_join", skewGuidedJoin, Some(skewGuidedJoinOracle)),
  )
}
