package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gate for the DSv2 paginated-API connector
  * ([[graft.sources.LaunchApiSource]]): the synthetic generator is
  * deterministic, so DuckDB reproduces the exact table from `range()` —
  * the connector's planning, pushdown and row materialization are then
  * held to the same rows+schema+hash standard as every file-backed
  * operator. The scan itself takes the S3 shape (watermark predicate →
  * pushed to the source, which skips whole pages at plan time).
  */
object ApiSourceOps extends QueryModule {

  def apiSourceScan(s: SparkSession, dir: String): DataFrame = {
    // watermark at synthetic row 200: pages fully below it are never planned
    val wm = new java.sql.Timestamp(graft.sources.LaunchApiSource.dateAt(200) / 1000)
    s.read.format("graft.sources.LaunchApiSource")
      .option("rows", 1000).option("pageSize", 100).load()
      .filter(col("date_utc") >= lit(wm))
      .select(col("launch_id"), col("mission_name"),
        unix_micros(col("date_utc")).as("date_us"),
        col("success").cast("long").as("success"), col("payload_mass_kg"))
      .orderBy("launch_id")
  }

  val apiSourceOracle: String =
    """SELECT printf('launch_%08d', i) AS launch_id,
      | 'Mission ' || CAST(i % 97 AS VARCHAR) AS mission_name,
      | 1420070400000000 + i * 21600000000 AS date_us,
      | CAST(CASE WHEN i % 11 = 0 THEN NULL ELSE i % 5 != 0 END AS BIGINT) AS success,
      | CASE WHEN i % 7 = 0 THEN NULL ELSE (i % 22801) * CAST(0.7 AS DOUBLE) END AS payload_mass_kg
      |FROM range(0, 1000) t(i)
      |WHERE i >= 200
      |ORDER BY launch_id""".stripMargin

  /** The connector's aggregate-pushdown path (`SupportsPushDownAggregates`):
    * global count/min/max over the watermarked launch stream answered by
    * the source in closed form — ZERO data rows materialized (the real
    * API's server-side count endpoint). The DuckDB twin recomputes the
    * same aggregates from `range()`; `LaunchApiSourceSpec` pins the
    * zero-materialization observable and the no-aggregate-exec plan.
    */
  def apiSourceAgg(s: SparkSession, dir: String): DataFrame = {
    val wm = new java.sql.Timestamp(graft.sources.LaunchApiSource.dateAt(200) / 1000)
    s.read.format("graft.sources.LaunchApiSource")
      .option("rows", 1000).option("pageSize", 100).load()
      .filter(col("date_utc") >= lit(wm))
      .agg(count(lit(1)).as("n_launches"),
        unix_micros(min(col("date_utc"))).as("min_date_us"),
        unix_micros(max(col("date_utc"))).as("max_date_us"))
  }

  val apiSourceAggOracle: String =
    """SELECT count(*) AS n_launches,
      | min(1420070400000000 + i * 21600000000) AS min_date_us,
      | max(1420070400000000 + i * 21600000000) AS max_date_us
      |FROM range(0, 1000) t(i)
      |WHERE i >= 200""".stripMargin

  /** Store names key on (applicationId, fixture dir) — a fixed global
    * name lets two sessions/fixtures in one JVM clobber each other
    * between the eager write and the LAZY read-back (ADVICE r11). Two
    * eviction scopes at write time (ADVICE r12 — the old tag-wide
    * `dropExcept` could evict a CONCURRENT session's live store):
    * same-application stale keys (other/rewritten fixture dirs) are
    * evicted except this one, and dead-application keys are reaped by
    * appId mismatch — sound because a JVM runs at most ONE SparkContext
    * at a time, so every live SparkSession shares the current
    * applicationId and any other embedded appId belongs to a stopped
    * context whose lazy readers are already dead.
    */
  private def rtStore(s: SparkSession, dir: String, tag: String): String = {
    val appScope = s"${tag}_${s.sparkContext.applicationId}_"
    val name = s"$appScope${dir.replaceAll("[^A-Za-z0-9]", "_")}"
    graft.sources.GraftStore.dropExcept(appScope, name)
    graft.sources.GraftStore.dropMatching(k =>
      k.startsWith(s"${tag}_") && !k.startsWith(appScope))
    name
  }

  /** The DSv2 WRITE half under the driver gate
    * ([[graft.sources.GraftStore]]): push the validated events feed
    * through the V2 two-phase-commit write path (task buffers → commit
    * messages → one atomic driver publish), then read it back THROUGH
    * THE CONNECTOR and emit every row. The oracle reads the same feed
    * straight from parquet — green only if the write/read round-trip is
    * row- and value-exact (schema fidelity, partition completeness, no
    * duplicate task commits). `mode("overwrite")` exercises the
    * SupportsTruncate path, and makes reruns (Bench's min-of-2,
    * repeated Verify) idempotent.
    *
    * Scale note: the protocol is the gate here; the in-JVM registry
    * stands in for staged files + a table-format commit log (see
    * GraftStore's scaladoc). The abort-path atomicity (a poisoned
    * partition publishes NOTHING) is spec-proven in SourceFormatsSpec.
    */
  def dsv2WriteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val feed = graft.engine.Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        graft.functions.Scalars.roundTo(col("value"), 2).as("value"))
    val store = rtStore(s, dir, "dsv2_rt")
    feed.write.format("graft.sources.GraftStore")
      .option("store", store).mode("overwrite").save()
    s.read.format("graft.sources.GraftStore").option("store", store).load()
      .orderBy("event_id")
  }

  val dsv2WriteOracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us,
      | floor(value * 1e2 + 0.5) / 1e2 AS value
      |FROM events ORDER BY event_id""".stripMargin

  /** The TRUNCATE semantics of the DSv2 sink under the driver gate
    * (VERDICT r11 #6 — `SupportsTruncate` was spec-covered but had no
    * registered query): write the FULL events feed, then `mode
    * ("overwrite")` it with only the `event_id % 3 = 0` slice, and read
    * the store back. The oracle is the slice ALONE — green only if the
    * truncate-publish actually discarded the first commit's rows (a sink
    * that degraded overwrite to append returns ~3× the rows and fails
    * the row count before the hash). This is the observable that
    * distinguishes the truncate path from [[dsv2WriteRoundtrip]]'s
    * idempotent single-write overwrite.
    */
  def dsv2OverwriteTruncate(s: SparkSession, dir: String): DataFrame = {
    val feed = graft.engine.Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        graft.functions.Scalars.roundTo(col("value"), 2).as("value"))
    val store = rtStore(s, dir, "dsv2_tr")
    feed.write.format("graft.sources.GraftStore")
      .option("store", store).mode("overwrite").save()
    feed.filter(col("event_id") % 3 === 0)
      .write.format("graft.sources.GraftStore")
      .option("store", store).mode("overwrite").save()
    s.read.format("graft.sources.GraftStore").option("store", store).load()
      .orderBy("event_id")
  }

  val dsv2TruncateOracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us,
      | floor(value * 1e2 + 0.5) / 1e2 AS value
      |FROM events WHERE event_id % 3 = 0 ORDER BY event_id""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("api_source_scan", apiSourceScan, Some(apiSourceOracle)),
    RegisteredQuery("api_source_agg", apiSourceAgg, Some(apiSourceAggOracle)),
    RegisteredQuery("dsv2_write_roundtrip", dsv2WriteRoundtrip, Some(dsv2WriteOracle)),
    RegisteredQuery("dsv2_overwrite_truncate", dsv2OverwriteTruncate, Some(dsv2TruncateOracle)),
  )
}
