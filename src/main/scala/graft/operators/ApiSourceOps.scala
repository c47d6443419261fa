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
    val store = "dsv2_rt"
    feed.write.format("graft.sources.GraftStore")
      .option("store", store).mode("overwrite").save()
    s.read.format("graft.sources.GraftStore").option("store", store).load()
      .orderBy("event_id")
  }

  val dsv2WriteOracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us,
      | floor(value * 1e2 + 0.5) / 1e2 AS value
      |FROM events ORDER BY event_id""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("api_source_scan", apiSourceScan, Some(apiSourceOracle)),
    RegisteredQuery("api_source_agg", apiSourceAgg, Some(apiSourceAggOracle)),
    RegisteredQuery("dsv2_write_roundtrip", dsv2WriteRoundtrip, Some(dsv2WriteOracle)),
  )
}
