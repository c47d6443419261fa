package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MergeOps

/** The reference's E1 control loop (run_incremental_ingestion,
  * src/ingest.py:32-128) as one linear Spark driver program:
  *
  *   watermark read → change detection (early exit) → incremental filter →
  *   validate (drop+count) → merge-by-key into the launches table →
  *   state append → snapshot append (E2 as ONE aggregate pass)
  *
  * State layout (all parquet under one root):
  *   launches/v=<runId>/   — versioned table snapshots: each run writes a NEW
  *                           version instead of overwriting in place (no
  *                           read-write conflict on the same path; the
  *                           production analog is a transactional table
  *                           format). Latest version wins.
  *   ingestion_state/      — append-only high-water-mark rows
  *                           (sql/init.sql:15-21 analog).
  *   snapshots/            — append-only aggregate snapshot rows
  *                           (launch_aggregations analog, sql/init.sql:23-42).
  *
  * Scale notes: the only wide operations are the merge (one shuffle on the
  * key) and the snapshot aggregate (map-side partial + tiny final). The
  * early-exit probe is a MAX over the source's watermark column — answered
  * from parquet footer statistics WHEN the caller passes a raw-column
  * source (`Tables.eventsSince` exists for exactly that); over a
  * derived/converted ts column (e.g. `Tables.events`' nanos→micros
  * rewrite) it degrades to a narrow single-column scan — still the moral
  * equivalent of the reference's 1-API-call change detection (~0.5s
  * no-new-data path, README.md:263-267), just not footer-free.
  */
object IncrementalPipeline {

  final case class RunResult(
      status: String,             // "initial_load" | "success" | "no_new_data"
      newFound: Long,
      dropped: Long,
      inserted: Long,             // genuinely-new keys (updates excluded, S7)
      totalAfter: Long,
      watermark: Option[Timestamp])

  /** Local-path view of a possibly `file:`-prefixed path — EVERY java.io
    * access of a Spark-visible path must go through this: Store's
    * latestVersion previously used the raw string, so a `file:` URI root
    * made every run look like an initial load (watermark still advanced
    * via the Spark-read state dir) and silently clobbered history
    * (review r8); the streaming source's directory-layout check had the
    * same blind spot (ADVICE r8). Shared so both use one spelling.
    */
  private[graft] def localFile(p: String): java.io.File =
    new java.io.File(p.stripPrefix("file:"))

  final class Store(val spark: SparkSession, val root: String) {
    val launchesRoot = s"$root/launches"
    val stateDir     = s"$root/ingestion_state"
    val snapshotsDir = s"$root/snapshots"

    private def localFile(p: String): java.io.File =
      IncrementalPipeline.localFile(p)

    private def exists(p: String): Boolean = localFile(p).exists()

    def latestVersion: Option[Long] = {
      val d = localFile(launchesRoot)
      if (!d.exists()) None
      else d.listFiles().filter(_.getName.startsWith("v="))
        .map(_.getName.stripPrefix("v=").toLong).sorted.lastOption
    }

    def launches: Option[DataFrame] =
      latestVersion.map(v => spark.read.parquet(s"$launchesRoot/v=$v"))

    def writeLaunches(df: DataFrame, runId: Long): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$launchesRoot/v=$runId")

    /** High-water mark: latest state row, epoch default when absent
      * (src/database.py:83-87). */
    def watermark: Timestamp =
      if (!exists(stateDir)) new Timestamp(0L)
      else spark.read.parquet(stateDir)
        .orderBy(col("updated_at").desc, col("last_fetched_ts").desc)
        .limit(1).collect()
        .headOption.map(_.getTimestamp(0)).getOrElse(new Timestamp(0L))

    /** State rows carry the reference's run identifier
      * (`pipeline_<ts>_<hex8>`, src/aggregations.py:51-52) — observability
      * metadata only; readers key on the timestamps.
      */
    def appendState(lastFetched: Timestamp, runId: Long): Unit = {
      import spark.implicits._
      Seq((lastFetched, new Timestamp(runId)))
        .toDF("last_fetched_ts", "updated_at")
        .withColumn("run_label",
          graft.functions.Scalars.runLabel(org.apache.spark.sql.functions.col("updated_at")))
        .write.mode(SaveMode.Append).parquet(stateDir)
    }

    def appendSnapshot(row: DataFrame): Unit =
      row.write.mode(SaveMode.Append).parquet(snapshotsDir)

    def snapshots: DataFrame = spark.read.parquet(snapshotsDir)
  }

  /** Validation predicate — P2 semantics on the events feed: key + event
    * time must be present, value non-negative when present.
    */
  def isValid = col("event_id").isNotNull && col("ts").isNotNull &&
    (col("value").isNull || col("value") >= 0)

  /** Fail-open source read (src/ingest.py:260-264: the paginated fetch
    * falls back to a full scan + client filter on error; change-detection
    * errors assume new data, src/database.py:268-271). `primary` is
    * evaluated eagerly so read-time failures (missing path, bad schema)
    * trip the fallback instead of surfacing later mid-plan.
    */
  def withFallback(primary: => DataFrame)(fallback: => DataFrame): DataFrame =
    try {
      val df = primary
      df.queryExecution.analyzed // force analysis
      df
    } catch { case _: Exception => fallback }

  /** One micro-batch run. `runId` is the logical clock (tests pass
    * deterministic values; production passes epoch millis).
    */
  def run(store: Store, source: DataFrame, runId: Long): RunResult = {
    val spark = store.spark
    val wm = store.watermark
    val isInitial = store.latestVersion.isEmpty

    // Change detection / early exit: one MAX probe (src/ingest.py:211-233
    // analog; footer-stat-answerable when the caller's source exposes the
    // RAW parquet column — Tables.eventsSince exists for exactly that; a
    // derived/converted ts column costs a narrow column scan instead).
    // Strictness contract, mirroring the reference's newer-than check: a
    // source max EQUAL to the watermark reads as no-new-data, i.e. rows
    // at the boundary are assumed re-deliveries of the batch that SET the
    // watermark. A writer adding a genuinely-new row at-or-before the
    // current watermark violates the feed contract (the `>=` refetch
    // below only shields boundary ties when newer data arrives with them).
    val sourceMax = source.agg(max(col("ts"))).collect().head.getTimestamp(0)
    if (!isInitial && (sourceMax == null || !sourceMax.after(wm)))
      return RunResult("no_new_data", 0, 0, 0,
        store.launches.map(_.count()).getOrElse(0L), Some(wm))

    // Incremental fetch past the watermark: `>=` + idempotent merge (the
    // reference's server path, src/api.py:115 — SURVEY.md §7.4-4).
    val incoming = if (isInitial) source else source.filter(col("ts") >= lit(wm))
    // batch metrics in ONE aggregate pass (found, valid, valid max) — the
    // three separate actions re-scanned the source three times (review r8)
    val batch = incoming.filter(isValid)
    val stats = incoming.agg(
        count(lit(1)).as("found"),
        count(when(isValid, 1)).as("valid"),
        max(when(isValid, col("ts"))).as("bmax"))
      .collect().head
    val newFound = stats.getLong(0)
    val valid = stats.getLong(1)
    val batchMax = stats.getTimestamp(2)

    val (merged, inserted) = store.launches match {
      case Some(existing) =>
        val m = MergeOps.mergeByKey(existing, batch, "event_id", "ts")
        val ins = MergeOps.newKeyCount(existing, batch, "event_id")
          .collect().head.getLong(0)
        (m, ins)
      case None =>
        // the initial load must dedup by key exactly like every later
        // merge (the reference's PK upsert always does) and report
        // `inserted` as a KEY count, not a row count — an at-least-once
        // feed re-delivering a key in batch 1 previously persisted both
        // rows (review r8); limit(0) supplies the empty existing side
        (MergeOps.mergeByKey(batch.limit(0), batch, "event_id", "ts"),
          batch.select("event_id").distinct().count())
    }
    store.writeLaunches(merged, runId)
    val table = spark.read.parquet(s"${store.launchesRoot}/v=$runId")
    val total = table.count()

    // Watermark advance to batch max (src/ingest.py:389-409).
    val newWm = if (batchMax != null) batchMax else wm
    store.appendState(newWm, runId)

    // E2: the eight snapshot metrics in ONE aggregate pass + append
    // (vs the reference's 4-5 Postgres round-trips, SURVEY.md §3-E2).
    val snapshot = table.agg(
        count(lit(1)).as("total_events"),
        count(when(col("event_type") === "purchase", 1)).as("total_purchases"),
        count(when(col("event_type") === "error", 1)).as("total_errors"),
        min(col("ts")).as("earliest_ts"),
        max(col("ts")).as("latest_ts"),
        countDistinct(col("user_id")).as("total_users"),
        sum(col("value")).as("total_value"))
      .withColumn("snapshot_type", lit(if (isInitial) "initial" else "incremental"))
      .withColumn("events_added_in_batch", lit(valid).cast("long"))
      .withColumn("pipeline_run_id", lit(runId))
    store.appendSnapshot(snapshot)

    RunResult(if (isInitial) "initial_load" else "success",
      newFound, newFound - valid, inserted, total, Some(newWm))
  }
}
