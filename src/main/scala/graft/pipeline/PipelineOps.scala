package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{MergeOps, QueryModule, RegisteredQuery}

/** Oracle-checkable rendition of one E1 pipeline run (the observability
  * dict the reference returns, src/ingest.py:108-118) as a pure dataflow:
  * the `events` feed split at a fixed watermark into "already ingested"
  * and "incoming", then validate → merge → metrics, with no writes so the
  * driver can hash-compare the result. The side-effecting twin
  * ([[IncrementalPipeline.run]]) is exercised by the ScalaTest suite.
  */
object PipelineOps extends QueryModule {

  val watermark = "2024-01-20 00:00:00"

  def pipelineMetrics(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("value"))
    val wm = to_timestamp(lit(watermark))
    val existing = ev.filter(col("ts") < wm)
    val incoming = ev.filter(col("ts") >= wm)
    val valid    = incoming.filter(IncrementalPipeline.isValid)
    val merged   = MergeOps.mergeByKey(existing, valid, "event_id", "ts")

    val mIncoming = incoming.agg(count(lit(1)).as("new_events_found"))
    val mValid = valid.agg(
      count(lit(1)).as("valid_events"),
      max(unix_micros(col("ts"))).as("batch_watermark_us"))
    val mMerged = merged.agg(count(lit(1)).as("total_after"))
    val mNewKeys = MergeOps.newKeyCount(existing, valid, "event_id")

    mIncoming.crossJoin(mValid).crossJoin(mMerged).crossJoin(mNewKeys)
      .withColumn("dropped_events", col("new_events_found") - col("valid_events"))
      .select("new_events_found", "valid_events", "dropped_events", "new_keys",
        "total_after", "batch_watermark_us")
  }

  val pipelineMetricsOracle: String =
    s"""WITH incoming AS (SELECT * FROM events WHERE ts >= TIMESTAMP '$watermark'),
       |valid AS (SELECT * FROM incoming
       |          WHERE event_id IS NOT NULL AND ts IS NOT NULL
       |           AND (value IS NULL OR value >= 0)),
       |existing AS (SELECT * FROM events WHERE ts < TIMESTAMP '$watermark')
       |SELECT
       | (SELECT count(*) FROM incoming) AS new_events_found,
       | (SELECT count(*) FROM valid) AS valid_events,
       | (SELECT count(*) FROM incoming) - (SELECT count(*) FROM valid) AS dropped_events,
       | (SELECT count(*) FROM (SELECT DISTINCT event_id FROM valid)
       |   WHERE event_id NOT IN (SELECT event_id FROM existing)) AS new_keys,
       | (SELECT count(DISTINCT event_id) FROM
       |   (SELECT event_id FROM existing UNION ALL SELECT event_id FROM valid)) AS total_after,
       | (SELECT epoch_us(max(ts)) FROM valid) AS batch_watermark_us""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("pipeline_metrics", pipelineMetrics, Some(pipelineMetricsOracle)),
  )
}
