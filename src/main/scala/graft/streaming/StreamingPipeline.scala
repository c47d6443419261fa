package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.pipeline.IncrementalPipeline

/** The CDC pipeline as Structured Streaming (SURVEY.md §2.9): the
  * reference's run-to-completion micro-batch loop maps to
  * `Trigger.AvailableNow` (process all available input, then stop — the
  * no-new-data run is a no-op trigger), and its idempotent upsert maps to a
  * `foreachBatch` merge into the same versioned store the batch pipeline
  * uses. Checkpointing replaces the hand-rolled `ingestion_state` table:
  * offsets survive restarts, re-delivered files dedup through the merge.
  *
  * Scale notes: `mergeByKey` inside foreachBatch shuffles once per batch on
  * the key; watermark + `dropDuplicates` bounds state. File-source listing
  * is the only driver-side cost.
  */
object StreamingPipeline {

  /** Run an AvailableNow pass over parquet files arriving in `inDir`,
    * merging each micro-batch into `store`. Returns the number of
    * micro-batches processed.
    */
  def runAvailableNow(
      spark: SparkSession,
      schema: StructType,
      inDir: String,
      store: IncrementalPipeline.Store,
      checkpointDir: String): Long = {
    var batches = 0L
    val stream = spark.readStream
      .schema(schema)
      .parquet(inDir)
      .filter(IncrementalPipeline.isValid)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batches += 1
        val merged = store.launches match {
          case Some(existing) =>
            graft.operators.MergeOps.mergeByKey(existing, batch, "event_id", "ts")
          case None => batch
        }
        // Materialize before the versioned write (foreachBatch may be
        // re-invoked on failure; versioned dirs keep replays idempotent).
        store.writeLaunches(merged, batchId)
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
