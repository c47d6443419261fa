package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

import graft.functions.Scalars._
import graft.operators.{QueryModule, RegisteredQuery}

/** Oracle-checked Structured Streaming queries: the batch operators'
  * streaming twins, registered so the STREAMING path itself sits behind
  * the DuckDB correctness gate rather than ScalaTest only. Each query
  * runs a real `readStream → transform → writeStream` job to completion
  * (`Trigger.AvailableNow`) against the fixture parquet and returns the
  * materialized sink table — deterministic because AvailableNow processes
  * the whole input and Complete mode emits every window's final state.
  *
  * Scale: identical dataflow to the batch twin (`window()` aggregate =
  * one keyed shuffle with map-side partials per micro-batch); at 100 TB
  * the file source becomes Kafka/object-store listing and AvailableNow
  * becomes a continuous trigger with watermarked Append output — the
  * plan under the sink is the same.
  */
object StreamingOps extends QueryModule {

  /** Memory-sink names are per-JVM global; a counter keeps repeated
    * invocations (Bench's warm loops, TimeOne's 3×) isolated.
    */
  private val sinkSeq = new AtomicInteger(0)

  /** Streaming twin of [[graft.operators.WindowsAndStats.w3TumblingWindow]]:
    * 6-hour event-time tumbling windows over the events stream, run as an
    * AvailableNow streaming job into a memory sink, then projected to the
    * SAME output shape (and the same oracle SQL) as the batch query. The
    * nanos→timestamp conversion mirrors `Tables.events` — the streaming
    * reader honors the same parquet nanos-as-long session flag.
    */
  def streamTumblingWindow(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val rawSchema = s.read.parquet(path).schema
    // the file stream source wants a DIRECTORY to list. A Spark-written
    // `events.parquet` is itself a directory (part-*.parquet leaves) and is
    // streamed directly; only the single-file fixture layout needs the
    // parent-dir + glob-filter dance (pathGlobFilter matches LEAF file
    // names, so it would silently match nothing against the directory
    // layout — ADVICE r7; the non-empty require below backstops both).
    val raw =
      if (new java.io.File(path).isDirectory)
        s.readStream.schema(rawSchema).parquet(path)
      else
        s.readStream.schema(rawSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
    val ev = rawSchema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
    val name = s"graft_stream_w3_${sinkSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-w3-ckpt")
    val q = ev
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    // detach from the sink so the temp view and checkpoint can be dropped
    // even when the run FAILS (warm bench loops would otherwise accumulate
    // one resident Complete-mode result table + one /tmp checkpoint per
    // invocation); the window count is time-bounded, so the local copy is
    // small
    try {
      q.awaitTermination()
      val shaped = s.table(name)
        .select(
          unix_micros(col("window.start")).as("w_start_us"),
          unix_micros(col("window.end")).as("w_end_us"),
          col("n_events"),
          roundTo(col("sum_value"), 2).as("sum_value"))
        .orderBy("w_start_us")
      val out = s.createDataFrame(shaped.collectAsList(), shaped.schema)
      // a source that listed zero files completes "successfully" with an
      // empty sink — fail loudly instead of returning a vacuous result
      require(!out.isEmpty, s"streaming source matched no input under $path")
      out
    } finally {
      scala.util.Try(s.catalog.dropTempView(name))
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(ckpt)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Same oracle as the batch twin — the streaming run must land on the
    * identical window grid and aggregates.
    */
  val streamTumblingOracle: String =
    """SELECT b * 1000000 AS w_start_us,
      | (b + 21600) * 1000000 AS w_end_us,
      | count(*) AS n_events,
      | floor(sum(value) * 1e2 + 0.5) / 1e2 AS sum_value
      |FROM (SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS b, value FROM events)
      |GROUP BY b ORDER BY w_start_us""".stripMargin

  override def queries: Seq[RegisteredQuery] = Seq(
    RegisteredQuery("stream_tumbling_window", streamTumblingWindow,
      Some(streamTumblingOracle)),
  )
}
