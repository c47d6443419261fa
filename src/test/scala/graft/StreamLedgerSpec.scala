package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftStore

/** Streaming over the catalog ledger, round-15 additions: head-anchored
  * change feeds (`startingOffsets=latest`) and streaming ingest into a
  * WAP branch.
  */
class StreamLedgerSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  private def drainCount(table: String, ckpt: String,
      opts: Map[String, String] = Map.empty): Long = {
    val seen = new AtomicLong(0)
    val reader = opts.foldLeft(spark.readStream) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.table(table)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(df.count()); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
    seen.get
  }

  test("startingOffsets=latest anchors the feed at the ledger head; resume consumes only the delta") {
    cat()
    spark.range(0, 10).select(col("id").as("k"))
      .writeTo("graft_cat.spec.sol").create()
    val root = java.nio.file.Files.createTempDirectory("graft_sol")
    try {
      val ckpt = root.resolve("ckpt").toString
      // latest: the 10 pre-existing rows are NOT replayed
      assert(drainCount("graft_cat.spec.sol", ckpt,
        Map("startingOffsets" -> "latest")) === 0L)
      spark.range(10, 15).select(col("id").as("k"))
        .writeTo("graft_cat.spec.sol").append()
      // the checkpoint resumes from the recorded head — exactly the delta
      assert(drainCount("graft_cat.spec.sol", ckpt,
        Map("startingOffsets" -> "latest")) === 5L)
      // default (earliest) on a FRESH checkpoint still replays everything
      assert(drainCount("graft_cat.spec.sol",
        root.resolve("ckpt2").toString) === 15L)
    } finally spark.sql("DROP TABLE graft_cat.spec.sol")
  }

  test("streaming ingest into a WAP branch: epochs land on the branch, main dark until publish") {
    cat()
    spark.range(0, 20).select(col("id").as("k"))
      .writeTo("graft_cat.spec.wstr").create()
    val mainKey = "cat::graft_cat.spec.wstr"
    val root = java.nio.file.Files.createTempDirectory("graft_wstr")
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.wstr', 'ingest')")
      val mainRef = GraftStore.batchesRef(mainKey).get
      val q = spark.readStream
        .format("rate-micro-batch")
        .option("rowsPerBatch", "5")
        .option("numPartitions", "1")
        .load()
        .select((col("value") + 1000).as("k"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .toTable("graft_cat.spec.`wstr@ingest`")
      try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
      val streamed = GraftStore.rowCount(mainKey + "#b=ingest") - 20
      assert(streamed > 0, "the stream should have appended to the branch")
      // main: untouched through the whole ingest
      assert(GraftStore.batchesRef(mainKey).get eq mainRef)
      assert(spark.table("graft_cat.spec.wstr").count() === 20L)
      spark.sql("CALL graft_cat.system.publish_branch('spec.wstr', 'ingest')")
      assert(spark.table("graft_cat.spec.wstr").count() === 20L + streamed)
    } finally spark.sql("DROP TABLE graft_cat.spec.wstr")
  }
}
