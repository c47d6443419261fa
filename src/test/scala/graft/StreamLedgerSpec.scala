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

  test("an EQUALITY delete mid-stream fences the raw append feed; eq-deletes committed before start are applied") {
    cat()
    spark.range(0, 10)
      .select(col("id").as("k"), (col("id") * 10.0).as("v"))
      .writeTo("graft_cat.spec.seqf")
      .tableProperty("write.delete.mode", "equality").create()
    val root = java.nio.file.Files.createTempDirectory("graft_seqf")
    try {
      val ckpt = root.resolve("ckpt").toString
      assert(drainCount("graft_cat.spec.seqf", ckpt) === 10L)
      // the eq-delete changed the meaning of already-streamed batches:
      // the epoch bumps and the checkpointed stream fails LOUDLY
      // instead of silently serving rows downstream already processed
      spark.sql("DELETE FROM graft_cat.spec.seqf WHERE k IN (3, 7)")
      val ex = intercept[Exception] {
        drainCount("graft_cat.spec.seqf", ckpt)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("append-only")),
        msgs(ex).mkString(" | ").take(200))
      // a FRESH stream applies the pending tuple set: deleted keys
      // never replay
      assert(drainCount("graft_cat.spec.seqf",
        root.resolve("ckpt2").toString) === 8L)
    } finally spark.sql("DROP TABLE graft_cat.spec.seqf")
  }

  test("metadata-only evolution MID-STREAM: RENAME keeps the feed coherent, ADD fences loudly") {
    cat()
    spark.range(0, 5).select(col("id").as("k"), lit(1.0).as("v"))
      .writeTo("graft_cat.spec.sev").create()
    val root = java.nio.file.Files.createTempDirectory("graft_sev")
    try {
      val seen = new AtomicLong(0)
      val q = spark.readStream.table("graft_cat.spec.sev")
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", root.resolve("c1").toString)
        .start()
      def awaitSeen(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (seen.get < n && System.nanoTime() < deadline) Thread.sleep(50)
        assert(seen.get === n)
      }
      try {
        awaitSeen(5)
        // RENAME mid-stream is COHERENT: slots are stable and widths
        // unchanged, so committed and new rows keep flowing under the
        // stream's declared (start-time) column names
        spark.sql("ALTER TABLE graft_cat.spec.sev RENAME COLUMN v TO w")
        spark.range(5, 9).select(col("id").as("k"), lit(2.0).as("w"))
          .writeTo("graft_cat.spec.sev").append()
        awaitSeen(9)
        assert(q.isActive, "rename must not kill the feed")
        // ADD COLUMN mid-stream diverges the widths: the feed must
        // fence LOUDLY, never serve a mis-shaped batch
        spark.sql("ALTER TABLE graft_cat.spec.sev ADD COLUMN tag STRING")
        spark.range(9, 12)
          .select(col("id").as("k"), lit(3.0).as("w"), lit("x").as("tag"))
          .writeTo("graft_cat.spec.sev").append()
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.awaitTermination(120000); ()
        }
        def chain(t: Throwable): Seq[String] =
          if (t == null) Seq.empty
          else Option(t.getMessage).toSeq ++ chain(t.getCause)
        assert(chain(ex).exists(_.contains("schema evolved under a streaming reader")),
          chain(ex).mkString(" | ").take(300))
        assert(seen.get === 9, "no mis-shaped batch may reach the sink")
      } finally { scala.util.Try(q.stop()); () }
    } finally spark.sql("DROP TABLE graft_cat.spec.sev")
  }

  test("partitioned streaming source: shard-grain append-only contract — a COW rewrite fences loudly") {
    cat()
    spark.range(0, 12)
      .select(col("id").as("k"),
        when(col("id") % 2 === 0, "a").otherwise("b").as("p"),
        lit(1.0).as("v"))
      .writeTo("graft_cat.spec.pstr").partitionedBy(col("p")).create()
    val root = java.nio.file.Files.createTempDirectory("graft_pstr")
    try {
      val ckpt = root.resolve("ckpt").toString
      assert(drainCount("graft_cat.spec.pstr", ckpt) === 12L)
      // an append lands in ONE shard; the resumed stream reads exactly it
      spark.range(100, 103)
        .select(col("id").as("k"), lit("a").as("p"), lit(2.0).as("v"))
        .writeTo("graft_cat.spec.pstr").append()
      assert(drainCount("graft_cat.spec.pstr", ckpt) === 3L)
      // a COW rewrite of shard 'a' breaks the append-only contract for
      // already-streamed offsets: the resumed stream must fence LOUDLY
      spark.sql("UPDATE graft_cat.spec.pstr SET v = v + 1 WHERE p = 'a'")
      val ex = intercept[Exception] {
        drainCount("graft_cat.spec.pstr", ckpt)
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(ex).exists(_.contains("rewritten or truncated under a streaming reader")),
        chain(ex).mkString(" | ").take(300))
      // a FRESH checkpoint replays the post-rewrite history cleanly? No:
      // the rewrite is still in the ledger — earliest replay walks over
      // it and fences too; streaming a rewritten partitioned table needs
      // the CDC view. Pin that the t@changes stream DOES flow across it.
      val seen = new AtomicLong(0)
      val q = spark.readStream.table("graft_cat.spec.`pstr@changes`")
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", root.resolve("ckpt2").toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
      // 12 + 3 inserts, then the rewrite renders 9 deletes + 9 inserts
      assert(seen.get === 12L + 3L + 18L)
    } finally spark.sql("DROP TABLE graft_cat.spec.pstr")
  }

  test("partitioned mid-stream evolution: RENAME keeps shards flowing, ADD COLUMN fences at width") {
    cat()
    spark.range(0, 10)
      .select(col("id").as("k"),
        when(col("id") % 2 === 0, "a").otherwise("b").as("p"),
        lit(1.0).as("v"))
      .writeTo("graft_cat.spec.psev").partitionedBy(col("p")).create()
    val root = java.nio.file.Files.createTempDirectory("graft_psev")
    try {
      val seen = new AtomicLong(0)
      val q = spark.readStream.table("graft_cat.spec.psev")
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", root.resolve("c1").toString)
        .start()
      def awaitSeen(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (seen.get < n && System.nanoTime() < deadline) Thread.sleep(50)
        assert(seen.get === n)
      }
      try {
        awaitSeen(10)
        // RENAME propagates to every shard as a metadata-only evolve
        // commit: widths and slots stable, so the LIVE stream keeps
        // flowing — the evolve commits contribute no rows, the
        // post-rename append lands positionally under start-time names
        spark.sql("ALTER TABLE graft_cat.spec.psev RENAME COLUMN v TO w")
        spark.range(100, 104)
          .select(col("id").as("k"),
            when(col("id") % 2 === 0, "a").otherwise("b").as("p"),
            lit(2.0).as("w"))
          .writeTo("graft_cat.spec.psev").append()
        awaitSeen(14)
        assert(q.isActive, "rename must not kill the partitioned feed")
        // ADD COLUMN diverges the table-level width mid-stream: the
        // LIVE stream must fence LOUDLY, never serve mis-shaped rows
        spark.sql("ALTER TABLE graft_cat.spec.psev ADD COLUMN tag STRING")
        spark.range(200, 202)
          .select(col("id").as("k"), lit("a").as("p"), lit(3.0).as("w"),
            lit("x").as("tag"))
          .writeTo("graft_cat.spec.psev").append()
        val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.awaitTermination(120000); ()
        }
        def chain(t: Throwable): Seq[String] =
          if (t == null) Seq.empty
          else Option(t.getMessage).toSeq ++ chain(t.getCause)
        assert(chain(ex).exists(_.contains("schema evolved under a streaming reader")),
          chain(ex).mkString(" | ").take(300))
        assert(seen.get === 14, "no mis-shaped batch may reach the sink")
      } finally { scala.util.Try(q.stop()); () }
    } finally spark.sql("DROP TABLE graft_cat.spec.psev")
  }

  test("spec evolution mid-stream: the partitioned source keeps flowing; post-evolve appends arrive from new-spec shards") {
    cat()
    spark.range(0, 6)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("v"))
      .repartition(1)
      .writeTo("graft_cat.spec.sevo").partitionedBy(col("p")).create()
    val root = java.nio.file.Files.createTempDirectory("graft_sevo")
    try {
      val ckpt = root.resolve("ckpt").toString
      assert(drainCount("graft_cat.spec.sevo", ckpt) === 6L)
      // the evolve is a metadata-only table-level commit: nothing to
      // serve, nothing to fence — the checkpointed stream stays alive
      spark.sql(
        "CALL graft_cat.system.evolve_spec('spec.sevo', 'bucket(2, v)')")
      assert(drainCount("graft_cat.spec.sevo", ckpt) === 0L)
      // appends now land in NEW-spec shards (a shard APPEARING
      // mid-stream is an append like any other) and flow to the sink
      spark.range(100, 103)
        .select((col("id") % 2).cast("string").as("p"), col("id").as("v"))
        .repartition(1)
        .writeTo("graft_cat.spec.sevo").append()
      assert(drainCount("graft_cat.spec.sevo", ckpt) === 3L)
    } finally spark.sql("DROP TABLE graft_cat.spec.sevo")
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

  test("a branch-born shard published WITH deletion state streams only its live rows (ADVICE r17)") {
    cat()
    spark.range(0, 8).select(lit("a").as("p"), col("id").as("v"))
      .repartition(1)
      .writeTo("graft_cat.spec.nbdv").partitionedBy(col("p"))
      .tableProperty("write.mode", "merge-on-read").create()
    val root = java.nio.file.Files.createTempDirectory("graft_nbdv")
    try {
      val ckpt = root.resolve("ckpt").toString
      assert(drainCount("graft_cat.spec.nbdv", ckpt) === 8L)
      // on a BRANCH: a brand-new partition is created, then some of its
      // rows are DV-deleted — publish adopts the shard in ONE main
      // commit, so the stream sees it NEWBORN with deletion state
      spark.sql("CALL graft_cat.system.create_branch('spec.nbdv', 'wip')")
      spark.range(100, 110).select(lit("b").as("p"), col("id").as("v"))
        .repartition(1)
        .writeTo("graft_cat.spec.`nbdv@wip`").append()
      spark.sql(
        "DELETE FROM graft_cat.spec.`nbdv@wip` WHERE p = 'b' AND v % 2 = 0")
      assert(GraftStore
        .dvMarkedCount("cat::graft_cat.spec.nbdv#b=wip#p=b") === 5L,
        "branch delete must land as DV bits on the newborn branch shard")
      spark.sql("CALL graft_cat.system.publish_branch('spec.nbdv', 'wip')")
      // resume: exactly the newborn shard's FIVE live rows — replaying
      // its DV'd rows as inserts would leak deleted data downstream
      assert(drainCount("graft_cat.spec.nbdv", ckpt) === 5L)
    } finally spark.sql("DROP TABLE graft_cat.spec.nbdv")
  }

  test("streaming ingest INTO a partitioned table: rows route per-shard, one table version per epoch, checkpoint resume appends only the delta") {
    cat()
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL("p STRING, v BIGINT"))
      .writeTo("graft_cat.spec.sipw").partitionedBy(col("p")).create()
    val k = "cat::graft_cat.spec.sipw"
    val root = java.nio.file.Files.createTempDirectory("graft_sipw")
    try {
      val v0 = graft.sources.GraftCatalog.partVersions(k).size
      def ingest(): Unit = {
        val q = spark.readStream
          .format("rate-micro-batch")
          .option("rowsPerBatch", "6")
          .option("numPartitions", "2")
          .load()
          .select((col("value") % 3).cast("string").as("p"),
            col("value").as("v"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft_cat.spec.sipw")
        try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
      }
      ingest()
      val n1 = spark.table("graft_cat.spec.sipw").count()
      assert(n1 > 0, "the stream must have appended")
      val epochs1 = graft.sources.GraftCatalog.partVersions(k).size - v0
      assert(epochs1 >= 1)
      // rows routed through the transform: every shard holds only its
      // own partition value
      GraftStore.keysWithPrefix(k + "#p=").foreach { sk =>
        val pv = sk.substring(sk.indexOf("#p=") + 3)
        assert(spark.table("graft_cat.spec.sipw")
          .filter(col("_group") === pv && col("p") =!= pv).count() === 0L)
      }
      // resume from the checkpoint: only NEW epochs land (the epoch
      // ledger refuses replays), and versions advance one per epoch
      ingest()
      val n2 = spark.table("graft_cat.spec.sipw").count()
      assert(n2 >= n1, "resume must never lose rows")
      assert(spark.table("graft_cat.spec.sipw")
        .groupBy(col("v")).count().filter(col("count") > 1).isEmpty,
        "no row may be ingested twice across checkpoint resumes")
    } finally spark.sql("DROP TABLE graft_cat.spec.sipw")
  }

  test("two INDEPENDENT streaming queries into one table: neither's epochs are swallowed (per-query ledger)") {
    cat()
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL("v BIGINT"))
      .writeTo("graft_cat.spec.twoq").create()
    val root = java.nio.file.Files.createTempDirectory("graft_twoq")
    try {
      def ingest(ckpt: String, offset: Long): Unit = {
        val q = spark.readStream
          .format("rate-micro-batch")
          .option("rowsPerBatch", "4").option("numPartitions", "1")
          .load()
          .select((col("value") + offset).as("v"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", root.resolve(ckpt).toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft_cat.spec.twoq")
        try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
      }
      ingest("ckptA", 0L)
      val n1 = spark.table("graft_cat.spec.twoq").count()
      assert(n1 > 0)
      // a SECOND query (own checkpoint, its batch ids restart at 0)
      // must land its rows — a table-grained epoch ledger would
      // silently drop them while its checkpoint advanced
      ingest("ckptB", 1000L)
      val n2 = spark.table("graft_cat.spec.twoq").count()
      assert(n2 > n1, "the second query's epochs were swallowed")
      assert(spark.table("graft_cat.spec.twoq")
        .filter(col("v") >= 1000L).count() === n2 - n1)
    } finally spark.sql("DROP TABLE graft_cat.spec.twoq")
  }

  test("checkpoint-wipe idempotence: the fingerprint tier suppresses same-content re-ingest; default stays at-least-once (VERDICT r18 #6)") {
    cat()
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL("v BIGINT"))
      .writeTo("graft_cat.spec.fpq").create()
    val root = java.nio.file.Files.createTempDirectory("graft_fpq")
    try {
      // deterministic content: rate-micro-batch from a FRESH checkpoint
      // replays the identical value sequence — exactly what a restart
      // from a deleted checkpoint does (new queryId, same batches)
      def ingest(ckpt: String, offset: Long): Unit = {
        val q = spark.readStream
          .format("rate-micro-batch")
          .option("rowsPerBatch", "4").option("numPartitions", "1")
          .load()
          .select((col("value") + offset).as("v"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", root.resolve(ckpt).toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft_cat.spec.fpq")
        try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
      }
      spark.conf.set("spark.graft.stream.fingerprintDedup", "true")
      ingest("c1", 0L)
      val n1 = spark.table("graft_cat.spec.fpq").count()
      assert(n1 > 0)
      // the wipe replay: fresh checkpoint = new queryId, identical
      // content — the per-query ledger alone would re-ingest (its
      // epoch keys are new), the fingerprint tier suppresses
      ingest("c2", 0L)
      assert(spark.table("graft_cat.spec.fpq").count() === n1,
        "same-content re-ingest must be suppressed with the tier on")
      // genuinely NEW content from another fresh query still lands
      ingest("c3", 5000L)
      val n3 = spark.table("graft_cat.spec.fpq").count()
      assert(n3 === 2 * n1, "new content must never be suppressed")
      // default off: the documented at-least-once contract — a wiped
      // checkpoint re-ingests (fingerprints are neither recorded nor
      // consulted)
      spark.conf.set("spark.graft.stream.fingerprintDedup", "false")
      ingest("c4", 0L)
      assert(spark.table("graft_cat.spec.fpq").count() === n3 + n1,
        "with the tier off, replay must land (at-least-once, no silence)")
    } finally {
      spark.conf.set("spark.graft.stream.fingerprintDedup", "false")
      spark.sql("DROP TABLE graft_cat.spec.fpq")
    }
  }

  test("checkpoint-wipe idempotence on a PARTITIONED table: whole-epoch fingerprint, shard-order-insensitive") {
    cat()
    spark.sql(
      """CREATE TABLE graft_cat.spec.fpp (v BIGINT, p STRING)
        |PARTITIONED BY (p)""".stripMargin)
    val root = java.nio.file.Files.createTempDirectory("graft_fpp")
    try {
      def ingest(ckpt: String, offset: Long): Unit = {
        val q = spark.readStream
          .format("rate-micro-batch")
          .option("rowsPerBatch", "6").option("numPartitions", "2")
          .load()
          .select((col("value") + offset).as("v"),
            (col("value") % 3).cast("string").as("p"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", root.resolve(ckpt).toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft_cat.spec.fpp")
        try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
      }
      spark.conf.set("spark.graft.stream.fingerprintDedup", "true")
      ingest("c1", 0L)
      val n1 = spark.table("graft_cat.spec.fpp").count()
      assert(n1 > 0)
      val v1 = graft.sources.GraftCatalog
        .partVersions("cat::graft_cat.spec.fpp").size
      // identical content from a fresh checkpoint (2 task partitions —
      // the fingerprint must not care how rows split across tasks or
      // shards): suppressed, and NO table version was burned
      ingest("c2", 0L)
      assert(spark.table("graft_cat.spec.fpp").count() === n1,
        "partitioned same-content re-ingest must be suppressed")
      assert(graft.sources.GraftCatalog
        .partVersions("cat::graft_cat.spec.fpp").size === v1,
        "a suppressed epoch must not record a table-level version")
      // new content still lands, one version per applied epoch
      ingest("c3", 9000L)
      assert(spark.table("graft_cat.spec.fpp").count() === 2 * n1)
    } finally {
      spark.conf.set("spark.graft.stream.fingerprintDedup", "false")
      spark.sql("DROP TABLE graft_cat.spec.fpp")
    }
  }
}
