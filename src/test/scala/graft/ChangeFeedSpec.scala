package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.ChangeFeed

/** Batch change feed over the catalog commit ledger
  * ([[graft.sources.ChangeFeed.tableChanges]]): every commit kind must
  * render its exact row-level delta, ranges must compose, and the
  * refusals (partitioned tables, expired versions) must be loud.
  */
class ChangeFeedSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("each commit kind renders its exact delta; ranges compose") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.filter(col("event_id") % 2 === 0)
      .writeTo("graft_cat.spec.cf1").create() // v0 create, v1 data
    try {
      base.filter(col("event_id") % 2 === 1)
        .writeTo("graft_cat.spec.cf1").append() // v2
      spark.sql("DELETE FROM graft_cat.spec.cf1 WHERE value < 40") // v3 DV
      spark.sql("ALTER TABLE graft_cat.spec.cf1 ADD COLUMN tag STRING") // v4 metadata

      val all = ChangeFeed.tableChanges(spark, "spec.cf1", 0, 4).cache()
      // v1 + v2: the two halves, as inserts
      assert(all.filter(col("_commit_version") === 1 &&
        col("_change_type") === "insert").count() ===
        base.filter(col("event_id") % 2 === 0).count())
      assert(all.filter(col("_commit_version") === 2 &&
        col("_change_type") === "insert").count() ===
        base.filter(col("event_id") % 2 === 1).count())
      // v3: exactly the DV-marked rows, as deletes with full row content
      val dels = all.filter(col("_commit_version") === 3)
      assert(dels.filter(col("_change_type") =!= "delete").count() === 0L)
      assert(dels.count() === base.filter(col("value") < 40).count())
      assert(dels.filter(col("value") >= 40).count() === 0L)
      // v4 (metadata-only evolution): no row changes; rows carry the
      // range-end schema (tag reads NULL everywhere)
      assert(all.filter(col("_commit_version") === 4).count() === 0L)
      assert(all.schema.fieldNames.contains("tag"))
      assert(all.filter(col("tag").isNotNull).count() === 0L)
      // composition: (0,2] ∪ (2,4] == (0,4]
      val a = ChangeFeed.tableChanges(spark, "spec.cf1", 0, 2)
      val b = ChangeFeed.tableChanges(spark, "spec.cf1", 2, 4)
      assert(a.count() + b.count() === all.count())
      all.unpersist()
    } finally spark.sql("DROP TABLE graft_cat.spec.cf1")
  }

  test("COW rewrite renders as pre-image deletes + post-image inserts that replay to the table state") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.cf2").create() // v0, v1
    try {
      spark.sql(
        "UPDATE graft_cat.spec.cf2 SET value = value + 1000 WHERE event_id % 10 = 0") // v2
      val ch = ChangeFeed.tableChanges(spark, "spec.cf2", 1, 2)
      val n = base.count()
      assert(ch.filter(col("_change_type") === "delete").count() === n)
      assert(ch.filter(col("_change_type") === "insert").count() === n)
      // replaying the feed (inserts of the last commit) reproduces the
      // live table row-for-row
      val replayed = ch.filter(col("_change_type") === "insert")
        .select(col("event_id"), col("value"))
        .orderBy("event_id", "value").collect().toSeq
      val live = spark.table("graft_cat.spec.cf2")
        .orderBy("event_id", "value").collect().toSeq
      assert(replayed === live)
    } finally spark.sql("DROP TABLE graft_cat.spec.cf2")
  }

  test("a MOR UPDATE renders with TRUE lineage: update_preimage/update_postimage pairs, zero delete+insert") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.cfm")
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      spark.sql(
        "UPDATE graft_cat.spec.cfm SET value = value + 1000 WHERE event_id % 50 = 0") // v2 row-delta
      val touched = base.filter(col("event_id") % 50 === 0).count()
      val ch = ChangeFeed.tableChanges(spark, "spec.cfm", 1, 2)
      // journaled lineage, not delete+insert: exactly the touched rows,
      // as pre/post image pairs (the Delta CDF rendering)
      assert(ch.filter(col("_change_type") === "update_preimage").count() === touched)
      assert(ch.filter(col("_change_type") === "update_postimage").count() === touched)
      assert(ch.filter(col("_change_type").isin("delete", "insert")).count() === 0L)
      assert(ch.filter(col("_change_type") === "update_preimage" &&
        col("event_id") % 50 =!= 0).count() === 0L)
      // PAIRING is row-exact: join pre to post by key — every pair
      // moved by exactly +1000 (so a consumer can diff moved rows)
      val pre = ch.filter(col("_change_type") === "update_preimage")
        .select(col("event_id"), col("value").as("pre_v"))
      val post = ch.filter(col("_change_type") === "update_postimage")
        .select(col("event_id"), col("value").as("post_v"))
      val pairs = pre.join(post, "event_id")
      assert(pairs.count() === touched)
      assert(pairs.filter(floor(col("post_v") * 100 + 0.5) -
        floor(col("pre_v") * 100 + 0.5) =!= 100000L).count() === 0L)
      // and the history kind agrees
      val kinds = spark.sql("CALL graft_cat.system.history('spec.cfm')")
        .orderBy("version").select("kind").collect().map(_.getString(0))
      assert(kinds.toSeq === Seq("create", "append", "row-delta"))
    } finally spark.sql("DROP TABLE graft_cat.spec.cfm")
  }

  test("a MOR MERGE mixes lineage kinds: matched rows pair, unmatched rows are genuine inserts") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
      .limit(60)
    spark.createDataFrame(base.collectAsList(), base.schema)
      .writeTo("graft_cat.spec.cfmm")
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      spark.table("graft_cat.spec.cfmm")
        .filter(col("event_id") % 3 === 0)
        .select(col("event_id"), (col("value") + 500).as("value"))
        .unionByName(spark.range(5)
          .select((col("id") + 9000000L).as("event_id"), lit(7.0).as("value")))
        .createOrReplaceTempView("spec_cfmm_src")
      spark.sql(
        """MERGE INTO graft_cat.spec.cfmm t USING spec_cfmm_src s
          |ON t.event_id = s.event_id
          |WHEN MATCHED THEN UPDATE SET value = s.value
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val matched = spark.table("graft_cat.spec.cfmm")
        .filter(col("event_id") % 3 === 0 && col("event_id") < 9000000L).count()
      val ch = ChangeFeed.tableChanges(spark, "spec.cfmm", 1, 2)
      assert(ch.filter(col("_change_type") === "update_preimage").count() === matched)
      assert(ch.filter(col("_change_type") === "update_postimage").count() === matched)
      assert(ch.filter(col("_change_type") === "insert").count() === 5L)
      assert(ch.filter(col("_change_type") === "insert" &&
        col("event_id") < 9000000L).count() === 0L)
      assert(ch.filter(col("_change_type") === "delete").count() === 0L)
    } finally spark.sql("DROP TABLE graft_cat.spec.cfmm")
  }

  test("t@changes: batch SELECT serves full-history CDC; the stream survives rewrites") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
      .limit(100)
    spark.createDataFrame(base.collectAsList(), base.schema)
      .writeTo("graft_cat.spec.cdcv").create() // v0, v1
    val root = java.nio.file.Files.createTempDirectory("graft_cdcv")
    try {
      spark.sql("DELETE FROM graft_cat.spec.cdcv WHERE value < 40") // v2 DV
      val gone = spark.sql(
        "SELECT count(*) FROM graft_cat.spec.cdcv VERSION AS OF 1")
        .head.getLong(0) - spark.table("graft_cat.spec.cdcv").count()
      // batch view == the API, row for row
      val viaView = spark.table("graft_cat.spec.`cdcv@changes`")
        .orderBy("_commit_version", "_change_type", "event_id", "value")
        .collect().toSeq
      val viaApi = ChangeFeed.tableChanges(spark, "spec.cdcv", 0, 2)
        .orderBy("_commit_version", "_change_type", "event_id", "value")
        .collect().toSeq
      assert(viaView === viaApi)
      assert(viaView.size.toLong === 100 + gone)

      // streaming: drain history, then a REWRITE commit, then drain the
      // delta — the version-ordinal offsets flow across the rewrite
      // where the raw append feed fences
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      def drain(): Long = {
        seen.set(0)
        val q = spark.readStream.table("graft_cat.spec.`cdcv@changes`")
          .writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            seen.addAndGet(df.count()); ()
          }
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
        seen.get
      }
      assert(drain() === 100 + gone)
      val live = spark.table("graft_cat.spec.cdcv").count()
      spark.sql("UPDATE graft_cat.spec.cdcv SET value = value + 1") // v3 rewrite
      assert(drain() === 2 * live,
        "the rewrite commit must stream as pre-image deletes + post-image inserts")
    } finally spark.sql("DROP TABLE graft_cat.spec.cdcv")
  }

  test("streaming lineage across a micro-batch boundary: a mid-stream MOR UPDATE serves row-exact pre/post pairs") {
    cat()
    val seed = (0L until 10L).map(i => (i, i * 10.0))
    spark.createDataFrame(seed).toDF("k", "v")
      .repartition(1)
      .writeTo("graft_cat.spec.cfsl")
      .tableProperty("write.mode", "merge-on-read").create() // v0, v1
    val root = java.nio.file.Files.createTempDirectory("graft_cfsl")
    try {
      val got = new java.util.concurrent.atomic.AtomicReference[
        Seq[org.apache.spark.sql.Row]](Seq.empty)
      def drain(): Seq[org.apache.spark.sql.Row] = {
        got.set(Seq.empty)
        val q = spark.readStream.table("graft_cat.spec.`cfsl@changes`")
          .writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            got.updateAndGet(_ ++ df.collect().toSeq); ()
          }
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
        got.get
      }
      assert(drain().count(_.getString(2) == "insert") === 10)
      // the UPDATE lands BETWEEN checkpointed drains
      spark.sql(
        "UPDATE graft_cat.spec.cfsl SET v = v + 100 WHERE k IN (3, 7)") // v2
      val delta = drain()
      // exactly the update commit: 2 pre + 2 post, nothing else
      assert(delta.length === 4, delta.mkString("; "))
      assert(delta.forall(_.getInt(3) == 2), "all rows from commit v2")
      val pre = delta.filter(_.getString(2) == "update_preimage")
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val post = delta.filter(_.getString(2) == "update_postimage")
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // row-exact pairing — and the PRE image is the pre-update value,
      // served from the ledger even though the live table (which this
      // drain runs against) already holds the post state
      assert(pre === Map(3L -> 30.0, 7L -> 70.0))
      assert(post === Map(3L -> 130.0, 7L -> 170.0))
    } finally spark.sql("DROP TABLE graft_cat.spec.cfsl")
  }

  test("the feed renders maintenance commits honestly: compact and rollback as rewrites that replay to the live table") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
      .limit(60)
    spark.createDataFrame(base.collectAsList(), base.schema)
      .writeTo("graft_cat.spec.cfmx").create() // v0, v1
    try {
      spark.sql("DELETE FROM graft_cat.spec.cfmx WHERE value < 40") // v2 DV
      spark.sql("CALL graft_cat.system.compact('spec.cfmx')") // v3 rewrite
      spark.sql("CALL graft_cat.system.rollback('spec.cfmx', 1)") // v4 rewrite
      val kinds = spark.sql("CALL graft_cat.system.history('spec.cfmx')")
        .orderBy("version").select("kind").collect().map(_.getString(0))
      assert(kinds.toSeq === Seq("create", "append", "delete-vectors",
        "rewrite", "rewrite"))
      // replaying the LAST commit's inserts reproduces the live table
      val ch = ChangeFeed.tableChanges(spark, "spec.cfmx", 3, 4)
      val replayed = ch.filter(col("_change_type") === "insert")
        .select(col("event_id"), col("value"))
        .orderBy("event_id", "value").collect().toSeq
      val live = spark.table("graft_cat.spec.cfmx")
        .orderBy("event_id", "value").collect().toSeq
      assert(replayed === live)
      // and the rollback's feed pre-image is exactly the compacted state
      assert(ch.filter(col("_change_type") === "delete").count() ===
        base.filter(col("value") >= 40).count())
    } finally spark.sql("DROP TABLE graft_cat.spec.cfmx")
  }

  test("a slot reset between DROP and re-ADD cannot resurrect dropped values in the feed (lineage-gated fallback)") {
    cat()
    spark.createDataFrame(Seq((1L, "aa", "SECRET1"), (2L, "bb", "SECRET2")))
      .toDF("k", "b", "c").repartition(1)
      .writeTo("graft_cat.spec.cflg").create() // v0, v1
    try {
      spark.sql("ALTER TABLE graft_cat.spec.cflg DROP COLUMN c") // v2
      spark.sql("CALL graft_cat.system.compact('spec.cflg')") // v3: slot reset
      spark.sql("ALTER TABLE graft_cat.spec.cflg ADD COLUMN d STRING") // v4
      // rendering v1's inserts: column d post-dates v1; its post-reset
      // slot numerically aliases v1's DROPPED column c — the lineage
      // gate must serve the range-end default (NULL), never c's values
      val v1 = spark.table("graft_cat.spec.cflg@changes".replace(
        "graft_cat.spec.cflg@changes", "graft_cat.spec.`cflg@changes`"))
        .filter(col("_commit_version") === 1).collect()
      assert(v1.length === 2)
      v1.foreach { r =>
        val d = r.getAs[String]("d")
        assert(d == null, s"dropped column value resurrected as d: $d")
      }
      // and a RENAME within one lineage still serves old rows' values
      spark.sql(
        "ALTER TABLE graft_cat.spec.cflg RENAME COLUMN b TO b2") // v5
      val post = spark.table("graft_cat.spec.`cflg@changes`")
        .filter(col("_commit_version") === 3 && // the compact rewrite's
          col("_change_type") === "insert")     // POST-image rows (its
        // pre-image deletes render from the PREVIOUS lineage, where the
        // cross-reset bridge is correctly refused → b2 reads NULL)
        .select("b2").collect().map(_.getString(0)).sorted
      assert(post.toSeq === Seq("aa", "bb"),
        "same-lineage rename fallback must keep serving pre-rename values")
    } finally spark.sql("DROP TABLE graft_cat.spec.cflg")
  }

  test("'changes' is a reserved ref: create_branch refuses it") {
    cat()
    spark.range(3).select(col("id").as("k")).writeTo("graft_cat.spec.cdcr").create()
    try {
      val e = intercept[Exception] {
        spark.sql("CALL graft_cat.system.create_branch('spec.cdcr', 'changes')")
      }
      assert(e.getMessage.contains("reserved"))
    } finally spark.sql("DROP TABLE graft_cat.spec.cdcr")
  }

  test("PARTITIONED CDC: per-shard diffs — untouched shards contribute nothing, drops render pre-images") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.cf3").partitionedBy(col("event_type")).create()
    try {
      // v1 = CTAS: every row an insert
      val v1 = ChangeFeed.tableChanges(spark, "spec.cf3", 0, 1)
      assert(v1.filter(col("_change_type") === "insert").count() === base.count())
      // v2 = partition-local COW rewrite: ONLY the 'error' shard diffs —
      // its pre-image rows delete, its post-image rows insert; every
      // other shard is reference-identical and contributes nothing
      spark.sql(
        "DELETE FROM graft_cat.spec.cf3 WHERE event_type = 'error' AND value < 50")
      val errBefore = base.filter(col("event_type") === "error").count()
      val errAfter = spark.table("graft_cat.spec.cf3")
        .filter(col("event_type") === "error").count()
      val v2 = ChangeFeed.tableChanges(spark, "spec.cf3", 1, 2)
      assert(v2.filter(col("_change_type") === "delete").count() === errBefore)
      assert(v2.filter(col("_change_type") === "insert").count() === errAfter)
      assert(v2.filter(col("event_type") =!= "error").count() === 0L,
        "untouched shards must contribute nothing")
      // v3 = partition DROP (metadata delete): the retired shard's live
      // rows render as deletes
      spark.sql("DELETE FROM graft_cat.spec.cf3 WHERE event_type = 'click'")
      val clicks = base.filter(col("event_type") === "click").count()
      val v3 = ChangeFeed.tableChanges(spark, "spec.cf3", 2, 3)
      assert(v3.filter(col("_change_type") === "delete").count() === clicks)
      assert(v3.filter(col("_change_type") =!= "delete").count() === 0L)
      // the t@changes VIEW serves the same rows (shared walk)
      val viaView = spark.table("graft_cat.spec.`cf3@changes`")
        .filter(col("_commit_version") === 2)
        .orderBy("_change_type", "event_id", "value").collect().toSeq
      val viaApi = v2
        .orderBy("_change_type", "event_id", "value").collect().toSeq
      assert(viaView === viaApi)
      // and the STREAMING feed drains the full partitioned history with
      // version-ordinal offsets (shape-agnostic micro-batch stream)
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_cf3s")
        .resolve("c").toString
      val q = spark.readStream.table("graft_cat.spec.`cf3@changes`")
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
      assert(seen.get ===
        v1.count() + v2.count() + v3.count())
    } finally spark.sql("DROP TABLE graft_cat.spec.cf3")
  }

  test("refusals: out-of-range and retention-expired versions") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))

    val b2 = base.select(col("event_id"), col("value"))
    b2.writeTo("graft_cat.spec.cf4").create()
    try {
      b2.limit(5).writeTo("graft_cat.spec.cf4").append() // v2
      intercept[IllegalArgumentException] {
        ChangeFeed.tableChanges(spark, "spec.cf4", 0, 99)
      }
      spark.sql("CALL graft_cat.system.expire_versions('spec.cf4', 1)")
      intercept[IllegalArgumentException] {
        ChangeFeed.tableChanges(spark, "spec.cf4", 0, 2)
      }
    } finally spark.sql("DROP TABLE graft_cat.spec.cf4")
  }

  test("a bounded range ending before a LATER rename renders through the range-end snapshot (ADVICE r17)") {
    cat()
    // v1 commits under name `b`; v2 renames b→c; v3 appends under `c`;
    // v4 renames c→d. tableChanges(0,3) renders in hist(3)'s schema
    // (`c`) — resolving slots against the LATEST snapshot (named `d`)
    // would miss the by-name lookup and null out v1's values, even
    // though hist(3) still bridges the slot
    spark.createDataFrame(Seq((1L, "x"), (2L, "y"))).toDF("k", "b")
      .repartition(1).writeTo("graft_cat.spec.cfre").create() // v0, v1
    try {
      spark.sql("ALTER TABLE graft_cat.spec.cfre RENAME COLUMN b TO c") // v2
      spark.createDataFrame(Seq((3L, "z"))).toDF("k", "c")
        .repartition(1).writeTo("graft_cat.spec.cfre").append() // v3
      spark.sql("ALTER TABLE graft_cat.spec.cfre RENAME COLUMN c TO d") // v4
      val ch = ChangeFeed.tableChanges(spark, "spec.cfre", 0, 3).cache()
      assert(ch.columns.contains("c"),
        "the feed renders in the range-end version's schema")
      val v1 = ch.filter(col("_commit_version") === 1)
        .select("c").collect().map(_.getString(0)).sorted.toSeq
      assert(v1 === Seq("x", "y"),
        "pre-rename rows must serve their values through the range-end slot bridge")
      assert(ch.filter(col("_commit_version") === 3)
        .select("c").head.getString(0) === "z")
      // the unbounded walk (current schema `d`) keeps resolving against
      // the latest snapshot — both names serve the same slot's values
      val all = ChangeFeed.tableChanges(spark, "spec.cfre", 0, 4)
      assert(all.filter(col("_commit_version") === 1)
        .select("d").collect().map(_.getString(0)).sorted.toSeq ===
        Seq("x", "y"))
    } finally spark.sql("DROP TABLE graft_cat.spec.cfre")
  }

  test("PARTITIONED: a bounded range ending before a later rename bridges slots the same way (ADVICE r17)") {
    cat()
    spark.createDataFrame(Seq(("p1", 1L, "x"), ("p2", 2L, "y")))
      .toDF("p", "k", "b").repartition(1)
      .writeTo("graft_cat.spec.cfrp").partitionedBy(col("p")).create()
    try {
      spark.sql("ALTER TABLE graft_cat.spec.cfrp RENAME COLUMN b TO c")
      spark.createDataFrame(Seq(("p1", 3L, "z"))).toDF("p", "k", "c")
        .repartition(1).writeTo("graft_cat.spec.cfrp").append()
      val endV = graft.sources.GraftCatalog
        .partVersions("cat::graft_cat.spec.cfrp").size - 1
      spark.sql("ALTER TABLE graft_cat.spec.cfrp RENAME COLUMN c TO d")
      val ch = ChangeFeed.tableChanges(spark, "spec.cfrp", 0, endV)
      assert(ch.columns.contains("c"))
      assert(ch.filter(col("_change_type") === "insert")
        .select("c").collect().map(_.getString(0)).sorted.toSeq ===
        Seq("x", "y", "z"),
        "partitioned pre-rename rows must bridge through the range-end shards")
    } finally spark.sql("DROP TABLE graft_cat.spec.cfrp")
  }

  test("timestamp bounds: at-or-before start, half-open range, clamping, refusals (VERDICT r19 #3)") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.filter(col("event_id") % 2 === 0)
      .writeTo("graft_cat.spec.cfts").create() // v0 create, v1 data
    try {
      Thread.sleep(15)
      val t1 = System.currentTimeMillis()
      Thread.sleep(15)
      base.filter(col("event_id") % 2 === 1)
        .writeTo("graft_cat.spec.cfts").append() // v2
      Thread.sleep(15)
      val t2 = System.currentTimeMillis()
      Thread.sleep(15)
      spark.sql("DELETE FROM graft_cat.spec.cfts WHERE value < 40") // v3 DV

      val odd = base.filter(col("event_id") % 2 === 1).count()
      val dels = base.filter(col("value") < 40).count()
      // since t1 (state then = v1): exactly v2's inserts + v3's deletes
      val sinceT1 = ChangeFeed.tableChangesSince(spark, "spec.cfts",
        t1.toString)
      assert(sinceT1.filter(col("_change_type") === "insert").count() === odd)
      assert(sinceT1.filter(col("_change_type") === "delete").count() === dels)
      // since t2: v3 only
      assert(ChangeFeed.tableChangesSince(spark, "spec.cfts", t2.toString)
        .count() === dels)
      // bounded window (t1, t2]: v2 only — the half-open contract
      val window = ChangeFeed.tableChangesSince(spark, "spec.cfts",
        t1.toString, Some(t2.toString))
      assert(window.count() === odd)
      assert(window.filter(col("_change_type") =!= "insert").count() === 0L)
      // a start predating the table clamps to the creation version
      assert(ChangeFeed.tableChangesSince(spark, "spec.cfts", "0").count()
        === ChangeFeed.tableChanges(spark, "spec.cfts", 0, 3).count())
      // an END bound predating every commit refuses loudly — an empty
      // answer would read as "no changes" when the range is unaddressable
      val e1 = intercept[IllegalArgumentException] {
        ChangeFeed.tableChangesSince(spark, "spec.cfts", "0", Some("1"))
      }
      assert(e1.getMessage.contains("at or before"), e1.getMessage)
      // a garbage bound refuses with the format hint
      val e2 = intercept[IllegalArgumentException] {
        ChangeFeed.tableChangesSince(spark, "spec.cfts", "not-a-time")
      }
      assert(e2.getMessage.contains("epoch millis"), e2.getMessage)
      // the DSv2 options spelling on `t@changes` serves the same window
      val viaOpts = spark.read.option("startingTimestamp", t1.toString)
        .option("endingTimestamp", t2.toString)
        .table("graft_cat.spec.`cfts@changes`")
      assert(viaOpts.count() === odd)
      // startingTimestamp and startingOffsets=latest are two different
      // anchors — combining them refuses
      val e3 = intercept[Exception] {
        spark.read.option("startingOffsets", "latest")
          .option("startingTimestamp", t1.toString)
          .table("graft_cat.spec.`cfts@changes`").count()
      }
      assert(e3.getMessage.contains("mutually exclusive"), e3.getMessage)
      // the ORDINAL option spelling — both bounds INCLUSIVE (Delta
      // parity): [2, 2] = v2 only, like the timestamp window
      val viaVersions = spark.read.option("startingVersion", "2")
        .option("endingVersion", "2")
        .table("graft_cat.spec.`cfts@changes`")
      assert(viaVersions.count() === odd)
      // one anchor per side: version + timestamp together refuse
      val e5 = intercept[Exception] {
        spark.read.option("startingVersion", "1")
          .option("startingTimestamp", t1.toString)
          .table("graft_cat.spec.`cfts@changes`").count()
      }
      assert(e5.getMessage.contains("mutually exclusive"), e5.getMessage)
      // out-of-range ordinals refuse with the ledger size
      val e6 = intercept[Exception] {
        spark.read.option("startingVersion", "99")
          .table("graft_cat.spec.`cfts@changes`").count()
      }
      assert(e6.getMessage.contains("out of range"), e6.getMessage)
      // an INVERTED window refuses loudly on the options path too
      val e7 = intercept[Exception] {
        spark.read.option("startingVersion", "3")
          .option("endingVersion", "1")
          .table("graft_cat.spec.`cfts@changes`").count()
      }
      assert(e7.getMessage.contains("inverted range"), e7.getMessage)
      // an expired range refuses through the walk's both-sides-live
      // check, not silently truncates
      spark.sql("CALL graft_cat.system.expire_versions('spec.cfts', 1)")
      val e4 = intercept[Exception] {
        ChangeFeed.tableChangesSince(spark, "spec.cfts", t1.toString)
          .count()
      }
      assert(e4.getMessage.contains("expired"), e4.getMessage)
    } finally spark.sql("DROP TABLE graft_cat.spec.cfts")
  }

  test("STREAMING timestamp anchor: startingTimestamp seeds the FIRST run; the checkpoint wins after") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.filter(col("event_id") % 2 === 0)
      .writeTo("graft_cat.spec.cfst").create() // v0, v1
    val root = java.nio.file.Files.createTempDirectory("graft_cfst")
    try {
      Thread.sleep(15)
      val t1 = System.currentTimeMillis()
      Thread.sleep(15)
      base.filter(col("event_id") % 2 === 1)
        .writeTo("graft_cat.spec.cfst").append() // v2
      val odd = base.filter(col("event_id") % 2 === 1).count()
      val dels = base.filter(col("value") < 40).count()
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      def drain(): Long = {
        seen.set(0)
        val q = spark.readStream.option("startingTimestamp", t1.toString)
          .table("graft_cat.spec.`cfst@changes`")
          .writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            seen.addAndGet(df.count()); ()
          }
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally { scala.util.Try(q.stop()); () }
        seen.get
      }
      // first run: only the commits AFTER the instant (v2) — v1's
      // creation rows are behind the anchor
      assert(drain() === odd)
      // restart with the SAME checkpoint: the offset wins over the
      // anchor — only the NEW commit streams, nothing replays
      spark.sql("DELETE FROM graft_cat.spec.cfst WHERE value < 40") // v3
      assert(drain() === dels)
    } finally spark.sql("DROP TABLE graft_cat.spec.cfst")
  }
}
