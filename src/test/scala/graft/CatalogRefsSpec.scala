package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.{GraftCatalog, GraftStore}

/** Ledger observability (`CALL system.history`) and named refs (tags):
  * commit kinds derived from consecutive snapshots, and tag pins that
  * survive ordinal retention.
  */
class CatalogRefsSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("history derives each commit's kind from the ledger") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.h1").create() // v0 create, v1 append
    try {
      base.limit(7).select((col("event_id") + 1000000L).as("event_id"),
        col("value")).writeTo("graft_cat.spec.h1").append() // v2
      spark.sql("DELETE FROM graft_cat.spec.h1 WHERE value < 40") // v3 DV
      spark.sql("UPDATE graft_cat.spec.h1 SET value = value + 1") // v4 rewrite
      spark.sql("ALTER TABLE graft_cat.spec.h1 ADD COLUMN tag STRING") // v5
      val kinds = spark.sql("CALL graft_cat.system.history('spec.h1')")
        .orderBy("version").select("kind").collect().map(_.getString(0))
      assert(kinds.toSeq === Seq("create", "append", "append",
        "delete-vectors", "rewrite", "evolve"))
      val h = spark.sql("CALL graft_cat.system.history('spec.h1')")
        .orderBy("version").collect()
      // DV commit: physical rows unchanged, live rows dropped
      assert(h(3).getLong(3) === h(2).getLong(3))
      assert(h(3).getLong(4) < h(3).getLong(3))
      // rewrite: physical == live again, epoch bumped past the DV commit
      assert(h(4).getLong(3) === h(4).getLong(4))
      assert(h(4).getInt(5) === h(3).getInt(5) + 1)
    } finally spark.sql("DROP TABLE graft_cat.spec.h1")
  }

  test("a tag pins a DV'd snapshot: the merge-on-read view survives compaction") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
      .limit(80)
    spark.createDataFrame(base.collectAsList(), base.schema)
      .writeTo("graft_cat.spec.tgdv").create()
    try {
      spark.sql("DELETE FROM graft_cat.spec.tgdv WHERE value < 40") // DV commit
      val live = spark.table("graft_cat.spec.tgdv").count()
      spark.sql("CALL graft_cat.system.create_tag('spec.tgdv', 'curated')")
      // compaction replaces batches entirely; the tag's pinned snapshot
      // still serves the DV'd view (its own batches + vectors)
      spark.sql("CALL graft_cat.system.compact('spec.tgdv')")
      spark.sql("INSERT INTO graft_cat.spec.tgdv VALUES (999999, 1.0)")
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.tgdv VERSION AS OF 'curated'")
        .head.getLong(0) === live)
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.tgdv VERSION AS OF 'curated' " +
          "WHERE value < 40").head.getLong(0) === 0L,
        "the tag must serve the deletion vectors it was pinned with")
    } finally spark.sql("DROP TABLE graft_cat.spec.tgdv")
  }

  test("tags pin a snapshot through later DML AND ordinal retention; lifecycle is clean") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.tg").create()
    try {
      val full = base.count()
      spark.sql("CALL graft_cat.system.create_tag('spec.tg', 'prewipe')")
      spark.sql("DELETE FROM graft_cat.spec.tg WHERE value < 40")
      // the tag still serves the pre-delete content
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.tg VERSION AS OF 'prewipe'")
        .head.getLong(0) === full)
      // ordinal retention reaps the tagged version's slot — the tag's
      // pin survives (refs protect snapshots)
      spark.sql("CALL graft_cat.system.expire_versions('spec.tg', 1)")
      intercept[Exception] {
        spark.sql("SELECT count(*) FROM graft_cat.spec.tg VERSION AS OF 1")
          .head
      }
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.tg VERSION AS OF 'prewipe'")
        .head.getLong(0) === full)
      // unknown ref and ordinal-shadowing names are refused loudly
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM graft_cat.spec.tg VERSION AS OF 'nope'").head
      }
      assert(e.getMessage.contains("neither an integer commit ordinal"))
      intercept[Exception] {
        spark.sql("CALL graft_cat.system.create_tag('spec.tg', '7')")
      }
      spark.sql("CALL graft_cat.system.drop_tag('spec.tg', 'prewipe')")
      intercept[Exception] {
        spark.sql(
          "SELECT count(*) FROM graft_cat.spec.tg VERSION AS OF 'prewipe'")
          .head
      }
    } finally spark.sql("DROP TABLE graft_cat.spec.tg")
    assert(!GraftCatalog.tags.keys.exists(_.startsWith("cat::graft_cat.spec.tg#t=")),
      "DROP TABLE must reap tags")
  }

  test("PARTITIONED tags + retention: refs pin shard snapshots through rewrites and ledger expiry") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.ptg").partitionedBy(col("event_type")).create()
    try {
      val full = base.count()
      spark.sql("CALL graft_cat.system.create_tag('spec.ptg', 'prewipe')")
      // a partition-local COW rewrite drops and re-creates the shard —
      // the tag's pinned snapshot objects keep serving the old content
      spark.sql("DELETE FROM graft_cat.spec.ptg WHERE event_type = 'error' AND value < 50")
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.ptg VERSION AS OF 'prewipe'")
        .head.getLong(0) === full)
      // table-level ledger retention: the tagged ordinal expires, the
      // tag survives (refs protect snapshots, partitioned edition)
      val res = spark.sql(
        "CALL graft_cat.system.expire_versions('spec.ptg', 1)").head
      assert(res.getInt(0) === 2, "v0+v1 expired") // keep only v2
      assert(res.getInt(1) === 2)
      val gone = intercept[Exception] {
        spark.sql("SELECT count(*) FROM graft_cat.spec.ptg VERSION AS OF 1").head
      }
      assert(gone.getMessage.contains("EXPIRED by retention"),
        gone.getMessage.take(140))
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.ptg VERSION AS OF 'prewipe'")
        .head.getLong(0) === full)
      // rollback to an expired ordinal refuses loudly
      val rb = intercept[Exception] {
        spark.sql("CALL graft_cat.system.rollback('spec.ptg', 1)").head
      }
      assert(rb.getMessage.contains("expired by retention"),
        rb.getMessage.take(140))
      spark.sql("CALL graft_cat.system.drop_tag('spec.ptg', 'prewipe')")
      intercept[Exception] {
        spark.sql(
          "SELECT count(*) FROM graft_cat.spec.ptg VERSION AS OF 'prewipe'")
          .head
      }
    } finally spark.sql("DROP TABLE graft_cat.spec.ptg")
    assert(!GraftCatalog.partTags.keys
      .exists(_.startsWith("cat::graft_cat.spec.ptg#t=")),
      "DROP TABLE must reap partitioned tags")
  }

  test("PARTITIONED history walks the table-level ledger with per-shard-diff kinds") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.phist")
      .partitionedBy(col("event_type")).create() // v0 create, v1 data
    try {
      spark.sql(
        "INSERT INTO graft_cat.spec.phist VALUES (900001, 'error', 1.0)") // v2
      spark.sql(
        "DELETE FROM graft_cat.spec.phist WHERE event_type = 'error' AND value < 50") // v3: shard-local COW
      val h = spark.sql("CALL graft_cat.system.history('spec.phist')")
        .collect()
      // one row per TABLE-LEVEL version — not the base store's
      // create-only history (the pre-r17 rendering)
      assert(h.length === 4, h.mkString("; "))
      assert(h(0).getString(1) === "create")
      assert(h(1).getString(1) === "append")
      assert(h(2).getString(1) === "append")
      assert(h(3).getString(1) === "rewrite",
        s"partition-local COW must classify from the shard diff: ${h(3)}")
      // live counts move with the commits, summed across shards
      assert(h(2).getLong(4) === base.count() + 1)
      assert(h(3).getLong(4) < h(2).getLong(4))
    } finally spark.sql("DROP TABLE graft_cat.spec.phist")
  }

  test("PARTITIONED retention releases shard-history snapshots the ledger no longer pins") {
    cat()
    val k = "cat::graft_cat.spec.ptr"
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.ptr").partitionedBy(col("event_type")).create()
    try {
      // grow shard histories: two more table-level commits
      spark.sql(
        "INSERT INTO graft_cat.spec.ptr VALUES (900001, 'error', 1.0)")
      spark.sql("CALL graft_cat.system.create_tag('spec.ptr', 'mid')")
      spark.sql(
        "INSERT INTO graft_cat.spec.ptr VALUES (900002, 'error', 2.0)")
      val errKey = s"$k#p=error"
      val (liveBefore, totalBefore) = GraftStore.historySlots(errKey)
      assert(liveBefore === totalBefore && totalBefore >= 3,
        s"expected a fully-live shard history, got $liveBefore/$totalBefore")
      // keep only the latest table-level version: the two expired
      // ledger entries were the last pins on the shard's older
      // snapshots — their history slots must tombstone (the VACUUM
      // half of retention; an unreleased snapshot is a storage leak)
      spark.sql("CALL graft_cat.system.expire_versions('spec.ptr', 1)")
      val (liveAfter, totalAfter) = GraftStore.historySlots(errKey)
      assert(totalAfter === totalBefore, "ordinals must stay stable")
      assert(liveAfter < liveBefore,
        s"shard history released nothing: $liveAfter/$totalAfter")
      // the tag still pins its snapshot: the 'mid' read keeps serving
      // (refs protect snapshots even after their history slot's ledger
      // version expired)
      val midCount = spark.sql(
        "SELECT count(*) FROM graft_cat.spec.ptr VERSION AS OF 'mid'")
        .head.getLong(0)
      assert(midCount === base.count() + 1)
      // the live head still serves
      assert(spark.table("graft_cat.spec.ptr").count() === base.count() + 2)
      // base-key history released its unpinned snapshots too
      val (baseLive, baseTotal) = GraftStore.historySlots(k)
      assert(baseLive <= baseTotal)
    } finally spark.sql("DROP TABLE graft_cat.spec.ptr")
  }

  test("TIMESTAMP AS OF resolves to the latest commit at-or-before; partitioned and FOR SYSTEM_TIME spellings; pre-history refusal") {
    cat()
    def lit(ms: Long): String = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))
    val evBase = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id").limit(50)
    val ev = spark.createDataFrame(evBase.collectAsList(), evBase.schema)
    val t0 = System.currentTimeMillis() - 60000 // before any commit
    // FLAT table
    ev.writeTo("graft_cat.spec.tt1").create()
    Thread.sleep(15); val mid = System.currentTimeMillis(); Thread.sleep(15)
    spark.sql("DELETE FROM graft_cat.spec.tt1 WHERE value < 50")
    try {
      val nMid = spark.sql(
        s"SELECT count(*) FROM graft_cat.spec.tt1 TIMESTAMP AS OF '${lit(mid)}'")
        .head.getLong(0)
      assert(nMid === 50L, "mid timestamp must serve the pre-delete state")
      // the ANSI system-versioning spelling rides the same path
      assert(spark.sql("SELECT count(*) FROM graft_cat.spec.tt1 " +
        s"FOR SYSTEM_TIME AS OF '${lit(System.currentTimeMillis() + 5)}'")
        .head.getLong(0) ===
        ev.filter(col("value") >= 50 || col("value").isNull).count())
      val e = intercept[Exception] {
        spark.sql("SELECT count(*) FROM graft_cat.spec.tt1 " +
          s"TIMESTAMP AS OF '${lit(t0)}'").collect()
      }
      assert(e.getMessage.contains("no version"), e.getMessage.take(200))
    } finally spark.sql("DROP TABLE graft_cat.spec.tt1")
    // PARTITIONED table: resolution walks the table-level ledger
    spark.sql(
      """CREATE TABLE graft_cat.spec.tt2 (event_id BIGINT, ts TIMESTAMP,
        |  value DOUBLE) PARTITIONED BY (days(ts))""".stripMargin)
    try {
      val rows = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("value")).limit(40)
      spark.createDataFrame(rows.collectAsList(), rows.schema)
        .writeTo("graft_cat.spec.tt2").append()
      Thread.sleep(15); val pMid = System.currentTimeMillis(); Thread.sleep(15)
      spark.sql("DELETE FROM graft_cat.spec.tt2 WHERE value < 50")
      assert(spark.sql("SELECT count(*) FROM graft_cat.spec.tt2 " +
        s"TIMESTAMP AS OF '${lit(pMid)}'").head.getLong(0) === 40L,
        "partitioned timestamp travel must pin the pre-delete shard set")
    } finally spark.sql("DROP TABLE graft_cat.spec.tt2")
  }

  test("expire_older_than: wall-clock retention over the commit ledger; expired range refuses both time-travel spellings") {
    cat()
    def lit(ms: Long): String = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(ms))
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"))
    ev.writeTo("graft_cat.spec.exot").create() // v0 empty, v1 data
    try {
      Thread.sleep(15); val mid = System.currentTimeMillis(); Thread.sleep(15)
      spark.sql("DELETE FROM graft_cat.spec.exot WHERE value < 50") // v2
      Thread.sleep(15); val bound = System.currentTimeMillis(); Thread.sleep(15)
      spark.sql("INSERT INTO graft_cat.spec.exot VALUES (9999999, 0.0)") // v3
      // the UTC timestamp-literal spelling of the bound
      val r = spark.sql("CALL graft_cat.system.expire_older_than(" +
        s"'spec.exot', '${lit(bound)}')").head
      assert(r.getInt(0) === 3 && r.getInt(1) === 3,
        s"expected 3 expired / first live 3, got $r")
      // the live head keeps serving
      assert(spark.table("graft_cat.spec.exot").count() ===
        ev.filter(col("value") >= 50 || col("value").isNull).count() + 1)
      // both time-travel spellings refuse the expired range
      val e1 = intercept[Exception] {
        spark.sql("SELECT count(*) FROM graft_cat.spec.exot " +
          "VERSION AS OF 1").collect()
      }
      assert(e1.getMessage.contains("EXPIRED"), e1.getMessage.take(160))
      val e2 = intercept[Exception] {
        spark.sql("SELECT count(*) FROM graft_cat.spec.exot " +
          s"TIMESTAMP AS OF '${lit(mid)}'").collect()
      }
      assert(e2.getMessage.contains("EXPIRED"), e2.getMessage.take(160))
      // retention never deletes the head: an all-future bound keeps 1
      val r2 = spark.sql("CALL graft_cat.system.expire_older_than(" +
        s"'spec.exot', '${System.currentTimeMillis() + 3600000}')").head
      assert(r2.getInt(1) === 3, "the head version must survive any bound")
      assert(spark.table("graft_cat.spec.exot").count() > 0)
    } finally spark.sql("DROP TABLE graft_cat.spec.exot")
  }

  test("metadata tables: t@snapshots tracks expiry with stable ordinals; t@partitions reports per-shard debt; names reserved") {
    cat()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_type").isNotNull)
    ev.writeTo("graft_cat.spec.meta1").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      spark.sql("DELETE FROM graft_cat.spec.meta1 WHERE event_id % 9 = 0")
      val snaps = spark.table("graft_cat.spec.`meta1@snapshots`")
      assert(snaps.count() === 3L, "create + append + delete = 3 versions")
      // live_rows per version: v1 full, v2 post-delete
      val byV = snaps.collect().map(r => r.getInt(0) -> r).toMap
      assert(byV(1).getLong(2) === ev.count())
      assert(byV(2).getLong(2) ===
        ev.filter(col("event_id") % 9 =!= 0).count())
      assert(!byV(2).getBoolean(4))
      // partitions: one row per shard, DV debt attributed per shard
      val parts = spark.table("graft_cat.spec.`meta1@partitions`")
      assert(parts.count() ===
        ev.select("event_type").distinct().count())
      assert(parts.agg(sum(col("dv_deleted"))).head.getLong(0) ===
        ev.filter(col("event_id") % 9 === 0).count())
      // expiry: ordinals stay, expired entries null their stats
      spark.sql("CALL graft_cat.system.expire_versions('spec.meta1', 1)")
      val after = spark.table("graft_cat.spec.`meta1@snapshots`")
      assert(after.count() === 3L, "ordinals must stay stable across expiry")
      assert(after.filter(col("expired")).count() === 2L)
      assert(after.filter(col("expired") && col("live_rows").isNotNull)
        .count() === 0L)
      // reserved: no branch may take the metadata-table names
      val e = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.create_branch('spec.meta1', 'snapshots')")
      }
      assert(e.getMessage.contains("reserved"), e.getMessage.take(160))
    } finally spark.sql("DROP TABLE graft_cat.spec.meta1")
  }

  test("'#' is refused in table, branch, tag and clone-target names (ADVICE r19: store-key suffix collisions)") {
    cat()
    // '#' separates internal store-key suffixes (#p= shards, #b=
    // branches, #t= tags, #q= epoch marks): a backticked name carrying
    // it would be enumerated as another table's shard/branch keys
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_cat.spec.`x#p=1` (id BIGINT)")
    }
    assert(e1.getMessage.contains("#"), e1.getMessage)
    spark.sql("CREATE TABLE graft_cat.spec.refguard (id BIGINT)")
    try {
      val e2 = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.create_branch('spec.refguard', 'b#p=0')")
      }
      assert(e2.getMessage.contains("#"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.create_tag('spec.refguard', 't#q=x')")
      }
      assert(e3.getMessage.contains("#"), e3.getMessage)
      val e4 = intercept[Exception] {
        spark.sql("CALL graft_cat.system.clone_table('spec.refguard', " +
          "'spec.y#b=main')")
      }
      assert(e4.getMessage.contains("#"), e4.getMessage)
    } finally spark.sql("DROP TABLE graft_cat.spec.refguard")
  }

  test("RENAME TO moves the whole identity: ledgers, tags, branches, epoch marks; refusals loud (VERDICT r19 #1)") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.rn1").create() // v0 create, v1 data
    try {
      spark.sql("DELETE FROM graft_cat.spec.rn1 WHERE value < 40") // v2
      spark.sql("CALL graft_cat.system.create_tag('spec.rn1', 'pre')")
      spark.sql("CALL graft_cat.system.create_branch('spec.rn1', 'wip')")
      val n101 = base.filter(col("event_id") % 101 === 0).count()
      base.filter(col("event_id") % 101 === 0)
        .writeTo("graft_cat.spec.`rn1@wip`").append()
      // streaming exactly-once ledger mark, keyed per (store, query)
      val schema = spark.table("graft_cat.spec.rn1").schema
      assert(GraftStore.publishEpoch("cat::graft_cat.spec.rn1", schema,
        Seq.empty, epochId = 5L, queryId = "qq"))
      val preCount = spark.table("graft_cat.spec.rn1").count()

      spark.sql("ALTER TABLE graft_cat.spec.rn1 RENAME TO spec.rn2")

      // the old name is GONE (loud, not phantom)
      intercept[Exception] {
        spark.table("graft_cat.spec.rn1").collect()
      }
      // head, time travel and the tag all serve through the NEW name —
      // the ledgers moved wholesale
      assert(spark.table("graft_cat.spec.rn2").count() === preCount)
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.rn2 VERSION AS OF 1")
        .head.getLong(0) === base.count())
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.rn2 VERSION AS OF 'pre'")
        .head.getLong(0) === preCount)
      // the diverged branch moved with its content
      assert(spark.table("graft_cat.spec.`rn2@wip`").count() ===
        preCount + n101)
      // the exactly-once epoch ledger moved: a restarted stream against
      // the NEW name replays its epoch as a no-op
      assert(!GraftStore.publishEpoch("cat::graft_cat.spec.rn2", schema,
        Seq.empty, epochId = 5L, queryId = "qq"),
        "the moved epoch mark must suppress the replay under the new name")
      // the ref inventory lists under the new name
      val names = spark.table("graft_cat.spec.`rn2@refs`")
        .select("name").collect().map(_.getString(0)).sorted.toSeq
      assert(names === Seq("main", "pre", "wip"))
      // refusals: reserved chars in the target, existing target
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE graft_cat.spec.rn2 RENAME TO spec.`bad@nm`")
      }
      assert(e1.getMessage.contains("reserved"), e1.getMessage.take(200))
      // a '#'-carrying NAMESPACE would forge a key inside another
      // table's shard space — refused like createTable (review r20)
      val e1b = intercept[Exception] {
        spark.sql(
          "ALTER TABLE graft_cat.spec.rn2 RENAME TO `spec.rn2#p=v`.x")
      }
      assert(e1b.getMessage.contains("#"), e1b.getMessage.take(200))
      spark.range(3).select(col("id")).writeTo("graft_cat.spec.rn3").create()
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE graft_cat.spec.rn2 RENAME TO spec.rn3")
      }
      assert(e2.getMessage.toLowerCase.contains("already exists"),
        e2.getMessage.take(200))
    } finally {
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.rn2"))
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.rn3"))
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.rn1")); ()
    }
  }

  test("PARTITIONED rename: shards, spec registrations and the table-level ledger follow the new name") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_type").isNotNull)
    base.writeTo("graft_cat.spec.rnp1").partitionedBy(col("event_type"))
      .create()
    try {
      spark.sql("DELETE FROM graft_cat.spec.rnp1 WHERE value < 40") // v2
      spark.sql("ALTER TABLE graft_cat.spec.rnp1 RENAME TO spec.rnp2")
      val expect = base.filter(col("value") >= 40).count()
      assert(spark.table("graft_cat.spec.rnp2").count() === expect)
      // partition pruning still keys on the moved shard registrations
      val types = base.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted
      assert(spark.table("graft_cat.spec.rnp2")
        .filter(col("event_type") === types.head).count() ===
        base.filter(col("value") >= 40 &&
          col("event_type") === types.head).count())
      // the table-level ledger moved: time travel across the rename
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.rnp2 VERSION AS OF 1")
        .head.getLong(0) === base.count())
      // shard inventory serves under the new name
      assert(spark.table("graft_cat.spec.`rnp2@partitions`").count() ===
        types.length.toLong)
    } finally {
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.rnp2"))
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.rnp1")); ()
    }
  }

  test("t@refs inventory: main + branches + tags with heads/fences; reserved refs never appear (VERDICT r19 #4)") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.rf1")
      .tableProperty("write.delete.mode", "equality").create()
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.rf1', 'wap')")
      spark.sql("CALL graft_cat.system.create_tag('spec.rf1', 'gold')")
      val refs = spark.table("graft_cat.spec.`rf1@refs`").collect()
      val byName = refs.map(r => r.getString(0) -> r.getString(1)).toMap
      // the eq-delete channel (`rf1@eq_deletes`) and the reserved
      // metadata/CDC refs are ADDRESSING SCHEMES, not stateful refs:
      // the inventory is exactly main + branches + tags
      assert(byName === Map("main" -> "branch", "wap" -> "branch",
        "gold" -> "tag"))
      val main = refs.find(_.getString(0) == "main").get
      assert(main.getInt(2) === 1, "main head = its ledger head ordinal")
      assert(main.isNullAt(3))
      assert(main.getLong(4) === base.count())
      val wap = refs.find(_.getString(0) == "wap").get
      assert(wap.getInt(2) === 0, "a fresh fork starts its own ledger")
      assert(wap.getInt(3) === 2, "fork fence = main commit count at fork")
      val gold = refs.find(_.getString(0) == "gold").get
      assert(gold.getInt(2) === 1, "tag pins the then-head ordinal")
      assert(gold.getLong(4) === base.count())
      // drop_branch removes it from the inventory
      spark.sql("CALL graft_cat.system.drop_branch('spec.rf1', 'wap')")
      assert(spark.table("graft_cat.spec.`rf1@refs`").count() === 2L)
      // 'refs' and 'history' are reserved names: create_branch refuses
      val e = intercept[Exception] {
        spark.sql("CALL graft_cat.system.create_branch('spec.rf1', 'refs')")
      }
      assert(e.getMessage.contains("reserved"), e.getMessage.take(200))
      val eh = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.create_branch('spec.rf1', 'history')")
      }
      assert(eh.getMessage.contains("reserved"), eh.getMessage.take(200))
      // the ancestry view: linear by construction, parents = v-1
      val hist = spark.table("graft_cat.spec.`rf1@history`").collect()
      assert(hist.length === 2) // v0 create, v1 data
      assert(hist.forall(_.getBoolean(3)), "linear ledger: all ancestors")
      assert(hist.count(_.isNullAt(2)) === 1, "exactly one root")
    } finally spark.sql("DROP TABLE graft_cat.spec.rf1")
  }

  test("PARTITIONED t@refs: branch heads off the branch ledger, tags pin shard sets, live rows sum shards") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_type").isNotNull)
    base.writeTo("graft_cat.spec.rfp").partitionedBy(col("event_type"))
      .create() // table-level ledger: v0 create, v1 CTAS
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.rfp', 'wap')")
      spark.sql(
        "DELETE FROM graft_cat.spec.`rfp@wap` WHERE value < 40") // branch v+1
      spark.sql("CALL graft_cat.system.create_tag('spec.rfp', 'gold')")
      val refs = spark.table("graft_cat.spec.`rfp@refs`").collect()
        .map(r => r.getString(0) -> r).toMap
      assert(refs.keySet === Set("main", "wap", "gold"))
      assert(refs("main").getString(1) === "branch")
      assert(refs("main").getInt(2) === 1, "main head = table-level ledger")
      assert(refs("main").getLong(4) === base.count())
      assert(refs("wap").getInt(3) === 2,
        "fork fence = main table-level commit count at fork")
      assert(refs("wap").getLong(4) ===
        base.filter(col("value") >= 40).count(),
        "branch live rows sum the BRANCH's shard stores")
      assert(refs("gold").getString(1) === "tag")
      assert(refs("gold").getInt(2) === 1,
        "tag's ordinal located in the table-level ledger")
      assert(refs("gold").getLong(4) === base.count())
      // the partitioned ancestry view serves too
      val hist = spark.table("graft_cat.spec.`rfp@history`").collect()
      assert(hist.length === 2)
      assert(hist.forall(_.getBoolean(3)))
    } finally spark.sql("DROP TABLE graft_cat.spec.rfp")
  }

  test("WAP audit: t@b@partitions / t@b@files / t@b@snapshots serve the BRANCH's own inventory; main stays dark") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_type").isNotNull)
    base.writeTo("graft_cat.spec.wau").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.wau', 'audit')")
      spark.sql(
        "DELETE FROM graft_cat.spec.`wau@audit` WHERE event_id % 2 = 0")
      val deleted = base.filter(col("event_id") % 2 === 0).count()
      // the branch's shard inventory carries the branch's DV debt...
      val bparts = spark.table("graft_cat.spec.`wau@audit@partitions`")
        .collect()
      assert(bparts.map(_.getLong(4)).sum === deleted)
      // ...while main's inventory is dark (the WAP contract)
      val mparts = spark.table("graft_cat.spec.`wau@partitions`").collect()
      assert(mparts.map(_.getLong(4)).sum === 0L)
      assert(mparts.map(_.getLong(2)).sum === base.count())
      // branch batch inventory: physical counts conserved, debt visible
      val bfiles = spark.table("graft_cat.spec.`wau@audit@files`").collect()
      assert(bfiles.map(_.getLong(2)).sum === base.count())
      assert(bfiles.map(_.getLong(3)).sum === deleted)
      // branch version ledger: the fork seed + the delete commit
      val bsnaps = spark.table("graft_cat.spec.`wau@audit@snapshots`")
        .collect()
      assert(bsnaps.length === 2)
      assert(bsnaps.map(_.getInt(0)).toSeq.sorted === Seq(0, 1))
      // branch historical census: fork version debt-free, head carries it
      val baf = spark.table("graft_cat.spec.`wau@audit@all_files`")
        .collect()
      assert(baf.filter(_.getInt(0) == 0).map(_.getLong(4)).sum === 0L)
      assert(baf.filter(_.getBoolean(5)).map(_.getLong(4)).sum === deleted)
      // an unknown branch refuses rather than serving an empty audit
      intercept[Exception] {
        spark.table("graft_cat.spec.`wau@nope@files`").collect()
      }
    } finally spark.sql("DROP TABLE graft_cat.spec.wau")
  }

  test("t@files batch inventory: physical counts, DV debt, bounds keyed by CURRENT column names; reserved name refused") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.fl1")
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      val extra = base.filter(col("event_id") % 7 === 0)
      extra.writeTo("graft_cat.spec.fl1").append() // second batch set
      spark.sql("DELETE FROM graft_cat.spec.fl1 WHERE event_id % 5 = 0")
      val files = spark.table("graft_cat.spec.`fl1@files`").collect()
      assert(files.nonEmpty)
      assert(files.forall(_.isNullAt(0)), "flat table: partition is null")
      // record_count is PHYSICAL — the MOR delete masks, never shrinks
      val written = base.count() + extra.count()
      assert(files.map(_.getLong(2)).sum === written)
      // dv_deleted sums to exactly the masked rows
      val masked = base.filter(col("event_id") % 5 === 0).count() +
        extra.filter(col("event_id") % 5 === 0).count()
      assert(files.map(_.getLong(3)).sum === masked)
      assert(spark.table("graft_cat.spec.fl1").count() === written - masked)
      // bounds: min-of-mins / max-of-maxs over batches = the data's range
      // (deleted rows INCLUDED — footer stats are commit-time physical)
      def boundsOf(col4: Int, key: String): Seq[Long] = files.toSeq
        .filterNot(_.isNullAt(col4))
        .flatMap(r => r.getMap[String, String](col4).get(key))
        .map(_.toLong)
      val ids = base.select("event_id").collect().map(_.getLong(0))
      assert(boundsOf(4, "event_id").min === ids.min)
      assert(boundsOf(5, "event_id").max === ids.max)
      // null tracking: 'value' has nulls in the fixture; event_id never
      val nullCols = files.toSeq.filterNot(_.isNullAt(6))
        .flatMap(_.getSeq[String](6)).toSet
      val hasNullValues =
        base.filter(col("value").isNull).count() > 0
      assert(!nullCols.contains("event_id"))
      assert(nullCols.contains("value") === hasNullValues)
      // bounds follow a RENAME COLUMN: keyed by the CURRENT logical
      // name through the slot projection (the field-id contract)
      spark.sql(
        "ALTER TABLE graft_cat.spec.fl1 RENAME COLUMN value TO amount")
      val renamed = spark.table("graft_cat.spec.`fl1@files`").collect()
      val keys = renamed.toSeq.filterNot(_.isNullAt(4))
        .flatMap(_.getMap[String, String](4).keys).toSet
      assert(keys.contains("amount") && !keys.contains("value"))
      // 'files' is a reserved ref: create_branch refuses
      val e = intercept[Exception] {
        spark.sql("CALL graft_cat.system.create_branch('spec.fl1', 'files')")
      }
      assert(e.getMessage.contains("reserved"), e.getMessage.take(200))
    } finally spark.sql("DROP TABLE graft_cat.spec.fl1")
  }

  test("t@all_files: historical census across versions; expired versions absent; t@b@history composes") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.af1").create() // v0 create, v1 CTAS
    try {
      base.filter(col("event_id") % 101 === 0)
        .writeTo("graft_cat.spec.af1").append() // v2
      spark.sql("DELETE FROM graft_cat.spec.af1 WHERE value < 40") // v3 DV
      def census(): Array[org.apache.spark.sql.Row] =
        spark.table("graft_cat.spec.`af1@all_files`").collect()
      val af = census()
      // v0 (empty create) contributes no batch rows; v1..v3 all serve
      assert(af.map(_.getInt(0)).toSet === Set(1, 2, 3))
      def rows(v: Int) = af.filter(_.getInt(0) == v).map(_.getLong(3)).sum
      def dv(v: Int) = af.filter(_.getInt(0) == v).map(_.getLong(4)).sum
      // the DV commit conserves physical rows; debt appears AT v3 only
      assert(rows(3) === rows(2))
      assert(rows(2) === rows(1) +
        base.filter(col("event_id") % 101 === 0).count())
      val deleted = base.filter(col("value") < 40).count() +
        base.filter(col("event_id") % 101 === 0)
          .filter(col("value") < 40).count()
      assert(dv(1) === 0L && dv(2) === 0L && dv(3) === deleted)
      // is_current marks the head version's rows only
      assert(af.filter(_.getBoolean(5)).map(_.getInt(0)).toSet === Set(3))
      // retention: expired versions are ABSENT from the census (their
      // ordinals stay visible in t@snapshots as tombstones)
      spark.sql("CALL graft_cat.system.expire_versions('spec.af1', 2)")
      assert(census().map(_.getInt(0)).toSet === Set(2, 3))
      // ... and branch ancestry composes like the other branch-scoped
      // metadata tables
      spark.sql("CALL graft_cat.system.create_branch('spec.af1', 'wip')")
      val bh = spark.table("graft_cat.spec.`af1@wip@history`").collect()
      assert(bh.nonEmpty && bh.forall(_.getBoolean(3)))
    } finally spark.sql("DROP TABLE graft_cat.spec.af1")
  }

  test("PARTITIONED t@files agrees with t@partitions: per-shard batch counts and live = record_count - dv_deleted") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_type").isNotNull)
    base.writeTo("graft_cat.spec.flp").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      spark.sql("DELETE FROM graft_cat.spec.flp WHERE event_id % 4 = 1")
      val files = spark.table("graft_cat.spec.`flp@files`").collect()
      val parts = spark.table("graft_cat.spec.`flp@partitions`").collect()
      val filesBy = files.groupBy(_.getString(0))
      assert(filesBy.keySet === parts.map(_.getString(0)).toSet)
      parts.foreach { p =>
        val f = filesBy(p.getString(0))
        assert(f.length === p.getInt(3), "batch count per shard agrees")
        assert(f.map(_.getLong(2)).sum - f.map(_.getLong(3)).sum ===
          p.getLong(2), "live = physical - DV debt, per shard")
      }
      // shard-local bounds: each shard's batches only cover ITS rows
      val perShardMin = base.groupBy("event_type")
        .agg(min("event_id").as("m")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      filesBy.foreach { case (part, fs) =>
        val lo = fs.toSeq.filterNot(_.isNullAt(4))
          .flatMap(_.getMap[String, String](4).get("event_id")).map(_.toLong)
        assert(lo.min === perShardMin(part), s"shard $part lower bound")
      }
      // the PARTITIONED historical census agrees with t@files at the
      // current version: same shard coverage, same physical/debt sums
      val afCur = spark.table("graft_cat.spec.`flp@all_files`").collect()
        .filter(_.getBoolean(5))
      assert(afCur.map(_.getString(1)).toSet === filesBy.keySet)
      assert(afCur.map(_.getLong(3)).sum === files.map(_.getLong(2)).sum)
      assert(afCur.map(_.getLong(4)).sum === files.map(_.getLong(3)).sum)
    } finally spark.sql("DROP TABLE graft_cat.spec.flp")
  }
}
