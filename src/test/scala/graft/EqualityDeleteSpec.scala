package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.GraftStore

/** EQUALITY deletes — Iceberg v2's second delete model (VERDICT r16
  * missing #2). The load-bearing pins:
  *   - the COMMIT is pure metadata: committed batches AND the
  *     positional DV map are REFERENCE-identical across the delete —
  *     the writer never scanned the target and never resolved a
  *     position (that is the whole point vs the positional DV tier);
  *   - application happens AT READ, with sequence semantics: only
  *     batches that existed at commit time are subject, so a key
  *     re-inserted after the delete is visible;
  *   - the tiers compose (positional DVs on top, compaction
  *     materializes both away) and the slot binding survives RENAME.
  */
class EqualityDeleteSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  private def mkTable(name: String): (String, Long) = {
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo(s"graft_cat.spec.$name")
      .tableProperty("write.mode", "merge-on-read")
      .tableProperty("write.delete.mode", "equality")
      .create()
    (s"cat::graft_cat.spec.$name", base.count())
  }

  test("equality DELETE is a pure-metadata commit: no batch rewrite, no position resolution, rows hidden at read") {
    cat()
    val (key, total) = mkTable("eq1")
    try {
      val batchesBefore = GraftStore.batchesRef(key).get
      val dvsBefore = GraftStore.dvsRef(key).get
      val v = GraftStore.versionCount(key)
      val errors = spark.table("graft_cat.spec.eq1")
        .filter(col("event_type") === "error").count()
      assert(errors > 0, "fixture must contain 'error' rows")
      spark.sql("DELETE FROM graft_cat.spec.eq1 WHERE event_type = 'error'")
      // THE pin: neither data nor positional DVs moved — the delete
      // committed a tuple set, nothing else
      assert(GraftStore.batchesRef(key).get eq batchesBefore,
        "equality delete must not rewrite any committed batch")
      assert(GraftStore.dvsRef(key).get eq dvsBefore,
        "equality delete must not resolve positions into DVs")
      assert(GraftStore.eqDeleteCount(key) === 1)
      assert(GraftStore.versionCount(key) === v + 1,
        "an equality delete is one first-class commit")
      // applied at read
      assert(spark.table("graft_cat.spec.eq1").count() === total - errors)
      assert(spark.table("graft_cat.spec.eq1")
        .filter(col("event_type") === "error").count() === 0L)
      // ledger observability: the commit classifies as its own kind
      val kinds = spark.sql(
        "CALL graft_cat.system.history('spec.eq1')")
        .select("kind").collect().map(_.getString(0))
      assert(kinds.last === "equality-delete", kinds.mkString(","))
      // time travel: the pre-delete version still serves every row
      assert(spark.sql(
        s"SELECT count(*) FROM graft_cat.spec.eq1 VERSION AS OF ${v - 1}")
        .head.getLong(0) === total)
    } finally spark.sql("DROP TABLE graft_cat.spec.eq1")
  }

  test("sequence semantics: a key re-inserted AFTER the equality delete stays visible") {
    cat()
    val (key, total) = mkTable("eq2")
    try {
      val errors = spark.table("graft_cat.spec.eq2")
        .filter(col("event_type") === "error").count()
      spark.sql("DELETE FROM graft_cat.spec.eq2 WHERE event_type = 'error'")
      spark.sql(
        "INSERT INTO graft_cat.spec.eq2 VALUES (90000001, 'error', 42.5)")
      // the post-delete append is NOT subject to the earlier delete
      val back = spark.table("graft_cat.spec.eq2")
        .filter(col("event_type") === "error").collect()
      assert(back.length === 1 && back(0).getLong(0) === 90000001L,
        "the re-inserted key must be visible (appliesBefore fencing)")
      assert(spark.table("graft_cat.spec.eq2").count() ===
        total - errors + 1)
      // a SECOND equality delete (tuple set on another column) removes
      // it again — IN translates to one tuple per value
      spark.sql(
        "DELETE FROM graft_cat.spec.eq2 WHERE event_id IN (90000001)")
      assert(GraftStore.eqDeleteCount(key) === 2)
      assert(spark.table("graft_cat.spec.eq2")
        .filter(col("event_type") === "error").count() === 0L)
    } finally spark.sql("DROP TABLE graft_cat.spec.eq2")
  }

  test("tiers compose: positional DV delete skips eq-deleted rows; compaction materializes both away") {
    cat()
    val (key, total) = mkTable("eq3")
    try {
      val base = spark.table("graft_cat.spec.eq3").cache()
      val errors = base.filter(col("event_type") === "error").count()
      val lowNonError = base.filter(col("value") < 30 &&
        col("event_type") =!= "error").count()
      spark.sql("DELETE FROM graft_cat.spec.eq3 WHERE event_type = 'error'")
      // non-equality shape → the positional DV tier; it must count and
      // mark ONLY rows still live under the reader view
      spark.sql("DELETE FROM graft_cat.spec.eq3 WHERE value < 30")
      assert(GraftStore.dvMarkedCount(key) === lowNonError,
        "positional tier must not re-mark eq-deleted rows")
      val expect = total - errors - lowNonError
      assert(spark.table("graft_cat.spec.eq3").count() === expect)
      // compaction: one rewrite materializes DVs AND equality deletes
      spark.sql("CALL graft_cat.system.compact('spec.eq3')")
      assert(GraftStore.eqDeleteCount(key) === 0,
        "compaction must clear pending equality deletes")
      assert(GraftStore.dvMarkedCount(key) === 0L)
      assert(spark.table("graft_cat.spec.eq3").count() === expect)
      assert(spark.table("graft_cat.spec.eq3")
        .filter(col("event_type") === "error" || col("value") < 30)
        .count() === 0L)
      base.unpersist()
    } finally spark.sql("DROP TABLE graft_cat.spec.eq3")
  }

  test("the slot binding survives RENAME COLUMN; the change feed renders row-exact deletes") {
    cat()
    val (_, total) = mkTable("eq4")
    try {
      val errors = spark.table("graft_cat.spec.eq4")
        .filter(col("event_type") === "error").count()
      val v = GraftStore.versionCount("cat::graft_cat.spec.eq4")
      spark.sql("DELETE FROM graft_cat.spec.eq4 WHERE event_type = 'error'")
      // the CDC view renders the commit as deletes — row-exact, even
      // though the commit itself never resolved a position
      val feed = spark.table("graft_cat.spec.`eq4@changes`")
        .filter(col("_commit_version") === v)
      assert(feed.count() === errors)
      assert(feed.filter(col("_change_type") =!= "delete").count() === 0L)
      // rename the filtered column: the tuple set is bound to the SLOT
      // (field-id contract), so it keeps applying
      spark.sql(
        "ALTER TABLE graft_cat.spec.eq4 RENAME COLUMN event_type TO kind")
      assert(spark.table("graft_cat.spec.eq4")
        .filter(col("kind") === "error").count() === 0L)
      assert(spark.table("graft_cat.spec.eq4").count() === total - errors)
    } finally spark.sql("DROP TABLE graft_cat.spec.eq4")
  }

  test("PARTITIONED equality delete: metadata-only per shard, ONE table version, partition-col tuples route to owning shards") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.peq")
      .partitionedBy(col("event_type"))
      .tableProperty("write.delete.mode", "equality").create()
    val k = "cat::graft_cat.spec.peq"
    val errKey = s"$k#p=error"
    val viewKey = s"$k#p=view"
    try {
      val total = base.count()
      val errBatches = GraftStore.batchesRef(errKey).get
      val errDvs = GraftStore.dvsRef(errKey).get
      val ledger0 = graft.sources.GraftCatalog.partVersions(k).size
      // keyed tuple set with NO partition conjunct: recorded on every
      // live shard, each commit pure metadata, ONE table-level version
      spark.sql("DELETE FROM graft_cat.spec.peq WHERE event_id IN (2, 4, 8)")
      assert(GraftStore.batchesRef(errKey).get eq errBatches)
      assert(GraftStore.dvsRef(errKey).get eq errDvs,
        "partitioned eq delete must not resolve positions")
      assert(GraftStore.eqDeleteCount(errKey) === 1)
      assert(GraftStore.eqDeleteCount(viewKey) === 1)
      assert(graft.sources.GraftCatalog.partVersions(k).size === ledger0 + 1,
        "one statement = one table-level version")
      assert(spark.table("graft_cat.spec.peq").count() ===
        total - base.filter(col("event_id").isin(2, 4, 8)).count())
      // tuple set naming the partition SOURCE column routes through the
      // transform: ONLY the owning shard records it
      spark.sql(
        "DELETE FROM graft_cat.spec.peq WHERE event_type = 'error' AND event_id = 9")
      assert(GraftStore.eqDeleteCount(errKey) === 2)
      assert(GraftStore.eqDeleteCount(viewKey) === 1,
        "non-owning shards must not record a partition-scoped tuple set")
      // time travel through the table-level ledger still serves the
      // pre-delete content
      assert(spark.sql(
        s"SELECT count(*) FROM graft_cat.spec.peq VERSION AS OF ${ledger0 - 1}")
        .head.getLong(0) === total)
    } finally spark.sql("DROP TABLE graft_cat.spec.peq")
  }

  test("a WAP branch inherits equality-delete mode; the flag is reaped with the branch") {
    cat()
    val (key, total) = mkTable("eqb")
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.eqb', 'tx')")
      val bk = s"$key#b=tx"
      val branchBatches = GraftStore.batchesRef(bk).get
      spark.sql(
        "DELETE FROM graft_cat.spec.`eqb@tx` WHERE event_type = 'error'")
      // the branch DELETE took the equality tier: tuple-set commit on
      // the BRANCH store, no batch rewrite, no positional resolution
      assert(GraftStore.eqDeleteCount(bk) === 1,
        "branch must inherit write.delete.mode=equality")
      assert(GraftStore.batchesRef(bk).get eq branchBatches)
      assert(GraftStore.dvMarkedCount(bk) === 0L)
      // main untouched until publish; publish carries the tuple set
      assert(spark.table("graft_cat.spec.eqb").count() === total)
      assert(GraftStore.eqDeleteCount(key) === 0)
      spark.sql("CALL graft_cat.system.publish_branch('spec.eqb', 'tx')")
      assert(spark.table("graft_cat.spec.eqb")
        .filter(col("event_type") === "error").count() === 0L)
      assert(!graft.sources.GraftCatalog.eqDeleteTables.contains(bk),
        "publish must reap the branch flag")
    } finally spark.sql("DROP TABLE graft_cat.spec.eqb")
  }

  test("without the table property, the same DELETE stays positional (opt-in contract)") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.eq5").create()
    val key = "cat::graft_cat.spec.eq5"
    try {
      spark.sql("DELETE FROM graft_cat.spec.eq5 WHERE event_type = 'error'")
      assert(GraftStore.eqDeleteCount(key) === 0,
        "a table without write.delete.mode=equality must not commit eq-deletes")
      assert(GraftStore.dvMarkedCount(key) > 0L,
        "the default pushable-DELETE tier is positional DVs")
    } finally spark.sql("DROP TABLE graft_cat.spec.eq5")
  }

  test("PLAN-SOURCED eq-delete (t@eq_deletes): the key set ships as a distributed write, pure-metadata commit, deduped tuples") {
    cat()
    val (key, total) = mkTable("eq6")
    try {
      val batchesBefore = GraftStore.batchesRef(key).get
      val dvsBefore = GraftStore.dvsRef(key).get
      val errors = spark.table("graft_cat.spec.eq6")
        .filter(col("event_type") === "error")
      val nErr = errors.count()
      val nKeys = errors.select("event_id").distinct().count()
      assert(nErr > 0)
      // the key set is a PLAN — multi-partition, duplicated 3×, with a
      // NULL-carrying tuple thrown in; tasks dedup, the driver merges,
      // NULL tuples drop (SQL equality never matches NULL)
      errors.select("event_id")
        .unionAll(errors.select("event_id"))
        .unionAll(errors.select("event_id"))
        .unionAll(spark.range(1).select(lit(null).cast("long").as("event_id")))
        .repartition(8)
        .writeTo("graft_cat.spec.`eq6@eq_deletes`").append()
      assert(GraftStore.batchesRef(key).get eq batchesBefore,
        "plan-sourced eq-delete must not rewrite any committed batch")
      assert(GraftStore.dvsRef(key).get eq dvsBefore,
        "plan-sourced eq-delete must not resolve positions into DVs")
      assert(GraftStore.eqDeleteCount(key) === 1,
        "one statement = one tuple-set commit")
      assert(GraftStore.eqDeleteTupleCount(key) === nKeys.toInt,
        "tuples must be globally deduped and NULL tuples dropped")
      assert(spark.table("graft_cat.spec.eq6").count() === total - nErr)
      assert(spark.table("graft_cat.spec.eq6")
        .filter(col("event_type") === "error").count() === 0L)
      // sequence semantics hold for the channel too: re-insert after
      // (sourced from the PARQUET base — the table view is now empty)
      val back = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
        .filter(col("event_type") === "error").limit(5)
      back.writeTo("graft_cat.spec.eq6").append()
      assert(spark.table("graft_cat.spec.eq6")
        .filter(col("event_type") === "error").count() === 5L)
      // an all-duplicate re-send still commits a (new) set; an EMPTY
      // key frame commits nothing at all
      val v = GraftStore.versionCount(key)
      errors.limit(0).select("event_id")
        .writeTo("graft_cat.spec.`eq6@eq_deletes`").append()
      assert(GraftStore.versionCount(key) === v,
        "an empty key frame must not create a ledger commit")
    } finally spark.sql("DROP TABLE graft_cat.spec.eq6")
  }

  test("plan-sourced eq-delete on a PARTITIONED table routes tuples to owning shards, one table version") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.eq7").partitionedBy(col("event_type"))
      .tableProperty("write.delete.mode", "equality").create()
    val key = "cat::graft_cat.spec.eq7"
    try {
      val ledger0 = graft.sources.GraftCatalog.partVersions(key).size
      val errKeys = spark.table("graft_cat.spec.eq7")
        .filter(col("event_type") === "error").select("event_id")
      val nErr = errKeys.count()
      // the key frame names the partition SOURCE column: tuples route
      // to exactly the owning shard — other shards record nothing
      spark.table("graft_cat.spec.eq7")
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("event_type"))
        .repartition(4)
        .writeTo("graft_cat.spec.`eq7@eq_deletes`").append()
      assert(GraftStore.eqDeleteCount(key + "#p=error") === 1)
      assert(GraftStore.keysWithPrefix(key + "#p=")
        .filterNot(_.endsWith("error"))
        .forall(GraftStore.eqDeleteCount(_) === 0),
        "tuples constraining the partition column must not fan to other shards")
      assert(graft.sources.GraftCatalog.partVersions(key).size ===
        ledger0 + 1, "one statement = one table-level version")
      assert(spark.table("graft_cat.spec.eq7")
        .filter(col("event_type") === "error").count() === 0L)
      assert(spark.table("graft_cat.spec.eq7").count() ===
        base.count() - nErr)
      // a key frame WITHOUT the partition column fans to every shard
      // (sourced from the parquet base — the table's error view is empty)
      base.filter(col("event_type") === "error").select("event_id")
        .limit(3).writeTo("graft_cat.spec.`eq7@eq_deletes`").append()
      assert(GraftStore.keysWithPrefix(key + "#p=")
        .forall(GraftStore.eqDeleteCount(_) >= 1),
        "tuples not naming the partition column must reach every shard")
    } finally spark.sql("DROP TABLE graft_cat.spec.eq7")
  }

  test("eq-delete channel refusals: opt-in contract, unknown/duplicate/float keys, reserved ref") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.eq8").create() // NOT equality mode
    try {
      val noMode = intercept[Exception] {
        base.select("event_id")
          .writeTo("graft_cat.spec.`eq8@eq_deletes`").append()
      }
      assert(noMode.getMessage.contains("write.delete.mode"),
        noMode.getMessage.take(160))
    } finally spark.sql("DROP TABLE graft_cat.spec.eq8")
    val (_, _) = mkTable("eq9")
    try {
      val unknown = intercept[Exception] {
        base.select(col("event_id").as("nope"))
          .writeTo("graft_cat.spec.`eq9@eq_deletes`").append()
      }
      assert(unknown.getMessage.contains("not a column"),
        unknown.getMessage.take(160))
      val float = intercept[Exception] {
        base.select("value") // DOUBLE
          .writeTo("graft_cat.spec.`eq9@eq_deletes`").append()
      }
      assert(float.getMessage.contains("FLOAT/DOUBLE"),
        float.getMessage.take(160))
      // ACCEPT_ANY_SCHEMA skips coercion, so a type-mismatched key
      // frame would probe with boxed values that can never equal the
      // stored rows — a silent no-op delete; must refuse loudly
      val mistyped = intercept[Exception] {
        base.select(col("event_id").cast("int").as("event_id"))
          .writeTo("graft_cat.spec.`eq9@eq_deletes`").append()
      }
      assert(mistyped.getMessage.contains("exact type"),
        mistyped.getMessage.take(160))
      val reserved = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.create_branch('spec.eq9', 'eq_deletes')")
      }
      assert(reserved.getMessage.contains("reserved"),
        reserved.getMessage.take(160))
    } finally spark.sql("DROP TABLE graft_cat.spec.eq9")
  }

  test("compaction/cluster on a PARTITIONED table with PENDING eq-deletes: no resurrection, seq contract survives renumbering (VERDICT r17 #6)") {
    cat()
    spark.range(0, 12)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("v"))
      .repartition(1)
      .writeTo("graft_cat.spec.eqc").partitionedBy(col("p"))
      .tableProperty("write.delete.mode", "equality").create()
    val key = "cat::graft_cat.spec.eqc"
    try {
      // pending eq-delete on every shard, then a key RE-INSERTED after
      // it (visible under sequence semantics) — the state compaction
      // must preserve exactly
      spark.sql("DELETE FROM graft_cat.spec.eqc WHERE v IN (2, 3, 4)")
      spark.sql("INSERT INTO graft_cat.spec.eqc VALUES ('0', 4)")
      val before = spark.table("graft_cat.spec.eqc")
        .orderBy("p", "v").collect().toSeq
      assert(before.map(_.getLong(1)).count(_ == 4L) === 1,
        "the re-inserted key must be visible pre-compaction")
      assert(GraftStore.keysWithPrefix(key + "#p=")
        .map(GraftStore.eqDeleteCount).sum > 0, "eq-deletes must be PENDING")
      spark.sql("CALL graft_cat.system.compact('spec.eqc')")
      // survivors identical; eq-deleted rows NOT resurrected; the
      // re-inserted row (post-delete seq) survives; debt paid down
      assert(spark.table("graft_cat.spec.eqc")
        .orderBy("p", "v").collect().toSeq === before,
        "compaction must preserve the logical view exactly")
      assert(GraftStore.keysWithPrefix(key + "#p=")
        .map(GraftStore.eqDeleteCount).sum === 0,
        "compaction must materialize pending eq-deletes away")
      // batch renumbering is safe for LATER eq-deletes: a fresh delete
      // against the compacted (renumbered) batches still lands exactly
      spark.sql("DELETE FROM graft_cat.spec.eqc WHERE v = 7")
      assert(spark.table("graft_cat.spec.eqc")
        .filter(col("v") === 7L).count() === 0L)
      // and CLUSTER with a pending eq-delete behaves the same
      spark.sql("DELETE FROM graft_cat.spec.eqc WHERE v IN (8, 9)")
      val want = spark.table("graft_cat.spec.eqc")
        .orderBy("p", "v").collect().toSeq
      spark.sql("CALL graft_cat.system.cluster('spec.eqc', 'v', 2)")
      assert(spark.table("graft_cat.spec.eqc")
        .orderBy("p", "v").collect().toSeq === want,
        "cluster must not resurrect eq-deleted rows")
      assert(GraftStore.keysWithPrefix(key + "#p=")
        .map(GraftStore.eqDeleteCount).sum === 0)
    } finally spark.sql("DROP TABLE graft_cat.spec.eqc")
  }

  test("DELETE ... WHERE k IN (SELECT ...) on an eq-delete table routes through the channel: pure metadata, no target scan") {
    cat()
    val (key, total) = mkTable("eqs1")
    // a SOURCE table holding the keys to retire — the subquery is a
    // genuine distributed plan over another table, not a literal list
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "error").select(col("event_id"))
      .writeTo("graft_cat.spec.eqs1del").create()
    try {
      val batchesBefore = GraftStore.batchesRef(key).get
      val dvsBefore = GraftStore.dvsRef(key).get
      val nDel = spark.table("graft_cat.spec.eqs1")
        .filter(col("event_type") === "error").count()
      spark.sql(
        """DELETE FROM graft_cat.spec.eqs1 WHERE event_id IN
          |  (SELECT event_id FROM graft_cat.spec.eqs1del)""".stripMargin)
      // THE pin: the subquery DELETE committed a tuple set — neither
      // the data nor the positional DV map moved (a COW rewrite would
      // replace batches; a MOR delta would mark DVs)
      assert(GraftStore.batchesRef(key).get eq batchesBefore,
        "IN-subquery eq-delete must not rewrite any committed batch")
      assert(GraftStore.dvsRef(key).get eq dvsBefore,
        "IN-subquery eq-delete must not resolve positions into DVs")
      assert(GraftStore.eqDeleteCount(key) === 1)
      assert(spark.table("graft_cat.spec.eqs1").count() === total - nDel)
      assert(spark.table("graft_cat.spec.eqs1")
        .filter(col("event_type") === "error").count() === 0L)
      // sequence semantics: re-insert after, still visible
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("value"))
        .filter(col("event_type") === "error").limit(3)
        .writeTo("graft_cat.spec.eqs1").append()
      assert(spark.table("graft_cat.spec.eqs1")
        .filter(col("event_type") === "error").count() === 3L)
      // multi-column key: (a, b) IN (SELECT ...) routes too — capture
      // fresh refs (the re-insert above legitimately appended a batch)
      val eqSets = GraftStore.eqDeleteCount(key)
      val batchesMid = GraftStore.batchesRef(key).get
      spark.sql(
        """DELETE FROM graft_cat.spec.eqs1 WHERE (event_id, event_type) IN
          |  (SELECT event_id, 'error' FROM graft_cat.spec.eqs1del LIMIT 2)"""
          .stripMargin)
      assert(GraftStore.eqDeleteCount(key) === eqSets + 1,
        "multi-column IN-subquery must also commit a tuple set")
      assert(GraftStore.batchesRef(key).get eq batchesMid,
        "the multi-column tuple-set commit must not touch data")
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.eqs1")
      spark.sql("DROP TABLE graft_cat.spec.eqs1del")
    }
  }

  test("IN-subquery DELETE conservative fallbacks: non-eq table, residual conjunct, double key all keep the row-level path") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.limit(50).select(col("event_id")).repartition(1)
      .writeTo("graft_cat.spec.eqs2del").create()
    // (a) non-eq-mode table: stays COW (data rewritten, no tuple set)
    base.writeTo("graft_cat.spec.eqs2").create()
    try {
      spark.sql(
        """DELETE FROM graft_cat.spec.eqs2 WHERE event_id IN
          |  (SELECT event_id FROM graft_cat.spec.eqs2del)""".stripMargin)
      assert(GraftStore.eqDeleteCount("cat::graft_cat.spec.eqs2") === 0,
        "a non-equality table must not commit eq-deletes")
      assert(spark.table("graft_cat.spec.eqs2").count() === base.count() - 50)
    } finally spark.sql("DROP TABLE graft_cat.spec.eqs2")
    // (b) residual conjunct alongside the subquery: row-level path
    // (the extra predicate needs target-row evaluation)
    val (key3, _) = mkTable("eqs3")
    try {
      spark.sql(
        """DELETE FROM graft_cat.spec.eqs3 WHERE event_id IN
          |  (SELECT event_id FROM graft_cat.spec.eqs2del)
          |  AND value < 1e9""".stripMargin)
      assert(GraftStore.eqDeleteCount(key3) === 0,
        "a residual conjunct must keep the row-level path")
      assert(spark.table("graft_cat.spec.eqs3")
        .join(spark.table("graft_cat.spec.eqs2del"), "event_id")
        .filter(col("value") < 1e9).count() === 0L,
        "the row-level path must still delete the matched rows")
    } finally spark.sql("DROP TABLE graft_cat.spec.eqs3")
    // (b2) CORRELATED subquery: carries an OuterReference into the key
    // plan — cannot run standalone as the channel source, must keep
    // the row-level path (planned as a join against the target)
    val (key5, total5) = mkTable("eqs5")
    try {
      spark.sql(
        """DELETE FROM graft_cat.spec.eqs5 t WHERE event_id IN
          |  (SELECT d.event_id FROM graft_cat.spec.eqs2del d
          |   WHERE d.event_id = t.event_id AND t.value < 1e9)""".stripMargin)
      assert(GraftStore.eqDeleteCount(key5) === 0,
        "a correlated IN-subquery must keep the row-level path")
      assert(spark.table("graft_cat.spec.eqs5").count() < total5,
        "the row-level path must still delete the matched rows")
    } finally spark.sql("DROP TABLE graft_cat.spec.eqs5")
    // (c) DOUBLE key column: refused by the channel contract, so the
    // rewrite must not fire — row-level path, still correct
    val (key4, total4) = mkTable("eqs4")
    base.limit(20).select(col("value")).repartition(1)
      .writeTo("graft_cat.spec.eqs4del").create()
    try {
      spark.sql(
        """DELETE FROM graft_cat.spec.eqs4 WHERE value IN
          |  (SELECT value FROM graft_cat.spec.eqs4del)""".stripMargin)
      assert(GraftStore.eqDeleteCount(key4) === 0,
        "a DOUBLE key must keep the row-level path")
      assert(spark.table("graft_cat.spec.eqs4").count() < total4)
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.eqs4")
      spark.sql("DROP TABLE graft_cat.spec.eqs4del")
      spark.sql("DROP TABLE graft_cat.spec.eqs2del")
    }
  }

  test("the eq-delete channel composes with WAP: t@b@eq_deletes commits on the BRANCH, main dark until publish") {
    cat()
    val (key, total) = mkTable("eqb1")
    val bk = key + "#b=cur"
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.eqb1', 'cur')")
      val mainBatches = GraftStore.batchesRef(key).get
      // the curation pass: retire the error keys ON THE BRANCH via the
      // branch's own plan-sourced channel
      Tables.events(spark, sfDir)
        .filter(col("event_type") === "error").select("event_id")
        .repartition(4)
        .writeTo("graft_cat.spec.`eqb1@cur@eq_deletes`").append()
      assert(GraftStore.eqDeleteCount(bk) === 1,
        "the tuple set must land on the BRANCH store")
      assert(GraftStore.eqDeleteCount(key) === 0,
        "main must carry no eq-delete before publish")
      assert(spark.table("graft_cat.spec.`eqb1@cur`")
        .filter(col("event_type") === "error").count() === 0L)
      assert(spark.table("graft_cat.spec.eqb1").count() === total,
        "main must stay dark until publish")
      // the IN-subquery SQL form routes on the branch too
      Tables.events(spark, sfDir)
        .filter(col("event_type") === "click").select("event_id").limit(5)
        .repartition(1).writeTo("graft_cat.spec.eqb1k").create()
      spark.sql(
        """DELETE FROM graft_cat.spec.`eqb1@cur` WHERE event_id IN
          |  (SELECT event_id FROM graft_cat.spec.eqb1k)""".stripMargin)
      assert(GraftStore.eqDeleteCount(bk) === 2,
        "the branch subquery-DELETE must commit a second tuple set")
      assert(GraftStore.batchesRef(bk).get eq mainBatches,
        "branch channel commits must not rewrite shared batches")
      // publish: the tuple sets arrive by reference, main reads hide
      val want = spark.table("graft_cat.spec.`eqb1@cur`")
        .orderBy("event_id").collect().toSeq
      spark.sql("CALL graft_cat.system.publish_branch('spec.eqb1', 'cur')")
      assert(GraftStore.eqDeleteCount(key) === 2,
        "publish must carry the branch's eq-delete sets")
      assert(spark.table("graft_cat.spec.eqb1")
        .orderBy("event_id").collect().toSeq === want)
      // the reserved composite ref cannot be a branch name
      val e = intercept[Exception] {
        spark.sql("CALL graft_cat.system.create_branch('spec.eqb1', 'a@b')")
      }
      assert(e.getMessage.contains("cannot contain '@'"),
        e.getMessage.take(160))
      // DOTTED branch names route too (the channel ref splits the
      // branch suffix off before dot-splitting the path)
      spark.sql("CALL graft_cat.system.create_branch('spec.eqb1', 'v1.fix')")
      // the fork inherits main's (published) pending sets; the branch
      // DELETE must add exactly one more through its own channel
      val inherited = GraftStore.eqDeleteCount(key + "#b=v1.fix")
      spark.sql(
        """DELETE FROM graft_cat.spec.`eqb1@v1.fix` WHERE event_id IN
          |  (SELECT event_id FROM graft_cat.spec.eqb1k)""".stripMargin)
      assert(GraftStore.eqDeleteCount(key + "#b=v1.fix") === inherited + 1,
        "a dotted branch name must still route through its channel")
      spark.sql("CALL graft_cat.system.drop_branch('spec.eqb1', 'v1.fix')")
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.eqb1")
      spark.sql("DROP TABLE graft_cat.spec.eqb1k")
    }
  }

  test("the eq-delete channel ENFORCES the per-statement tuple budget (VERDICT r18 #3)") {
    cat()
    val (key, _) = mkTable("eqbud")
    try {
      // shrink the budget so the fixture's distinct key count exceeds it
      spark.conf.set("spark.graft.eqDelete.tupleBudget", "3")
      val keys = spark.table("graft_cat.spec.eqbud")
        .select(col("event_id")).distinct().limit(10)
      val err = intercept[Exception] {
        keys.writeTo("graft_cat.spec.`eqbud@eq_deletes`").append()
      }
      def rootMsg(t: Throwable): String =
        (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
      assert(rootMsg(err).contains("per-statement budget"),
        s"refusal must name the budget, got: ${rootMsg(err).take(300)}")
      // the refused statement committed NOTHING
      assert(GraftStore.eqDeleteCount(key) === 0,
        "a budget refusal must not leave a partial tuple-set commit")
      // within budget: commits normally
      spark.conf.set("spark.graft.eqDelete.tupleBudget", "4194304")
      keys.writeTo("graft_cat.spec.`eqbud@eq_deletes`").append()
      assert(GraftStore.eqDeleteCount(key) === 1)
    } finally {
      spark.conf.set("spark.graft.eqDelete.tupleBudget", "4194304")
      spark.sql("DROP TABLE graft_cat.spec.eqbud")
    }
  }

  test("the streaming upsert path carries no data-proportional driver collect (VERDICT r17 #1 pin)") {
    // mechanical pin, ReadmeClaimsSpec-style: the upsert recipe's
    // foreachBatch must source the eq-delete keys as a PLAN (the
    // t@eq_deletes channel), never .collect() them or string-build an
    // IN (...) DELETE
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/streaming/StreamingOps.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    Seq("def streamUpsertEq(" -> "streamUpsertEqOracle",
        "def streamUpsertEqPartitioned(" ->
          "streamUpsertEqPartitionedOracle").foreach {
      case (defMarker, endMarker) =>
        val start = src.indexOf(defMarker)
        assert(start >= 0, s"$defMarker must exist")
        val end = src.indexOf(endMarker, start)
        val body = src.substring(start, if (end < 0) src.length else end)
        assert(!body.contains(".collect()"),
          s"$defMarker must not collect batch keys to the driver")
        assert(!body.contains("IN ("),
          s"$defMarker must not string-build an IN-list DELETE")
        assert(body.contains("@eq_deletes"),
          s"$defMarker must route keys through the plan-sourced channel")
    }
  }
}
