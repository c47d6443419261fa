package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.{GraftCatalog, GraftStore}

/** Write-audit-publish branching ([[graft.sources.GraftCatalog]]):
  * branch isolation, the fast-forward fence, and lifecycle hygiene.
  */
class BranchSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("branch writes are invisible to main until publish; publish fast-forwards audited content") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.filter(col("event_id") % 2 === 0).writeTo("graft_cat.spec.wap").create()
    val mainKey = "cat::graft_cat.spec.wap"
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.wap', 'audit')")
      val mainRef = GraftStore.batchesRef(mainKey).get
      val mainCount = spark.table("graft_cat.spec.wap").count()
      // branch starts at the fork point
      assert(spark.table("graft_cat.spec.`wap@audit`").count() === mainCount)
      // audit writes: append the odd half, DV-delete low values — on the
      // BRANCH only
      base.filter(col("event_id") % 2 === 1)
        .writeTo("graft_cat.spec.`wap@audit`").append()
      spark.sql("DELETE FROM graft_cat.spec.`wap@audit` WHERE value < 40")
      assert(GraftStore.dvMarkedCount(mainKey + "#b=audit") > 0,
        "the branch delete should be a DV commit")
      // main: untouched — same count, committed batches reference-identical
      assert(spark.table("graft_cat.spec.wap").count() === mainCount)
      assert(GraftStore.batchesRef(mainKey).get eq mainRef)
      val want = base.filter(col("value") >= 40)
        .orderBy("event_id", "value").collect().toSeq
      val pub = spark.sql(
        "CALL graft_cat.system.publish_branch('spec.wap', 'audit')").head
      assert(pub.getLong(0) === want.size.toLong, "published_rows")
      // main now serves the audited content, row for row, DVs materialized
      assert(spark.table("graft_cat.spec.wap")
        .orderBy("event_id", "value").collect().toSeq === want)
      // the branch is gone
      intercept[Exception] {
        spark.table("graft_cat.spec.`wap@audit`").count()
      }
      assert(GraftStore.batchesRef(mainKey + "#b=audit").isEmpty)
    } finally spark.sql("DROP TABLE graft_cat.spec.wap")
  }

  test("a branch of a merge-on-read table inherits MOR: branch DML is a row-delta, publish carries it") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.wapm")
      .tableProperty("write.mode", "merge-on-read").create()
    val mainKey = "cat::graft_cat.spec.wapm"
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.wapm', 'fix')")
      val branchBefore = GraftStore.batchesRef(mainKey + "#b=fix").get
      spark.sql(
        "UPDATE graft_cat.spec.`wapm@fix` SET value = value + 1000 WHERE event_id % 100 = 0")
      val branchAfter = GraftStore.batchesRef(mainKey + "#b=fix").get
      // the branch write was MERGE-ON-READ: old batches survive by
      // reference, one delta batch appended
      assert(branchAfter.size === branchBefore.size + 1)
      branchBefore.indices.foreach(i =>
        assert(branchAfter(i) eq branchBefore(i)))
      assert(GraftStore.dvMarkedCount(mainKey + "#b=fix") ===
        base.filter(col("event_id") % 100 === 0).count())
      spark.sql("CALL graft_cat.system.publish_branch('spec.wapm', 'fix')")
      val want = base.select(col("event_id"),
          when(col("event_id") % 100 === 0, col("value") + 1000)
            .otherwise(col("value")).as("value"))
        .orderBy("event_id", "value").collect().toSeq
      assert(spark.table("graft_cat.spec.wapm")
        .orderBy("event_id", "value").collect().toSeq === want)
    } finally spark.sql("DROP TABLE graft_cat.spec.wapm")
  }

  test("publish refuses when main advanced since the fork (optimistic concurrency)") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.limit(100).writeTo("graft_cat.spec.wapc").create()
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.wapc', 'b1')")
      base.limit(5).writeTo("graft_cat.spec.wapc").append() // main advances
      val before = spark.table("graft_cat.spec.wapc").count()
      val e = intercept[Exception] {
        spark.sql("CALL graft_cat.system.publish_branch('spec.wapc', 'b1')")
      }
      assert(e.getMessage != null && e.getMessage.contains("fast-forward"))
      // the refused publish changed nothing: main intact, branch intact
      assert(spark.table("graft_cat.spec.wapc").count() === before)
      assert(spark.table("graft_cat.spec.`wapc@b1`").count() === 100L)
      spark.sql("CALL graft_cat.system.drop_branch('spec.wapc', 'b1')")
    } finally spark.sql("DROP TABLE graft_cat.spec.wapc")
  }

  test("lifecycle hygiene: SHOW TABLES hides branch stores; CREATE TABLE with '@' refused; DROP TABLE reaps branches") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value")).limit(50)
    base.writeTo("graft_cat.spec.waph").create()
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.waph', 'x')")
      val shown = spark.sql("SHOW TABLES IN graft_cat.spec")
        .select("tableName").collect().map(_.getString(0))
      assert(shown.contains("waph"))
      assert(!shown.exists(_.contains("#b=")), shown.mkString(","))
      intercept[Exception] {
        spark.range(1).writeTo("graft_cat.spec.`bad@name`").create()
      }
      // branch time travel runs over the branch's OWN ledger
      base.limit(5).writeTo("graft_cat.spec.`waph@x`").append()
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.`waph@x` VERSION AS OF 0")
        .head.getLong(0) === 50L)
    } finally spark.sql("DROP TABLE graft_cat.spec.waph")
    assert(GraftStore.batchesRef("cat::graft_cat.spec.waph#b=x").isEmpty,
      "DROP TABLE must reap branch stores")
    assert(!GraftCatalog.branches.contains("cat::graft_cat.spec.waph#b=x"))
  }

  test("PARTITIONED WAP: branch forks shards as metadata, DML stays on-branch, publish is one table-level commit") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.pwap").partitionedBy(col("event_type")).create()
    try {
      val mainBefore = spark.table("graft_cat.spec.pwap")
        .orderBy("event_id", "value").collect().toSeq
      spark.sql("CALL graft_cat.system.create_branch('spec.pwap', 'audit')")
      // branch is itself partitioned: a partition-local COW DML runs on
      // the BRANCH shards; main's shards stay reference-identical
      val mainErrShard = GraftStore
        .batchesRef("cat::graft_cat.spec.pwap#p=error").get
      spark.sql(
        "DELETE FROM graft_cat.spec.`pwap@audit` WHERE event_type = 'error' AND value < 50")
      base.filter(col("event_id") % 7 === 0)
        .select((col("event_id") + 700000L).as("event_id"),
          col("event_type"), col("value"))
        .writeTo("graft_cat.spec.`pwap@audit`").append()
      assert(GraftStore.batchesRef("cat::graft_cat.spec.pwap#p=error").get
        eq mainErrShard, "main shard must not be touched by branch DML")
      assert(spark.table("graft_cat.spec.pwap")
        .orderBy("event_id", "value").collect().toSeq === mainBefore,
        "main must stay dark until publish")
      // branch time travel over its OWN table-level ledger
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.`pwap@audit` VERSION AS OF 0")
        .head.getLong(0) === mainBefore.size.toLong)
      val want = spark.table("graft_cat.spec.`pwap@audit`")
        .orderBy("event_id", "value").collect().toSeq
      val res = spark.sql(
        "CALL graft_cat.system.publish_branch('spec.pwap', 'audit')").head
      assert(res.getLong(0) === want.size.toLong)
      assert(spark.table("graft_cat.spec.pwap")
        .orderBy("event_id", "value").collect().toSeq === want)
      // the publish is ONE table-level commit: the pre-publish state is
      // still one VERSION AS OF away
      assert(spark.sql(
        s"SELECT count(*) FROM graft_cat.spec.pwap VERSION AS OF ${res.getInt(1) - 1}")
        .head.getLong(0) === mainBefore.size.toLong)
      // stale publish refused: fork, advance main, publish must fence
      spark.sql("CALL graft_cat.system.create_branch('spec.pwap', 'stale')")
      base.limit(3).select((col("event_id") + 900000L).as("event_id"),
        col("event_type"), col("value"))
        .writeTo("graft_cat.spec.pwap").append()
      val ex = intercept[Exception] {
        spark.sql("CALL graft_cat.system.publish_branch('spec.pwap', 'stale')")
          .head
      }
      assert(ex.getMessage.contains("cannot fast-forward"),
        ex.getMessage.take(160))
      spark.sql("CALL graft_cat.system.drop_branch('spec.pwap', 'stale')")
    } finally spark.sql("DROP TABLE graft_cat.spec.pwap")
    assert(GraftStore
      .batchesRef("cat::graft_cat.spec.pwap#b=stale#p=error").isEmpty,
      "DROP TABLE must reap partitioned branch shard stores")
  }

  test("a constraint-only ALTER on a partitioned table is no ledger commit: the WAP publish fence survives it") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.pcf").partitionedBy(col("event_type")).create()
    try {
      val ledger0 = GraftCatalog.partVersions("cat::graft_cat.spec.pcf").size
      spark.sql("CALL graft_cat.system.create_branch('spec.pcf', 'tx')")
      spark.sql(
        "DELETE FROM graft_cat.spec.`pcf@tx` WHERE event_type = 'click'")
      // catalog-side metadata only: no store commit, no ledger entry —
      // the unpartitioned shape never counted these either, and a
      // fence tripped by a constraint would refuse a publish for a
      // change no snapshot ever saw
      spark.sql("ALTER TABLE graft_cat.spec.pcf " +
        "ADD CONSTRAINT v_nonneg CHECK (value >= 0)")
      assert(GraftCatalog.partVersions("cat::graft_cat.spec.pcf").size
        === ledger0, "constraint-only ALTER must not advance the ledger")
      spark.sql("CALL graft_cat.system.publish_branch('spec.pcf', 'tx')")
      assert(spark.table("graft_cat.spec.pcf")
        .filter(col("event_type") === "click").count() === 0L)
      // a SCHEMA-evolving ALTER still records one table-level version
      val l1 = GraftCatalog.partVersions("cat::graft_cat.spec.pcf").size
      spark.sql("ALTER TABLE graft_cat.spec.pcf ADD COLUMN note STRING")
      assert(GraftCatalog.partVersions("cat::graft_cat.spec.pcf").size
        === l1 + 1)
    } finally spark.sql("DROP TABLE graft_cat.spec.pcf")
  }

  test("PARTITIONED MOR on a branch: branch DML is a per-shard row-delta; publish carries the DVs + deltas by reference") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.pmor").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    val mainErr = "cat::graft_cat.spec.pmor#p=error"
    val branchErr = "cat::graft_cat.spec.pmor#b=mor#p=error"
    try {
      val mainBefore = spark.table("graft_cat.spec.pmor")
        .orderBy("event_id", "value").collect().toSeq
      val mainErrBatches = GraftStore.batchesRef(mainErr).get
      spark.sql("CALL graft_cat.system.create_branch('spec.pmor', 'mor')")
      // the fork is metadata: branch shards share main's batches by ref
      assert(GraftStore.batchesRef(branchErr).get eq mainErrBatches)
      // row-delta DML on the BRANCH: per-shard DV bits + delta batches,
      // zero rewrite — the pre-existing batch prefix stays reference-
      // identical to MAIN's batches even inside the branch store
      spark.sql(
        "UPDATE graft_cat.spec.`pmor@mor` SET value = value * 2 WHERE event_id % 7 = 0")
      val bb = GraftStore.batchesRef(branchErr).get
      assert(bb.size === mainErrBatches.size + 1,
        "branch MOR UPDATE must append exactly one delta batch per touched shard")
      mainErrBatches.indices.foreach(i =>
        assert(bb(i) eq mainErrBatches(i),
          s"branch delta rewrote pre-existing batch $i"))
      assert(GraftStore.dvMarkedCount(branchErr) > 0L,
        "branch MOR UPDATE must mark branch-shard DVs")
      // main is completely dark: same batches, zero DVs, same rows
      assert(GraftStore.batchesRef(mainErr).get eq mainErrBatches)
      assert(GraftStore.dvMarkedCount(mainErr) === 0L)
      assert(spark.table("graft_cat.spec.pmor")
        .orderBy("event_id", "value").collect().toSeq === mainBefore)
      // publish: main adopts the branch shard SNAPSHOTS — the DVs and
      // delta batches arrive by reference (a pointer swap, not a
      // rewrite), and the merged view reads through them
      val want = spark.table("graft_cat.spec.`pmor@mor`")
        .orderBy("event_id", "value").collect().toSeq
      spark.sql("CALL graft_cat.system.publish_branch('spec.pmor', 'mor')")
      assert(GraftStore.batchesRef(mainErr).get eq bb,
        "publish must carry the branch's batches (incl. the delta) by reference")
      assert(GraftStore.dvMarkedCount(mainErr) > 0L,
        "publish must carry the branch's DVs")
      assert(spark.table("graft_cat.spec.pmor")
        .orderBy("event_id", "value").collect().toSeq === want)
      // and the published content IS the doubled-%7 semantics
      val pubCents = spark.table("graft_cat.spec.pmor")
        .filter(col("event_id") % 7 === 0)
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long"))).head.getLong(0)
      val baseCents = base.filter(col("event_id") % 7 === 0)
        .agg(sum(floor(col("value") * 2 * 100 + 0.5).cast("long")))
        .head.getLong(0)
      assert(pubCents === baseCents)
    } finally spark.sql("DROP TABLE graft_cat.spec.pmor")
  }

  test("a partitioned branch keeps its FORK-TIME spec after main evolves (ADVICE r17)") {
    cat()
    spark.range(0, 12)
      .select((col("id") % 3).cast("string").as("p"), col("id").as("v"))
      .repartition(1)
      .writeTo("graft_cat.spec.bspec").partitionedBy(col("p")).create()
    try {
      spark.sql("CALL graft_cat.system.create_branch('spec.bspec', 'wip')")
      // main evolves to bucket AFTER the fork — the branch's identity
      // spec (registered at fork) must keep routing branch writes;
      // resolving main's CURRENT spec here would route branch rows
      // through the bucket transform while tagging shards with the
      // branch's old spec id — silent misrouting
      spark.sql(
        "CALL graft_cat.system.evolve_spec('spec.bspec', 'bucket(4, v)')")
      val shardsBefore = GraftStore
        .keysWithPrefix("cat::graft_cat.spec.bspec#b=wip#p=").toSet
      spark.range(100, 104)
        .select((col("id") % 3).cast("string").as("p"), col("id").as("v"))
        .repartition(1)
        .writeTo("graft_cat.spec.`bspec@wip`").append()
      val shardsAfter = GraftStore
        .keysWithPrefix("cat::graft_cat.spec.bspec#b=wip#p=").toSet
      // identity routing lands every row in the existing p-shards — no
      // new shard keys, no spec-id suffix, each row in ITS p shard
      assert(shardsAfter === shardsBefore,
        s"branch append created unexpected shards: ${shardsAfter -- shardsBefore}")
      assert(shardsAfter.forall(!_.contains("#s=")),
        "branch shards must not carry a spec-id suffix (single-spec branch)")
      // v=100..103 → p = 1,2,0,1: shard #p=1 gains exactly 2 rows
      assert(GraftStore
        .rowCount("cat::graft_cat.spec.bspec#b=wip#p=1") === 4L + 2L)
      assert(spark.table("graft_cat.spec.`bspec@wip`").count() === 16L)
      assert(spark.table("graft_cat.spec.`bspec@wip`")
        .filter(col("p") === "1").count() === 6L)
      // main is independent: its post-evolve appends route through the
      // NEW spec and the branch append never touched it
      assert(spark.table("graft_cat.spec.bspec").count() === 12L)
    } finally spark.sql("DROP TABLE graft_cat.spec.bspec")
  }
}
