package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.GraftStore

/** Merge-on-read DELETE (deletion vectors), partition-drop DELETE, and
  * `CALL system.compact` — the metadata-only tiers of row-level DML.
  * The load-bearing proofs are REFERENCE-identity (`eq`) of committed
  * batch arrays: a metadata delete must not rewrite a single batch, a
  * partition drop must leave surviving shards untouched, and only an
  * explicit COW fallback / compaction may replace them.
  */
class DeleteVectorSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("pushable DELETE commits deletion vectors: zero rewrite, rows hidden, one ledger version") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.dv1").create()
    val key = "cat::graft_cat.spec.dv1"
    try {
      val before = GraftStore.batchesRef(key).get
      val v = GraftStore.versionCount(key)
      val expectGone = base.filter(col("value") < 40).count()
      spark.sql("DELETE FROM graft_cat.spec.dv1 WHERE value < 40")
      // metadata-only: the committed batch seq is REFERENCE-identical —
      // the delete wrote bitmaps, not rows
      assert(GraftStore.batchesRef(key).get eq before,
        "DV delete must not rewrite any committed batch")
      assert(GraftStore.dvMarkedCount(key) === expectGone)
      assert(GraftStore.versionCount(key) === v + 1,
        "a DV delete is one first-class commit")
      // rows are hidden on the read path
      assert(spark.table("graft_cat.spec.dv1").count() ===
        base.count() - expectGone)
      assert(spark.table("graft_cat.spec.dv1")
        .filter(col("value") < 40).count() === 0L)
      // time travel: the pre-delete version still serves every row, the
      // post-delete version applies its snapshot's DVs
      assert(spark.sql(
        s"SELECT count(*) FROM graft_cat.spec.dv1 VERSION AS OF ${v - 1}")
        .head.getLong(0) === base.count())
      assert(spark.sql(
        s"SELECT count(*) FROM graft_cat.spec.dv1 VERSION AS OF $v")
        .head.getLong(0) === base.count() - expectGone)
    } finally spark.sql("DROP TABLE graft_cat.spec.dv1")
  }

  test("UPDATE after a DV delete cannot resurrect deleted rows; the COW rewrite compacts the DV away") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.dv2").create()
    val key = "cat::graft_cat.spec.dv2"
    try {
      spark.sql("DELETE FROM graft_cat.spec.dv2 WHERE value < 40")
      assert(GraftStore.dvMarkedCount(key) > 0)
      spark.sql("UPDATE graft_cat.spec.dv2 SET value = value + 1000")
      // the operation scan applied the DVs, so the rewrite carried only
      // live rows — and the truncate-overwrite reset the vectors
      assert(GraftStore.dvMarkedCount(key) === 0L)
      val t = spark.table("graft_cat.spec.dv2")
      assert(t.count() === base.filter(col("value") >= 40).count())
      assert(t.filter(col("value") < 1040).count() === 0L,
        "a deleted row resurrected through the COW rewrite")
    } finally spark.sql("DROP TABLE graft_cat.spec.dv2")
  }

  test("non-translatable DELETE falls back to the COW rewrite (canDeleteWhere refusal)") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.dv3").create()
    val key = "cat::graft_cat.spec.dv3"
    try {
      val before = GraftStore.batchesRef(key).get
      // value * 2 is a computed operand: StorePredicates refuses it, so
      // the plan must stay group-based COW — batches ARE rewritten
      spark.sql("DELETE FROM graft_cat.spec.dv3 WHERE value * 2 < 80")
      assert(!(GraftStore.batchesRef(key).get eq before),
        "non-pushable DELETE must take the COW rewrite")
      assert(GraftStore.dvMarkedCount(key) === 0L)
      assert(spark.table("graft_cat.spec.dv3").count() ===
        base.filter(col("value") * 2 >= 80).count())
    } finally spark.sql("DROP TABLE graft_cat.spec.dv3")
  }

  test("DV delete bumps the truncation epoch: streaming offsets are invalidated, not replayed") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.dv4").create()
    val key = "cat::graft_cat.spec.dv4"
    try {
      val epoch = GraftStore.truncEpoch(key)
      spark.sql("DELETE FROM graft_cat.spec.dv4 WHERE value < 40")
      // already-streamed batches changed meaning — the change-feed
      // contract (GraftStoreMicroBatchStream) fails loudly on mismatch
      assert(GraftStore.truncEpoch(key) === epoch + 1)
    } finally spark.sql("DROP TABLE graft_cat.spec.dv4")
  }

  test("partition-only DELETE retires whole shards; surviving shards stay reference-identical") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.dvp").partitionedBy(col("event_type")).create()
    try {
      val types = base.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted
      assert(types.contains("error") && types.length > 1)
      val survivors = types.filterNot(_ == "error")
      val refs = survivors.map(p =>
        p -> GraftStore.batchesRef(s"cat::graft_cat.spec.dvp#p=$p").get).toMap
      spark.sql("DELETE FROM graft_cat.spec.dvp WHERE event_type = 'error'")
      // the matched shard took one empty truncate-commit
      assert(GraftStore.rowCount("cat::graft_cat.spec.dvp#p=error") === 0L)
      // no surviving shard was touched, let alone rewritten
      survivors.foreach { p =>
        assert(GraftStore.batchesRef(s"cat::graft_cat.spec.dvp#p=$p").get
          eq refs(p), s"partition '$p' was rewritten by a partition drop")
      }
      assert(spark.table("graft_cat.spec.dvp").count() ===
        base.filter(col("event_type") =!= "error").count())
    } finally spark.sql("DROP TABLE graft_cat.spec.dvp")
  }

  test("CALL system.compact materializes DVs and bin-packs to one batch; content and time travel survive") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.filter(col("event_id") % 2 === 0).repartition(1)
      .writeTo("graft_cat.spec.dvc").create()
    val key = "cat::graft_cat.spec.dvc"
    try {
      base.filter(col("event_id") % 2 === 1).repartition(1)
        .writeTo("graft_cat.spec.dvc").append()
      spark.sql("DELETE FROM graft_cat.spec.dvc WHERE value < 40")
      val wantRows = spark.table("graft_cat.spec.dvc")
        .orderBy("event_id", "value").collect().toSeq
      val preCompactVersion = GraftStore.versionCount(key) - 1
      val res = spark.sql("CALL graft_cat.system.compact('spec.dvc')").head
      assert(res.getInt(0) === 2, "batches_before")
      assert(res.getInt(1) === 1, "batches_after")
      assert(res.getLong(2) === base.filter(col("value") < 40).count(),
        "dv_rows_removed")
      assert(res.getLong(3) === base.filter(col("value") >= 40).count(),
        "live_rows")
      assert(GraftStore.batchesRef(key).get.size === 1)
      assert(GraftStore.dvMarkedCount(key) === 0L)
      // logical content identical row-for-row
      assert(spark.table("graft_cat.spec.dvc")
        .orderBy("event_id", "value").collect().toSeq === wantRows)
      // compaction is itself a commit: the pre-compaction version still
      // resolves and serves the DV'd view
      assert(spark.sql("SELECT count(*) FROM graft_cat.spec.dvc " +
        s"VERSION AS OF $preCompactVersion").head.getLong(0) ===
        wantRows.size.toLong)
    } finally spark.sql("DROP TABLE graft_cat.spec.dvc")
  }

  test("TARGETED compact('t', partition): one shard rewritten, every other untouched; refusals loud") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .filter(col("event_type").isNotNull)
    base.writeTo("graft_cat.spec.dvtc").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      spark.sql("DELETE FROM graft_cat.spec.dvtc WHERE event_id % 3 = 0")
      def inventory(): Map[String, (Int, Long)] =
        spark.table("graft_cat.spec.`dvtc@partitions`").collect()
          .map(r => r.getString(0) -> ((r.getInt(3), r.getLong(4)))).toMap
      val before = inventory()
      assert(before.size > 1, "fixture has several event types")
      val target = before.keys.min
      val want = spark.table("graft_cat.spec.dvtc")
        .orderBy("event_id", "value").collect().toSeq
      spark.sql(s"CALL graft_cat.system.compact('spec.dvtc', '$target')")
      val after = inventory()
      assert(after(target) === ((1, 0L)),
        "target shard bin-packed to one batch, DV debt gone")
      (before.keySet - target).foreach(p =>
        assert(after(p) === before(p), s"shard $p untouched"))
      // logical content identical row-for-row
      assert(spark.table("graft_cat.spec.dvtc")
        .orderBy("event_id", "value").collect().toSeq === want)
      // a partition value with no live shard refuses — a silent no-op
      // would read as "compacted"
      val e = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.compact('spec.dvtc', 'no_such_part')")
      }
      assert(e.getMessage.contains("no live shard"), e.getMessage.take(300))
    } finally spark.sql("DROP TABLE graft_cat.spec.dvtc")
    // naming a partition on an UNPARTITIONED table refuses too
    Tables.events(spark, sfDir).select(col("event_id"), col("value"))
      .limit(10).writeTo("graft_cat.spec.dvtf").create()
    try {
      val ef = intercept[Exception] {
        spark.sql("CALL graft_cat.system.compact('spec.dvtf', 'x')")
      }
      assert(ef.getMessage.contains("not partitioned"),
        ef.getMessage.take(300))
    } finally spark.sql("DROP TABLE graft_cat.spec.dvtf")
  }

  test("CALL system.rollback restores an earlier commit as a NEW commit (undo without history rewrite)") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.dvr").create() // v0 create, v1 data
    val key = "cat::graft_cat.spec.dvr"
    try {
      spark.sql("DELETE FROM graft_cat.spec.dvr WHERE value < 40") // v2 DV
      val afterDelete = spark.table("graft_cat.spec.dvr").count()
      val res = spark.sql("CALL graft_cat.system.rollback('spec.dvr', 1)").head
      assert(res.getInt(0) === 1, "restored_version")
      assert(res.getLong(1) === base.count(), "n_rows")
      assert(res.getInt(2) === 3, "new_version")
      // the undo is live...
      assert(spark.table("graft_cat.spec.dvr").count() === base.count())
      // ...and the rolled-over DELETE is still in the ledger (rollback
      // is a commit, not a history rewrite)
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.dvr VERSION AS OF 2")
        .head.getLong(0) === afterDelete)
      assert(GraftStore.versionCount(key) === 4)
    } finally spark.sql("DROP TABLE graft_cat.spec.dvr")
  }

  test("unpredicated DELETE on a partitioned table truncates every shard, preserving shard ledgers") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.dvpt").partitionedBy(col("event_type")).create()
    try {
      val shardKeys = graft.sources.GraftStore.batchesRef(
        "cat::graft_cat.spec.dvpt#p=error")
      assert(shardKeys.isDefined)
      spark.sql("DELETE FROM graft_cat.spec.dvpt")
      assert(spark.table("graft_cat.spec.dvpt").count() === 0L)
      // the shard stores survive as EMPTY tables (one truncate-commit
      // each), so appends keep routing and shard history stays
      assert(GraftStore.rowCount("cat::graft_cat.spec.dvpt#p=error") === 0L)
      assert(GraftStore.versionCount("cat::graft_cat.spec.dvpt#p=error") >= 2)
      base.limit(10).writeTo("graft_cat.spec.dvpt").append()
      assert(spark.table("graft_cat.spec.dvpt").count() === 10L)
    } finally spark.sql("DROP TABLE graft_cat.spec.dvpt")
  }

  test("DV predicate three-valued logic: NULLs survive comparisons, IS NULL names them, NOT/OR compose") {
    cat()
    import spark.implicits._
    Seq((1L, Some(10.0)), (2L, Some(50.0)), (3L, None), (4L, Some(90.0)),
      (5L, None))
      .toDF("k", "v").writeTo("graft_cat.spec.dv3v").create()
    val key = "cat::graft_cat.spec.dv3v"
    try {
      val before = GraftStore.batchesRef(key).get
      // v < 40 is UNKNOWN for NULL rows: they must SURVIVE (SQL DELETE
      // removes only rows where the predicate is TRUE)
      spark.sql("DELETE FROM graft_cat.spec.dv3v WHERE v < 40")
      assert(GraftStore.batchesRef(key).get eq before, "metadata-only")
      assert(spark.table("graft_cat.spec.dv3v").orderBy("k")
        .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L, 5L))
      // NOT (v >= 60) is likewise UNKNOWN on NULL: keeps 3 and 5
      spark.sql("DELETE FROM graft_cat.spec.dv3v WHERE NOT (v >= 60)")
      assert(spark.table("graft_cat.spec.dv3v").orderBy("k")
        .collect().map(_.getLong(0)).toSeq === Seq(3L, 4L, 5L))
      // IS NULL names the null rows exactly; OR composes
      spark.sql("DELETE FROM graft_cat.spec.dv3v WHERE v IS NULL OR v > 1000")
      assert(spark.table("graft_cat.spec.dv3v").orderBy("k")
        .collect().map(_.getLong(0)).toSeq === Seq(4L))
      assert(GraftStore.batchesRef(key).get eq before,
        "every step stayed a deletion-vector commit")
    } finally spark.sql("DROP TABLE graft_cat.spec.dv3v")
  }

  test("TRUNCATE TABLE empties through the SupportsDeleteV2 surface") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.dvt").create()
    try {
      spark.sql("TRUNCATE TABLE graft_cat.spec.dvt")
      assert(spark.table("graft_cat.spec.dvt").count() === 0L)
    } finally spark.sql("DROP TABLE graft_cat.spec.dvt")
  }
}
