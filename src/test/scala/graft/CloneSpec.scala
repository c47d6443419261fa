package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.{GraftCatalog, GraftStore}

/** SHALLOW CLONE (`CALL system.clone_table`): a zero-copy fork whose v0
  * shares the source's snapshot by reference, after which the two
  * tables are fully independent — snapshot immutability IS the
  * isolation. The reference pins are load-bearing: clone must not copy
  * a byte, and divergence must not leak a byte.
  */
class CloneSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("clone shares the snapshot by reference; DML on either side leaves the other untouched") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    base.writeTo("graft_cat.spec.cl1").create()
    try {
      val res = spark.sql(
        "CALL graft_cat.system.clone_table('spec.cl1', 'spec.cl1c')").head
      assert(res.getLong(0) === base.count())
      // zero copy: the clone's v0 IS the source's snapshot
      assert(GraftStore.batchesRef("cat::graft_cat.spec.cl1c").get eq
        GraftStore.batchesRef("cat::graft_cat.spec.cl1").get)
      // diverge the clone: source's snapshot stays reference-identical
      val srcRef = GraftStore.batchesRef("cat::graft_cat.spec.cl1").get
      spark.sql("UPDATE graft_cat.spec.cl1c SET value = value + 1 WHERE event_id % 2 = 0")
      assert(GraftStore.batchesRef("cat::graft_cat.spec.cl1").get eq srcRef)
      assert(spark.table("graft_cat.spec.cl1")
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long"))).head.getLong(0) ===
        base.agg(sum(floor(col("value") * 100 + 0.5).cast("long"))).head.getLong(0))
      // diverge the source: clone untouched
      val dstRef = GraftStore.batchesRef("cat::graft_cat.spec.cl1c").get
      spark.sql("DELETE FROM graft_cat.spec.cl1 WHERE value < 30")
      assert(GraftStore.batchesRef("cat::graft_cat.spec.cl1c").get eq dstRef)
      // the clone starts a FRESH lineage: v0 is the clone, nothing older
      assert(GraftStore.versionCount("cat::graft_cat.spec.cl1c") === 2,
        "clone ledger = v0 (the clone) + v1 (the update)")
      // dropping the SOURCE cannot break the clone (shared arrays are
      // pinned by the clone's own snapshot refs)
      spark.sql("DROP TABLE graft_cat.spec.cl1")
      assert(spark.table("graft_cat.spec.cl1c").count() === base.count())
    } finally {
      scala.util.Try(spark.sql("DROP TABLE graft_cat.spec.cl1"))
      spark.sql("DROP TABLE graft_cat.spec.cl1c")
    }
  }

  test("clone carries write-model flags and the partition spec; refusals are loud") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.cl2").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read")
      .tableProperty("write.delete.mode", "equality").create()
    try {
      spark.sql("CALL graft_cat.system.clone_table('spec.cl2', 'spec.cl2c')")
      val ck = "cat::graft_cat.spec.cl2c"
      // the partitioned shape forked: shard stores seeded by reference
      assert(GraftStore.batchesRef(s"$ck#p=error").get eq
        GraftStore.batchesRef("cat::graft_cat.spec.cl2#p=error").get)
      assert(GraftCatalog.partVersions(ck).size === 1, "clone ledger = v0")
      // MOR carried: an UPDATE on the clone is a row-delta (no rewrite
      // of the shared batch)
      val shared = GraftStore.batchesRef(s"$ck#p=error").get
      spark.sql(
        "UPDATE graft_cat.spec.cl2c SET value = value + 1 WHERE event_type = 'error'")
      val after = GraftStore.batchesRef(s"$ck#p=error").get
      assert(after.size === shared.size + 1 && (after.head eq shared.head),
        "clone of a MOR table must take row-delta DML")
      // equality-delete mode carried
      spark.sql("DELETE FROM graft_cat.spec.cl2c WHERE event_id IN (2, 4)")
      assert(GraftStore.eqDeleteCount(s"$ck#p=error") === 1)
      // the SOURCE saw none of it
      assert(GraftStore.dvMarkedCount("cat::graft_cat.spec.cl2#p=error") === 0L)
      assert(GraftStore.eqDeleteCount("cat::graft_cat.spec.cl2#p=error") === 0)
      // refusals
      val e1 = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.clone_table('spec.cl2', 'spec.cl2c')").head
      }
      assert(e1.getMessage.contains("already exists"), e1.getMessage.take(120))
      val e2 = intercept[Exception] {
        spark.sql(
          "CALL graft_cat.system.clone_table('spec.nope', 'spec.cl2d')").head
      }
      assert(e2.getMessage.contains("no table"), e2.getMessage.take(120))
    } finally {
      spark.sql("DROP TABLE graft_cat.spec.cl2")
      spark.sql("DROP TABLE graft_cat.spec.cl2c")
    }
  }
}
