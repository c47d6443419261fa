package graft.sources

import org.apache.spark.sql.functions._

/** Commit-time validation of the (spec, specId) pair a partitioned
  * write CAPTURED at table load (ADVICE r17): a concurrent
  * `evolve_spec` between analysis and execution must refuse the commit
  * — a torn pair would tag old-transform-routed shards with the new
  * spec id, silently corrupting per-shard decoding and pruning — while
  * a STALE-but-coherent pair (old transform + old id) commits fine,
  * exactly Iceberg's per-file-spec model where concurrent spec
  * evolution never fails appends.
  */
class SpecCaptureSpec extends graft.SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)

  test("validateSpecCapture: coherent pairs pass, torn pairs refuse") {
    cat()
    spark.range(0, 6)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("v"))
      .writeTo("graft_cat.spec.vsc").partitionedBy(col("p")).create()
    val k = "cat::graft_cat.spec.vsc"
    try {
      val identity = GraftCatalog.parts(k)
      GraftCatalog.validateSpecCapture(k, 0, identity) // current: fine
      spark.sql("CALL graft_cat.system.evolve_spec('spec.vsc', 'bucket(4, v)')")
      val bucket = GraftCatalog.parts(k)
      // stale id + the transform it NAMED: still coherent
      GraftCatalog.validateSpecCapture(k, 0, identity)
      GraftCatalog.validateSpecCapture(k, 1, bucket)
      // torn: an id paired with a transform it never named
      val torn = intercept[IllegalArgumentException] {
        GraftCatalog.validateSpecCapture(k, 1, identity)
      }
      assert(torn.getMessage.contains("evolved between analysis and execution"))
      intercept[IllegalArgumentException] {
        GraftCatalog.validateSpecCapture(k, 0, bucket)
      }
      intercept[IllegalArgumentException] {
        GraftCatalog.validateSpecCapture(k, 2, bucket) // id out of range
      }
    } finally spark.sql("DROP TABLE graft_cat.spec.vsc")
  }

  test("a write whose capture tore under a concurrent evolve_spec refuses at commit; a stale coherent capture commits") {
    cat()
    spark.range(0, 6)
      .select((col("id") % 2).cast("string").as("p"), col("id").as("v"))
      .writeTo("graft_cat.spec.tear").partitionedBy(col("p")).create()
    val k = "cat::graft_cat.spec.tear"
    try {
      val schema = GraftStore.stores(k).schema
      val identity = GraftCatalog.parts(k)
      val capturedId = GraftCatalog.currentSpecId(k) // 0, with `identity`
      // the spec evolves AFTER load but BEFORE the write commits —
      // exactly the analysis/execution window the guard exists for
      spark.sql("CALL graft_cat.system.evolve_spec('spec.tear', 'bucket(4, v)')")
      val rows = Map("0" -> Array(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString("0"), 99L)))
      // torn pair (old transform, NEW id): refused under the lock
      val tornWrite = new GraftPartBatchWrite(k, schema, identity,
        GraftCatalog.currentSpecId(k), () => Seq.empty, appendMode = true)
      val ex = intercept[IllegalArgumentException] {
        tornWrite.commit(Array(GraftPartCommit(rows)))
      }
      assert(ex.getMessage.contains("evolved between analysis and execution"))
      assert(spark.table("graft_cat.spec.tear").count() === 6L,
        "a refused commit must publish nothing")
      // stale COHERENT pair (old transform, its own id): commits, rows
      // land in an id-0 shard and read back under per-shard decoding
      val staleWrite = new GraftPartBatchWrite(k, schema, identity,
        capturedId, () => Seq.empty, appendMode = true)
      staleWrite.commit(Array(GraftPartCommit(rows)))
      assert(spark.table("graft_cat.spec.tear").count() === 7L)
      assert(spark.table("graft_cat.spec.tear")
        .filter(col("v") === 99L).select("p").head.getString(0) === "0")
    } finally spark.sql("DROP TABLE graft_cat.spec.tear")
  }

  test("an eq-delete channel commit whose key column was dropped/retyped mid-flight refuses (by-name re-resolution under the lock)") {
    cat()
    spark.range(0, 6)
      .select(col("id").as("k"), (col("id") % 3).as("g"),
        col("id").cast("string").as("s"))
      .writeTo("graft_cat.spec.kdrop")
      .tableProperty("write.delete.mode", "equality").create()
    val key = "cat::graft_cat.spec.kdrop"
    try {
      // the write was ANALYZED against (k, g, s); `g` is dropped before
      // the commit executes — index-bound columns would now delete by
      // the WRONG column (s shifted into g's position)
      val w = new GraftEqDeleteBatchWrite(key,
        org.apache.spark.sql.types.StructType.fromDDL("g BIGINT"))
      spark.sql("ALTER TABLE graft_cat.spec.kdrop DROP COLUMN g")
      val msg = GraftEqDeleteCommit(Array(Array[Any](1L)))
      val ex = intercept[IllegalArgumentException] {
        w.commit(Array(msg))
      }
      assert(ex.getMessage.contains("dropped or retyped"),
        ex.getMessage.take(160))
      assert(GraftStore.eqDeleteCount(key) === 0,
        "a refused channel commit must record nothing")
      // a surviving key column still commits by NAME, whatever its
      // logical position became after the drop
      val w2 = new GraftEqDeleteBatchWrite(key,
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
      w2.commit(Array(GraftEqDeleteCommit(Array(Array[Any](2L)))))
      assert(GraftStore.eqDeleteCount(key) === 1)
      assert(spark.table("graft_cat.spec.kdrop")
        .filter(col("k") === 2L).count() === 0L)
      assert(spark.table("graft_cat.spec.kdrop").count() === 5L)
    } finally spark.sql("DROP TABLE graft_cat.spec.kdrop")
  }
}
