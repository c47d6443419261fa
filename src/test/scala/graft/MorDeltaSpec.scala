package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.sources.GraftStore

/** Merge-on-read row-level DML (`TBLPROPERTIES('write.mode'=
  * 'merge-on-read')` → Spark plans `WriteDelta`): writes must be
  * O(changed rows) — deletion-vector bits + one appended delta batch —
  * with every committed batch REFERENCE-identical through the DML.
  */
class MorDeltaSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  private def createMor(name: String, df: org.apache.spark.sql.DataFrame): Unit =
    df.writeTo(name).tableProperty("write.mode", "merge-on-read").create()

  test("UPDATE writes only the changed rows: DV bits + one delta batch, zero rewrite") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    createMor("graft_cat.spec.mor1", base)
    val key = "cat::graft_cat.spec.mor1"
    try {
      val before = GraftStore.batchesRef(key).get
      val touched = base.filter(col("event_id") % 50 === 0).count()
      spark.sql(
        "UPDATE graft_cat.spec.mor1 SET value = value + 1000 WHERE event_id % 50 = 0")
      val after = GraftStore.batchesRef(key).get
      // every pre-existing batch survives BY REFERENCE; exactly one
      // delta batch was appended, sized to the touched rows
      assert(after.size === before.size + 1)
      before.indices.foreach(i => assert(after(i) eq before(i),
        s"batch $i was rewritten by a MOR update"))
      assert(after.last.length.toLong === touched)
      assert(GraftStore.dvMarkedCount(key) === touched)
      // semantics: identical to the COW answer
      val got = spark.table("graft_cat.spec.mor1")
        .orderBy("event_id", "value").collect().toSeq
      val want = base.select(col("event_id"),
          when(col("event_id") % 50 === 0, col("value") + 1000)
            .otherwise(col("value")).as("value"))
        .orderBy("event_id", "value").collect().toSeq
      assert(got === want)
    } finally spark.sql("DROP TABLE graft_cat.spec.mor1")
  }

  test("MERGE mixes update/insert/delete ops; physical write = changed rows only") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    createMor("graft_cat.spec.mor2", base)
    val key = "cat::graft_cat.spec.mor2"
    try {
      val before = GraftStore.batchesRef(key).get
      val upd = base.filter(col("event_id") % 7 === 0 &&
          col("event_id") % 13 =!= 0)
        .select(col("event_id"), (col("value") * 2).as("value"))
      val ins = base.filter(col("event_id") % 11 === 0)
        .select((col("event_id") + 1000000L).as("event_id"), col("value"))
      val del = base.filter(col("event_id") % 13 === 0)
        .select(col("event_id"), lit(-1.0).as("value"))
      upd.unionByName(ins).unionByName(del)
        .createOrReplaceTempView("mor2_src")
      spark.sql(
        """MERGE INTO graft_cat.spec.mor2 t USING mor2_src s
          |ON t.event_id = s.event_id
          |WHEN MATCHED AND s.value < 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET value = s.value
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val after = GraftStore.batchesRef(key).get
      before.indices.foreach(i => assert(after(i) eq before(i)))
      val nUpd = base.filter(col("event_id") % 7 === 0 &&
        col("event_id") % 13 =!= 0).count()
      val nIns = base.filter(col("event_id") % 11 === 0).count()
      val nDel = base.filter(col("event_id") % 13 === 0).count()
      assert(after.size === before.size + 1)
      assert(after.last.length.toLong === nUpd + nIns)
      assert(GraftStore.dvMarkedCount(key) === nUpd + nDel)
      // semantics
      val want = base.filter(col("event_id") % 13 =!= 0)
        .select(col("event_id"),
          when(col("event_id") % 7 === 0, col("value") * 2)
            .otherwise(col("value")).as("value"))
        .unionByName(ins)
        .orderBy("event_id", "value").collect().toSeq
      val got = spark.table("graft_cat.spec.mor2")
        .orderBy("event_id", "value").collect().toSeq
      assert(got === want)
    } finally spark.sql("DROP TABLE graft_cat.spec.mor2")
  }

  test("non-pushable DELETE on a MOR table is a row-delta (DV bits), not a COW rewrite") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    createMor("graft_cat.spec.mor3", base)
    val key = "cat::graft_cat.spec.mor3"
    try {
      val before = GraftStore.batchesRef(key).get
      spark.sql("DELETE FROM graft_cat.spec.mor3 WHERE value * 2 < 80")
      val after = GraftStore.batchesRef(key).get
      assert(after.size === before.size, "a delete appends no batch")
      before.indices.foreach(i => assert(after(i) eq before(i)))
      assert(GraftStore.dvMarkedCount(key) ===
        base.filter(col("value") * 2 < 80).count())
      assert(spark.table("graft_cat.spec.mor3").count() ===
        base.filter(col("value") * 2 >= 80).count())
    } finally spark.sql("DROP TABLE graft_cat.spec.mor3")
  }

  test("the MOR operation scan data-skips: a range-selective UPDATE reads one batch of four") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    val maxId = base.agg(max(col("event_id"))).head.getLong(0)
    val w = math.ceil((maxId + 1) / 4.0).toLong
    def quartile(i: Int) = base
      .filter(col("event_id") >= i * w && col("event_id") < (i + 1) * w)
      .repartition(1)
    createMor("graft_cat.spec.mor5", quartile(0))
    val key = "cat::graft_cat.spec.mor5"
    try {
      (1 to 3).foreach(i => quartile(i).writeTo("graft_cat.spec.mor5").append())
      spark.sql(
        s"UPDATE graft_cat.spec.mor5 SET value = value + 1 WHERE event_id >= ${3 * w}")
      // the op scan's pushed filter pruned the three range-disjoint
      // batches by footer stats before any row was read
      val (planned, skipped) = GraftStore.skipLog.getOrElse(key, (-1, -1))
      assert(planned === 4 && skipped === 3,
        s"expected 4 batches / 3 skipped on the op scan, got $planned/$skipped")
      // and the delta still lands correctly
      val want = base.select(col("event_id"),
          when(col("event_id") >= 3 * w, col("value") + 1)
            .otherwise(col("value")).as("value"))
        .orderBy("event_id", "value").collect().toSeq
      assert(spark.table("graft_cat.spec.mor5")
        .orderBy("event_id", "value").collect().toSeq === want)
    } finally spark.sql("DROP TABLE graft_cat.spec.mor5")
  }

  test("SHOW TBLPROPERTIES surfaces the write mode") {
    cat()
    spark.range(3).select(col("id").as("k")).writeTo("graft_cat.spec.morp")
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      val props = spark.sql("SHOW TBLPROPERTIES graft_cat.spec.morp")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("write.mode").contains("merge-on-read"))
    } finally spark.sql("DROP TABLE graft_cat.spec.morp")
  }

  test("MOR ledger composes: time travel, history kind, compaction paying down the DV debt") {
    cat()
    val base = Tables.events(spark, sfDir).select(col("event_id"), col("value"))
    createMor("graft_cat.spec.mor4", base)
    val key = "cat::graft_cat.spec.mor4"
    try {
      spark.sql(
        "UPDATE graft_cat.spec.mor4 SET value = value + 1000 WHERE event_id % 50 = 0")
      // pre-update version unaffected
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.mor4 VERSION AS OF 1")
        .head.getLong(0) === base.count())
      val want = spark.table("graft_cat.spec.mor4")
        .orderBy("event_id", "value").collect().toSeq
      spark.sql("CALL graft_cat.system.compact('spec.mor4')")
      assert(GraftStore.dvMarkedCount(key) === 0L)
      assert(GraftStore.batchesRef(key).get.size === 1)
      assert(spark.table("graft_cat.spec.mor4")
        .orderBy("event_id", "value").collect().toSeq === want)
    } finally spark.sql("DROP TABLE graft_cat.spec.mor4")
  }

  test("PARTITIONED MOR: UPDATE writes per-shard DV bits + delta batches, zero rewrite; CDC pairs lineage") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.pmor").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      val shardKeys = base.select("event_type").distinct()
        .collect().map(r => s"cat::graft_cat.spec.pmor#p=${r.getString(0)}")
      val before = shardKeys.map(k => k -> GraftStore.batchesRef(k).get).toMap
      spark.sql(
        "UPDATE graft_cat.spec.pmor SET value = value + 1000 WHERE event_id % 50 = 0")
      // MOR means NO rewrite anywhere: every shard's pre-existing
      // batches survive BY REFERENCE (the batch list only ever grows)
      shardKeys.foreach { k =>
        val now = GraftStore.batchesRef(k).get
        val prev = before(k)
        assert(now.size >= prev.size &&
          prev.indices.forall(i => now(i) eq prev(i)),
          s"$k rewrote committed batches under a MOR UPDATE")
      }
      val want = base
        .select(col("event_id"), col("event_type"),
          when(col("event_id") % 50 === 0, col("value") + 1000)
            .otherwise(col("value")).as("value"))
        .orderBy("event_id", "value").collect().toSeq
      assert(spark.table("graft_cat.spec.pmor")
        .orderBy("event_id", "value").collect().toSeq === want)
      // the partitioned CDC walk renders the journaled lineage
      val touched = base.filter(col("event_id") % 50 === 0).count()
      val ch = graft.sources.ChangeFeed.tableChanges(spark, "spec.pmor", 1, 2)
      assert(ch.filter(col("_change_type") === "update_preimage").count() === touched)
      assert(ch.filter(col("_change_type") === "update_postimage").count() === touched)
      assert(ch.filter(col("_change_type").isin("delete", "insert")).count() === 0L)
      // cross-shard MOVE: updating the partition column relocates the
      // row — honestly a delete (old shard DV) + insert (new shard)
      val moved = spark.table("graft_cat.spec.pmor")
        .filter(col("event_id") % 97 === 0).count()
      spark.sql(
        "UPDATE graft_cat.spec.pmor SET event_type = 'moved' WHERE event_id % 97 = 0")
      assert(spark.table("graft_cat.spec.pmor")
        .filter(col("event_type") === "moved").count() === moved)
      val ch3 = graft.sources.ChangeFeed.tableChanges(spark, "spec.pmor", 2, 3)
      assert(ch3.filter(col("_change_type") === "delete").count() === moved)
      assert(ch3.filter(col("_change_type") === "insert").count() === moved)
      assert(ch3.filter(col("_change_type").startsWith("update")).count() === 0L)
      // still zero rewrites: original batches all survive by reference
      shardKeys.foreach { k =>
        val now = GraftStore.batchesRef(k).get
        val prev = before(k)
        assert(prev.indices.forall(i => now(i) eq prev(i)), k)
      }
      // time travel over the table-level ledger still exact
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat.spec.pmor VERSION AS OF 1")
        .head.getLong(0) === base.count())
    } finally spark.sql("DROP TABLE graft_cat.spec.pmor")
  }

  test("PARTITIONED MOR MERGE: update/insert/delete ops route per shard, zero rewrite") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.pmm").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      val shardKeys = base.select("event_type").distinct()
        .collect().map(r => s"cat::graft_cat.spec.pmm#p=${r.getString(0)}")
      val before = shardKeys.map(k => k -> GraftStore.batchesRef(k).get).toMap
      // matched %4==0 & value<30 → DELETE; other matched %4==0 → UPDATE;
      // unmatched (new ids, partition from modulo) → INSERT
      base.filter(col("event_id") % 4 === 0)
        .select(col("event_id"), col("event_type"), col("value"))
        .unionByName(spark.range(5).select(
          (col("id") + 8000000L).as("event_id"),
          lit("view").as("event_type"), lit(3.0).as("value")))
        .createOrReplaceTempView("spec_pmm_src")
      spark.sql(
        """MERGE INTO graft_cat.spec.pmm t USING spec_pmm_src s
          |ON t.event_id = s.event_id
          |WHEN MATCHED AND t.value < 30 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET value = t.value + 500
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val want = base
        .filter(!(col("event_id") % 4 === 0 && col("value") < 30))
        .select(col("event_id"), col("event_type"),
          when(col("event_id") % 4 === 0, col("value") + 500)
            .otherwise(col("value")).as("value"))
        .unionByName(spark.range(5).select(
          (col("id") + 8000000L).as("event_id"),
          lit("view").as("event_type"), lit(3.0).as("value")))
        .orderBy("event_id", "value").collect().toSeq
      assert(spark.table("graft_cat.spec.pmm")
        .orderBy("event_id", "value").collect().toSeq === want)
      // zero rewrite: every shard's pre-existing batches by reference
      shardKeys.foreach { k =>
        val now = GraftStore.batchesRef(k).get
        val prev = before(k)
        assert(now.size >= prev.size &&
          prev.indices.forall(i => now(i) eq prev(i)), k)
      }
      // CDC: updates pair, deletes and inserts stay distinct, per shard
      val ch = graft.sources.ChangeFeed.tableChanges(spark, "spec.pmm", 1, 2)
      val nUpd = base.filter(col("event_id") % 4 === 0 && col("value") >= 30).count()
      val nDel = base.filter(col("event_id") % 4 === 0 && col("value") < 30).count()
      assert(ch.filter(col("_change_type") === "update_preimage").count() === nUpd)
      assert(ch.filter(col("_change_type") === "update_postimage").count() === nUpd)
      assert(ch.filter(col("_change_type") === "delete").count() === nDel)
      assert(ch.filter(col("_change_type") === "insert").count() === 5L)
    } finally spark.sql("DROP TABLE graft_cat.spec.pmm")
  }

  test("partitioned MOR op scan prunes shards on partition conjuncts (skip-log pinned)") {
    cat()
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    base.writeTo("graft_cat.spec.pmp").partitionedBy(col("event_type"))
      .tableProperty("write.mode", "merge-on-read").create()
    try {
      val nShards = base.select("event_type").distinct().count().toInt
      spark.sql(
        "UPDATE graft_cat.spec.pmp SET value = value + 1000 WHERE event_type = 'error' AND value < 30")
      // the delta op read ONE shard of N — pruning recorded at planning
      val (total, skipped) =
        GraftStore.skipLog("cat::graft_cat.spec.pmp")
      assert(total === nShards)
      assert(skipped === nShards - 1,
        s"expected ${nShards - 1} shards pruned, got $skipped")
      // and the result is still exact
      val want = base
        .select(col("event_id"), col("event_type"),
          when(col("event_type") === "error" && col("value") < 30,
            col("value") + 1000).otherwise(col("value")).as("value"))
        .orderBy("event_id", "value").collect().toSeq
      assert(spark.table("graft_cat.spec.pmp")
        .orderBy("event_id", "value").collect().toSeq === want)
    } finally spark.sql("DROP TABLE graft_cat.spec.pmp")
  }

  test("capstone MERGE source stays distributed: no LocalRelation feeds any WriteDelta (VERDICT r15 #1)") {
    cat()
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
    val dmlPlans = new java.util.concurrent.ConcurrentLinkedQueue[LogicalPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val p = qe.optimizedPlan
        if (p.getClass.getSimpleName.contains("WriteDelta")) dmlPlans.add(p)
        ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = graft.operators.MergeOps.corpusCurationLedger(spark, sfDir)
        .collect()
      assert(out.nonEmpty)
      // listener delivery is async — wait for the capstone's two
      // row-delta DMLs (the dedup MERGE and the re-tag UPDATE)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (dmlPlans.size < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(dmlPlans.size >= 2, "expected the MERGE and UPDATE WriteDelta plans")
      dmlPlans.forEach { p =>
        val local = p.collect { case l: LocalRelation => l }
        assert(local.isEmpty,
          s"WriteDelta plan routes rows through a driver-side LocalRelation:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }
}
