package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Catalog-table scans report LIVE-row statistics from the snapshot
  * ([[graft.sources.GraftStoreScan.estimateStatistics]]), so Catalyst
  * broadcasts a small catalog table in a join with no hint and no
  * ANALYZE — and a deletion-vector delete SHRINKS the estimate.
  */
class StoreStatsSpec extends SparkSpec {

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)

  test("a small catalog dimension auto-broadcasts; stats track live rows through a DV delete") {
    cat()
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"))
    // a 5-row dimension table in the catalog
    spark.range(5).select(col("id").as("event_type_id"),
        concat(lit("t"), col("id")).as("nm"))
      .writeTo("graft_cat.spec.dim").create()
    try {
      val joined = events.join(spark.table("graft_cat.spec.dim"),
        events("event_id") % 5 === col("event_type_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastExchange"),
        s"a 5-row catalog table should broadcast without a hint:\n$plan")
      assert(joined.count() === events.count())

      // DV delete shrinks the reported estimate (live rows, not physical)
      val statsOf = { () =>
        val rel = spark.table("graft_cat.spec.dim").queryExecution.optimizedPlan
        rel.stats.rowCount
      }
      val before = statsOf()
      spark.sql("DELETE FROM graft_cat.spec.dim WHERE event_type_id >= 3")
      val after = statsOf()
      assert(before.contains(BigInt(5)) || before.isEmpty)
      assert(after.contains(BigInt(3)),
        s"expected live-row stats 3 after the DV delete, got $after")
    } finally spark.sql("DROP TABLE graft_cat.spec.dim")
  }
}
