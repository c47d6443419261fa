package graft

import org.apache.spark.sql.functions._

/** Runtime (row-level) bloom-filter join pruning — the 100 TB mechanism
  * that DPP can't cover: when the dimension side of a SHUFFLE join is
  * selectively filtered, Spark injects a bloom filter built from the
  * dimension keys into the fact-side scan, dropping non-joining rows
  * before the exchange. Fixture tables sit far below the production
  * thresholds (application side ≥ 10 GB by default), so this spec lowers
  * the thresholds to prove the ENGINE's join shapes are eligible — the
  * same plans at real scale get the filter with stock settings. Asserted:
  * `might_contain` lands in the optimized plan, and the filtered join's
  * row count equals the unfiltered equivalent (the bloom filter is
  * may-contain, never drops a joining row).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim shuffle join gets a runtime bloom filter; results unchanged") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val dim = graft.engine.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val fact = graft.engine.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")
      val withFilter = joined.count()
      confs.keys.foreach(k => spark.conf.unset(k))
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
      assert(withFilter == without && withFilter > 0,
        s"bloom filter changed results: $withFilter vs $without")
    } finally {
      saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
      }
    }
  }
}
