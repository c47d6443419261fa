package graft

import org.apache.spark.sql.functions._

import graft.operators.WarehouseOps

/** Plan pins for `cbo_stats_join`: column statistics must be what flips
  * the join strategy — broadcast under CBO, sort-merge without it, at
  * the SAME threshold — and both plans must agree on the result.
  */
class CboStatsSpec extends SparkSpec {

  test("ANALYZE column stats shrink the filtered-dim estimate by well over the pin margin") {
    val sc = spark.newSession()
    val tbl = WarehouseOps.cboTable(sc, sfDir)
    val withStats = WarehouseOps.cboDimEstimate(sc, sfDir, tbl, cbo = true)
    val sizeOnly = WarehouseOps.cboDimEstimate(sc, sfDir, tbl, cbo = false)
    assert(withStats * 4 < sizeOnly,
      s"expected a >4x stats-driven reduction, got $withStats vs $sizeOnly")
  }

  test("same threshold, stats on -> BroadcastHashJoin; stats off -> SortMergeJoin; equal results") {
    val sc = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      if (sc.conf.isModifiable(k)) sc.conf.set(k, v)
    }
    WarehouseOps.cboConfs.foreach { case (k, v) => sc.conf.set(k, v) }
    val tbl = WarehouseOps.cboTable(sc, sfDir)
    val thr = ((WarehouseOps.cboDimEstimate(sc, sfDir, tbl, cbo = true) +
      WarehouseOps.cboDimEstimate(sc, sfDir, tbl, cbo = false)) / 2).toLong
    sc.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)

    sc.conf.set("spark.sql.cbo.enabled", "true")
    val withCbo = WarehouseOps.withActiveSession(sc) {
      val df = WarehouseOps.cboJoinPlan(sc, sfDir, tbl)
      val cboExec = df.queryExecution.executedPlan.toString
      assert(cboExec.contains("BroadcastHashJoin"),
        s"stats-driven broadcast missing:\n${cboExec.take(800)}")
      df.collect().toSeq
    }

    sc.conf.set("spark.sql.cbo.enabled", "false")
    val without = WarehouseOps.withActiveSession(sc) {
      val df = WarehouseOps.cboJoinPlan(sc, sfDir, tbl)
      val rawExec = df.queryExecution.executedPlan.toString
      assert(rawExec.contains("SortMergeJoin") && !rawExec.contains("BroadcastHashJoin"),
        s"size-only estimate must refuse the broadcast at the same threshold:\n${rawExec.take(800)}")
      df.collect().toSeq
    }

    assert(withCbo === without, "join strategy must not change the result")
  }

  test("cbo_stats_join digest equals the plain-session recompute") {
    val got = WarehouseOps.cboStatsJoin(spark, sfDir).collect().toSeq
    val want = graft.engine.Tables.orders(spark, sfDir)
      .join(graft.engine.Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9000),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0)
          .as("total"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(got === want)
  }
}
