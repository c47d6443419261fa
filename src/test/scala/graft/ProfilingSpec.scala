package graft

import graft.operators.ProfilingOps

/** Invariants for the one-pass data-quality rule report: fixed catalog,
  * bounded counts, and the designed violation mix (natural violations on
  * the range/horizon/status rules, a simulated-null rule, one genuinely
  * passing rule) — plus the one-scan plan property that makes the rule
  * catalog free to grow.
  */
class ProfilingSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  test("dq_rule_report: five rules, bounded counts, designed violation mix") {
    val rows = ProfilingOps.dqRuleReport(spark, sfDir)
      .orderBy("rule").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_custkey_present", "2_price_range", "3_date_horizon",
        "4_status_known", "5_priority_format"))
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == n, "n_checked differs across rules of one pass")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val byRule = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byRule("4_status_known") > 0, "'P' status rows must violate rule 4")
    assert(byRule("5_priority_format") == 0, "priority format rule must pass")
  }

  test("dq_rule_report scans orders exactly once regardless of catalog size") {
    val df = ProfilingOps.dqRuleReport(spark, sfDir)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected one scan, got ${scans.length}")
  }
}
