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

  test("observed_ingest: metrics ride the ONE transform scan (CollectMetrics, no 2nd pass)") {
    import org.apache.spark.sql.functions.col
    val obs = org.apache.spark.sql.Observation("graft_obs_spec")
    val digest = ProfilingOps.observedDigest(spark, sfDir, obs)
    digest.collect()
    val plan = digest.queryExecution.executedPlan
    val scans = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1,
      s"observe() must not add a scan: expected 1, got ${scans.length}")
    assert(plan.toString.contains("CollectMetrics"),
      "no CollectMetrics node — the observation is not riding this job")
    // the metrics equal a direct recompute
    val m = obs.get
    val ev = graft.engine.Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
    assert(m("obs_rows") == ev.count())
    assert(m("obs_bad_value") ==
      ev.filter(col("value").isNull || col("value") < 0).count())
  }

  test("integrity_audit: clean fixture passes; injected dup pk + orphan fk are caught") {
    import org.apache.spark.sql.functions._
    val clean = ProfilingOps.integrityAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.size == 10)
    assert(clean("pk_orders") == 0L && clean("fk_lineitem_orders") == 0L)
    assert(clean("fk_orders_customer_stale") > 0L,
      "thinned dimension must orphan some orders")

    // corrupt copy: one duplicated order + one order with unknown custkey
    val dir = tmpDir("graft-integrity")
    for (t <- Seq("customer", "part", "supplier", "nation", "lineitem"))
      spark.read.parquet(s"$sfDir/$t.parquet").write.parquet(s"$dir/$t.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    o.unionAll(o.limit(1))
      .unionAll(o.limit(1)
        .withColumn("o_orderkey", lit(-999L))
        .withColumn("o_custkey", lit(-777L)))
      .write.parquet(s"$dir/orders.parquet")
    val bad = ProfilingOps.integrityAudit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bad("pk_orders") == 1L, "duplicated order key must be counted once")
    assert(bad("fk_orders_customer_stale") == clean("fk_orders_customer_stale") + 1,
      "the unknown custkey must add exactly one orphan")
    assert(bad("fk_lineitem_orders") == 0L,
      "no lineitem points at the injected order key")
  }

  test("approx_top_k is exact below sketch capacity: equals the true top-3") {
    import org.apache.spark.sql.functions._
    // 5 distinct event types vs a 10^4-item sketch: zero evictions, so
    // every count is the true count and a cell-exact compare is sound
    val got = ProfilingOps.approxTopkBuiltin(spark, sfDir).collect().toSeq
    val want = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("item"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item")).limit(3).collect().toSeq
    assert(got === want)
  }

  test("hll sketch columns are storable binary state; sparse-range estimates are exact") {
    import org.apache.spark.sql.functions._
    val per = graft.engine.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact"))
    // the sketch is a BINARY column — the property that makes it a
    // storable, re-unionable rollup artifact rather than a one-shot agg
    assert(per.schema("sk").dataType ===
      org.apache.spark.sql.types.BinaryType)
    // at fixture cardinality (15 users) the sketch is in its exact
    // sparse range: estimates equal the true counts, no envelope needed
    val rows = per.select(col("exact"),
      hll_sketch_estimate(col("sk")).as("est")).collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(0)))
  }

  test("median/percentile (exact) equal a driver-side sorted recompute") {
    import org.apache.spark.sql.functions._
    val vals = graft.engine.Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    def q(p: Double): Double = {
      val pos = p * (vals.length - 1)
      val lo = vals(pos.toInt)
      val hi = vals(math.min(pos.toInt + 1, vals.length - 1))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val row = graft.operators.WindowsAndStats
      .medianPercentiles(spark, sfDir)
      .filter(col("event_type") === "click").collect().head
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(row.getDouble(1) === r4(q(0.5)))
    assert(row.getDouble(2) === r4(q(0.25)))
    assert(row.getDouble(3) === r4(q(0.75)))
  }

  test("kanon_audit: digest invariants against the raw class table") {
    val r = ProfilingOps.kanonAudit(spark, sfDir).collect().head
    val (nClasses, k, nRows, below5, below10) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
    assert(nRows == customers.count(), "class sizes must partition the table")
    assert(k >= 1 && below5 <= below10 && below10 <= nRows)
    import org.apache.spark.sql.functions._
    val minClass = customers.groupBy("c_mktsegment", "c_nationkey").count()
      .agg(min("count")).collect().head.getLong(0)
    assert(k == minClass, "k-anonymity must be the smallest equivalence class")
    assert(nClasses <= 5L * 25L, "class count bounded by quasi-identifier domain")
  }
}
