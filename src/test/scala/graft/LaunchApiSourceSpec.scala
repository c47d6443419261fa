package graft

import org.apache.spark.sql.functions._

import graft.sources.LaunchApiSource

/** The DSv2 paginated-API source: schema, determinism, plan-time page
  * skipping under a pushed watermark, and column pruning. rowsGenerated
  * is the observable for "the filter reached the source" — local-mode
  * single JVM, so the counter sees executor-side reads.
  */
class LaunchApiSourceSpec extends SparkSpec {

  private def api(rows: Long = 1000, pageSize: Int = 100) =
    spark.read.format("graft.sources.LaunchApiSource")
      .option("rows", rows).option("pageSize", pageSize).load()

  test("full scan: schema, row count, deterministic content") {
    val df = api()
    assert(df.schema.fieldNames.toSeq ==
      Seq("launch_id", "mission_name", "date_utc", "success", "payload_mass_kg"))
    assert(df.count() == 1000)
    val first = df.orderBy("launch_id").first()
    assert(first.getString(0) == "launch_00000000")
    assert(df.orderBy("launch_id").first() == first) // rerun = same row
  }

  test("watermark pushdown skips whole pages at plan time") {
    // watermark at row 700 of 1000 -> pages 0-6 fully below, skipped
    val wm = new java.sql.Timestamp(LaunchApiSource.dateAt(700) / 1000)
    LaunchApiSource.rowsGenerated.set(0)
    val df = api().filter(col("date_utc") >= lit(wm))
    // collect(), not count(): count() now rides the AGGREGATE pushdown and
    // materializes zero rows — this test observes the row-scan filter path
    assert(df.collect().length == 300)
    val generated = LaunchApiSource.rowsGenerated.get()
    assert(generated == 300, s"expected only qualifying rows materialized, got $generated")
    assert(df.rdd.getNumPartitions == 3, "fully-filtered pages must not become partitions")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("minDateUs=Some"), s"pushed watermark missing from scan:\n$scanDesc")
  }

  test("strict > excludes the boundary row; unsupported filters stay post-scan") {
    val wm = new java.sql.Timestamp(LaunchApiSource.dateAt(999) / 1000)
    assert(api().filter(col("date_utc") > lit(wm)).count() == 0)
    assert(api().filter(col("date_utc") >= lit(wm)).count() == 1)
    // success filter is NOT pushed; rows still materialize then filter
    LaunchApiSource.rowsGenerated.set(0)
    assert(api(rows = 110).filter(col("success") === true).count() > 0)
    assert(LaunchApiSource.rowsGenerated.get() == 110, "non-pushed filter must not prune the scan")
  }

  test("column pruning reaches the reader") {
    val df = api().select(countDistinct(col("mission_name")).as("n"))
    assert(df.collect().head.getLong(0) == 97)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("cols=mission_name"), s"reader not pruned:\n$scan")
  }

  test("watermark + aggregation end-to-end (the S3 incremental-scan shape)") {
    val wm = new java.sql.Timestamp(LaunchApiSource.dateAt(500) / 1000)
    val agg = api().filter(col("date_utc") >= lit(wm))
      .agg(count(lit(1)).as("n"),
        sum(when(col("success") === true, 1).otherwise(0)).as("succ"))
      .collect().head
    assert(agg.getLong(0) == 500)
    assert(agg.getLong(1) > 300) // ~4/5 of non-null-success rows succeed
  }

  test("aggregate pushdown: closed-form count/min/max, ZERO rows materialized") {
    val wm = new java.sql.Timestamp(LaunchApiSource.dateAt(200) / 1000)
    val q = api().filter(col("date_utc") >= lit(wm))
      .agg(count(lit(1)).as("n"),
        min(col("date_utc")).as("lo"), max(col("date_utc")).as("hi"))
    // complete pushdown: Spark's own aggregate exec disappears entirely
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"expected no aggregate exec under complete pushdown:\n$plan")
    LaunchApiSource.rowsGenerated.set(0)
    val row = q.collect().head
    assert(LaunchApiSource.rowsGenerated.get() == 0,
      "pushed aggregate must materialize zero data rows")
    assert(row.getLong(0) == 800)
    assert(row.getTimestamp(1).getTime * 1000 == LaunchApiSource.dateAt(200))
    assert(row.getTimestamp(2).getTime * 1000 == LaunchApiSource.dateAt(999))
  }

  test("unsupported aggregates decline pushdown and fall back to the row scan") {
    val q = api().agg(avg(col("payload_mass_kg")).as("m"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), "avg must keep Spark-side aggregation")
    LaunchApiSource.rowsGenerated.set(0)
    assert(q.collect().head.getDouble(0) > 0)
    assert(LaunchApiSource.rowsGenerated.get() == 1000,
      "fallback must materialize every row")
  }

  test("streaming: admission-controlled batches resume exactly-once across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val out = tmpDir("graft-api-stream-out")
    val ckpt = tmpDir("graft-api-stream-ckpt")
    def run(rows: Long) = {
      val q = spark.readStream.format("graft.sources.LaunchApiSource")
        .option("rows", rows).option("pageSize", 100)
        .option("maxRowsPerTrigger", 300)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q
    }
    // first poll: upstream has 300 launches
    run(300)
    assert(spark.read.parquet(out).count() == 300)
    // upstream grew to 1000; same checkpoint → resume from offset 300.
    // 700 remaining rows / 300 per trigger = 3 data batches (admission
    // control must survive the restart too)
    val q2 = run(1000)
    assert(q2.recentProgress.count(_.numInputRows > 0) == 3,
      q2.recentProgress.map(_.numInputRows).mkString(","))
    val ids = spark.read.parquet(out).select("launch_id").collect().map(_.getString(0))
    assert(ids.length == 1000, "exactly-once: no loss, no replay")
    assert(ids.distinct.length == 1000, "exactly-once: no duplicates")
  }

  test("group-by aggregates decline pushdown (values still correct)") {
    val byMission = api(rows = 97 * 3, pageSize = 50)
      .groupBy(col("mission_name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMission.size == 97 && byMission.values.forall(_ == 3L))
  }
}
