package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Partitioned-layout complement to BucketingSpec: events written
  * `partitionBy(event_date)` must answer a date-filtered query by reading
  * only the matching partitions (partition pruning), the 100 TB analog of
  * the reference's server-side date filter ("reduce data transfer by
  * 80%", README.md:188).
  */
class PartitionPruningSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("date filter prunes partitions of a partitionBy-written table") {
    val out = tmpDir("graft-partitioned")
    val ev = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    ev.write.partitionBy("event_date")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)

    val totalDays = ev.select("event_date").distinct().count()
    val q = spark.read.parquet(out)
      .filter(col("event_date") === lit(java.sql.Date.valueOf("2024-01-15")))
    val n = q.count()
    assert(n > 0)

    val scans = collect(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scanned = scans.head.relation.location
      .listFiles(scans.head.partitionFilters, scans.head.dataFilters)
    // one day's partition only, out of ~30
    assert(scanned.map(_.files.size).sum < scans.head.relation.location.inputFiles.length,
      "scan did not prune partitions")
    assert(scanned.size === 1, s"expected 1 pruned partition, got ${scanned.size} of $totalDays days")
  }

  test("dimension filter prunes fact partitions DYNAMICALLY through the join") {
    // the second layout lever at 100 TB: a star-schema query that filters
    // the DIMENSION must not scan every fact partition — Spark's dynamic
    // partition pruning plants a DynamicPruningExpression subquery in the
    // fact scan's partition filters at planning time. Fact = events
    // partitioned by day; dim = a 3-row day attribute table filtered to
    // one tier.
    import spark.implicits._
    val out = tmpDir("graft-dpp-fact")
    val ev = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    ev.write.partitionBy("event_date")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
    val days = ev.select("event_date").distinct()
      .orderBy("event_date").as[java.sql.Date].collect()
    // the dim must be a DATASOURCE relation: over an in-memory
    // LocalRelation the optimizer folds the tier filter into the relation
    // itself before the PartitionPruning rule looks for a selective
    // predicate, and no DPP subquery is planted (verified)
    val dimDir = tmpDir("graft-dpp-dim")
    days.zipWithIndex
      .map { case (d, i) => (d, if (i < 3) "audit" else "normal") }.toSeq
      .toDF("d_date", "d_tier")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val fact = spark.read.parquet(out)
    val q = fact.join(dim.filter(col("d_tier") === "audit"),
        fact("event_date") === dim("d_date"))
      .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
    val rows = q.collect()
    assert(rows.length === 3, s"expected 3 audit days, got ${rows.length}")

    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("graft-dpp-fact")) => s
    }
    assert(scans.nonEmpty, "fact scan not found in final plan")
    val hasDpp = scans.exists(_.partitionFilters.exists(_.find(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression]).isDefined))
    assert(hasDpp,
      s"no DynamicPruningExpression in fact partition filters:\n${scans.map(_.partitionFilters).mkString("\n")}")
  }
}
