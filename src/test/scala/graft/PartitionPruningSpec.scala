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
}
