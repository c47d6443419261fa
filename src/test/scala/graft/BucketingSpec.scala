package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** The 100 TB merge design (SURVEY.md S7 scale note): with the launches
  * table BUCKETED by key, the key-equality join against an equally
  * bucketed batch needs no exchange at all — the shuffle that dominates
  * the naive merge disappears. This spec proves the property at test
  * scale: same join, bucketed vs not, exchange count 0 vs >0.
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("key join over bucketed tables plans without a shuffle exchange") {
    val db = "graft_bucketing_test"
    val loc = tmpDir("graft-bucketing")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    try {
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("value"))
      ev.write.bucketBy(8, "event_id").sortBy("event_id")
        .mode("overwrite").saveAsTable(s"$db.launches_bucketed")
      ev.filter(col("event_id") % 3 === 0)
        .write.bucketBy(8, "event_id").sortBy("event_id")
        .mode("overwrite").saveAsTable(s"$db.batch_bucketed")

      val bucketedJoin = spark.table(s"$db.launches_bucketed")
        .join(spark.table(s"$db.batch_bucketed"), "event_id")
      bucketedJoin.count() // materialize through AQE
      val bucketedExchanges = collect(
        bucketedJoin.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(bucketedExchanges.isEmpty,
        s"bucketed join should be shuffle-free, found: $bucketedExchanges")

      // control: the same join over plain parquet shuffles (merge hint —
      // at test scale the small side would otherwise broadcast, which is
      // also shuffle-free and proves nothing)
      val plain = ev.hint("merge").join(ev.filter(col("event_id") % 3 === 0)
        .select(col("event_id").as("event_id"), col("value").as("v2")).hint("merge"), "event_id")
      plain.count()
      val plainExchanges = collect(plain.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(plainExchanges.nonEmpty, "control join unexpectedly shuffle-free")

      // and the join results agree
      assert(bucketedJoin.count() === plain.count())
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
