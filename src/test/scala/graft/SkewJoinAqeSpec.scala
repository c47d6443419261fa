package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling is the engine's answer for hot-key JOINs at
  * 100 TB (salting covers the aggregation case — `SkewSaltingSpec`).
  * This pins that the runtime re-plan actually engages: with thresholds
  * scaled to fixture bytes, a 95%-hot-key join must come back with its
  * skewed side split (`skew=true` in the final plan) and identical
  * results to the unsplit join.
  */
class SkewJoinAqeSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffled join
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")

      val left = (1 to 50000).map { i =>
        (if (i % 20 != 0) "hot" else s"cold${i % 13}", i.toLong)
      }.toDF("k", "v")
      val right = (0 until 13).map(i => (s"cold$i", i.toLong))
        .:+(("hot", 99L)).toDF("k", "w")

      val joined = left.join(right, "k")
      val n = joined.collect().length // collect THIS df so ITS adaptive plan finalizes
      assert(n == 50000, s"join lost rows: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew handling did not engage:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
