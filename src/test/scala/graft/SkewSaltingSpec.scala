package graft

import org.apache.spark.sql.functions._

/** Skew mitigation by salting (the 100 TB aggregation pattern): a
  * two-phase salted aggregation must be exactly equivalent to the direct
  * one. At production scale the salted partial pass spreads one hot key
  * over N reducers; AQE's skew-join handling covers the join case, this
  * covers the aggregation case.
  */
class SkewSaltingSpec extends SparkSpec {

  test("two-phase salted aggregation equals direct aggregation on a skewed key") {
    import spark.implicits._
    // synthesize skew: 90% of rows share one key
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"cold${i % 7}"
      (k, i.toDouble)
    }
    val df = rows.toDF("k", "v")

    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap

    val salts = 8
    val salted = df
      .withColumn("salt", pmod(hash(col("v")), lit(salts)))
      .groupBy("k", "salt")                       // phase 1: hot key spread over 8 reducers
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy("k")                               // phase 2: tiny final combine
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap

    assert(salted.keySet === direct.keySet)
    direct.foreach { case (k, (n, s)) =>
      assert(salted(k)._1 === n)
      assert(math.abs(salted(k)._2 - s) < 1e-6, s"sum mismatch for $k")
    }
  }
}
