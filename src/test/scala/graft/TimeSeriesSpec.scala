package graft

import org.apache.spark.sql.functions._

import graft.operators.WindowsAndStats

/** Invariants for the time-series/statistics additions: the smoothing
  * window is a true convex combination, the EWMA fold respects per-key
  * bounds, and quantile bins really quarter each group.
  */
class TimeSeriesSpec extends SparkSpec {

  test("w4_moving_avg: ma7 lies within the per-user value envelope") {
    val rows = WindowsAndStats.w4MovingAvg(spark, sfDir)
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"),
        min("ma7").as("mlo"), max("ma7").as("mhi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= r.getDouble(1) - 1e-4, s"ma7 below min for ${r.get(0)}")
      assert(r.getDouble(4) <= r.getDouble(2) + 1e-4, s"ma7 above max for ${r.get(0)}")
    }
  }

  test("w5_ewma: fold result bounded by per-user min/max; first-value seed for singletons") {
    import spark.implicits._
    val ev = graft.engine.Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val bounds = ev.groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"))
    val joined = WindowsAndStats.w5Ewma(spark, sfDir).join(bounds, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ewma, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(ewma >= lo - 1e-4 && ewma <= hi + 1e-4, s"ewma out of bounds for ${r.get(0)}")
    }
    // a singleton sequence must return its own value (list_reduce seed semantics)
    val single = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 42.5))
      .toDF("user_id", "event_id", "ts", "value")
    val out = single.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq"))
      .select(aggregate(
        slice(col("seq"), lit(2), size(col("seq")) - 1),
        element_at(col("seq"), 1).getField("value"),
        (acc, x) => lit(0.3) * x.getField("value") + lit(0.7) * acc).as("e"))
      .collect()
    assert(out.head.getDouble(0) == 42.5)
  }

  test("feature_bins: four bins per group, counts near quarters") {
    val rows = WindowsAndStats.featureBins(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L, 2L, 3L), s"missing bins for $t")
      val counts = rs.map(_.getLong(2))
      val total = counts.sum.toDouble
      counts.foreach(c => assert(c / total > 0.15 && c / total < 0.35,
        s"bin far from a quartile for $t: ${counts.mkString(",")}"))
    }
  }
}
