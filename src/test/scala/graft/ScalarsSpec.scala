package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Scalars._

/** Scalar kit semantics — the reference's edge cases (FIXTURES.md §A4). */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("triState maps to true/false/null") {
    val df = Seq("F", "O", "P", "X").toDF("s")
      .select(triState(col("s"), "F", "O").as("b"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      === Seq(true, false, null, null))
  }

  test("tri-state counts exclude nulls from both classes (A2)") {
    val df = Seq(Some(true), Some(true), Some(false), None, None).toDF("success")
    val r = df.agg(countTrue(col("success")).as("t"), countFalse(col("success")).as("f"),
      count(lit(1)).as("n")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 5L)))
    // invariant the reference tests: successful + failed <= total
    assert(r.getLong(0) + r.getLong(1) <= r.getLong(2))
  }

  test("ratioPct guards zero denominator with NULL (A7)") {
    val df = Seq((1L, 0L), (1L, 3L)).toDF("num", "den")
      .select(ratioPct(col("num"), col("den")).as("r"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) === 33.33)
  }

  test("hourDiffTrunc truncates like Trino date_diff; frac keeps fraction (Q3 trap)") {
    val a = Timestamp.valueOf("2024-01-01 00:00:00")
    val b = Timestamp.valueOf("2024-01-01 01:59:00")
    val df = Seq((a, b)).toDF("a", "b").select(
      hourDiffTrunc(col("a"), col("b")).as("t"),
      hourDiffFrac(col("a"), col("b")).as("f"))
    val r = df.collect().head
    assert(r.getLong(0) === 1L)
    assert(math.abs(r.getDouble(1) - 59.0 / 60.0 - 1.0) < 1e-9)
  }

  test("nullIfNonPositive: 0 and negatives become NULL (P10)") {
    val df = Seq(0.0, -1.0, 2.5).toDF("m")
      .select(nullIfNonPositive(col("m")).as("v"))
    val vs = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(vs.toSeq === Seq(null, null, 2.5))
  }

  test("roundTo half-up at exact decimal boundaries, both signs") {
    val df = Seq(4.725, 8.125, 1.0049, -0.0050415).toDF("x")
      .select(roundTo(col("x"), 2).as("r2"), roundTo(col("x"), 6).as("r6"))
    val rs = df.collect()
    assert(rs(0).getDouble(0) === 4.72) // 4.725 is binary 4.72499…964 → down
    assert(rs(1).getDouble(0) === 8.13) // 8.125 exact binary → half-up
    assert(rs(2).getDouble(0) === 1.0)
    assert(rs(3).getDouble(1) === -0.005041)
  }

  test("runLabel matches the reference's pipeline_<ts>_<hex8> format (§2.10)") {
    val labels = Seq(Timestamp.valueOf("2024-03-05 17:04:09"), Timestamp.valueOf("2024-03-05 17:04:09"))
      .toDF("ts").select(runLabel(col("ts")).as("run_id")).collect().map(_.getString(0))
    labels.foreach { l =>
      assert(l.matches("pipeline_\\d{8}_\\d{6}_[0-9a-f]{8}"), s"bad run label: $l")
      assert(l.startsWith("pipeline_20240305_170409_"))
    }
    // uuid suffix makes concurrent runs with the same wall clock distinct
    assert(labels.distinct.length === 2)
  }
}
