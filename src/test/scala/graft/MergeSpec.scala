package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MergeOps

/** S7 merge semantics — the reference's upsert edge cases (FIXTURES.md §A4):
  * duplicate keys with changed fields (last write wins), new-key counting
  * that excludes updates, idempotence under re-delivery.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val existing = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10.0),
    (2L, ts("2024-01-02 00:00:00"), 20.0),
    (3L, ts("2024-01-03 00:00:00"), 30.0)
  ).toDF("event_id", "ts", "value")

  private val incoming = Seq(
    (2L, ts("2024-01-05 00:00:00"), 99.0),  // update: newer version
    (4L, ts("2024-01-04 00:00:00"), 40.0)   // genuinely new key
  ).toDF("event_id", "ts", "value")

  private def asMap(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("last write wins on duplicate keys; others untouched") {
    val merged = MergeOps.mergeByKey(existing, incoming, "event_id", "ts")
    assert(asMap(merged) === Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("new-key count excludes updates (src/database.py:164-190 semantics)") {
    val n = MergeOps.newKeyCount(existing, incoming, "event_id").collect().head.getLong(0)
    assert(n === 1L)
  }

  test("merge is idempotent: re-delivering the same batch changes nothing") {
    val once = MergeOps.mergeByKey(existing, incoming, "event_id", "ts")
    val twice = MergeOps.mergeByKey(once, incoming, "event_id", "ts")
    assert(asMap(twice) === asMap(once))
    assert(MergeOps.newKeyCount(once, incoming, "event_id")
      .collect().head.getLong(0) === 0L)
  }

  test("boundary re-fetch (>= watermark) dedups through merge (P3 asymmetry)") {
    // the row exactly at the watermark arrives twice with identical version
    val boundary = Seq((3L, ts("2024-01-03 00:00:00"), 30.0)).toDF("event_id", "ts", "value")
    val merged = MergeOps.mergeByKey(existing, boundary, "event_id", "ts")
    assert(merged.count() === 3L)
    assert(asMap(merged)(3L) === 30.0)
  }

  test("merge handles empty incoming batch") {
    val empty = incoming.filter(lit(false))
    val merged = MergeOps.mergeByKey(existing, empty, "event_id", "ts")
    assert(merged.count() === 3L)
  }
}
