package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.SnapshotAggregator
import graft.functions.SnapshotAggregator.EventRow

/** The typed A10 Aggregator must agree with the untyped single-pass agg,
  * and its merge must be associative across arbitrary splits (the property
  * that makes the snapshot state distributable / micro-batchable).
  */
class TypedAggregatorSpec extends SparkSpec {

  test("typed Aggregator equals the untyped one-pass aggregate") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
    val typed = ev.select(SnapshotAggregator.aggregator.toColumn).collect().head

    val untyped = Tables.events(spark, sfDir).agg(
      count(lit(1)).as("total"),
      count(when(col("event_type") === "purchase", 1)).as("purchases"),
      count(when(col("event_type") === "error", 1)).as("errors"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"),
      avg(col("value")).as("avg_value")).collect().head

    assert(typed.total_events === untyped.getLong(0))
    assert(typed.total_purchases === untyped.getLong(1))
    assert(typed.total_errors === untyped.getLong(2))
    assert(typed.earliest_ts === untyped.getTimestamp(3))
    assert(typed.latest_ts === untyped.getTimestamp(4))
    assert(math.abs(typed.avg_value.get - untyped.getDouble(5)) < 1e-9)
  }

  test("merge is associative and order-insensitive (snapshot ⊕ batch = full recompute)") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventRow]
    val agg = SnapshotAggregator.aggregator
    val full = ev.select(agg.toColumn).collect().head

    // split at a date boundary, aggregate independently, merge states —
    // exactly the reference's "previous snapshot ⊕ new batch" path
    val cut = Tables.utcTs("2024-01-15 00:00:00")
    val a = ev.filter(col("ts") < lit(cut)).as[EventRow].select(agg.toColumn).collect().head
    val b = ev.filter(col("ts") >= lit(cut)).as[EventRow].select(agg.toColumn).collect().head
    assert(a.total_events + b.total_events === full.total_events)
    assert(a.total_purchases + b.total_purchases === full.total_purchases)
    assert(Seq(a.earliest_ts, b.earliest_ts).min(Ordering.by((t: java.sql.Timestamp) => t.getTime))
      === full.earliest_ts)
  }
}
