package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The A10 snapshot state as a typed `Aggregator` — the faithful typed
  * form of the reference's incremental merge (init/reduce/merge/finish
  * mirror `_calculate_incremental_updates`, src/aggregations.py:236-308):
  * counts and min/max merge associatively; averages carry (sum, count)
  * pairs instead of the reference's "recompute from the full table"
  * fallback (src/aggregations.py:290-300), which is exactly the
  * decomposition that makes the state mergeable across partitions — and
  * across micro-batches when used with `mapGroupsWithState`.
  *
  * The untyped single-pass `agg(...)` (Relational.aggSnapshotFull,
  * MergeOps.a10SnapshotSeries) remains the default plan; this typed twin
  * exists for API fidelity and is equivalence-tested against it.
  */
object SnapshotAggregator {

  final case class EventRow(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class AggState(
      total: Long, purchases: Long, errors: Long,
      minTs: Long, maxTs: Long,          // micros since epoch; Long.Max/Min when empty
      sumValue: Double, nValue: Long)

  final case class Snapshot(
      total_events: Long, total_purchases: Long, total_errors: Long,
      earliest_ts: Timestamp, latest_ts: Timestamp,
      avg_value: Option[Double], purchase_rate: Option[Double])

  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def fromMicros(m: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(m, 1000L))
    t.setNanos((Math.floorMod(m, 1000000L) * 1000L).toInt)
    t
  }

  val aggregator: Aggregator[EventRow, AggState, Snapshot] =
    new Aggregator[EventRow, AggState, Snapshot] {
      override def zero: AggState =
        AggState(0L, 0L, 0L, Long.MaxValue, Long.MinValue, 0.0, 0L)

      override def reduce(b: AggState, e: EventRow): AggState = {
        val m = micros(e.ts)
        AggState(
          b.total + 1,
          b.purchases + (if (e.event_type == "purchase") 1 else 0),
          b.errors + (if (e.event_type == "error") 1 else 0),
          math.min(b.minTs, m), math.max(b.maxTs, m),
          b.sumValue + e.value, b.nValue + 1)
      }

      override def merge(a: AggState, b: AggState): AggState =
        AggState(
          a.total + b.total, a.purchases + b.purchases, a.errors + b.errors,
          math.min(a.minTs, b.minTs), math.max(a.maxTs, b.maxTs),
          a.sumValue + b.sumValue, a.nValue + b.nValue)

      override def finish(r: AggState): Snapshot =
        Snapshot(
          r.total, r.purchases, r.errors,
          if (r.total == 0) null else fromMicros(r.minTs),
          if (r.total == 0) null else fromMicros(r.maxTs),
          if (r.nValue == 0) None else Some(r.sumValue / r.nValue),
          // A7 guard: NULL rate on empty state (src/models.py:112-116)
          if (r.total == 0) None else Some(r.purchases.toDouble * 100.0 / r.total))

      override def bufferEncoder: Encoder[AggState] = Encoders.product[AggState]
      override def outputEncoder: Encoder[Snapshot] = Encoders.product[Snapshot]
    }
}
