package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Input/state/output rows for [[TwsTypeCountsProcessor]]. */
case class TcIn(event_id: Long, user_id: Long, event_type: String, value: Double)
case class TcAgg(n: Long, cents: Long)
case class TcEmit(user_id: Long, event_type: String, n_events: Long, sum_cents: Long)

/** Per-(user, event_type) running counts/sums on `transformWithState`
  * MAP STATE — the composite state type the TWS matrix still lacked
  * (value state, schema evolution, state read, and timers are gated).
  * The map's point is granularity: each batch touches ONLY the entries
  * of the types it saw (`getValue`/`updateValue` per sub-key), where a
  * ValueState holding the whole per-user map would rewrite every entry
  * on every touch — at 100 TB state sizes, the difference between
  * updating a row and rewriting a document.
  *
  * Cents discipline: values accumulate as `floor(v*100+0.5)` longs —
  * exact in any batch/arrival order, so the oracle can recompute the
  * final state cell-exactly (no float-envelope caveat).
  *
  * Emissions are update-mode shaped: one row per (user, type) TOUCHED
  * in the batch, carrying the post-batch running totals — the digest
  * keeps each key's final emission (`n` strictly increases per key).
  */
class TwsTypeCountsProcessor extends StatefulProcessor[Long, TcIn, TcEmit] {

  @transient private var counts: MapState[String, TcAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, TcAgg](
      "typeCounts", Encoders.STRING, Encoders.product[TcAgg], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TcIn],
      timerValues: TimerValues): Iterator[TcEmit] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { r =>
      val prev = Option(counts.getValue(r.event_type)).getOrElse(TcAgg(0L, 0L))
      counts.updateValue(r.event_type,
        TcAgg(prev.n + 1, prev.cents + math.floor(r.value * 100 + 0.5).toLong))
      touched += r.event_type
      ()
    }
    touched.iterator.map { t =>
      val a = counts.getValue(t)
      TcEmit(key, t, a.n, a.cents)
    }
  }
}
