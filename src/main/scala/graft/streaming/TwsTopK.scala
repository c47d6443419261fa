package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Input/state/output rows for [[TwsTopKProcessor]] — top-level case
  * classes so `Encoders.product` derivation is stable across executors.
  */
case class TwsIn(event_id: Long, user_id: Long, value: Double)
case class TwsScored(value: Double, eventId: Long)
case class TwsState(items: List[TwsScored], nSeen: Long)
case class TwsEmit(user_id: Long, n_seen: Long,
    v1: Option[Double], v2: Option[Double], v3: Option[Double])

/** Arbitrary-state streaming top-k via the `transformWithState` API
  * (Spark 4's StatefulProcessor, the successor to
  * `flatMapGroupsWithState` — RocksDB-provider-only by design): keep each
  * user's running top-3 event values. A running PER-KEY TOP-K is not
  * expressible as a built-in streaming aggregate (no window functions in
  * streaming, and `max` keeps only one value), so this is the API's
  * genuine use case, not a twin of an existing aggregate: bounded custom
  * state (k entries + a counter) merged on every batch.
  *
  * State is a single [[ValueState]] holding the k-bounded item list —
  * O(k) per key regardless of stream length, the smallest state that
  * solves the problem; `TTLConfig.NONE` because the fixture key space is
  * bounded (production sets a TTL here instead of a watermark — this API
  * evicts by state age, not event time). One emission per (key, batch
  * that touched it) — exactly update-mode granularity, which the driver
  * digest counts as teeth.
  */
class TwsTopKProcessor(k: Int) extends StatefulProcessor[Long, TwsIn, TwsEmit] {

  @transient private var state: ValueState[TwsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TwsState](
      "topk", Encoders.product[TwsState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsIn],
      timerValues: TimerValues): Iterator[TwsEmit] = {
    val prev = Option(state.get()).getOrElse(TwsState(Nil, 0L))
    var n = prev.nSeen
    val incoming = rows.map { r => n += 1; TwsScored(r.value, r.event_id) }.toList
    // total order (value desc, event id asc) makes the survivors — and
    // therefore the persisted state — independent of arrival order
    val top = (prev.items ++ incoming)
      .sortBy(e => (-e.value, e.eventId)).take(k)
    state.update(TwsState(top, n))
    val vs = top.map(_.value)
    Iterator.single(TwsEmit(key, n, vs.lift(0), vs.lift(1), vs.lift(2)))
  }
}

/** VERSION 2 of the top-k state — [[TwsState]] plus one ADDED field
  * (`maxSeen`, an `Option` so Avro encodes it nullable with a null
  * default). Under `spark.sql.streaming.stateStore.encodingFormat=avro`
  * a checkpoint written by [[TwsTopKProcessor]] restarts directly into
  * [[TwsTopKProcessorV2]]: V1 rows decode with `maxSeen = None` and the
  * new stat starts accruing at the migration batch — the supported
  * state-schema-evolution path in Spark 4 (the default unsaferow
  * encoding rejects any value-schema change). `StateEvolutionSpec`
  * gates the restart: carried items/counter prove the old fields
  * survived, and `max_seen` spanning only post-migration values proves
  * the default fill (a recompute-from-scratch would cover both phases).
  */
case class TwsStateV2(items: List[TwsScored], nSeen: Long, maxSeen: Option[Double])
case class TwsEmitV2(user_id: Long, n_seen: Long, max_seen: Option[Double],
    v1: Option[Double], v2: Option[Double], v3: Option[Double])

class TwsTopKProcessorV2(k: Int) extends StatefulProcessor[Long, TwsIn, TwsEmitV2] {

  @transient private var state: ValueState[TwsStateV2] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TwsStateV2](
      "topk", Encoders.product[TwsStateV2], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TwsIn],
      timerValues: TimerValues): Iterator[TwsEmitV2] = {
    val prev = Option(state.get()).getOrElse(TwsStateV2(Nil, 0L, None))
    var n = prev.nSeen
    val incoming = rows.map { r => n += 1; TwsScored(r.value, r.event_id) }.toList
    val top = (prev.items ++ incoming)
      .sortBy(e => (-e.value, e.eventId)).take(k)
    val maxSeen = (prev.maxSeen.toList ++ incoming.map(_.value))
      .reduceOption((a: Double, b: Double) => math.max(a, b))
    state.update(TwsStateV2(top, n, maxSeen))
    val vs = top.map(_.value)
    Iterator.single(TwsEmitV2(key, n, maxSeen, vs.lift(0), vs.lift(1), vs.lift(2)))
  }
}
