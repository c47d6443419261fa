package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Input/state/output rows for [[TwsSessionizer]]. `n == 0` in the state
  * means NO open session — the record then only carries `nextSid`, the
  * per-user session ordinal that must survive session closes (the
  * ordinal contract the flatMapGroupsWithState sessionizer also keeps).
  */
case class SessIn(user_id: Long, ts: java.sql.Timestamp)
case class SessSt(nextSid: Long, startUs: Long, endUs: Long, n: Long, timerMs: Long)
case class SessEmit(user_id: Long, session_id: Long, n_events: Long,
    session_start_us: Long, session_end_us: Long)

/** Gap sessionization on `transformWithState` EVENT-TIME TIMERS — the
  * TWS API leg the matrix still lacked (value state, Avro state
  * evolution, and offline state read are gated; timer-driven expiry was
  * not). The flatMapGroupsWithState sessionizer expresses idle close as
  * `GroupStateTimeout.EventTimeTimeout` + per-batch `hasTimedOut`; the
  * TWS shape is finer: the processor REGISTERS one event-time timer per
  * open session at `end + gap`, RE-REGISTERS (delete + register) as
  * events extend the session, and closes the session in
  * `handleExpiredTimer` when the watermark crosses the expiry — so a
  * session flushes in the exact micro-batch its gap elapses, not merely
  * "some batch after timeout".
  *
  * Exactly-one emission per session: an in-batch close (a later event
  * beyond the gap) emits immediately and DELETES the obsolete timer;
  * `handleExpiredTimer` additionally checks the firing expiry equals
  * the state's registered timer, so a stale timer that raced a re-open
  * can never double-emit or close the wrong session.
  *
  * State is one small record per user (ordinal + open-session bounds) —
  * the same O(keys) bound as the fMGWS sessionizer; timers add one
  * (key, ts) entry per OPEN session, watermark-bounded.
  */
class TwsSessionizer(gapMinutes: Int) extends StatefulProcessor[Long, SessIn, SessEmit] {

  private val gapUs = gapMinutes * 60L * 1000000L

  @transient private var st: ValueState[SessSt] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SessSt](
      "open", Encoders.product[SessSt], TTLConfig.NONE)

  private def usOf(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000

  private def emitOf(key: Long, s: SessSt): SessEmit =
    SessEmit(key, s.nextSid, s.n, s.startUs, s.endUs)

  override def handleInputRows(key: Long, rows: Iterator[SessIn],
      timerValues: TimerValues): Iterator[SessEmit] = {
    // per-(key, batch) rows are unordered; the staged feed guarantees
    // cross-batch event-time order, in-batch order is restored here
    val sorted = rows.toArray.sortBy(r => usOf(r.ts))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessEmit]
    var cur = Option(st.get()).getOrElse(SessSt(1L, 0L, 0L, 0L, 0L))
    sorted.foreach { r =>
      val t = usOf(r.ts)
      if (cur.n == 0L)
        cur = cur.copy(startUs = t, endUs = t, n = 1L)
      else if (t - cur.endUs > gapUs) {
        out += emitOf(key, cur)
        cur = SessSt(cur.nextSid + 1, t, t, 1L, cur.timerMs)
      } else
        cur = cur.copy(endUs = math.max(cur.endUs, t), n = cur.n + 1)
    }
    if (cur.n > 0L) {
      val expiry = (cur.endUs + gapUs) / 1000L
      if (cur.timerMs != 0L && cur.timerMs != expiry)
        getHandle.deleteTimer(cur.timerMs)
      if (cur.timerMs != expiry) getHandle.registerTimer(expiry)
      cur = cur.copy(timerMs = expiry)
    } else if (cur.timerMs != 0L) {
      getHandle.deleteTimer(cur.timerMs)
      cur = cur.copy(timerMs = 0L)
    }
    st.update(cur)
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessEmit] = {
    val cur = st.get()
    if (cur != null && cur.n > 0L &&
        cur.timerMs == expiredTimerInfo.getExpiryTimeInMs) {
      st.update(SessSt(cur.nextSid + 1, 0L, 0L, 0L, 0L))
      Iterator.single(emitOf(key, cur))
    } else Iterator.empty
  }
}
