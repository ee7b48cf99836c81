package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Timer-based gap-session close over `transformWithState` — the
  * live-ingest twin of the built-in `session_window` aggregate (q107)
  * and the third face of the same gap rule as the batch analytic
  * windows ([[graft.operators.Sessionize]]). Where [[KmvStream]]
  * exercised typed VALUE state, this exercises the TIMER API: a
  * session has no natural "close" row, so silence is detected by an
  * event-time timer armed at `last event + gap` and re-armed as the
  * session extends.
  *
  * Mechanics per user key:
  *  - `handleInputRows` folds the batch's events (sorted in-batch; a
  *    cross-batch straggler within the watermark merges by min/max)
  *    into the open session. An event at `>= last + gap` proves the
  *    previous session closed — it is emitted immediately (data
  *    supersedes timers) and the new session opens.
  *  - the single armed timer fires when the WATERMARK passes the open
  *    session's close time — the no-successor case (user went quiet /
  *    feed ended). Stale timers (superseded by a longer session or a
  *    data-driven close) no-op by checking the expiry against the
  *    current close time, so no `deleteTimer` bookkeeping is needed.
  *
  * State per user is ONE (start, last, n) triple plus one timer —
  * bounded by active users, not events, and evicted on close: the
  * 100 TB shape. Emission is append-only and FINAL (a session is only
  * emitted once its close is proven by data or watermark), so the
  * drain needs no dedup-on-read, unlike the KMV re-emission contract.
  *
  * Exactness vs the batch oracle: with a static feed plus one
  * max-timestamp sentinel row to push the final watermark past every
  * close time (the AvailableNow drain's no-data batch then fires all
  * remaining timers), the emitted set equals batch gap-sessionization
  * row-for-row — q146 shares q107's oracle.
  */
object SessionStream {

  /** Input: one event. `Instant` keeps the micros the fixture stores
    * (`java.sql.Timestamp.getTime` would truncate to millis and drift
    * session bounds off the batch oracle).
    */
  final case class UserEvent(user_id: Long, ts: java.time.Instant)
  /** State: the user's open session (epoch-MICROS bounds + count). */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  /** Emission: a CLOSED session; end = last event + gap, matching
    * `session_window`'s half-open [start, last+gap) convention.
    */
  final case class ClosedSession(
      user_id: Long, session_start: java.time.Instant,
      session_end: java.time.Instant, n_events: Long)

  implicit val userEventEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
  implicit val closedEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  private def toUs(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def toInstant(us: Long): java.time.Instant = {
    val s = Math.floorDiv(us, 1000000L)
    java.time.Instant.ofEpochSecond(s, (us - s * 1000000L) * 1000L)
  }

  final class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, UserEvent, ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def closed(key: Long, s: OpenSession): ClosedSession =
      ClosedSession(key, toInstant(s.startUs), toInstant(s.lastUs + gapUs), s.n)

    /** Timers are millis; round the micros close time UP so a timer
      * can never fire before its session's true close.
      */
    private def closeTimeMs(s: OpenSession): Long =
      Math.floorDiv(s.lastUs + gapUs + 999L, 1000L)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.map(e => toUs(e.ts)).toArray.sorted
      if (sorted.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var cur = if (open.exists()) open.get() else null
      sorted.foreach { t =>
        if (cur == null) cur = OpenSession(t, t, 1L)
        else if (t < cur.lastUs + gapUs)
          // extends (or, for a within-watermark straggler, back-fills)
          cur = OpenSession(math.min(cur.startUs, t), math.max(cur.lastUs, t), cur.n + 1L)
        else {
          out += closed(key, cur) // data proves the gap passed
          cur = OpenSession(t, t, 1L)
        }
      }
      open.update(cur)
      // one armed timer per key: the open session's close time. Earlier
      // registrations are left to fire as stale no-ops (expiry check
      // below) rather than tracked and deleted.
      getHandle.registerTimer(closeTimeMs(cur))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (open.exists() && expiredTimerInfo.getExpiryTimeInMs >= closeTimeMs(open.get())) {
        val s = open.get()
        open.clear()
        Iterator.single(closed(key, s))
      } else Iterator.empty // stale timer: session extended or already closed
  }

  /** The closed-session stream over a watermarked source carrying
    * (user_id, ts). Event-time mode: timers fire as the watermark
    * passes close times. Requires the RocksDB state store provider
    * (the transformWithState contract).
    */
  def closedSessions(src: DataFrame, gapMinutes: Int,
                     watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    require(gapMinutes >= 1, s"gapMinutes must be >= 1 (got $gapMinutes)")
    src
      .select(col("user_id"), col("ts"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60L * 1000000L), TimeMode.EventTime(), OutputMode.Append())
  }

  /** Drain all currently-available input and return every session the
    * watermark could prove closed. AvailableNow's closing no-data
    * batch fires the remaining timers once the final watermark passes
    * their close times — a feed whose tail sessions must ALL close
    * (e.g. to match a batch oracle) appends one sentinel event past
    * `max(ts) + gap` and filters it back out (see q146).
    */
  def drainClosed(spark: SparkSession, src: DataFrame, gapMinutes: Int): DataFrame =
    EventStream.withStateStore(spark, EventStream.RocksDbProvider) {
      EventStream.runAppendToMemory(spark, closedSessions(src, gapMinutes).toDF())
    }
}
