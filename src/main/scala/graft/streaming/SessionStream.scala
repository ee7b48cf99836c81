package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Timer-based gap-session close over `transformWithState` — the
  * live-ingest twin of the built-in `session_window` aggregate (q107)
  * and the third face of the same gap rule as the batch analytic
  * windows ([[graft.operators.Sessionize]]). Where [[KmvStream]]
  * exercised typed VALUE state, this exercises LIST state plus the
  * TIMER API: a session has no natural "close" row, so silence is
  * detected by an event-time timer armed at the earliest open
  * session's `last event + gap`.
  *
  * Closure proof — the WATERMARK, nothing else. A successor event at
  * `>= last + gap` does NOT prove the earlier session closed when the
  * feed is out-of-order: a straggler (any event the watermark still
  * admits) can land BETWEEN them and bridge both into one session.
  * The only sound rule is that a session is final once the watermark
  * passes its close time — no admissible future event can extend it,
  * because extension needs an event before `last + gap` and the
  * watermark bounds arrivals from below. (With a 0-second watermark
  * delay this degrades gracefully to "a successor closes the session
  * at the next batch boundary", since the successor itself drags the
  * watermark past the close time.)
  *
  * Mechanics per user key:
  *  - `handleInputRows` merges the batch's events into the key's OPEN
  *    session list (classic interval merge under the gap rule — a
  *    straggler may extend a session, start one of its own, or bridge
  *    two existing ones, and each event lands in the session the
  *    batch oracle would give it), emits any session the current
  *    watermark already proves closed, and arms one timer at the
  *    earliest remaining close time.
  *  - `handleExpiredTimer` fires as the watermark passes that close
  *    time: emit-and-evict every session now provably closed, re-arm
  *    for the earliest survivor. Both paths keep exactly one timer
  *    per key (superseded expiries are deleted via `listTimers`), and
  *    a defensive no-op guard covers a timer racing an eviction.
  *
  * State per user is the OPEN session list — in an in-order feed
  * exactly one entry; out-of-order feeds briefly hold the few
  * sessions the watermark window can still touch — plus one armed
  * timer. Bounded by active users, not events, and evicted on close:
  * the 100 TB shape. Emission is append-only and FINAL, so the drain
  * needs no dedup-on-read, unlike the KMV re-emission contract.
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
  /** State: one OPEN session (epoch-MICROS bounds + count). */
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
    @transient private var open: ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def closed(key: Long, s: OpenSession): ClosedSession =
      ClosedSession(key, toInstant(s.startUs), toInstant(s.lastUs + gapUs), s.n)

    /** Timers are millis; round the micros close time UP so a timer
      * can never fire before its session's true close.
      */
    private def closeTimeMs(s: OpenSession): Long =
      Math.floorDiv(s.lastUs + gapUs + 999L, 1000L)

    /** Interval-merge `sessions` (sorted by startUs) under the gap
      * rule: a successor merges iff it starts strictly inside
      * [start, last + gap) — `session_window`'s >=-gap-breaks rule.
      */
    private def mergeAll(sessions: Seq[OpenSession]): Seq[OpenSession] =
      sessions.foldLeft(List.empty[OpenSession]) {
        case (Nil, s) => s :: Nil
        case (cur :: done, s) if s.startUs < cur.lastUs + gapUs =>
          OpenSession(cur.startUs, math.max(cur.lastUs, s.lastUs), cur.n + s.n) :: done
        case (acc, s) => s :: acc
      }.reverse

    /** Emit every session the watermark proves closed, keep the rest
      * in state, and leave EXACTLY ONE timer armed — at the earliest
      * surviving close time (none when the key fully evicts).
      */
    private def emitProvable(key: Long, sessions: Seq[OpenSession],
                             watermarkMs: Long,
                             firedMs: Long = Long.MinValue): Iterator[ClosedSession] = {
      val (done, still) = sessions.partition(s => closeTimeMs(s) <= watermarkMs)
      open.clear()
      // the just-fired timer (firedMs) is removed by the framework;
      // listTimers still reports it during the callback, so skip it
      val armed = getHandle.listTimers().toSet - firedMs
      if (still.nonEmpty) {
        open.put(still.toArray)
        val next = still.map(closeTimeMs).min
        armed.filterNot(_ == next).foreach(getHandle.deleteTimer)
        if (!armed.contains(next)) getHandle.registerTimer(next)
      } else armed.foreach(getHandle.deleteTimer)
      done.iterator.map(closed(key, _))
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[ClosedSession] = {
      val evs = rows.map(e => toUs(e.ts)).toArray.sorted
      if (evs.isEmpty) return Iterator.empty
      val existing = if (open.exists()) open.get().toSeq else Seq.empty
      val merged = mergeAll(
        (existing ++ evs.map(t => OpenSession(t, t, 1L)))
          .sortBy(s => (s.startUs, s.lastUs)))
      emitProvable(key, merged, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (!open.exists()) Iterator.empty // stale timer: key already evicted
      else emitProvable(key, open.get().toSeq,
        math.max(timerValues.getCurrentWatermarkInMs(), expiredTimerInfo.getExpiryTimeInMs),
        firedMs = expiredTimerInfo.getExpiryTimeInMs)
  }

  /** The closed-session stream over a watermarked source carrying
    * (user_id, ts). Event-time mode: timers fire as the watermark
    * passes close times; `watermarkDelay` is the out-of-orderness the
    * feed tolerates (stragglers older than that are dropped by Spark
    * before the processor, the standard watermark contract — and
    * emissions lag the feed by the same delay, the price of admitting
    * them). Requires the RocksDB state store provider (the
    * transformWithState contract).
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
    * `max(ts) + gap` (+ the watermark delay, if any) and filters it
    * back out (see q146).
    */
  def drainClosed(spark: SparkSession, src: DataFrame, gapMinutes: Int,
                  watermarkDelay: String = "0 seconds"): DataFrame =
    EventStream.withStateStore(spark, EventStream.RocksDbProvider) {
      EventStream.runAppendToMemory(spark,
        closedSessions(src, gapMinutes, watermarkDelay).toDF())
    }

  /** Reserved user_id of the sentinel row [[stageWithSentinel]]
    * appends; callers filter it back out of the drained sessions.
    */
  val SentinelUser: Long = -1L

  /** Stage `ev` (user_id, ts) as a parquet feed plus ONE sentinel
    * event that PROVABLY closes every session: it sits at
    * `max(ts) + gap + delay + 1 min`, so the AvailableNow drain's
    * closing batch drags the watermark past every open session's
    * close time and fires every remaining timer — the invariant that
    * makes a drain of the staged feed equal batch sessionization.
    * Keeping the arithmetic here (rather than hand-rolled at each
    * call site) ties the sentinel offset to the SAME gap/delay the
    * drain uses — a gap change cannot silently stop flushing tail
    * sessions. The max(ts) probe is a bounded driver read (one row).
    */
  def stageWithSentinel(ev: DataFrame, dir: String, gapMinutes: Int,
                        watermarkDelayMinutes: Int = 0): Unit = {
    val spark = ev.sparkSession
    import spark.implicits._
    val maxTs = ev.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("ts"))).head().getTimestamp(0)
    // an empty feed has no max(ts) to anchor the sentinel on — and
    // nothing to flush either; fail with the cause named rather than
    // NPE-ing on the null timestamp below
    require(maxTs != null,
      "stageWithSentinel: input feed is empty (or all-null ts) — nothing to stage")
    val sentinel = Seq((SentinelUser, new java.sql.Timestamp(
      maxTs.getTime + (gapMinutes + watermarkDelayMinutes + 1).toLong * 60 * 1000)))
      .toDF("user_id", "ts")
    ev.unionByName(sentinel).write.parquet(dir)
  }
}
