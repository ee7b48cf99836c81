package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The same per-user profile as [[UserState]], on Spark 4's
  * `transformWithState` — the arbitrary-state API that supersedes
  * `flatMapGroupsWithState`: typed state handles (ValueState /
  * ListState / MapState) instead of one opaque blob, per-state TTL,
  * and timers, all backed by the RocksDB state store (set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `...state.RocksDBStateStoreProvider` — required by this API, and
  * the right provider at 100 TB anyway: state spills to disk instead
  * of living in executor heap). Keeping both forms documents the
  * migration path; results are identical (UserStateSpec asserts it).
  */
object UserStateV2 {
  import UserState.{UserEvent, UserProfile}

  final class ProfileProcessor extends StatefulProcessor[Long, UserEvent, UserProfile] {
    @transient private var profile: ValueState[UserProfile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // per-state TTL, the v1 ProcessingTimeTimeout's successor: a
      // profile idle for 7 days is evicted by the store itself, so the
      // map is bounded by active users, not all-time history (same
      // contract as UserState.profiles; TTLConfig.NONE would leak)
      profile = getHandle.getValueState[UserProfile](
        "profile", Encoders.product[UserProfile],
        TTLConfig(java.time.Duration.ofDays(7)))

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[UserProfile] = {
      val evs = rows.toSeq
      if (evs.isEmpty) return Iterator.empty
      val prev =
        if (profile.exists()) profile.get()
        else UserProfile(key, 0L, Long.MaxValue, Long.MinValue, 0.0)
      val next = UserProfile(
        user_id = key,
        n_events = prev.n_events + evs.length,
        first_seen_micros = math.min(prev.first_seen_micros, evs.map(_.ts_micros).min),
        last_seen_micros = math.max(prev.last_seen_micros, evs.map(_.ts_micros).max),
        total_value = prev.total_value + evs.map(_.value).sum)
      profile.update(next)
      Iterator.single(next)
    }
  }

  /** Streaming profiles: one updated row per (user, microbatch). */
  def profiles(events: Dataset[UserEvent]): Dataset[UserProfile] = {
    import UserState.profileEnc
    events
      .groupByKey(_.user_id)(UserState.longEnc)
      // ProcessingTime mode: required for the state TTL above
      .transformWithState(new ProfileProcessor, TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
