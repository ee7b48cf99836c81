package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-feed extension of
  * the reference's play-history model (a "listening session" = plays
  * separated by less than `gap`).
  *
  * Batch form uses analytic windows: a session starts where the gap
  * from the previous event of the same user exceeds the threshold
  * (`lag`), and session ids are a running sum of start markers — both
  * partitioned by user, so the sort is per-user-partition, never
  * global. The streaming form is the built-in `session_window`
  * (EventStream.sessionAgg); both implement the same gap rule.
  */
object Sessionize {

  /** Per-event session ids. Output: input columns + session_id
    * (1-based per user). Deterministic: event ordering tie-breaks on
    * event_id.
    */
  def assignSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val newSession =
      when(lag(col("ts"), 1).over(byUser).isNull, 1L)
        .otherwise(when(
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
            > gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
    events
      .withColumn("_new", newSession)
      .withColumn("session_id",
        sum(col("_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** Per-user session stats. Output:
    * (user_id, n_sessions, longest_session_events) ordered by user_id.
    */
  def userSessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    assignSessions(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("longest_session_events"))
      .orderBy(col("user_id"))

  /** Sequence-example construction — the training-set builder for
    * next-event prediction (the recsys / behavioral-LM analogue of
    * TextPrep's chunk+pack): each event becomes one example whose
    * features are the user's previous `k` event types (oldest first,
    * "-" where history runs out) and whose label is the current type.
    * Everything is per-user analytic windows ordered by (ts, event_id)
    * — deterministic under ties, no self-join, no collect.
    *
    * Scale shape: k `lag` columns ride ONE user-partitioned sort (all
    * window specs share the partitioning and ordering, so Catalyst
    * evaluates them in a single Window operator over a single
    * exchange); cost is one shuffle of the events keyed by user.
    * Output: (user_id, event_id, context, label) ordered by
    * (user_id, event_id) — context is the "-"-padded
    * comma-join so the row hashes identically in any engine.
    */
  def nextEventExamples(events: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ctx = concat_ws(",",
      (k to 1 by -1).map(i =>
        coalesce(lag(col("event_type"), i).over(byUser), lit("-"))): _*)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("context", ctx)
      .select(col("user_id"), col("event_id"), col("context"),
        col("event_type").as("label"))
      .orderBy(col("user_id"), col("event_id"))
  }
}
