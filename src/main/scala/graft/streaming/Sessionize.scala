package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: events of one user
  * separated by more than `gapMicros` start a new session — the
  * canonical lag + conditional-cumulative-sum window composition.
  * Session ids are deterministic ((user, ts, event_id) ordering with
  * the unique event id as tiebreak), so the whole operator is
  * oracle-able despite being window-heavy.
  *
  * Scale: both windows partition by the user key — one hash shuffle of
  * the events, then per-user sorted scans; no global sort, no
  * self-join (the naive "join each event to its predecessor"
  * formulation shuffles twice and breaks on duplicate timestamps).
  * Skewed users (bots) are the known hazard: cap or salt upstream if a
  * single user's events exceed a partition.
  */
object Sessionize {

  /** Bot mitigation for the skew hazard above: cap each user at the
    * FIRST `maxPerUser` events in (ts, id) order — the same order key
    * [[sessionize]] uses, so capped users keep a prefix of their real
    * session stream and normal users are untouched. The cap itself
    * still sorts the hot user's rows in one partition (unavoidable
    * without changing per-user semantics — it's one window, no extra
    * shuffle), but every downstream stage (session tagging, rollups,
    * joins against sessions) then runs on ≤ maxPerUser rows per user
    * instead of a bot's millions dominating a straggler partition.
    */
  def capUserEvents(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, maxPerUser: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(idCol).asc)
    events.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxPerUser)
      .drop("_rn")
  }

  /** Per-event session tagging: adds `session_seq` (1-based per user)
    * and `session_id` ("<user>_<seq>").
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(idCol).asc)
    val tus: Column = unix_micros(col(tsCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    events
      .withColumn("_new",
        when(prev.isNull || tus - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("session_id",
        concat_ws("_", col(userCol), col("session_seq")))
      .drop("_new")
  }

  /** Per-session rollup: event count, start/end (epoch micros), and
    * duration — the compact face used for corpus/session statistics.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, gapMicros: Long = 30L * 60 * 1000000): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapMicros)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
