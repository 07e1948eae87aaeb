package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // user 1: events at 0, 10, 50 min (gap 30 → sessions {0,10} and {50});
  // user 2: one event; same timestamp as user 1's first (isolation check)
  private def mins(m: Long) = timestamp_micros(lit(m * 60 * 1000000))
  private val events = Seq(
    (1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 50L), (4L, 2L, 0L)
  ).toDF("event_id", "user_id", "m")
    .withColumn("ts", timestamp_micros(col("m") * 60 * 1000000)).drop("m")

  test("gap splits sessions per user; session ids deterministic") {
    val got = Sessionize.sessionize(events, "user_id", "ts", "event_id")
      .select("event_id", "session_id").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "1_1", 2L -> "1_1", 3L -> "1_2", 4L -> "2_1"))
  }

  test("sessionStats: counts, bounds, duration") {
    val got = Sessionize.sessionStats(events, "user_id", "ts", "event_id")
      .select("user_id", "session_seq", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 2L, 10L * 60 * 1000000), // 0..10 min
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("boundary: gap exactly equal to threshold stays in the session") {
    val e = Seq((1L, 1L, 0L), (2L, 1L, 30L)).toDF("event_id", "user_id", "m")
      .withColumn("ts", timestamp_micros(col("m") * 60 * 1000000)).drop("m")
    val seqs = Sessionize.sessionize(e, "user_id", "ts", "event_id")
      .select("session_seq").as[Long].collect().toSet
    assert(seqs === Set(1L)) // strict > gap starts a new session
  }

  test("capUserEvents: bot key bounded, normal users untouched, no straggler partition") {
    // one bot with 10⁵ events + 20 normal users with 10 each: the skew
    // hazard the scaladoc documents. After the cap, the max per-user
    // partition load is maxPerUser, not the bot's 10⁵.
    val bot = spark.range(100000).selectExpr(
      "id AS event_id", "'bot' AS user_id",
      "timestamp_micros(id * 1000000) AS ts")
    val normal = spark.range(200).selectExpr(
      "id + 1000000 AS event_id", "concat('u', id % 20) AS user_id",
      "timestamp_micros((id div 20) * 1000000) AS ts")
    val events = bot.unionByName(normal)
    val capped = Sessionize.capUserEvents(events, "user_id", "ts", "event_id", 500)
    assert(capped.count() === 500L + 200L)
    // partition row counts after the per-user shuffle: bounded by the cap
    def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Int =
      df.repartition(8, col("user_id")).rdd
        .mapPartitions(it => Iterator(it.size)).collect().max
    assert(maxPartitionRows(events) >= 100000)
    assert(maxPartitionRows(capped) <= 600)
    // capped = prefix in (ts, id) order → normal users' sessions unchanged
    val withBot = Sessionize.sessionize(capped, "user_id", "ts", "event_id")
      .filter(col("user_id") =!= "bot")
      .select("event_id", "session_id").as[(Long, String)].collect().toMap
    val without = Sessionize.sessionize(normal, "user_id", "ts", "event_id")
      .select("event_id", "session_id").as[(Long, String)].collect().toMap
    assert(withBot === without)
  }
}
