package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConversationsSpec extends SparkSpec {
  import spark.implicits._

  // user 1: turns at 0s/10s/20s (one conversation), then 31min later
  // two more turns (second conversation); user 2: one turn
  private def ev = Seq(
    (1L, 0L, 101L, "ask", 100L),
    (1L, 10L * 1000000, 102L, "answer", 250L),
    (1L, 20L * 1000000, 103L, "answer", 300L), // repeat violation
    (1L, (31L * 60 + 20) * 1000000, 104L, "ask", 400L),
    (1L, (31L * 60 + 30) * 1000000, 105L, "answer", 200L),
    (2L, 0L, 201L, "ask", 50L)
  ).toDF("user_id", "tus", "event_id", "event_type", "len")
    .withColumn("ts", timestamp_micros(col("tus")))

  test("turns: conversation boundaries, 1-based turn index, alternating roles") {
    val t = Conversations.turns(ev, "user_id", "ts", "event_id")
      .orderBy("user_id", "session_seq", "turn_idx")
      .select("user_id", "session_seq", "turn_idx", "role", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))
    assert(t.toSeq === Seq(
      (1L, 1L, 1, "user", 101L), (1L, 1L, 2, "assistant", 102L),
      (1L, 1L, 3, "user", 103L),
      (1L, 2L, 1, "user", 104L), (1L, 2L, 2, "assistant", 105L),
      (2L, 1L, 1, "user", 201L)))
  }

  test("assemble: rollup counts, bounds, and the repeat-violation gate") {
    val a = Conversations.assemble(ev, "user_id", "ts", "event_id",
        "event_type", "len")
      .orderBy("user_id", "conv_seq").collect()
    val c1 = a(0) // user 1 conv 1: 3 turns, answer→answer violation
    assert(c1.getAs[Long]("n_turns") === 3L)
    assert(c1.getAs[Long]("n_user_turns") === 2L) // turns 1 and 3
    assert(c1.getAs[Long]("n_types") === 2L)
    assert(c1.getAs[Long]("total_len") === 650L)
    assert(c1.getAs[Long]("start_us") === 0L)
    assert(c1.getAs[Long]("end_us") === 20L * 1000000)
    assert(c1.getAs[Long]("repeat_violations") === 1L)
    val c2 = a(1)
    assert(c2.getAs[Long]("n_turns") === 2L &&
      c2.getAs[Long]("repeat_violations") === 0L)
    assert(a.length === 3)
  }

  test("contextPack: recent-turn suffix under budget; over-budget turn drops") {
    // user 1 conv 1 lens (old→new) 100,250,300; budget 560 keeps the
    // suffix {300,250} (550 ≤ 560), drops the oldest
    val p = Conversations.contextPack(ev, "user_id", "ts", "event_id",
        "len", budget = 560L)
      .orderBy("user_id", "conv_seq").collect()
    val c1 = p(0)
    assert(c1.getAs[Long]("kept_turns") === 2L)
    assert(c1.getAs[Long]("kept_len") === 550L)
    assert(c1.getAs[Long]("dropped_turns") === 1L)
    // a budget below the newest turn keeps NOTHING (suffix rule, not
    // best-fit): conv 2's newest turn is 200
    val tight = Conversations.contextPack(
        ev.filter(col("event_id").isin(104L, 105L)),
        "user_id", "ts", "event_id", "len", budget = 150L)
      .collect().head
    assert(tight.getAs[Long]("kept_turns") === 0L &&
      tight.getAs[Long]("dropped_turns") === 2L)
  }

  test("sftMaskLayout: contiguous offsets, trainable only on listed types") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      (1L, 1L, "view", ts(0), 10L),
      (1L, 2L, "purchase", ts(1), 4L),
      (1L, 3L, "view", ts(2), 6L),
      (1L, 4L, "view", ts(90), 3L) // new session after the 30-min gap
    ).toDF("user_id", "event_id", "event_type", "ts", "len")
    val rows = Conversations.sftMaskLayout(ev, "user_id", "ts", "event_id",
        "event_type", "len", Seq("purchase"))
      .orderBy("conv_seq", "turn_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getString(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(rows((1L, 1L)) === (("view", 0L, 10L, false)))
    assert(rows((1L, 2L)) === (("purchase", 10L, 4L, true)))
    assert(rows((1L, 3L)) === (("view", 14L, 6L, false)))
    assert(rows((2L, 1L)) === (("view", 0L, 3L, false))) // offsets rebase
    // a NULL length raises instead of silently collapsing offsets
    val exN = intercept[Exception] {
      Conversations.sftMaskLayout(
        Seq((1L, 1L, "view", ts(0), Option.empty[Long]))
          .toDF("user_id", "event_id", "event_type", "ts", "len"),
        "user_id", "ts", "event_id", "event_type", "len",
        Seq("purchase")).collect()
    }
    assert(exN.getMessage.contains("NULL length"))
  }
}
