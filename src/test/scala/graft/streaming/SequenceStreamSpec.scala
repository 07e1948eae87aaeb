package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SequenceStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val steps = Seq("a", "b", "c")
  private val neg = Map(1 -> Seq("x"))

  test("streaming: a chain completing across micro-batches emits exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val ev = input.toDF().toDF("user_id", "step", "ts")
    val q = SequenceStream.detect(ev, "user_id", "ts", "step",
        steps, windowSeconds = 4 * 3600L, negations = neg)
      .writeStream.format("memory").queryName("seq_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 reaches a→b; user 2 gets a then a banned x
      input.addData(
        (1L, "a", ts("2024-01-01 10:00:00")),
        (1L, "b", ts("2024-01-01 10:30:00")),
        (2L, "a", ts("2024-01-01 10:00:00")),
        (2L, "x", ts("2024-01-01 10:15:00")))
      q.processAllAvailable()
      assert(spark.table("seq_out").count() === 0) // nothing complete yet

      // batch 2: user 1 completes; user 2's b/c arrive but the chain is
      // broken — no emission ever
      input.addData(
        (1L, "c", ts("2024-01-01 11:00:00")),
        (2L, "b", ts("2024-01-01 10:30:00")),
        (2L, "c", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val got = spark.table("seq_out")
        .select(col("entity").cast("long"), col("ts_us"))
        .as[(Long, Seq[Long])]
        .collect().toMap
      assert(got.keySet === Set(1L))
      assert(got(1L).length === 3 && got(1L) === got(1L).sorted)

      // batch 3: a second full chain for user 1 must NOT re-emit
      input.addData(
        (1L, "a", ts("2024-01-01 12:00:00")),
        (1L, "b", ts("2024-01-01 12:10:00")),
        (1L, "c", ts("2024-01-01 12:20:00")))
      q.processAllAvailable()
      assert(spark.table("seq_out").count() === 1)
    } finally q.stop()
  }

  test("string entity ids are supported (no numeric-cast assumption)") {
    val df = Seq(
      ("u1", "a", ts("2024-01-01 10:00:00")),
      ("u1", "b", ts("2024-01-01 10:10:00")),
      ("u1", "c", ts("2024-01-01 10:20:00"))).toDF("user_id", "step", "ts")
    val out = SequenceStream.detect(df, "user_id", "ts", "step",
      steps, windowSeconds = 3600L, negations = neg).collect()
    assert(out.map(_.entity).toSeq === Seq("u1"))
  }

  test("matchExistential finds the clean later chain the greedy faces break on") {
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // the documented divergence case: greedy picks b@1 and x@3 breaks it;
    // existential matches via (b@5, c@10)
    val ev = Seq(
      (1L, "a", t(0)), (1L, "b", t(1)), (1L, "x", t(3)),
      (1L, "b", t(5)), (1L, "c", t(10)),
      // user 2: x after EVERY b before the c → genuinely unmatched
      (2L, "a", t(0)), (2L, "b", t(1)), (2L, "b", t(5)),
      (2L, "x", t(7)), (2L, "c", t(10)))
      .toDF("user_id", "step", "ts")
    val out = SequenceStream.matchExistential(ev, "user_id", "ts", "step",
        Seq("a", "b", "c"), windowSeconds = 100L,
        negations = Map(2 -> Seq("x")))
      .collect().map(m => m.entity.toLong -> (m.matched, m.matched_at_us)).toMap
    assert(out === Map(
      1L -> ((true, Some(1700000010000000L))),
      2L -> ((false, None))))
  }

  test("matchExistential completes sequences with a REPEATED step type (a, b, a)") {
    // regression: indexOf pinned the second 'a' to position 1, so the
    // pattern could never complete
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (1L, "a", t(0)), (1L, "b", t(1)), (1L, "a", t(2)),   // completes
      (2L, "a", t(0)), (2L, "b", t(1)))                    // missing final a
      .toDF("user_id", "step", "ts")
    val out = SequenceStream.matchExistential(ev, "user_id", "ts", "step",
        Seq("a", "b", "a"), windowSeconds = 100L)
      .collect().map(m => m.entity.toLong -> m.matched).toMap
    assert(out === Map(1L -> true, 2L -> false))
  }

  test("matchExistential equals a brute-force chain enumeration on random data") {
    val rnd = new scala.util.Random(13)
    val evs = (1 to 300).map { i =>
      (rnd.nextInt(10).toLong,
        Seq("a", "b", "c", "x")(rnd.nextInt(4)),
        1700000000000000L + rnd.nextInt(400) * 1000000L)
    }
    val df = evs.toDF("user_id", "step", "ts_us")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us"))).drop("ts_us")
    val w = 200L * 1000000L
    val got = SequenceStream.matchExistential(df, "user_id", "ts", "step",
        Seq("a", "b", "c"), windowSeconds = 200L,
        negations = Map(1 -> Seq("x"), 2 -> Seq("x")))
      .collect().map(m => m.entity.toLong -> ((m.t1_us, m.matched, m.matched_at_us)))
      .toMap
    val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
      rows.filter(_._2 == "a").map(_._3).minOption.map { t1 =>
        val chains = for {
          b <- rows.filter(r => r._2 == "b" && r._3 > t1 && r._3 <= t1 + w)
          if !rows.exists(r => r._2 == "x" && r._3 > t1 && r._3 < b._3)
          c <- rows.filter(r => r._2 == "c" && r._3 > b._3 && r._3 <= t1 + w)
          if !rows.exists(r => r._2 == "x" && r._3 > b._3 && r._3 < c._3)
        } yield c._3
        u -> ((t1, chains.nonEmpty, chains.minOption))
      }
    }
    assert(got === expected, s"events=$evs")
  }

  test("batch face equals sequenceMatch(...).filter(matched)") {
    val rnd = new scala.util.Random(7)
    val evs = (1 to 300).map { i =>
      (rnd.nextInt(12).toLong,
        Seq("a", "b", "c", "x")(rnd.nextInt(4)),
        new Timestamp(1700000000000L + rnd.nextInt(500) * 1000L))
    }
    val df = evs.toDF("user_id", "step", "ts")
    val stream = SequenceStream.detect(df, "user_id", "ts", "step",
        steps, windowSeconds = 200L, negations = neg)
      .collect().map(m => m.entity.toLong -> m.ts_us.toSeq).toMap
    val batch = graft.core.Temporal.sequenceMatch(df, "user_id", "ts", "step",
        steps, windowSeconds = 200L, negations = neg)
      .filter(col("matched"))
      .collect().map { r =>
        r.getLong(0) -> (1 to 3).map(i =>
          r.getTimestamp(i).getTime * 1000L).toSeq
      }.toMap
    assert(stream === batch, s"events=$evs")
  }
}
