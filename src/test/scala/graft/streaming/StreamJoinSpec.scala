package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming: pairs emit when both sides arrive, even across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.intervalJoinStream(
      purchases.toDF().toDF("purchase_id", "user_id", "pts"),
      views.toDF().toDF("view_id", "v_user", "vts"),
      Seq("user_id" -> "v_user"), "pts", "vts",
      lookbackSec = 3600L, maxLateness = "10 minutes")
    val q = joined
      .select(col("purchase_id"), col("view_id"))
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      // batch 1: a view only — no pair yet
      views.addData((100L, 1L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("ij_out").count() === 0)

      // batch 2: the purchase 30 min later joins the buffered view;
      // a view AT the purchase instant (not strictly before) must not
      views.addData((101L, 1L, ts("2024-01-01 10:30:00")))
      purchases.addData((500L, 1L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      val got = spark.table("ij_out").as[(Long, Long)].collect().toSet
      assert(got === Set((500L, 100L)))

      // batch 3: a purchase at 11:00 — its trailing hour [10:00, 11:00)
      // includes BOTH buffered views (10:00 exactly on the inclusive
      // lower bound, 10:30 inside)
      purchases.addData((501L, 1L, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val got3 = spark.table("ij_out").as[(Long, Long)].collect().toSet
      assert(got3 === Set((500L, 100L), (501L, 100L), (501L, 101L)))

      // batch 4: a purchase far ahead joins nothing (both views out of
      // its trailing hour)
      purchases.addData((502L, 1L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      assert(spark.table("ij_out").count() === 3)
    } finally q.stop()
  }

  test("streaming: state is bounded — the plan carries watermark-based eviction") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoin.intervalJoinStream(
      purchases.toDF().toDF("purchase_id", "user_id", "pts"),
      views.toDF().toDF("view_id", "v_user", "vts"),
      Seq("user_id" -> "v_user"), "pts", "vts", 3600L, "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_state")
      .outputMode("append").start()
    try {
      views.addData((1L, 1L, ts("2024-01-01 10:00:00")))
      purchases.addData((1L, 1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // append-mode stream-stream join only runs when Spark derived a
      // state watermark from the interval condition; assert it did
      val progress = q.lastProgress
      assert(progress.stateOperators.nonEmpty,
        "interval join must run as a stateful operator")
      assert(progress.eventTime.containsKey("watermark"),
        "watermark must be tracked for state eviction")
    } finally q.stop()
  }

  test("batch face equals a driver-side brute force on random data") {
    val rnd = new scala.util.Random(11)
    val events = (1 to 400).map { i =>
      val typ = if (rnd.nextBoolean()) "purchase" else "view"
      (i.toLong, rnd.nextInt(5).toLong, typ,
        new Timestamp(1700000000000L + rnd.nextInt(8 * 3600) * 1000L))
    }
    val df = events.toDF("event_id", "user_id", "event_type", "ts")
    val got = StreamJoin.viewsBeforePurchases(df, 3600L)
      .select("purchase_id", "view_id").as[(Long, Long)].collect().toSet
    val purchases = events.filter(_._3 == "purchase")
    val views = events.filter(_._3 == "view")
    val want = (for {
      p <- purchases; v <- views
      if v._2 == p._2
      if v._4.getTime >= p._4.getTime - 3600 * 1000L && v._4.getTime < p._4.getTime
    } yield (p._1, v._1)).toSet
    assert(got === want)
  }

  test("batch plan is an equi-keyed join, not BroadcastNestedLoop") {
    val df = Seq((1L, 1L, "purchase", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val plan = StreamJoin.viewsBeforePurchases(df, 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
