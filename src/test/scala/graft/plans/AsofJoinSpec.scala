package graft.plans

import graft.SparkSpec
import graft.core.Temporal
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def sampleOne[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  test("native as-of join matches the window composition on random data") {
    GraftExtensions.register(spark)
    val gen = for {
      nl <- Gen.chooseNum(1, 40)
      nr <- Gen.chooseNum(0, 40)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 500L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 500L)))
    } yield (ls.zipWithIndex, rs.distinct)
    val (ls, rs) = sampleOne(gen)
    val left = ls.map { case ((u, t), i) => (i.toLong, u, ts(t)) }
      .toDF("l_id", "user_id", "ts")
    val right = rs.map { case (u, t) => (u, ts(t), t) }
      .toDF("user_id", "ts", "r_sec")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val native = Temporal.asofJoinNative(left, right,
      Seq("user_id"), "ts", Seq("r_sec"))
    val window = Temporal.asofJoin(left, right,
      Seq("user_id"), "ts", Seq("r_sec"))
    assert(collect(native) === collect(window), s"left=$ls right=$rs")
  }

  test("directed native faces match asofJoinDirected on random data, all directions") {
    GraftExtensions.register(spark)
    val gen = for {
      nl <- Gen.chooseNum(1, 40)
      nr <- Gen.chooseNum(0, 40)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 500L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 500L)))
    } yield (ls.zipWithIndex, rs.distinct)
    val (ls, rs) = sampleOne(gen)
    val left = ls.map { case ((u, t), i) => (i.toLong, u, ts(t)) }
      .toDF("l_id", "user_id", "ts")
    val right = rs.map { case (u, t) => (u, ts(t), t) }
      .toDF("user_id", "ts", "r_sec")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    for (d <- Seq(Temporal.AsofDirection.Backward,
        Temporal.AsofDirection.Forward, Temporal.AsofDirection.Nearest);
        tol <- Seq(None, Some(60L * 1000000))) {
      val native = Temporal.asofJoinNativeDirected(left, right,
        Seq("user_id"), "ts", Seq("r_sec"), d, tol)
      val window = Temporal.asofJoinDirected(left, right,
        Seq("user_id"), "ts", Seq("r_sec"), d, tol)
      assert(collect(native) === collect(window),
        s"direction=$d tol=$tol left=$ls right=$rs")
    }
  }

  test("native as-of join plans as AsofJoinExec with no Window") {
    GraftExtensions.register(spark)
    val left = Seq((1L, 7L, ts(100))).toDF("l_id", "user_id", "ts")
    val right = Seq((7L, ts(50), 50L)).toDF("user_id", "ts", "r_sec")
    val plan = Temporal.asofJoinNative(left, right,
        Seq("user_id"), "ts", Seq("r_sec"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("shared-lineage sides survive relation deduplication") {
    // both sides filter the SAME frame: re-analysis deduplicates the
    // right subtree's exprIds — the regression here was right-side
    // key/ts references silently resolving to the left side, pruning
    // the join keys out of the right child
    GraftExtensions.register(spark)
    val ev = Seq(
      (1L, 7L, "p", ts(100)),
      (2L, 7L, "v", ts(60)),
      (3L, 7L, "v", ts(80)),
      (4L, 8L, "p", ts(50)))
      .toDF("event_id", "user_id", "kind", "ts")
    val p = ev.filter(col("kind") === "p")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("kind") === "v")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("v_id"))
    val out = Temporal.asofJoinNative(p, v, Seq("user_id"), "ts", Seq("v_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out === Map(1L -> Some(3L), 4L -> None))
  }

  test("window face matches native when payload VALUES are null (row atomicity)") {
    GraftExtensions.register(spark)
    val left = Seq((1L, 7L, ts(100)), (2L, 7L, ts(70)))
      .toDF("l_id", "user_id", "ts")
    val right = Seq(
      (7L, ts(50), Some(50L), Some("a")),
      (7L, ts(80), None: Option[Long], Some("b"))) // newest row, null payload col
      .toDF("user_id", "ts", "r_sec", "tag")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)))).toSet
    val native = Temporal.asofJoinNative(left, right,
      Seq("user_id"), "ts", Seq("r_sec", "tag"))
    val window = Temporal.asofJoin(left, right,
      Seq("user_id"), "ts", Seq("r_sec", "tag"))
    // l_id=1 sees the ts(80) row ATOMICALLY: r_sec null (no back-fill
    // from ts(50)), tag "b"; l_id=2 sees the ts(50) row
    assert(collect(native) === Set(
      (1L, None, Some("b")), (2L, Some(50L), Some("a"))))
    assert(collect(window) === collect(native))
  }

  test("null timestamps: right never matches, left gets null payload") {
    GraftExtensions.register(spark)
    val left = Seq(
      (1L, 7L, Some(ts(100))),
      (2L, 7L, None)) // null left ts → null payload
      .toDF("l_id", "user_id", "ts")
    val right = Seq(
      (7L, None: Option[Timestamp], 1L),  // null right ts → never matches
      (7L, Some(ts(60)), 60L))
      .toDF("user_id", "ts", "r_sec")
    val out = Temporal.asofJoinNative(left, right,
        Seq("user_id"), "ts", Seq("r_sec"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out === Map(1L -> Some(60L), 2L -> None))
  }
}
