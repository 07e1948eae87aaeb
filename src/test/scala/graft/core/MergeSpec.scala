package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")

  test("upsert: matched update, unmatched insert, untouched passthrough") {
    val updates = Seq((2L, "B2", 22.0), (9L, "new", 99.0)).toDF("k", "name", "v")
    val got = Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "B2", 22.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (9L, "new", 99.0)))
  }

  test("upsert with delete flag: deleted keys vanish, delete col is dropped") {
    val updates = Seq((2L, "B2", 22.0, false), (3L, "x", 0.0, true),
        (9L, "new", 99.0, false))
      .toDF("k", "name", "v", "del")
    val out = Merge.upsert(base, updates, Seq("k"), deleteCol = Some("del"))
    assert(out.columns.toSeq === Seq("k", "name", "v"))
    val got = out.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "B2", 22.0), (4L, "d", 40.0),
      (9L, "new", 99.0)))
  }

  test("upsert: null delete flag means keep (update applies)") {
    val updates = Seq((1L, "A1", 11.0, Option.empty[Boolean]))
      .toDF("k", "name", "v", "del")
    val got = Merge.upsert(base, updates, Seq("k"), deleteCol = Some("del"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got.head === ((1L, "A1", 11.0)))
    assert(got.size === 4)
  }

  test("upsert plans a single equi anti join — no cartesian, base scanned once") {
    val updates = Seq((2L, "B2", 22.0)).toDF("k", "name", "v")
    val plan = Merge.upsert(base, updates, Seq("k")).queryExecution
      .executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("diff classifies added/removed/changed, drops unchanged, null-safe values") {
    val before = Seq(
      (1L, Some("a"), 1.0), (2L, Some("b"), 2.0), (3L, None, 3.0),
      (4L, Some("d"), 4.0))
      .toDF("k", "name", "v")
    val after = Seq(
      (1L, Some("a"), 1.0),          // unchanged → dropped
      (2L, Some("b"), 99.0),         // changed value
      (3L, Some("c"), 3.0),          // null → non-null = changed
      (5L, Some("e"), 5.0))          // added; 4 removed
      .toDF("k", "name", "v")
    val got = Merge.diff(before, after, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // column order must not matter (sorted struct pack)
    val reordered = after.select("v", "k", "name")
    assert(Merge.diff(before, reordered, Seq("k"))
      .as[(Long, String)].collect().toMap === got)
  }

  test("diff rejects mismatched snapshot schemas") {
    intercept[IllegalArgumentException] {
      Merge.diff(base, base.drop("v"), Seq("k"))
    }
  }
}
