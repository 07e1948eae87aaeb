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
}
