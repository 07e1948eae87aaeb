package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("mergePartials equals a from-scratch aggregate; new keys appear") {
    val raw = Seq(("a", 1L), ("a", 2L), ("b", 5L), ("b", 7L), ("c", 9L))
      .toDF("k", "v")
    def part(f: org.apache.spark.sql.Column) = raw.filter(f).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("lo"), max("v").as("hi"))
    // delta holds ALL of key c (new key) and part of b
    val merged = IncrementalAgg.mergePartials(
      part(col("v") < 6), part(col("v") >= 6),
      Seq("k"), sumCols = Seq("n", "s"),
      minCols = Seq("lo"), maxCols = Seq("hi"))
    val want = part(lit(true))
    val m = merged.orderBy("k").as[(String, Long, Long, Long, Long)].collect().toSeq
    val w = want.orderBy("k").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(m === w)
  }

  test("deriveAvg: re-derived mean, null on zero count") {
    val partials = Seq(("a", 2L, 10.0), ("z", 0L, 0.0)).toDF("k", "n", "s")
    val got = IncrementalAgg.deriveAvg(partials, "s", "n", "avg")
      .orderBy("k").as[(String, Long, Double, Option[Double])].collect().toSeq
    assert(got === Seq(("a", 2L, 10.0, Some(5.0)), ("z", 0L, 0.0, None)))
  }

  test("hll partials: merged shards estimate identically to one-shot, exact when sparse") {
    val rows = (1 to 400).map(i => ("g" + i % 2, (i % 97).toLong))
      .toDF("k", "v")
    val shardA = IncrementalAgg.hllPartial(rows.filter($"v" % 2 === 0), Seq("k"), "v")
    val shardB = IncrementalAgg.hllPartial(rows.filter($"v" % 2 === 1), Seq("k"), "v")
    val merged = IncrementalAgg.hllMergeEstimate(shardA, shardB)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = IncrementalAgg.hllMergeEstimate(
        IncrementalAgg.hllPartial(rows, Seq("k"), "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === oneShot)
    // 97 distinct values are far inside HLL's sparse-exact regime
    val exact = rows.groupBy("k").agg(count_distinct($"v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === exact)
  }
}
