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

  test("first/last partials: struct min/max monoids merge to the one-shot answer") {
    val rows = Seq(
      ("a", 10L, 1L, 5.0),   // first of a (ts 10, id 1)
      ("a", 10L, 2L, 7.0),   // same ts, higher id
      ("a", 30L, 3L, 2.0),   // last of a
      ("b", 5L, 4L, 9.0))    // single-shard-only key
      .toDF("k", "tsu", "id", "v")
    def unwrap(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.deriveFirstLast(df, "v")
        .collect().map(r => r.getAs[String]("k") ->
          ((r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Long]("n"),
            r.getAs[Double]("first_val"), r.getAs[Double]("last_val")))).toMap
    // shard by id parity; key b lands entirely in one shard
    val pa = IncrementalAgg.firstLastPartial(rows.filter($"id" % 2 === 0),
      Seq("k"), Seq("tsu", "id"), "v")
    val pb = IncrementalAgg.firstLastPartial(rows.filter($"id" % 2 === 1),
      Seq("k"), Seq("tsu", "id"), "v")
    val merged = unwrap(IncrementalAgg.mergePartials(pa, pb,
      keys = Seq("k"), sumCols = Seq("n"),
      minCols = Seq("first_s", "lo"), maxCols = Seq("last_s", "hi")))
    val oneShot = unwrap(IncrementalAgg.firstLastPartial(rows,
      Seq("k"), Seq("tsu", "id"), "v"))
    assert(merged === oneShot)
    // (lo, hi, n, first, last): first of a = 5.0 (ts 10 id 1), last = 2.0
    assert(merged("a") === ((2.0, 7.0, 3L, 5.0, 2.0)))
    assert(merged("b") === ((9.0, 9.0, 1L, 9.0, 9.0)))
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

  test("histogram partials merge to the one-shot histogram; nulls drop; " +
    "top bucket caps") {
    val vals = Seq(Some(0.0), Some(9.9), Some(10.0), Some(25.0), None,
      Some(99.0), Some(1e9)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val merged = IncrementalAgg.histogramMerge(
      IncrementalAgg.histogramPartial(vals.filter($"id" % 2 === 0),
        lit(0), "v", width = 10.0, buckets = 4),
      IncrementalAgg.histogramPartial(vals.filter($"id" % 2 === 1),
        lit(1), "v", width = 10.0, buckets = 4))
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val oneShot = IncrementalAgg.histogramMerge(
      IncrementalAgg.histogramPartial(vals, lit(0), "v", 10.0, 4))
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(merged === oneShot)
    // buckets: [0,10)→2, [10,20)→1, [20,30)→1, cap bucket 3 ← 99 and 1e9
    assert(merged === Seq((0L, 2L), (1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("histogramQuantiles: exact crossing semantics at boundaries") {
    // counts 10/10/80 over buckets 0/1/2 (total 100): q=1000bp crosses
    // exactly at bucket 0 (cum·10000 = 10·10000 ≥ 1000·100); q=1001bp
    // needs bucket 1; median and p99 land in bucket 2
    val merged = Seq((0L, 10L), (1L, 10L), (2L, 80L)).toDF("bucket", "n")
    val got = IncrementalAgg.histogramQuantiles(
        merged, Seq(1000, 1001, 5000, 9900))
      .orderBy("q_bp").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1000L, 0L, 10L, 100L), (1001L, 1L, 20L, 100L),
      (5000L, 2L, 100L, 100L), (9900L, 2L, 100L, 100L)))
  }
}
