package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  // three shards: s0 fully below the probe range, s1 straddling it,
  // s2 all-null values (NULL bounds, nulls recorded)
  private def corpus = Seq(
    ("s0", Some(1L)), ("s0", Some(5L)),
    ("s1", Some(8L)), ("s1", Some(20L)), ("s1", None),
    ("s2", None), ("s2", None))
    .toDF("sh", "v")

  test("build: per-shard min/max over non-null values, null counts, rows") {
    val zm = ZoneMap.build(corpus, col("sh"), Seq("v")).orderBy("shard")
      .as[(String, Long, Option[Long], Option[Long], Long)].collect().toSeq
    assert(zm === Seq(
      ("s0", 2L, Some(1L), Some(5L), 0L),
      ("s1", 3L, Some(8L), Some(20L), 1L),
      ("s2", 2L, None, None, 2L)))
  }

  test("pruneRange keeps exactly the interval-overlapping shards; " +
    "all-null shards never match a range") {
    val zm = ZoneMap.build(corpus, col("sh"), Seq("v"))
    val hit = ZoneMap.pruneRange(zm, "v", lit(7L), lit(100L))
      .select("shard").as[String].collect().toSeq
    assert(hit === Seq("s1"))
    // conservative: a range touching s0's max keeps s0 even though the
    // only match is the boundary value
    val edge = ZoneMap.pruneRange(zm, "v", lit(5L), lit(6L))
      .select("shard").orderBy("shard").as[String].collect().toSeq
    assert(edge === Seq("s0"))
  }

  test("half-open bounds: a NULL lo/hi means unbounded, never skip-everything") {
    // regression: `max >= lit(null)` is NULL and filter() drops NULL —
    // the documented half-open contract used to false-skip every shard
    val zm = ZoneMap.build(corpus, col("sh"), Seq("v"))
    val noLo = ZoneMap.pruneRange(zm, "v", lit(null).cast("long"), lit(6L))
      .select("shard").orderBy("shard").as[String].collect().toSeq
    assert(noLo === Seq("s0")) // v <= 6 can only live in s0 (1..5)
    val noHi = ZoneMap.pruneRange(zm, "v", lit(7L), lit(null).cast("long"))
      .select("shard").orderBy("shard").as[String].collect().toSeq
    assert(noHi === Seq("s1")) // v >= 7 only in s1 (8..20); s2 all-null skips
    val st = ZoneMap.pruneStats(zm, "v", lit(null).cast("long"), lit(6L))
      .as[(Long, Long, Long, Long)].collect().head
    assert(st === ((3L, 1L, 7L, 2L)))
  }

  test("pruneIsNull reads exactly the shards that recorded nulls") {
    val zm = ZoneMap.build(corpus, col("sh"), Seq("v"))
    val hit = ZoneMap.pruneIsNull(zm, "v")
      .select("shard").orderBy("shard").as[String].collect().toSeq
    assert(hit === Seq("s1", "s2"))
  }

  test("pruneStats: totals and to-read from the stats frame alone") {
    val zm = ZoneMap.build(corpus, col("sh"), Seq("v"))
    val st = ZoneMap.pruneStats(zm, "v", lit(7L), lit(100L))
      .as[(Long, Long, Long, Long)].collect().head
    assert(st === ((3L, 1L, 7L, 3L)))
  }

  test("merge of batch partials equals the from-scratch map; " +
    "batch-disjoint shards pass through") {
    val batch1 = corpus.filter(col("v") < 8 || col("v").isNull)
    val batch2 = corpus.filter(col("v") >= 8)
    val merged = ZoneMap.merge(
        Seq(ZoneMap.build(batch1, col("sh"), Seq("v")),
          ZoneMap.build(batch2, col("sh"), Seq("v"))), Seq("v"))
      .orderBy("shard")
      .as[(String, Long, Option[Long], Option[Long], Long)].collect().toSeq
    val whole = ZoneMap.build(corpus, col("sh"), Seq("v")).orderBy("shard")
      .as[(String, Long, Option[Long], Option[Long], Long)].collect().toSeq
    assert(merged === whole)
  }

  test("prune never drops a shard that contains a match (vs brute force)") {
    val zm = ZoneMap.build(corpus, col("sh"), Seq("v"))
    for ((lo, hi) <- Seq((0L, 3L), (5L, 8L), (21L, 99L), (1L, 20L))) {
      val kept = ZoneMap.pruneRange(zm, "v", lit(lo), lit(hi))
        .select("shard").as[String].collect().toSet
      val truth = corpus.filter(col("v") >= lo && col("v") <= hi)
        .select("sh").distinct().as[String].collect().toSet
      assert(truth.subsetOf(kept), s"range [$lo,$hi]: $truth not in $kept")
    }
  }
}
