package graft.llm

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("cmsEstimate never undercounts; collision-free tiny corpus is exact") {
    val items = (Seq.fill(5)("apple") ++ Seq.fill(3)("pear") ++ Seq("plum"))
      .toDF("k")
    val counters = Sketch.cmsCounters(items, "k")
    val probes = Seq("apple", "pear", "plum", "absent").toDF("k")
    val est = Sketch.cmsEstimate(counters, probes, "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // one-sided error: est >= true count always; 3 distinct keys across
    // 4x256 md5 cells are collision-free (deterministic given md5), so
    // estimates are exact and the absent key reads 0
    assert(est === Map("apple" -> 5L, "pear" -> 3L, "plum" -> 1L,
      "absent" -> 0L))
  }

  test("cmsMerge of shard grids equals the grid of the concatenated stream") {
    val a = Seq("x", "y", "x").toDF("k")
    val b = Seq("y", "z", "x").toDF("k")
    val merged = Sketch.cmsMerge(Sketch.cmsCounters(a, "k"),
      Sketch.cmsCounters(b, "k"))
      .orderBy("seed", "bucket").collect().toSeq
    val whole = Sketch.cmsCounters(a.union(b), "k")
      .orderBy("seed", "bucket").collect().toSeq
    assert(merged === whole)
  }

  test("counter grid stays bounded by depth x width for any stream size") {
    val items = (1 to 5000).map(i => s"tok$i").toDF("k")
    assert(Sketch.cmsCounters(items, "k", depth = 4, width = 64)
      .count() <= 4L * 64L)
  }

  test("cmsInnerProduct: exact when collision-free, one-sided otherwise, " +
    "and equals the join cardinality") {
    // a: x,x,y ; b: x,y,y,z → Σ f_a·f_b = 2·1 + 1·2 = 4 = |a ⋈ b|
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "y", "y", "z").toDF("k")
    val ga = Sketch.cmsCounters(a, "k", depth = 4, width = 1024)
    val gb = Sketch.cmsCounters(b, "k", depth = 4, width = 1024)
    val est = Sketch.cmsInnerProduct(ga, gb).as[Long].collect().head
    val joinRows = a.join(b, "k").count()
    assert(joinRows === 4L)
    assert(est >= joinRows)            // never undercounts
    assert(est === 4L)                 // 3 keys in 1024 buckets: no collisions
    // self inner product = Σ f² (the F2/skew diagnostic)
    val self = Sketch.cmsInnerProduct(ga, ga).as[Long].collect().head
    assert(self === (2L * 2 + 1))
  }
}
