package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // srcA: 4 docs, 3 share the "all rights reserved" template shingle;
  // srcB: 2 docs with no common shingles across them
  private val docs = Seq(
    (1L, "srcA", "all rights reserved unique alpha content here today"),
    (2L, "srcA", "all rights reserved different beta words follow now"),
    (3L, "srcA", "all rights reserved gamma material appears in this"),
    (4L, "srcA", "completely original delta text nothing shared at all"),
    (5L, "srcB", "all rights reserved but only one doc has it"),
    (6L, "srcB", "totally unrelated sentence with fresh vocabulary inside")
  ).toDF("doc_id", "source", "text")

  test("profile: shingle common within a source, scoped to that source") {
    val prof = Boilerplate.sourceProfile(docs, "doc_id", "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(prof.contains(("srcA", "all rights reserved")))
    // in srcB the same shingle appears in 1 of 2 docs — below minDf=2
    assert(!prof.contains(("srcB", "all rights reserved")))
    // a unique srcA shingle is not boilerplate
    assert(!prof.exists(_._2 == "unique alpha content"))
  }

  test("stats: templated docs flagged, original docs clean") {
    val stats = Boilerplate.boilerplateStats(docs, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // docs 1-3 share exactly "all rights reserved" (1 of 6 shingles each)
    assert(stats(1L)._2 === 1L)
    assert(!stats(1L)._3) // 1*2 < 6 → not templated
    assert(stats(4L)._2 === 0L)
    assert(stats(5L)._2 === 0L) // srcB profile empty
    // a doc that is mostly template: make the shared part dominate
    val heavy = Seq(
      (1L, "s", "all rights reserved to them"),
      (2L, "s", "all rights reserved to them"),
      (3L, "s", "all rights reserved to them forever and unique tail")
    ).toDF("doc_id", "source", "text")
    val hs = Boilerplate.boilerplateStats(heavy, "doc_id", "source", "text")
      .filter(col("doc_id") === 3L).collect().head
    // doc 3: 7 shingles, 3 shared ("all rights reserved", "rights
    // reserved to", "reserved to them") → not >= half; doc 1/2: 3/3 → templated
    val h1 = Boilerplate.boilerplateStats(heavy, "doc_id", "source", "text")
      .filter(col("doc_id") === 1L).collect().head
    assert(h1.getBoolean(3))
    assert(!hs.getBoolean(3))
  }

  test("sourceOverlap: shared shingles counted once per pair, hot shingles excluded") {
    val docs = Seq(
      (1L, "a", "alpha beta gamma delta"),     // shares "alpha beta gamma" with b
      (2L, "a", "alpha beta gamma delta"),     //   (duplicate doc — still ONE distinct shingle)
      (3L, "b", "alpha beta gamma other words"),
      (4L, "c", "completely different text here"),
      // a shingle present in ALL THREE sources — excluded at maxSources=2
      (5L, "a", "shared everywhere phrase x"),
      (6L, "b", "shared everywhere phrase y"),
      (7L, "c", "shared everywhere phrase z")
    ).toDF("doc_id", "source", "text")
    val out = Boilerplate.sourceOverlap(docs, "doc_id", "source", "text",
        k = 3, maxSources = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // ("alpha beta gamma", "beta gamma delta"? only first is shared) → (a,b) = 1
    assert(out(("a", "b")) === 1L)
    // "shared everywhere phrase" spans all 3 sources → excluded everywhere
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")))
    // raising the guard admits it
    val loose = Boilerplate.sourceOverlap(docs, "doc_id", "source", "text",
        k = 3, maxSources = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(loose(("a", "c")) === 1L && loose(("b", "c")) === 1L)
    assert(loose(("a", "b")) === 2L)
  }
}
