package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val benchmark = Seq(
    (100L, "what is the secret benchmark answer to this question")
  ).toDF("doc_id", "text")

  test("streaming: gates + decontam + first-seen dedup across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = CurateStream.curate(docs, benchmark, "doc_id", "text")
      .writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick fox is a fast runner and the slow dog naps"),
        (3L, "spam spam spam spam spam spam spam spam the a"), // repetitive
        (4L, "data row data row likes many other things here today now"), // es
        (6L, "the secret benchmark answer is a fast thing indeed yes")) // contaminated
      q.processAllAvailable()
      val b1 = spark.table("curate_out")
        .select("first_id").as[Long].collect().toSet
      assert(b1 === Set(1L))

      // late exact dup of doc 1 → no re-emission; a fresh clean doc emits
      input.addData(
        (2L, "the quick fox is a fast runner and the slow dog naps"),
        (8L, "the river bends and a quiet boat drifts slow past town"))
      q.processAllAvailable()
      val b2 = spark.table("curate_out")
        .select("first_id").as[Long].collect().toSet
      assert(b2 === Set(1L, 8L))
    } finally q.stop()
  }

  test("streaming: oversized benchmark auto-switches to the Bloom sketch path " +
       "and keeps the exact path's results") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // maxBroadcastShingles = 0 forces the sketch face; with per-probe
    // fpp ~5e-7 the tiny corpus must match the exact face bit for bit
    val q = CurateStream.curate(docs, benchmark, "doc_id", "text",
        maxBroadcastShingles = 0L)
      .writeStream.format("memory").queryName("curate_bloom_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick fox is a fast runner and the slow dog naps"),
        (3L, "spam spam spam spam spam spam spam spam the a"), // repetitive
        (6L, "the secret benchmark answer is a fast thing indeed yes")) // contaminated
      q.processAllAvailable()
      assert(spark.table("curate_bloom_out")
        .select("first_id").as[Long].collect().toSet === Set(1L))
    } finally q.stop()
  }

  test("batch face: decontam-before-dedup keeps a clean later copy") {
    // doc 1 contaminated, doc 2 identical-content? No — same CONTENT can't
    // differ in contamination. Instead: the min-id doc of a content group
    // is always decontaminated identically, so ordering only matters
    // ACROSS content; assert the registry equals the SQL composition.
    val docs = Seq(
      (1L, "the quick fox is a fast runner and the slow dog naps"),
      (2L, "the quick fox is a fast runner and the slow dog naps"),
      (5L, "!!! ??? ;;; ### $$$ %%% the"),
      (6L, "the secret benchmark answer is a fast thing indeed yes"),
      (8L, "the river bends and a quiet boat drifts slow past town")
    ).toDF("doc_id", "text")
    val got = CurateStream.curate(docs, benchmark, "doc_id", "text")
      .select("first_id", "copies").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (8L, 1L)))
  }

  test("pureGates: 100k-token pathological docs complete in bounded time") {
    // worst case for a count-each-distinct top-token formulation:
    // 100k DISTINCT tokens (O(distinct*n) = 1e10 comparisons would hang);
    // the run-length fold pays one array sort instead
    val allDistinct = (0 until 100000).map(i => s"t$i").mkString(" ")
    val repetitive = ("spam " * 99999) + "the" // 100k tokens, top=99999
    val normal = "the quick fox is a fast runner and the slow dog naps"
    val docs = Seq((1L, allDistinct), (2L, repetitive), (3L, normal))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val ids = graft.llm.Curation.pureGates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val sec = (System.nanoTime() - t0) / 1e9
    // 1 drops (no stopword hit -> "und"); 2 drops (repetition gate)
    assert(ids === Set(3L))
    assert(sec < 60.0,
      f"pureGates took $sec%.1f s on 100k-token docs — top-token path must stay O(n log n)")
  }

  test("empty benchmark decontaminates nothing") {
    val docs = Seq(
      (1L, "the quick fox is a fast runner and the slow dog naps")
    ).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = CurateStream.curate(docs, empty, "doc_id", "text")
      .select("first_id").as[Long].collect().toSet
    assert(got === Set(1L))
  }
}
