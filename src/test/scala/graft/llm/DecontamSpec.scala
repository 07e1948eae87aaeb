package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // benchmark doc 100 shares the 3-gram "spark shuffles by key" family
  // with corpus doc 1; doc 2 is clean; doc 3 is too short to shingle.
  private def corpus = Seq(
    (1L, "spark shuffles by key and then reduces"),
    (2L, "entirely different words live here together now"),
    (3L, "too short")).toDF("doc_id", "text")

  private def benchmark = Seq(
    (100L, "spark shuffles by key")).toDF("doc_id", "text")

  test("overlap counts shared distinct shingles per contaminated doc") {
    val rows = Decontam.overlap(corpus, benchmark, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares "spark shuffles by" and "shuffles by key" (2 of its 5)
    assert(rows.toSeq === Seq((1L, 2L, 5L)))
  }

  test("decontaminate drops contaminated docs, keeps clean and short ones") {
    val kept = Decontam.decontaminate(corpus, benchmark, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 3L))
  }

  test("decontaminateBloom returns exactly the exact path's survivors") {
    val viaBloom = Decontam.decontaminateBloom(corpus, benchmark, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    val exact = Decontam.decontaminate(corpus, benchmark, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(viaBloom.toSeq === exact.toSeq)
    assert(viaBloom.toSeq === Seq(2L, 3L))
    // a deliberately undersized filter only widens candidates (more
    // false positives) — never drops a true match
    val tiny = Decontam.decontaminateBloom(corpus, benchmark, "doc_id", "text",
        expectedBenchShingles = 1L)
      .select("doc_id").as[Long].collect().sorted
    assert(tiny.toSeq === exact.toSeq)
  }

  test("minOverlap threshold spares low-overlap docs") {
    val kept = Decontam.decontaminate(corpus, benchmark, "doc_id", "text",
        minOverlap = 3L)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 3L))
  }

  test("a doc sharing no shingles with an overlapping vocabulary stays clean") {
    // same words, different order → different 3-grams
    val scrambled = Seq((9L, "key by shuffles spark reduces then and")).toDF("doc_id", "text")
    assert(Decontam.overlap(scrambled, benchmark, "doc_id", "text").count() === 0)
  }
}
