package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // docs built so each gate has a victim:
  //  1: clean english prose → survives
  //  2: exact copy of 1, higher id → dies at dedup (1 kept)
  //  3: repetitive spam → dies at repetition gate
  //  4: non-english (es-profile words) → dies at language gate
  //  5: punctuation storm → dies at quality gate (score < 0)
  //  6: shares a 3-shingle with the benchmark → dies at decontamination
  //  7: empty text → no tokens, dies by construction
  private val corpus = Seq(
    (1L, "the quick fox is a fast runner and the slow dog naps"),
    (2L, "the quick fox is a fast runner and the slow dog naps"),
    (3L, "spam spam spam spam spam spam spam spam the a"),
    (4L, "data row data row likes many other things here today now"),
    (5L, "!!! ??? ;;; ### $$$ %%% the"),
    (6L, "the secret benchmark answer is a fast thing indeed yes"),
    (7L, "")).toDF("doc_id", "text")

  private val benchmark = Seq(
    (100L, "what is the secret benchmark answer to this question")).toDF("doc_id", "text")

  test("each gate removes its victim; clean lowest-id doc survives") {
    val out = Curation.curate(corpus, benchmark, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("dedup keeps the lowest id: dropping doc 1 promotes doc 2") {
    val out = Curation.curate(
      corpus.filter(col("doc_id") =!= 1L), benchmark, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(2L))
  }

  test("minOverlap-style leniency lives in Decontam; curate is strict") {
    // doc 6 shares "secret benchmark answer" (and more) with the bench
    val only6 = corpus.filter(col("doc_id") === 6L)
    val out = Curation.curate(only6, benchmark, "doc_id", "text")
    assert(out.count() === 0)
  }

  test("matches the composed standalone operators on the same corpus") {
    // reference composition: the five operators called back-to-back
    val langs = TextAnalysis.langId(corpus, "doc_id", "text")
      .filter(col("pred_lang") === "en").select("doc_id")
    val hits = TextAnalysis.stopwordHits(corpus, "doc_id", "text")
    val scoreOk = corpus.join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("sw_hits"))
      .filter(TextAnalysis.qualityScore(col("text"), col("sw_hits")) >= 0)
      .select("doc_id")
    val repOk = TextAnalysis.repetitionStats(corpus, "doc_id", "text")
      .filter(!col("is_repetitive")).select("doc_id")
    val gated = corpus
      .join(langs, Seq("doc_id"), "left_semi")
      .join(scoreOk, Seq("doc_id"), "left_semi")
      .join(repOk, Seq("doc_id"), "left_semi")
    val keep = DedupOps.exactDedupKeep(gated, "doc_id", "text").select("doc_id")
    val expected = Decontam.decontaminate(
        gated.join(keep, Seq("doc_id"), "left_semi"), benchmark, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val fused = Curation.curate(corpus, benchmark, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(fused === expected)
  }

  test("funnelReport: hand-traced stage counts; n_out chains into the " +
      "next stage's n_in; final n_out equals curate's survivors") {
    // 5 corpus docs: 1 = healthy en, 2 = exact twin of 1 (dedup drop),
    // 3 = es (lang drop), 4 = repetitive (rep drop),
    // 5 = healthy en but shares a shingle with the benchmark
    val corpus = Seq(
      (1L, "the fast data table a slow window batch"),
      (2L, "the fast data table a slow window batch"),
      (3L, "data row data fila datos row mesa fila"),
      (4L, "the the the the the the the the"),
      (5L, "a fast stream the benchmark shingle lives here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the benchmark shingle lives in this text"))
      .toDF("doc_id", "text")
    val got = Curation.funnelReport(corpus, bench, "doc_id", "text")
      .orderBy("stage_idx").collect()
    assert(got.map(_.getAs[String]("stage")).toSeq ===
      Seq("lang_id", "quality_score", "repetition", "exact_dedup",
        "decontam"))
    // chain invariant
    got.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("n_out") === w(1).getAs[Long]("n_in"))
    }
    val byStage = got.map(r =>
      r.getAs[String]("stage") -> ((r.getAs[Long]("n_in"),
        r.getAs[Long]("n_out")))).toMap
    assert(byStage("lang_id") === ((5L, 4L)))        // doc 3 votes es
    assert(byStage("quality_score") === ((4L, 4L)))
    assert(byStage("repetition") === ((4L, 3L)))     // doc 4 drops
    assert(byStage("exact_dedup") === ((3L, 2L)))    // doc 2 loses to 1
    assert(byStage("decontam") === ((2L, 1L)))       // doc 5 contaminated
    val survivors = Curation.curate(corpus, bench, "doc_id", "text")
      .count()
    assert(survivors === got.last.getAs[Long]("n_out"))
  }

  test("funnelReport on an empty corpus reports zeros, not NULLs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bench = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = Curation.funnelReport(empty, bench, "doc_id", "text")
      .orderBy("stage_idx").collect()
    assert(got.length === 5)
    got.foreach { r =>
      assert(r.getAs[Long]("n_in") === 0L && r.getAs[Long]("n_out") === 0L)
      assert(r.isNullAt(r.fieldIndex("survival")))
    }
  }
}
