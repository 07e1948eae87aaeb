package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: greedy left-to-right BPE over word counts. */
  private def refTrain(wc: Map[String, Long], n: Int)
    : (Seq[(String, String, Long)], Map[String, List[String]]) = {
    var words: Map[String, List[String]] =
      wc.map { case (w, _) => w -> (w.toList.map(_.toString) :+ "</w>") }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    while (r < n) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, toks) =>
        toks.zip(toks.drop(1)).foreach(p =>
          pc(p) = pc.getOrElse(p, 0L) + wc(w))
      }
      if (pc.isEmpty) r = n
      else {
        val ((a, b), c) = pc.toSeq.minBy { case ((l, rr), cnt) => (-cnt, l, rr) }
        merges += ((a, b, c))
        words = words.map { case (w, toks) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          toks.foreach { t =>
            if (out.nonEmpty && out.last == a && t == b)
              out(out.size - 1) = a + b
            else out += t
          }
          w -> out.toList
        }
      }
      r += 1
    }
    (merges.toSeq, words)
  }

  test("train: classic low/lower corpus learns the expected first merges") {
    // 'lo' dominates: appears in every word; then 'low'
    val docs = Seq(
      (1L, "low low low lower lower lowest"),
      (2L, "low lowest")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", 2).merges
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === (("l", "o", 8L)))
    assert(m(1) === (("lo", "w", 8L)))
  }

  test("mergeOnce: greedy left-to-right on same-token runs (aaaa -> aa aa)") {
    val df = Seq(Tuple1(Seq("a", "a", "a", "a")), Tuple1(Seq("a", "a", "a")))
      .toDF("toks")
    val out = df.select(Bpe.mergeOnce(col("toks"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("aa", "aa"))
    assert(out(1) === Seq("aa", "a"))
  }

  test("train matches the plain-Scala greedy reference on real documents") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
    val wc = Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refMerges, refWords) = refTrain(wc, 5)
    val model = Bpe.train(docs, "text", 5)
    val gotMerges = model.merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotMerges === refMerges)
    val gotWords = model.words.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(gotWords === refWords)
  }

  test("encode: vocab join covers corpus words; OOV falls back to merge replay") {
    val docs = Seq((1L, "low lower")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", 2) // learns (l,o) then (lo,w)
    val probe = Seq((9L, "low slow")).toDF("doc_id", "text") // 'slow' is OOV
    val enc = Bpe.encode(probe, "doc_id", "text", model)
      .orderBy("word_pos").collect()
      .map(r => r.getString(2) -> r.getSeq[String](3).toList)
    assert(enc(0) === ("low" -> List("low", "</w>")))
    // OOV replays the same merges over its chars: s + low + </w>
    assert(enc(1) === ("slow" -> List("s", "low", "</w>")))
  }
}
