package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DedupIndex — the build-once pair store must be a pure refactoring
  * of the per-consumer chains: every consumer over the STORED pairs
  * returns byte-identical rows to the one-shot DedupOps entry point,
  * and the store round-trips the verified pair frame exactly.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "web"),
    (2L, "the quick brown fox jumps over the lazy dog", "books"),
    (3L, "the quick brown fox jumps over the sleepy dog", "web"),
    (4L, "completely different text about spark engines here", "web"),
    (5L, "entirely unrelated musings on database optimizers", "books")
  ).toDF("doc_id", "text", "source")

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withStore(f: DataFrame => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("dupindex").toFile
    try {
      val path = new java.io.File(dir, "pairs").getPath
      DedupIndex.writePairStore(docs, "doc_id", "text", path)
      f(DedupIndex.readPairs(spark, path))
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }

  test("the store round-trips nearDupPairs exactly") {
    withStore { stored =>
      assert(sorted(stored) ===
        sorted(DedupOps.nearDupPairs(docs, "doc_id", "text")))
    }
  }

  test("every consumer over the stored pairs equals its one-shot " +
    "DedupOps chain") {
    withStore { stored =>
      assert(sorted(DedupIndex.sourceMatrix(stored, docs, "doc_id",
          "source")) ===
        sorted(DedupOps.dupSourceMatrix(docs, "doc_id", "text", "source")))
      assert(sorted(DedupIndex.leakFreeSplit(stored, docs, "doc_id",
          splits)) ===
        sorted(DedupOps.leakFreeSplit(docs, "doc_id", "text", splits)))
      assert(sorted(DedupIndex.splitLeakage(stored, splits)) ===
        sorted(DedupOps.splitLeakage(docs, "doc_id", "text", splits)))
      val oneShotPairs = DedupOps.nearDupPairs(docs, "doc_id", "text")
        .filter(col("jaccard_n") * 10 >= col("jaccard_d") * 8)
        .select("id1", "id2")
      assert(sorted(DedupIndex.clusters(stored, docs.select("doc_id"),
          "doc_id")) ===
        sorted(DupGraph.dupClusters(docs.select("doc_id"), "doc_id",
          oneShotPairs)))
    }
  }

  test("thresholded applies the integer cross-multiply, not doubles") {
    val pairs = Seq(
      (1L, 2L, 8L, 10L),   // exactly 0.8 → kept at 8/10
      (1L, 3L, 79L, 100L), // 0.79 → dropped
      (2L, 3L, 4L, 5L)     // 0.8 → kept
    ).toDF("id1", "id2", "jaccard_n", "jaccard_d")
    assert(DedupIndex.thresholded(pairs).select("id1", "id2")
      .as[(Long, Long)].collect().toSet === Set((1L, 2L), (2L, 3L)))
  }
}
