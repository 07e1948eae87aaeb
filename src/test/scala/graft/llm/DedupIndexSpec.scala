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

  test("recallFloor is the s-curve 50% point: (1-2^(-1/b))^(1/r)") {
    // 8 hashes / 4 rows → b=2: (1 - 2^-0.5)^0.25 ≈ 0.73566
    assert(math.abs(DedupIndex.recallFloor(8, 4) -
      math.pow(1.0 - 1.0 / math.sqrt(2.0), 0.25)) < 1e-12)
    assert(math.abs(DedupIndex.recallFloor(8, 4) - 0.7357) < 5e-5)
    // 16 hashes / 2 rows → b=8: wider bands candidate lower similarity
    assert(DedupIndex.recallFloor(16, 2) < DedupIndex.recallFloor(8, 4))
    intercept[IllegalArgumentException](DedupIndex.recallFloor(8, 3))
  }

  test("an under-floor threshold against a STORED index raises; the " +
    "same request on a bare in-memory frame does not") {
    withStore { stored =>
      // 0.8 ≥ the 8/4 store's 0.736 floor → served
      DedupIndex.thresholded(stored, 8, 10).count()
      // 0.3 < floor: the store never candidated those pairs — refuse
      val e = intercept[IllegalArgumentException](
        DedupIndex.thresholded(stored, 3, 10))
      assert(e.getMessage.contains("recall floor"))
      // a frame without store provenance carries no floor metadata:
      // the producer owns the recall contract, no guard to apply
      DedupIndex.thresholded(stored.select("id1", "id2", "jaccard_n",
        "jaccard_d").withColumn("jaccard_n", col("jaccard_n") + 0L),
        3, 10).count()
    }
  }

  private def withIncrStore(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("incrpairs").toFile
    try f(new java.io.File(dir, "store").getPath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }

  test("a two-batch incremental store is row-identical to the one-shot " +
    "store, and its consumers agree") {
    withIncrStore { store =>
      DedupIndex.appendPairBatch(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", store, seq = 0L)
      DedupIndex.appendPairBatch(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", store, seq = 1L)
      val incr = DedupIndex.readPairStore(spark, store)
      assert(sorted(incr) ===
        sorted(DedupOps.nearDupPairs(docs, "doc_id", "text")))
      assert(sorted(DedupIndex.sourceMatrix(incr, docs, "doc_id",
          "source")) ===
        sorted(DedupOps.dupSourceMatrix(docs, "doc_id", "text", "source")))
      assert(sorted(DedupIndex.leakFreeSplit(incr, docs, "doc_id",
          splits)) ===
        sorted(DedupOps.leakFreeSplit(docs, "doc_id", "text", splits)))
      // the incremental store carries the floor guard too
      intercept[IllegalArgumentException](
        DedupIndex.thresholded(incr, 3, 10))
    }
  }

  test("replaying a batch with its own tag is idempotent, and " +
    "compaction preserves the pair union") {
    withIncrStore { store =>
      val even = docs.filter(col("doc_id") % 2 === 0)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      DedupIndex.appendPairBatch(even, "doc_id", "text", store, seq = 0L)
      DedupIndex.appendPairBatch(odd, "doc_id", "text", store, seq = 1L)
      val before = sorted(DedupIndex.readPairStore(spark, store))
      // crash-replay of batch 1: same (queryId, seq) → recompute
      // against state-excluding-itself and overwrite, nothing doubles
      DedupIndex.appendPairBatch(odd, "doc_id", "text", store, seq = 1L)
      assert(sorted(DedupIndex.readPairStore(spark, store)) === before)
      DedupIndex.compactPairStore(spark, store)
      assert(sorted(DedupIndex.readPairStore(spark, store)) === before)
      // a third batch against the COMPACTED state still folds correctly:
      // re-append doc 3's near-dup twin under a fresh id
      val twin = Seq((6L, "the quick brown fox jumps over the sleepy cat",
        "web")).toDF("doc_id", "text", "source")
      DedupIndex.appendPairBatch(twin, "doc_id", "text", store, seq = 2L)
      val all = docs.unionByName(twin)
      assert(sorted(DedupIndex.readPairStore(spark, store)) ===
        sorted(DedupOps.nearDupPairs(all, "doc_id", "text")))
    }
  }

  test("a late replay — after later seqs committed — is still " +
    "idempotent: prior state is seq-filtered, not just tag-filtered") {
    withIncrStore { store =>
      val even = docs.filter(col("doc_id") % 2 === 0)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      DedupIndex.appendPairBatch(even, "doc_id", "text", store, seq = 0L)
      DedupIndex.appendPairBatch(odd, "doc_id", "text", store, seq = 1L)
      val before = sorted(DedupIndex.readPairStore(spark, store))
      assert(before === sorted(DedupOps.nearDupPairs(docs, "doc_id", "text")))
      // replay batch 0 AFTER batch 1 committed: batch 1 must not leak
      // into batch 0's "prior" state, or the cross pairs batch 1
      // already emitted would double (r13 advice)
      DedupIndex.appendPairBatch(even, "doc_id", "text", store, seq = 0L)
      assert(sorted(DedupIndex.readPairStore(spark, store)) === before)
    }
  }

  test("compactPairStore sweeps a crashed batch's orphaned sig/shingle " +
    "deltas so its replay cannot double against its own stale state") {
    withIncrStore { store =>
      val even = docs.filter(col("doc_id") % 2 === 0)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      DedupIndex.appendPairBatch(even, "doc_id", "text", store, seq = 0L)
      DedupIndex.appendPairBatch(odd, "doc_id", "text", store, seq = 1L)
      // simulate batch 1 crashing between its sigs write and its pairs
      // write: sigs/shingles committed, pairs delta never landed
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(new java.io.File(s"${DedupIndex.pairsPath(store)}/ingest_batch=q_1"))
      // compaction must NOT fold the orphans in (their tag would be
      // erased and the replay could no longer self-exclude)
      DedupIndex.compactPairStore(spark, store)
      DedupIndex.appendPairBatch(odd, "doc_id", "text", store, seq = 1L)
      val got = DedupIndex.readPairStore(spark, store)
      assert(sorted(got) ===
        sorted(DedupOps.nearDupPairs(docs, "doc_id", "text")))
      assert(got.filter(col("id1") === col("id2")).count() === 0L)
      // the healed store keeps folding correctly
      val twin = Seq((6L, "the quick brown fox jumps over the sleepy cat",
        "web")).toDF("doc_id", "text", "source")
      DedupIndex.appendPairBatch(twin, "doc_id", "text", store, seq = 2L)
      assert(sorted(DedupIndex.readPairStore(spark, store)) ===
        sorted(DedupOps.nearDupPairs(docs.unionByName(twin),
          "doc_id", "text")))
    }
  }

  test("appendPairBatch refuses LSH params that disagree with the " +
    "store's sidecar") {
    withIncrStore { store =>
      DedupIndex.appendPairBatch(docs, "doc_id", "text", store, seq = 0L)
      intercept[IllegalArgumentException](
        DedupIndex.appendPairBatch(docs, "doc_id", "text", store,
          seq = 1L, numHashes = 16, rowsPerBand = 4))
    }
  }
}
