package graft.streaming

import graft.SparkSpec
import graft.core.Fs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class IncrDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(i: Int): String =
    (0 until 30).map(j => s"v${(i * 11 + j * 3) % 60}").mkString(" ")

  private def conf = spark.sparkContext.hadoopConfiguration

  private def deltaTags(store: String): Set[String] =
    Fs.listDirs(IncrDedupStream.indexPath(store), conf)
      .map(_.getPath.getName.stripPrefix("ingest_batch=")).toSet

  private def indexIds(store: String): Set[Long] =
    spark.read.parquet(IncrDedupStream.indexPath(store))
      .select("doc_id").as[Long].collect().toSet

  test("stream maintains the index: later batches dedup against earlier survivors") {
    val dir = java.nio.file.Files.createTempDirectory("incr_stream").toFile
    val store = s"${dir.getPath}/store"
    val ckpt = s"${dir.getPath}/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")

    def runOnce(): Unit = {
      val q = IncrDedupStream.run(docs, "doc_id", "text", store, ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    // batch 0: two novel docs + an in-batch exact copy
    input.addData((1L, doc(0)), (2L, doc(1)), (3L, doc(0)))
    runOnce()
    // batch 1: exact copy of an ACCEPTED doc (1) and of a VICTIM's text
    // (doc(0) again — matches survivor 1, not victim 3), plus a novel doc
    input.addData((10L, doc(0)), (11L, doc(2)))
    runOnce()
    // batch 2: exact copy of batch 1's novel survivor
    input.addData((20L, doc(2)))
    runOnce()

    val verdicts = spark.read
      .option("basePath", s"$store/verdicts")
      .parquet(s"$store/verdicts/batch=*")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          if (r.isNullAt(r.fieldIndex("match_id"))) -1L
          else r.getAs[Long]("match_id")))
      .toMap
    assert(verdicts(1L)._1 === "kept")
    assert(verdicts(2L)._1 === "kept")
    assert(verdicts(3L) === (("exact_dup_batch", 1L)))
    assert(verdicts(10L) === (("exact_dup_corpus", 1L)))
    assert(verdicts(11L)._1 === "kept")
    assert(verdicts(20L) === (("exact_dup_corpus", 11L)))

    // the live index holds exactly the accepted docs' signatures, one
    // delta per batch, all under the same streaming queryId
    assert(indexIds(store) === Set(1L, 2L, 11L))
    val tags = deltaTags(store)
    assert(tags.size === 3 && tags.map(_.split("_").last) === Set("0", "1", "2"))
    assert(tags.map(_.split("_").head).size === 1, s"one queryId: $tags")
  }

  test("replay recomputes identically; checkpoint reset writes a new delta tag") {
    val dir = java.nio.file.Files.createTempDirectory("incr_replay").toFile
    val store = s"${dir.getPath}/store"
    val b0 = Seq((1L, doc(0)), (2L, doc(1))).toDF("doc_id", "text")
    IncrDedupStream.applyBatch(b0, "doc_id", "text", store,
      batchId = 0L, queryId = "q1")
    assert(indexIds(store) === Set(1L, 2L))
    // at-least-once replay (crash between delta write and checkpoint
    // commit): the batch judges against the index MINUS its own tag and
    // overwrites its delta — bit-identical store, no duplicates
    IncrDedupStream.applyBatch(b0, "doc_id", "text", store,
      batchId = 0L, queryId = "q1")
    assert(indexIds(store) === Set(1L, 2L))
    assert(deltaTags(store) === Set("q1_0"))
    // checkpoint reset: batchId restarts at 0 under a NEW queryId — the
    // batch folds under its own tag (its docs are dups of q1's delta)
    IncrDedupStream.applyBatch(Seq((5L, doc(0))).toDF("doc_id", "text"),
      "doc_id", "text", store, batchId = 0L, queryId = "q2")
    assert(deltaTags(store) === Set("q1_0", "q2_0"))
    assert(indexIds(store) === Set(1L, 2L)) // 5 was a dup: empty delta
    val v = spark.read.parquet(IncrDedupStream.verdictsPath(store, 0L))
    assert(v.filter(col("doc_id") === 5L).select("verdict")
      .as[String].head() === "exact_dup_corpus")
  }

  test("direct folds (batchId = -1) append count-named deltas; compact absorbs all") {
    val dir = java.nio.file.Files.createTempDirectory("incr_direct").toFile
    val store = s"${dir.getPath}/store"
    IncrDedupStream.applyBatch(Seq((1L, doc(0))).toDF("doc_id", "text"),
      "doc_id", "text", store, batchId = 3L, queryId = "q1")
    IncrDedupStream.applyBatch(Seq((2L, doc(1))).toDF("doc_id", "text"),
      "doc_id", "text", store) // direct: no batch identity
    assert(indexIds(store) === Set(1L, 2L))
    assert(deltaTags(store) === Set("q1_3", "direct_1"))
    IncrDedupStream.compact(spark, store)
    assert(deltaTags(store) === Set("compacted_2"))
    assert(indexIds(store) === Set(1L, 2L))
    // the compacted index still dedups the next batch correctly
    IncrDedupStream.applyBatch(
      Seq((7L, doc(0)), (8L, doc(5))).toDF("doc_id", "text"),
      "doc_id", "text", store, batchId = 4L, queryId = "q1")
    assert(indexIds(store) === Set(1L, 2L, 8L))
    val v = spark.read.parquet(IncrDedupStream.verdictsPath(store, 4L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v === Map(7L -> "exact_dup_corpus", 8L -> "kept"))
  }

  test("auto-compaction: a low trigger yields identical index and " +
    "verdicts as no trigger; delta dirs stay bounded; replay after an " +
    "auto-compact is still idempotent") {
    def mk(): String = {
      val d = java.nio.file.Files.createTempDirectory("incr_auto").toFile
      s"${d.getPath}/store"
    }
    val (storeA, storeB) = (mk(), mk())
    // the last batch's doc must be genuinely novel (doc(i) sequences
    // share a 3-residue token coset, so doc(4) near-dups doc(1))
    val novel = (0 until 30).map(j => s"z$j").mkString(" ")
    val batches = Seq(
      Seq((1L, doc(0)), (2L, doc(1))),
      Seq((10L, doc(0)), (11L, doc(2))),
      Seq((20L, doc(2)), (21L, doc(3))),
      Seq((30L, novel)))
    batches.zipWithIndex.foreach { case (b, i) =>
      val df = b.toDF("doc_id", "text")
      IncrDedupStream.applyBatch(df, "doc_id", "text", storeA,
        batchId = i.toLong, queryId = "q", autoCompactMinDeltas = 2)
      IncrDedupStream.applyBatch(df, "doc_id", "text", storeB,
        batchId = i.toLong, queryId = "q", autoCompactMinDeltas = 0)
    }
    def verdictMap(store: String): Map[Long, String] =
      spark.read.option("basePath", s"$store/verdicts")
        .parquet(s"$store/verdicts/batch=*")
        .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(indexIds(storeA) === indexIds(storeB))
    assert(verdictMap(storeA) === verdictMap(storeB))
    // trigger 2: compaction fires BEFORE the batch writes its delta, so
    // the store never exceeds compacted + own = 2 dirs; the untriggered
    // store carries one delta per batch
    assert(Fs.listDirs(IncrDedupStream.indexPath(storeA), conf)
      .length <= 2, deltaTags(storeA).toString)
    assert(deltaTags(storeB).size === 4)
    // replay of the last batch: its own committed tag is present when
    // the trigger fires — compaction must EXCLUDE (and the replay
    // rewrite) it, not bake it in as prior corpus
    IncrDedupStream.applyBatch(batches.last.toDF("doc_id", "text"),
      "doc_id", "text", storeA, batchId = 3L, queryId = "q",
      autoCompactMinDeltas = 2)
    assert(indexIds(storeA) === indexIds(storeB))
    assert(verdictMap(storeA)(30L) === "kept",
      "a replayed doc must not match its own pre-compact signatures")
  }
}
