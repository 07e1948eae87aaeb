package graft.streaming

import graft.SparkSpec
import graft.llm.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** Kill-and-resume proof for the stateful streaming sinks: a query is
  * crashed BETWEEN a batch's side effect and its checkpoint commit (the
  * at-least-once window), restarted from the same checkpoint, and the
  * final state must equal the one-shot run —
  *  - SketchStream: cell-wise addition is NOT idempotent, so the replay
  *    must be caught by the (queryId, batchId) marker;
  *  - CdcApply: keyed latest-wins upsert IS idempotent, so the replay
  *    must converge by construction.
  * The engine really replays: the offset WAL records a batch before
  * foreachBatch runs, the commit log only after it returns, so the
  * injected throw leaves the batch pending for the restart.
  */
class KillResumeSpec extends SparkSpec {
  import spark.implicits._

  private def writeJson(dir: java.io.File, name: String, rows: Seq[String]): Unit = {
    dir.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(dir, name).toPath, rows.mkString("\n"))
  }

  test("SketchStream: crash between fold and commit; resume skips the replayed batch") {
    val root = java.nio.file.Files.createTempDirectory("kill_cms").toFile
    val in = new java.io.File(root, "in")
    writeJson(in, "0.json", Seq("""{"k": "x"}""", """{"k": "y"}"""))
    writeJson(in, "1.json", Seq("""{"k": "x"}""", """{"k": "z"}"""))
    writeJson(in, "2.json", Seq("""{"k": "y"}"""))
    val grid = s"${root.getPath}/grid"
    val ckpt = s"${root.getPath}/ckpt"
    def stream = spark.readStream.schema("k string")
      .option("maxFilesPerTrigger", 1).json(in.getPath)

    // run 1: fold batch 1, then die before its checkpoint commit
    val qids = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q1 = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val qid = Option(batch.sparkSession.sparkContext
          .getLocalProperty("sql.streaming.queryId")).getOrElse("")
        qids.add(qid)
        SketchStream.applyBatch(batch, "k", grid,
          batchId = batchId, queryId = qid)
        if (batchId == 1L) throw new RuntimeException("injected crash")
      }
      .start()
    intercept[StreamingQueryException] { q1.awaitTermination() }
    // the marker identity must be the real streaming queryId, not ""
    assert(qids.stream().allMatch(q => q.nonEmpty))
    assert(SketchStream.lastAppliedBatchId(grid,
      spark.sparkContext.hadoopConfiguration) === 1L)

    // run 2: same checkpoint — the engine replays batch 1 (the marker
    // must skip it; addition is not idempotent) and then folds batch 2
    val q2 = SketchStream.run(stream, "k", grid, ckpt)
    q2.awaitTermination()

    val streamed = spark.read.parquet(grid)
      .orderBy("seed", "bucket").collect().toSeq
    val oneShot = Sketch.cmsCounters(
        Seq("x", "y", "x", "z", "y").toDF("k"), "k")
      .orderBy("seed", "bucket").collect().toSeq
    assert(streamed === oneShot)
  }

  test("IncrDedupStream: crash between delta write and commit; resume converges") {
    val root = java.nio.file.Files.createTempDirectory("kill_incr").toFile
    val in = new java.io.File(root, "in")
    def text(tag: String) =
      (0 until 30).map(j => s"$tag${j % 9}").mkString(" ")
    writeJson(in, "0.json", Seq(
      s"""{"doc_id": 1, "text": "${text("a")}"}""",
      s"""{"doc_id": 2, "text": "${text("b")}"}"""))
    writeJson(in, "1.json", Seq(
      s"""{"doc_id": 10, "text": "${text("a")}"}""", // dup of accepted 1
      s"""{"doc_id": 11, "text": "${text("c")}"}"""))
    writeJson(in, "2.json", Seq(
      s"""{"doc_id": 20, "text": "${text("c")}"}""")) // dup of accepted 11
    val store = s"${root.getPath}/store"
    val ckpt = s"${root.getPath}/ckpt"
    def stream = spark.readStream.schema("doc_id long, text string")
      .option("maxFilesPerTrigger", 1).json(in.getPath)

    // run 1: fold batch 1 fully (verdicts + delta), die before commit
    val q1 = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrDedupStream.applyBatch(batch, "doc_id", "text", store,
          batchId = batchId, queryId = ReplayGuard.streamingQueryId(batch))
        if (batchId == 1L) throw new RuntimeException("injected crash")
      }
      .start()
    intercept[StreamingQueryException] { q1.awaitTermination() }

    // run 2: the engine replays batch 1 (recompute-and-overwrite must
    // not duplicate 11's signature) and then folds batch 2
    val q2 = IncrDedupStream.run(stream, "doc_id", "text", store, ckpt)
    q2.awaitTermination()

    val idx = spark.read.parquet(IncrDedupStream.indexPath(store))
    assert(idx.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 11L), "accepted set wrong or duplicated after replay")
    val verdicts = spark.read
      .option("basePath", s"$store/verdicts").parquet(s"$store/verdicts/batch=*")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict"))
      .toMap
    assert(verdicts === Map(1L -> "kept", 2L -> "kept",
      10L -> "exact_dup_corpus", 11L -> "kept", 20L -> "exact_dup_corpus"))
  }

  test("CdcApply: crash mid-stream; resume converges to the one-shot snapshot") {
    val root = java.nio.file.Files.createTempDirectory("kill_cdc").toFile
    val in = new java.io.File(root, "in")
    writeJson(in, "0.json", Seq(
      """{"key": "a", "ts": "2024-01-01T00:00:00", "id": 1, "deleted": false, "v": 1}""",
      """{"key": "b", "ts": "2024-01-01T00:00:01", "id": 2, "deleted": false, "v": 2}"""))
    writeJson(in, "1.json", Seq(
      """{"key": "b", "ts": "2024-01-02T00:00:00", "id": 3, "deleted": false, "v": 20}""",
      """{"key": "c", "ts": "2024-01-02T00:00:01", "id": 4, "deleted": false, "v": 3}"""))
    writeJson(in, "2.json", Seq(
      """{"key": "a", "ts": "2024-01-03T00:00:00", "id": 5, "deleted": true, "v": 0}"""))
    val base = s"${root.getPath}/base"
    val ckpt = s"${root.getPath}/ckpt"
    val schema = "key string, ts timestamp, id long, deleted boolean, v long"
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in.getPath)

    val q1 = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        CdcApply.applyBatch(batch.sparkSession, batch, base,
          Seq("key"), "ts", "id", "deleted")
        if (batchId == 1L) throw new RuntimeException("injected crash")
      }
      .start()
    intercept[StreamingQueryException] { q1.awaitTermination() }

    val q2 = CdcApply.run(stream, base, ckpt, Seq("key"), "ts", "id", "deleted")
    q2.awaitTermination()

    // one-shot truth: a deleted, b overwritten by its later change, c kept
    val got = spark.read.parquet(base).select("key", "v")
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("b", 20L), ("c", 3L)))
  }
}
