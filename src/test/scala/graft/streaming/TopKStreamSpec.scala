package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed top-k tracks the hot keys across micro-batches with eviction") {
    val dir = java.nio.file.Files.createTempDirectory("topk_spec").toFile
    val (grid, cand, ckpt) =
      (s"${dir.getPath}/grid", s"${dir.getPath}/cand", s"${dir.getPath}/ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val items = input.toDF().toDF("k")

    def runOnce(): Unit = {
      val q = TopKStream.run(items, "k", grid, cand, ckpt,
        candidateCap = 3, trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    // batch 1: a dominates; candidate table holds {a, b, c} (cap 3)
    input.addData("a", "a", "a", "b", "b", "c")
    runOnce()
    val c1 = TopKStream.topK(spark, cand, "k", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(c1.head === ("a" -> 3L))
    assert(c1.map(_._1).toSet === Set("a", "b", "c"))
    // batch 2: d surges past b and c — they evict (cap stays 3)
    input.addData("d", "d", "d", "d", "a")
    runOnce()
    val c2 = TopKStream.topK(spark, cand, "k", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(c2.take(2).toSeq === Seq("a" -> 4L, "d" -> 4L))
    // batch 3: b re-enters with its FULL cumulative estimate (2 + 2)
    input.addData("b", "b")
    runOnce()
    val c3 = TopKStream.topK(spark, cand, "k", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c3("b") === 4L, "evicted key must return with cumulative count")
    assert(c3.keySet === Set("a", "b", "d"))
  }

  test("a replayed batch leaves grid AND candidates unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("topk_replay").toFile
    val (grid, cand) = (s"${dir.getPath}/grid", s"${dir.getPath}/cand")
    TopKStream.applyBatch(Seq("a", "a", "b").toDF("k"), "k", grid, cand,
      candidateCap = 2, batchId = 0L, queryId = "q1")
    val before = TopKStream.topK(spark, cand, "k", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // at-least-once replay: grid fold skips; candidate refresh re-runs
    // as a pure function of the unchanged grid → identical table
    TopKStream.applyBatch(Seq("a", "a", "b").toDF("k"), "k", grid, cand,
      candidateCap = 2, batchId = 0L, queryId = "q1")
    val after = TopKStream.topK(spark, cand, "k", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(after === before)
    assert(after === Seq(("a", 2L), ("b", 1L)))
  }
}
