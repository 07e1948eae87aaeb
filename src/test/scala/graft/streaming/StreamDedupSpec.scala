package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming: each content hash emitted exactly once across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamDedup.firstSeen(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((2L, "aaa"), (1L, "aaa"), (3L, "bbb"))
      q.processAllAvailable()
      val b1 = spark.table("dedup_out")
        .select("first_id", "copies").as[(Long, Long)].collect().toSet
      assert(b1 === Set((1L, 2L), (3L, 1L))) // min id of the batch wins

      // second batch: 'aaa' is a late dup → NO new emission; 'ccc' is new
      input.addData((4L, "aaa"), (5L, "ccc"))
      q.processAllAvailable()
      val b2 = spark.table("dedup_out")
        .select("first_id", "copies").as[(Long, Long)].collect().toSet
      assert(b2 === Set((1L, 2L), (3L, 1L), (5L, 1L)))
    } finally q.stop()
  }

  test("batch: firstSeen equals the groupBy answer (state starts empty)") {
    val docs = Seq((5L, "x"), (2L, "x"), (9L, "x"), (7L, "y"))
      .toDF("doc_id", "text")
    val got = StreamDedup.firstSeen(docs, "doc_id", "text")
      .select("first_id", "copies").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 3L), (7L, 1L)))
    val oracle = docs.groupBy(md5(col("text")))
      .agg(min("doc_id"), count(lit(1))).drop(md5(col("text")).toString)
    assert(StreamDedup.firstSeen(docs, "doc_id", "text").count() ===
      oracle.count())
  }
}
