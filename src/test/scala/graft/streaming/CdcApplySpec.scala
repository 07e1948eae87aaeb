package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("latestChanges keeps one row per key: max (ts, id)") {
    val changes = Seq(
      (1L, ts(1), 10L, 1.0, false), (1L, ts(5), 11L, 2.0, false),
      (1L, ts(5), 12L, 3.0, false), (2L, ts(2), 13L, 4.0, false))
      .toDF("k", "ts", "id", "v", "del")
    val got = CdcApply.latestChanges(changes, Seq("k"), "ts", "id")
      .orderBy("k").as[(Long, Timestamp, Long, Double, Boolean)].collect()
    assert(got.map(r => (r._1, r._3)).toSeq === Seq((1L, 12L), (2L, 13L)))
  }

  test("multi-batch stream: later batches overwrite, deletes remove, state survives batches") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_spec").toFile
    val base = s"${dir.getPath}/state"
    val ckpt = s"${dir.getPath}/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double, Boolean)]
    val changes = input.toDF().toDF("k", "ts", "id", "v", "del")

    def runOnce(): Unit = {
      val q = CdcApply.run(changes, base, ckpt, Seq("k"), "ts", "id", "del",
        Trigger.AvailableNow())
      q.awaitTermination()
    }
    def snapshot(): Map[Long, (Long, Double)] =
      spark.read.parquet(base).as[(Long, Timestamp, Long, Double)]
        .collect().map(r => r._1 -> (r._3, r._4)).toMap

    // batch 1: two inserts (k=1 has two changes; the later one wins)
    input.addData((1L, ts(1), 1L, 10.0, false), (1L, ts(2), 2L, 20.0, false),
      (2L, ts(1), 3L, 30.0, false))
    runOnce()
    assert(snapshot() === Map(1L -> (2L, 20.0), 2L -> (3L, 30.0)))

    // batch 2: update k=1, delete k=2, insert k=3
    input.addData((1L, ts(9), 4L, 40.0, false), (2L, ts(9), 5L, 0.0, true),
      (3L, ts(9), 6L, 60.0, false))
    runOnce()
    assert(snapshot() === Map(1L -> (4L, 40.0), 3L -> (6L, 60.0)))

    // batch 3: delete-then-reinsert of k=1 within one batch — latest wins
    input.addData((1L, ts(10), 7L, 0.0, true), (1L, ts(11), 8L, 80.0, false))
    runOnce()
    assert(snapshot() === Map(1L -> (8L, 80.0), 3L -> (6L, 60.0)))
  }
}
