package graft.streaming

import graft.SparkSpec
import graft.llm.Sketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch stream grid is bit-identical to the one-shot batch grid") {
    val dir = java.nio.file.Files.createTempDirectory("cms_spec").toFile
    val grid = s"${dir.getPath}/grid"
    val ckpt = s"${dir.getPath}/ckpt"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val items = input.toDF().toDF("k")

    def runOnce(): Unit = {
      val q = SketchStream.run(items, "k", grid, ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    input.addData("x", "y", "x", "z")
    runOnce()
    input.addData("y", "y", "w")
    runOnce()
    input.addData("x")
    runOnce()

    val streamed = spark.read.parquet(grid)
      .orderBy("seed", "bucket").collect().toSeq
    val oneShot = Sketch.cmsCounters(
        Seq("x", "y", "x", "z", "y", "y", "w", "x").toDF("k"), "k")
      .orderBy("seed", "bucket").collect().toSeq
    assert(streamed === oneShot)

    // and the estimates over the maintained grid are the true counts
    val est = Sketch.cmsEstimate(spark.read.parquet(grid),
        Seq("x", "y", "z", "w", "absent").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("x" -> 3L, "y" -> 3L, "z" -> 1L, "w" -> 1L,
      "absent" -> 0L))
  }

  test("a replayed foreachBatch id is skipped, not double-counted") {
    val dir = java.nio.file.Files.createTempDirectory("cms_replay").toFile
    val grid = s"${dir.getPath}/grid"
    SketchStream.applyBatch(Seq("a", "b").toDF("k"), "k", grid, batchId = 0L)
    // at-least-once replay of the same batch (crash between swap and
    // checkpoint commit): must be a no-op, addition is not idempotent
    SketchStream.applyBatch(Seq("a", "b").toDF("k"), "k", grid, batchId = 0L)
    SketchStream.applyBatch(Seq("a").toDF("k"), "k", grid, batchId = 1L)
    assert(SketchStream.lastAppliedBatchId(grid,
      spark.sparkContext.hadoopConfiguration) === 1L)
    val est = Sketch.cmsEstimate(spark.read.parquet(grid),
        Seq("a", "b").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 2L, "b" -> 1L))
  }

  test("applyBatch on a missing grid bootstraps; staging never lingers") {
    val dir = java.nio.file.Files.createTempDirectory("cms_boot").toFile
    val grid = s"${dir.getPath}/grid"
    SketchStream.applyBatch(Seq("a", "b").toDF("k"), "k", grid)
    SketchStream.applyBatch(Seq("a").toDF("k"), "k", grid)
    assert(!new java.io.File(s"$grid.staging").exists())
    val est = Sketch.cmsEstimate(spark.read.parquet(grid),
        Seq("a", "b").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 2L, "b" -> 1L))
  }
}
