package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed grid equals one-shot; stable stream near 0, shifted stream flags") {
    val dir = java.nio.file.Files.createTempDirectory("drift_spec").toFile
    val base = s"${dir.getPath}/base"
    val (curA, curB) = (s"${dir.getPath}/curA", s"${dir.getPath}/curB")
    val ref = (1 to 200).map(i => (i % 10) * 10L).toDF("v")
    DriftStream.writeBaseline(ref, "v", base, nBins = 10)

    // stable stream: same distribution folded in two batches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val items = input.toDF().toDF("v")
    def runOnce(path: String): Unit = {
      val q = DriftStream.run(items, "v", base, path,
        s"${dir.getPath}/ckpt_${path.split('/').last}",
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    input.addData((1 to 100).map(i => (i % 10) * 10L): _*)
    runOnce(curA)
    input.addData((1 to 100).map(i => (i % 10) * 10L): _*)
    runOnce(curA)
    val stable = DriftStream.psi(spark, base, curA).collect().head
    assert(stable.getLong(0) === 200L && stable.getLong(1) === 200L)
    assert(math.abs(stable.getDouble(2)) < 0.01, s"stable psi ${stable.getDouble(2)}")

    // streamed grid ≡ one-shot fold of the concatenated batches
    DriftStream.applyBatch((1 to 200).map(i => (i % 10) * 10L).toDF("v"),
      "v", base, curB)
    val a = spark.read.parquet(curA).orderBy("bin").collect().toSeq
    val b = spark.read.parquet(curB).orderBy("bin").collect().toSeq
    assert(a === b, "micro-batched fold must equal the one-shot grid")

    // shifted stream: everything at the top of the range (and beyond)
    val curC = s"${dir.getPath}/curC"
    DriftStream.applyBatch((1 to 200).map(_ => 95L).toDF("v"), "v", base, curC)
    val shifted = DriftStream.psi(spark, base, curC).collect().head.getDouble(2)
    assert(shifted > 1.0, s"shifted psi $shifted must flag")
  }

  test("grid geometry comes from the baseline file — non-default nBins round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("drift_nbins").toFile
    val (base, cur) = (s"${dir.getPath}/base", s"${dir.getPath}/cur")
    // 4 bins over 0..99 (width (99+4) div 4 = 25): readers recover
    // nBins=4 from the -3 marker row; no caller re-supplies it (the old
    // mismatch bug mis-clamped the top bin)
    DriftStream.writeBaseline((0 until 100).map(_.toLong).toDF("v"), "v", base,
      nBins = 4)
    DriftStream.applyBatch((0 until 100).map(_.toLong).toDF("v"), "v", base, cur)
    val grid = spark.read.parquet(cur).orderBy("bin").collect()
    assert(grid.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(grid.map(_.getLong(1)).toSeq === Seq(25L, 25L, 25L, 25L))
    val r = DriftStream.psi(spark, base, cur).collect().head
    assert(r.getLong(0) === 100L && r.getLong(1) === 100L)
    assert(math.abs(r.getDouble(2)) < 1e-9, s"identical grids psi ${r.getDouble(2)}")
  }

  test("a replayed batch id is skipped — counts are not double-folded") {
    val dir = java.nio.file.Files.createTempDirectory("drift_replay").toFile
    val (base, cur) = (s"${dir.getPath}/base", s"${dir.getPath}/cur")
    DriftStream.writeBaseline((1 to 100).map(_.toLong).toDF("v"), "v", base)
    DriftStream.applyBatch(Seq(5L, 50L).toDF("v"), "v", base, cur,
      batchId = 0L, queryId = "q1")
    DriftStream.applyBatch(Seq(5L, 50L).toDF("v"), "v", base, cur,
      batchId = 0L, queryId = "q1") // at-least-once replay → no-op
    val n = DriftStream.psi(spark, base, cur).collect().head.getLong(1)
    assert(n === 2L, s"replay double-folded: $n")
  }

  test("ks: hand-computed binned D over the same grids") {
    val dir = java.nio.file.Files.createTempDirectory("drift_ks").toFile
    val (base, cur) = (s"${dir.getPath}/base", s"${dir.getPath}/cur")
    // baseline 0..99 uniform → 10 bins × 10; current all in bin 0:
    // cum devs (in 100·20 units) peak at bin 0: |10·20 − 20·100| = 1800
    DriftStream.writeBaseline((0 until 100).map(_.toLong).toDF("v"), "v",
      base, nBins = 10)
    DriftStream.applyBatch((1 to 20).map(_ => 3L).toDF("v"), "v", base, cur)
    val r = DriftStream.ks(spark, base, cur).collect().head
    assert(r.getAs[Long]("n_baseline") === 100L)
    assert(r.getAs[Long]("n_current") === 20L)
    assert(r.getAs[Long]("d_num") === 1800L)
    assert(r.getAs[Long]("d_bin") === 0L)
    assert(math.abs(r.getAs[Double]("d") - 0.9) < 1e-9)
  }

  test("ks: identical distributions give D = 0; ties pick the lowest bin") {
    val dir = java.nio.file.Files.createTempDirectory("drift_ks0").toFile
    val (base, cur) = (s"${dir.getPath}/base", s"${dir.getPath}/cur")
    DriftStream.writeBaseline((0 until 100).map(_.toLong).toDF("v"), "v",
      base, nBins = 10)
    DriftStream.applyBatch((0 until 100).map(_.toLong).toDF("v"), "v",
      base, cur)
    val r = DriftStream.ks(spark, base, cur).collect().head
    assert(r.getAs[Long]("d_num") === 0L)
    assert(r.getAs[Long]("d_bin") === 0L) // all bins tie at 0 → min bin
    assert(r.getAs[Double]("d") === 0.0)
  }
}
