package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
    (2L, Seq(0.002f, -0.004f)),
    (3L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("codes are in [-127, 127] with the max component at ±127") {
    val q = Quant.quantizeInt8(vecs, "embedding")
    val r1 = q.filter(col("vec_id") === 1).select("qvec")
      .collect().head.getSeq[Int](0)
    assert(r1 === Seq(127, -63, 32, 0)) // -0.5→-63.5→floor(-63.0)... half-up
    val all = q.select(explode(col("qvec")).as("c")).as[Int].collect()
    assert(all.forall(c => c >= -127 && c <= 127))
  }

  test("all-zero vectors quantize to zero codes, not NaN/null") {
    val r = Quant.quantizeInt8(vecs, "embedding")
      .filter(col("vec_id") === 3)
      .select("qvec").collect().head.getSeq[Int](0)
    assert(r === Seq(0, 0, 0))
  }

  test("dequantization error is bounded by half a quantization step") {
    val q = Quant.quantizeInt8(vecs, "embedding")
      .withColumn("deq", Quant.dequantize(col("qvec"), col("amax")))
      .withColumn("err", aggregate(
        zip_with(col("embedding"), col("deq"),
          (a, b) => abs(a.cast("double") - b)),
        lit(0.0d), (acc, x) => greatest(acc, x)))
    val rows = q.select("vec_id", "amax", "err")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (_, amax, err) =>
      assert(err <= amax / 254.0 + 1e-12, s"err $err exceeds half-step for amax $amax")
    }
  }

  test("integer dot product matches the manual computation") {
    val df = Seq((Seq(1, -2, 3), Seq(4, 5, -6))).toDF("a", "b")
    val d = df.select(Quant.qdot(col("a"), col("b")).as("d"))
      .as[Long].collect().head
    assert(d === (4 - 10 - 18))
  }
}
