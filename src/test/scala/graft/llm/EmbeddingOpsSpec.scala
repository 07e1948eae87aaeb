package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 2.0f), 1),
    (1L, Array(3.0f, 4.0f), 1),
    (2L, Array(10.0f, 0.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("meanPoolQuantized: exact integer sums per (label, dim)") {
    val rows = EmbeddingOps.meanPoolQuantized(vecs, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows((1, 1)) === ((4000000L, 2L))) // 1.0 + 3.0
    assert(rows((1, 2)) === ((6000000L, 2L))) // 2.0 + 4.0
    assert(rows((2, 1)) === ((10000000L, 1L)))
  }

  test("meanPool assembles ordered centroids") {
    val cents = EmbeddingOps.meanPool(vecs, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents(1) === Seq(2.0, 3.0))
    assert(cents(2) === Seq(10.0, 0.0))
  }

  test("labelCohesion: tight class scores 1.0, spread class lower") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1),   // label 1: two identical directions
      (1L, Array(2.0f, 0.0f), 1),   //   → mean cos 1.0
      (2L, Array(1.0f, 0.0f), 2),   // label 2: orthogonal pair
      (3L, Array(0.0f, 1.0f), 2)    //   → cos(v, centroid) = cos 45° each
    ).toDF("vec_id", "embedding", "label")
    val rows = EmbeddingOps.labelCohesion(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(1) === ((2L, 1.0)))
    assert(rows(2)._1 === 2L)
    assert(math.abs(rows(2)._2 - 0.7071) < 1e-9)
  }

  test("labelOutliers: flags the vector pointing away from its label centroid") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1),    // aligned with the label-1 mass
      (1L, Array(1.0f, 0.1f), 1),
      (2L, Array(1.0f, -0.1f), 1),
      (3L, Array(-1.0f, 0.0f), 1),   // anti-aligned → mislabel flag
      (4L, Array(0.0f, 1.0f), 2),    // label 2 is clean
      (5L, Array(0.0f, 2.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = EmbeddingOps.labelOutliers(df, "vec_id", "label", "embedding", 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(0L -> false, 1L -> false, 2L -> false,
      3L -> true, 4L -> false, 5L -> false))
  }

  test("withL2Normalized: unit norm, zero vector stays zero") {
    val df = Seq(
      (0L, Array(3.0f, 4.0f)),
      (1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = EmbeddingOps.withL2Normalized(df, "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(out(0L).zip(Seq(0.6, 0.8)).forall { case (a, b) => math.abs(a - b) < 1e-7 })
    assert(out(1L) === Seq(0.0, 0.0))
  }
}
