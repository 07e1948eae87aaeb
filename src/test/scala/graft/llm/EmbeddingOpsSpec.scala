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

  test("dimSums / secondMoments: exact quantized moments on hand vectors") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(3.0f, -1.5f))
    ).toDF("vec_id", "embedding")
    val ds = EmbeddingOps.dimSums(df, "embedding", 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDecimal(2).longValue, r.getLong(3)))).toMap
    // milli: dim1 = 1000 + 3000; dim2 = 2000 + (-1500)
    assert(ds(1) === ((4000L, 1000L * 1000 + 3000L * 3000, 2L)))
    assert(ds(2) === ((500L, 2000L * 2000 + 1500L * 1500, 2L)))
    val sm = EmbeddingOps.secondMoments(df, "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getDecimal(2).longValue).toMap
    assert(sm((1L, 1L)) == 1000L * 1000 + 3000L * 3000)
    assert(sm((1L, 2L)) == 1000L * 2000 + 3000L * -1500L)
    assert(sm((2L, 2L)) == 2000L * 2000 + 1500L * 1500)
    assert(sm.size == 3) // upper triangle only
  }

  test("secondMoments raises on ragged vectors") {
    val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      EmbeddingOps.secondMoments(df, "embedding", 2).collect()
    }
    assert(ex.getMessage.contains("vector length"))
  }

  test("covarianceMatrix matches the closed form on correlated dims") {
    // dim2 = 2 * dim1 exactly: cov(1,2) = 2*var(1), cov(2,2) = 4*var(1)
    val df = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(2.0f, 4.0f)),
      (2L, Array(3.0f, 6.0f))
    ).toDF("vec_id", "embedding")
    val cov = EmbeddingOps.covarianceMatrix(df, "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // population var of {1,2,3} = 2/3
    assert(math.abs(cov((1L, 1L)) - 2.0 / 3) < 1e-6)
    assert(math.abs(cov((1L, 2L)) - 4.0 / 3) < 1e-6)
    assert(math.abs(cov((2L, 2L)) - 8.0 / 3) < 1e-6)
  }

  test("varianceShare: exact shares, dead dimension scores zero") {
    val df = Seq(
      (0L, Array(1.0f, 5.0f)),
      (1L, Array(3.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val vs = EmbeddingOps.varianceShare(df, "embedding", 2)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(vs(1) === ((1.0, 1.0))) // var of {1,3} = 1, all the variance
    assert(vs(2) === ((0.0, 0.0))) // constant dim
    val const = Seq((0L, Array(5.0f)), (1L, Array(5.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      EmbeddingOps.varianceShare(const, "embedding", 1).collect()
    }
    assert(ex.getMessage.contains("zero total variance"))
  }

  test("eigenSpectrum: diagonal and hand-diagonalizable matrices") {
    val diag = Seq((1L, 1L, 3.0), (1L, 2L, 0.0), (2L, 2L, 1.0))
      .toDF("i", "j", "cov")
    assert(EmbeddingOps.eigenSpectrum(diag, 2).toSeq == Seq(3.0, 1.0))
    // [[2,1],[1,2]] has eigenvalues 3 and 1
    val m = Seq((1L, 1L, 2.0), (1L, 2L, 1.0), (2L, 2L, 2.0))
      .toDF("i", "j", "cov")
    val eig = EmbeddingOps.eigenSpectrum(m, 2)
    assert(math.abs(eig(0) - 3.0) < 1e-9 && math.abs(eig(1) - 1.0) < 1e-9)
  }

  test("spectralSummary: uniform spectrum has full effective rank") {
    val (share, effRank, pr) =
      EmbeddingOps.spectralSummary(Array(1.0, 1.0, 1.0, 1.0), topK = 2)
    assert(share == 0.5 && math.abs(effRank - 4.0) < 1e-9 &&
      math.abs(pr - 4.0) < 1e-9)
    val (s1, e1, p1) =
      EmbeddingOps.spectralSummary(Array(5.0, 0.0, 0.0), topK = 1)
    assert(s1 == 1.0 && math.abs(e1 - 1.0) < 1e-9 && math.abs(p1 - 1.0) < 1e-9)
  }

  test("project: axis-aligned directions recover components; eigen parity") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(2.0f, 4.0f)),
      (2L, Array(3.0f, 6.0f))
    ).toDF("vec_id", "embedding")
    val axes = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val pr = EmbeddingOps.project(df, "vec_id", "embedding", axes)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pr((0L, 0L)) == 1.0 && pr((0L, 1L)) == 2.0)
    assert(pr((2L, 0L)) == 3.0 && pr((2L, 1L)) == 6.0)
    // variance along the dominant direction of the rank-1 data equals
    // the top eigenvalue of its covariance (10/3 here): the PCA loop
    // closes — covariance -> eigen -> project
    val cov = EmbeddingOps.covarianceMatrix(df, "embedding", 2)
    val eig = EmbeddingOps.eigenSpectrum(cov, 2)
    val u = Array(Array(1.0 / math.sqrt(5), 2.0 / math.sqrt(5)))
    val proj = EmbeddingOps.project(df, "vec_id", "embedding", u)
      .collect().map(_.getDouble(2))
    val mean = proj.sum / proj.length
    val popVar = proj.map(x => (x - mean) * (x - mean)).sum / proj.length
    assert(math.abs(popVar - eig(0)) < 1e-3, s"popVar $popVar vs eig ${eig(0)}")
  }

  test("knnLabelPurity: the mislabeled vector is out-voted by its neighborhood") {
    // two tight clusters on orthogonal axes; vec 5 sits in cluster A
    // but carries label 2 — its 3-NN are all label 1
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(1.0f, 0.05f), 1), (5L, Array(0.95f, 0.0f), 2),
      (10L, Array(0.0f, 1.0f), 2), (11L, Array(0.1f, 0.9f), 2),
      (12L, Array(0.05f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val rows = EmbeddingOps.knnLabelPurity(vecs, vecs, "vec_id",
        "embedding", "label", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(rows(5L) === ((0L, 0.0, true)), s"mislabel not flagged: $rows")
    assert(rows(0L) === ((2L, 0.666667, false))) // 5 is a neighbor w/ label 2
    assert(rows(10L)._3 === false)
  }

  private def ckaOf(rows: Seq[(Array[Float], Array[Float])]): Double = {
    val df = rows.toDF("x", "y")
    val r = EmbeddingOps.linearCka(df, "x", "y",
      rows.head._1.length, rows.head._2.length).head()
    assert(r.getAs[Long]("n") === rows.size.toLong)
    r.getAs[Double]("cka")
  }

  /** Straightforward reference CKA over the milli-quantized vectors —
    * an independent in-test implementation, not the engine's algebra.
    */
  private def refCka(xs: Seq[Array[Long]], ys: Seq[Array[Long]]): Double = {
    val n = xs.size
    def scatter(a: Seq[Array[Long]], b: Seq[Array[Long]]) = {
      val (da, db) = (a.head.length, b.head.length)
      Array.tabulate(da, db) { (i, j) =>
        val sab = a.indices.map(r => a(r)(i).toDouble * b(r)(j)).sum
        val (sa, sb) = (a.map(_(i)).sum.toDouble, b.map(_(j)).sum.toDouble)
        n * sab - sa * sb
      }
    }
    def frob2(m: Array[Array[Double]]) = m.flatten.map(c => c * c).sum
    frob2(scatter(xs, ys)) /
      math.sqrt(frob2(scatter(xs, xs)) * frob2(scatter(ys, ys)))
  }

  test("linearCka: self-alignment is exactly 1; scale invariance on the " +
    "milli grid") {
    // milli-grid values so quantization is lossless and 2x stays exact
    val vs = Seq(Array(0.25f, 0.5f, -0.125f), Array(0.125f, -0.25f, 0.5f),
      Array(-0.5f, 0.125f, 0.25f), Array(0.375f, 0.25f, -0.25f))
    assert(math.abs(ckaOf(vs.map(v => (v, v))) - 1.0) < 1e-12)
    val scaled = vs.map(v => (v, v.map(_ * 2.0f)))
    assert(math.abs(ckaOf(scaled) - 1.0) < 1e-12)
  }

  test("linearCka matches an independent reference on a deterministic " +
    "cloud; damage lands strictly inside (0, 1)") {
    val xs = Seq.tabulate(40)(r => Array.tabulate(5)(i =>
      ((r * 7919 + i * 104729) % 2000 - 1000).toFloat / 1000.0f))
    // y: x with one dimension zeroed and another coarsened
    val ys = xs.map(v => Array(v(0), 0.0f,
      math.floor(v(2) * 4) .toFloat / 4.0f, v(3), v(4)))
    val got = ckaOf(xs.zip(ys))
    val ref = refCka(
      xs.map(_.map(v => math.floor(v * 1000.0).toLong)),
      ys.map(_.map(v => math.floor(v * 1000.0).toLong)))
    assert(math.abs(got - ref) < 1e-9, s"got $got, ref $ref")
    assert(got > 0.0 && got < 1.0)
  }

  test("linearCka: a constant representation has no defined alignment") {
    val vs = Seq.tabulate(4)(r =>
      (Array.tabulate(3)(i => (r + i).toFloat / 8.0f), Array(0.5f, 0.5f)))
    val r = EmbeddingOps.linearCka(vs.toDF("x", "y"), "x", "y", 3, 2).head()
    assert(r.isNullAt(r.fieldIndex("cka")))
  }
}
