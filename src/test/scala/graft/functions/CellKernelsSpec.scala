package graft.functions

import graft.SparkSpec
import graft.llm.Ann
import org.apache.spark.sql.functions._

/** Bit-parity pins for the r14 literal-quantizer kernels against the
  * join-based formulations they replace inside Ivf/Quant/CurateStream.
  */
class CellKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def l2(v: Seq[Double]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))

  test("CellSims + round/argmax fold ≡ broadcast-join assign (max_by on " +
    "(round(sim,9), -cell)), including exact ties") {
    val rnd = new scala.util.Random(7)
    // duplicate centroids force exact sim ties — the lowest cell must win
    val base = IndexedSeq.fill(6)(IndexedSeq.fill(8)(rnd.nextDouble() * 2 - 1))
    val cents = (base ++ base.take(2)).zipWithIndex.map { case (c, i) => (i, c) }
    val vecs = (1 to 300).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "vec")

    // reference: the join-based argmax exactly as Ivf.assign wrote it
    val centsDf = cents.toDF("cell", "centroid")
    val ref = df
      .select(col("id"), col("vec"), Ann.l2norm(col("vec")).as("_vn"))
      .join(broadcast(centsDf.withColumn("_cn", Ann.l2norm(col("centroid")))))
      .withColumn("_sim", round(
        Ann.dot(col("vec"), col("centroid")) / (col("_vn") * col("_cn")), 9))
      .groupBy(col("id"))
      .agg(max_by(col("cell"),
        struct(col("_sim"), (-col("cell")).as("_nc"))).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    val table = Map(0 -> cents.map { case (i, c) => (i, c, l2(c)) })
    val cs = CellSims.sims(col("vec"), lit(0), table)
    // the same fold Ivf.argmaxFold uses (private there; shape replicated)
    val got = df.withColumn("_cs", cs)
      .select(col("id"),
        aggregate(
          zip_with(col("_cs.cells"), col("_cs.sims"),
            (cc, ss) => struct(round(ss, 9), cc)
              .cast("struct<col1:double,col2:int>")),
          struct(lit(null).cast("double"), lit(null).cast("int")),
          (acc, p) => {
            val sim = p.getField("col1")
            val adopt = (acc.getField("col2").isNull && sim.isNotNull) ||
              sim > acc.getField("col1") ||
              (isnan(sim) && !isnan(acc.getField("col1")))
            when(adopt, p).otherwise(acc)
          },
          acc => acc.getField("col2")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    assert(got === ref)
  }

  test("CellSims null semantics: missing group → null; null vector → null") {
    val table = Map(0 -> IndexedSeq((0, IndexedSeq(1.0, 0.0), 1.0)))
    val df = Seq((1L, Array(1.0f, 0.5f), 0), (2L, Array(1.0f, 0.5f), 9),
        (3L, null.asInstanceOf[Array[Float]], 0))
      .toDF("id", "vec", "grp")
    val got = df.select(col("id"),
        CellSims.sims(col("vec"), col("grp"), table).as("cs"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("CellDists ≡ the zip_with subDist fold, bit for bit") {
    val rnd = new scala.util.Random(11)
    val cents = (0 until 5).map(i =>
      (i, IndexedSeq.fill(4)(rnd.nextDouble() * 2 - 1)))
    val df = (1 to 100).map(i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2 - 1))).toDF("id", "vec")
    val table = Map(0 -> cents.map { case (i, c) => (i, c) }.toIndexedSeq)
    val refCols = cents.map { case (i, c) =>
      aggregate(zip_with(col("vec"), typedLit(c),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0d), (acc, x) => acc + x).as(s"d$i")
    }
    val rows = df
      .withColumn("_cd", CellDists.dists(col("vec"), lit(0), table))
      .select(col("_cd.dists").as("dists") +: refCols: _*)
      .collect()
    rows.foreach { r =>
      val dists = r.getSeq[Double](0)
      cents.indices.foreach { i =>
        assert(java.lang.Double.doubleToLongBits(dists(i)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(i + 1)))
      }
    }
  }

  test("SetOverlapBroadcast ≡ arrays_overlap against the literal set") {
    val set = Array("a b c", "x y z", "q r s")
    val bc = spark.sparkContext.broadcast(set.map(_.getBytes("UTF-8")))
    val df = Seq(
      (1L, Array("a b c", "m n o")), // overlap
      (2L, Array("m n o", "p q r")), // no overlap
      (3L, Array.empty[String]),     // empty → false
      (4L, null.asInstanceOf[Array[String]]) // null → null
    ).toDF("id", "arr")
    val got = df.select(col("id"),
        SetProbe.overlapBroadcast(bc, col("arr")).as("o"),
        arrays_overlap(col("arr"), typedLit(set.toSeq)).as("ref"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getBoolean(1)),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toSet
    got.foreach { case (_, o, ref) => assert(o === ref) }
    assert(got.map(t => t._1 -> t._2).toMap ===
      Map(1L -> Some(true), 2L -> Some(false), 3L -> Some(false), 4L -> None))
  }
}
