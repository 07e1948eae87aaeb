package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poisson thresholds are ascending, in range, and mean-1") {
    val ts = Bootstrap.poissonThresholds
    assert(ts == ts.sorted && ts == ts.distinct)
    assert(ts.head > 0 && ts.last < 65536)
    // mean weight over the full bucket grid ≈ 1 (the Poisson(1) mean,
    // up to the 16-bit tail truncation)
    val mean = (0 until 65536).map(b => ts.count(_ <= b)).sum / 65536.0
    assert(math.abs(mean - 1.0) < 1e-3, s"mean weight $mean")
  }

  test("poissonWeight matches its SQL face over every bucket") {
    val grid = spark.range(65536L).select(col("id").as("bkt"))
      .withColumn("w_col", Bootstrap.poissonWeight(col("bkt")))
      .withColumn("w_sql", expr(Bootstrap.poissonWeightSql("bkt")).cast("long"))
    assert(grid.filter(col("w_col") =!= col("w_sql")).count() == 0L)
    val byW = grid.groupBy("w_col").count().as[(Long, Long)].collect().toMap
    // weight-0 bucket count is exactly the first threshold
    assert(byW(0L) == Bootstrap.poissonThresholds.head)
    assert(byW.keys.max == Bootstrap.poissonThresholds.size.toLong)
  }

  test("PoissonWeightMd5 kernel ≡ poissonWeight(replicateBucket(id, rep)) " +
    "over a dense (id, rep) grid") {
    val grid = spark.range(500L).select(col("id"))
      .crossJoin(spark.range(7L).select(col("id").as("rep")))
      .withColumn("w_col",
        Bootstrap.poissonWeight(
          Bootstrap.replicateBucket(col("id"), col("rep"))))
      .withColumn("w_native",
        graft.functions.PoissonWeightMd5.weight(
          concat(col("id").cast("string"), lit("_"),
            col("rep").cast("string")),
          Bootstrap.poissonThresholds))
    assert(grid.filter(col("w_col") =!= col("w_native")).count() == 0L)
    // null key → null weight, like the column form
    val n = spark.sql("SELECT CAST(NULL AS STRING) AS k")
      .select(graft.functions.PoissonWeightMd5.weight(col("k"),
        Bootstrap.poissonThresholds).as("w"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("replicateStats shapes and determinism") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "b", 40L)).toDF("id", "g", "v")
    val r1 = Bootstrap.replicateStats(df, "id", Seq("v"), b = 8,
      groupCols = Seq("g")).orderBy("g", "rep")
    assert(r1.count() == 16L)
    val rows = r1.collect()
    val r2 = Bootstrap.replicateStats(df, "id", Seq("v"), b = 8,
      groupCols = Seq("g")).orderBy("g", "rep").collect()
    assert(rows.sameElements(r2))
    // weights vary across replicates (not a constant resample)
    assert(rows.map(_.getLong(2)).distinct.length > 1)
  }

  test("replicateStats raises on NULL values") {
    val df = Seq((1L, Some(10L)), (2L, None)).toDF("id", "v")
    val ex = intercept[Exception] {
      Bootstrap.replicateStats(df, "id", Seq("v"), b = 4).collect()
    }
    assert(ex.getMessage.contains("NULL value v"))
  }

  test("percentileCI selects the documented order statistics") {
    val reps = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("rep", "s")
    val ci = Bootstrap.percentileCI(reps, "s").collect().head
    // b=10: lo idx ⌈10·50/2000⌉=1, mid ⌈10/2⌉=5, hi ⌈10·1950/2000⌉=10
    assert(ci.getAs[Long]("n_rep") == 10L)
    assert(ci.getAs[Double]("point") == 5.0)
    assert(ci.getAs[Double]("ci_lo") == 1.0)
    assert(ci.getAs[Double]("ci_hi") == 10.0)
    intercept[IllegalArgumentException] {
      Bootstrap.percentileCI(reps, "s", alphaPermille = 0)
    }
  }

  test("meanCI degenerates to the constant on a constant column") {
    val df = (1L to 50L).map(i => (i, 7L)).toDF("id", "v")
    val ci = Bootstrap.meanCI(df, "id", "v", b = 20).collect().head
    assert(ci.getAs[Double]("point") == 7.0)
    assert(ci.getAs[Double]("ci_lo") == 7.0)
    assert(ci.getAs[Double]("ci_hi") == 7.0)
  }

  test("meanCI interval brackets the true mean and widens with alpha") {
    val df = (1L to 400L).map(i => (i, (i % 100) + 1L)).toDF("id", "v")
    val w = Bootstrap.meanCI(df, "id", "v", b = 100).collect().head
    val lo = w.getAs[Double]("ci_lo"); val hi = w.getAs[Double]("ci_hi")
    assert(lo < hi && lo < 51.0 && hi > 51.0, s"95% CI [$lo, $hi]")
    val n = Bootstrap.meanCI(df, "id", "v", b = 100, alphaPermille = 500)
      .collect().head
    assert(n.getAs[Double]("ci_lo") >= lo &&
      n.getAs[Double]("ci_hi") <= hi)
  }

  test("ratioCI is exact when the ratio is weight-invariant") {
    val df = (1L to 60L).map(i => (i, 6L, 3L)).toDF("id", "num", "den")
    val ci = Bootstrap.ratioCI(df, "id", "num", "den", b = 25)
      .collect().head
    assert(ci.getAs[Double]("point") == 2.0)
    assert(ci.getAs[Double]("ci_lo") == 2.0)
    assert(ci.getAs[Double]("ci_hi") == 2.0)
  }

  test("diffMeansCI is zero across identical constant slices") {
    val df = (1L to 80L).map(i =>
      (i, if (i <= 40) "a" else "b", 5L)).toDF("id", "g", "v")
    val ci = Bootstrap.diffMeansCI(df, "id", "v", "g", "a", "b", b = 15)
      .collect().head
    assert(ci.getAs[Long]("n_rep") == 15L)
    assert(ci.getAs[Double]("point") == 0.0)
    assert(ci.getAs[Double]("ci_lo") == 0.0)
    assert(ci.getAs[Double]("ci_hi") == 0.0)
  }
}
