package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the bit-by-bit reference on random and edge inputs") {
    val rnd = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0L),
      (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL), (-1L, 7L)) ++
      (1 to 200).map(_ => (rnd.nextLong(), rnd.nextLong()))
    cases.foreach { case (x, y) =>
      assert(ZOrder.interleave(x, y) === refInterleave(x & 0xFFFFFFFFL, y & 0xFFFFFFFFL),
        s"($x, $y)")
    }
  }

  test("codegen path (DataFrame projection) agrees with the Scala eval") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 100).map(_ => (rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.z(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === ZOrder.interleave(x, y)) }
  }

  test("z_interleave is SQL-reachable via GraftExtensions and stays codegen'd") {
    graft.plans.GraftExtensions.register(spark)
    val one = spark.sql("SELECT z_interleave(5L, 3L) AS z").as[Long].head()
    assert(one === ZOrder.interleave(5L, 3L))
    val rangeDf = spark.range(100).selectExpr("z_interleave(id, id + 1L) AS z")
    // "*(1)" is the WholeStageCodegen marker in the plan string
    assert(rangeDf.queryExecution.executedPlan.toString
      .contains("*(1) Project"), rangeDf.queryExecution.executedPlan)
    val got = rangeDf.as[Long].collect()
    (0 until 100).foreach { i =>
      assert(got(i) === ZOrder.interleave(i.toLong, i + 1L))
    }
  }

  test("null in, null out") {
    val got = Seq((Some(1L), Option.empty[Long]), (Some(2L), Some(3L)))
      .toDF("x", "y")
      .select(ZOrder.z(col("x"), col("y")).as("z"))
      .as[Option[Long]].collect().toSeq
    assert(got === Seq(None, Some(ZOrder.interleave(2L, 3L))))
  }

  test("cluster yields disjoint per-partition z ranges (files prune on both dims)") {
    val rnd = new scala.util.Random(9)
    val df = (1 to 4000).map(_ =>
      (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)).toDF("x", "y")
    val clustered = ZOrder.cluster(df, col("x"), col("y"), numPartitions = 8)
    val ranges = clustered
      .select(ZOrder.z(col("x"), col("y")).as("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .as[(Int, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"overlap: $a vs $b")
      case _ =>
    }
  }
}
