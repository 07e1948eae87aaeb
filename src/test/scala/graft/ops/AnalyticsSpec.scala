package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the analytics surface that the DuckDB oracle can't
  * check (approximate sketches) plus plan audits for the new families —
  * the shapes the 100 TB design depends on.
  */
class AnalyticsSpec extends SparkSpec {

  test("approx_count_distinct: within rsd bound of the exact count") {
    val df = spark.range(200000).selectExpr("id % 37 AS g", "id % 50021 AS k")
    val got = df.groupBy("g")
      .agg(approx_count_distinct(col("k"), rsd = 0.02).as("approx"),
        countDistinct(col("k")).as("exact"))
      .collect()
    assert(got.length === 37)
    got.foreach { r =>
      val (approx, exact) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
      // 2% rsd → 5σ margin of 10%; HLL at this cardinality is far tighter
      assert(math.abs(approx - exact) <= exact * 0.10,
        s"g=${r.get(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx: true rank of the sketch's answer lands within " +
      "the 1%-accuracy bound") {
    val df = spark.range(100000)
      .selectExpr("id % 3 AS g", "CAST((id * 48271) % 99991 AS DOUBLE) AS x")
    val ap = df.groupBy("g")
      .agg(expr("percentile_approx(x, array(0.5D, 0.99D), 100)").as("ap"),
        count(lit(1)).as("n"))
    val got = df.join(ap, "g")
      .groupBy("g").agg(
        sum(when(col("x") <= col("ap")(0), 1L).otherwise(0L)).as("r50"),
        sum(when(col("x") <= col("ap")(1), 1L).otherwise(0L)).as("r99"),
        first("n").as("n"))
      .collect()
    assert(got.length === 3)
    got.foreach { r =>
      val (r50, r99, n) = (r.getAs[Long]("r50"), r.getAs[Long]("r99"),
        r.getAs[Long]("n"))
      assert(r50 * 100 >= n * 48 && r50 * 100 <= n * 52,
        s"g=${r.get(0)}: p50 rank $r50 of $n")
      assert(r99 * 100 >= n * 97, s"g=${r.get(0)}: p99 rank $r99 of $n")
    }
  }

  test("rollup/cube/grouping-sets: one Expand + one aggregate exchange, no join") {
    val li = spark.range(1000).selectExpr(
      "CAST(id % 3 AS STRING) AS a", "CAST(id % 5 AS STRING) AS b", "id AS v")
    val plan = li.cube("a", "b").agg(sum("v").as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Join"), s"multi-level agg must not plan a join:\n$plan")
    // a single shuffle on the expanded grouping keys
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
  }

  test("pivot with explicit values: single aggregate pass, no per-value scan") {
    val df = spark.range(1000).selectExpr(
      "CAST(id % 3 AS STRING) AS g", "CAST(id % 2 AS STRING) AS p", "id AS v")
    val plan = df.groupBy("g").pivot("p", Seq("0", "1")).agg(sum("v"))
      .queryExecution.executedPlan.toString
    // Spark pivots as two chained aggregates — groupBy(g,p) then a
    // pivotfirst on g — both partial+final; 2 shuffles max, no scan
    // per pivot value and no join
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      s"pivot must stay aggregation-shaped:\n$plan")
    assert(!plan.contains("Union") && !plan.contains("Join"),
      s"no per-pivot-value union/join of scans:\n$plan")
    assert("pivotfirst".r.findAllIn(plan).length === 2, // partial+final
      s"expected the single pivotfirst aggregate pair:\n$plan")
  }

  test("window breadth shares one sort across functions on the same frame spec") {
    val df = spark.range(1000).selectExpr("id % 7 AS g", "id AS v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v"))
    val plan = df.select(col("v"),
        ntile(4).over(w).as("nt"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .queryExecution.executedPlan.toString
    // all three functions evaluate in Window node(s) fed by ONE sort
    assert("Sort ".r.findAllIn(plan).length === 1,
      s"same-frame window functions must share a sort:\n$plan")
  }
}
