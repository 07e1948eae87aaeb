package graft.core

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with zero Exchange (no shuffle)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"file_$i")).toDF("id", "file_name")
      val b = (500 to 1500).map(i => (i.toLong, s"fac_${i % 7}")).toDF("id", "facility_id")
      Bucketing.writeBucketed(a, "bkt_sync", Seq("id"), numBuckets = 4)
      Bucketing.writeBucketed(b, "bkt_log", Seq("id"), numBuckets = 4)

      val joined = Bucketing.bucketedJoin(spark, "bkt_sync", "bkt_log", Seq("id"))
      assert(joined.count() === 501)

      val executed = joined.queryExecution.executedPlan
      val exchanges = executed.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected shuffle-free bucketed join, found: ${exchanges.map(_.nodeName)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_sync")
      spark.sql("DROP TABLE IF EXISTS bkt_log")
    }
  }

  test("bucketed scan prunes columns and pushes filters like plain parquet") {
    val df = (1 to 100).map(i => (i.toLong, s"n$i", i * 1.5)).toDF("id", "name", "v")
    Bucketing.writeBucketed(df, "bkt_probe", Seq("id"), numBuckets = 2)
    try {
      val out = spark.table("bkt_probe").filter(col("id") > 90).select("id", "name")
      assert(out.count() === 10)
      val scan = out.queryExecution.executedPlan.toString()
      assert(scan.contains("SelectedBucketsCount") || scan.contains("Scan"),
        "bucketed file scan in plan")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_probe")
  }
}
