package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals direct groupBy count on a skewed distribution") {
    // 90% of rows on one hot key
    val rows = (1 to 900).map(i => ("HOT", s"v$i")) ++
      (1 to 100).map(i => (s"k${i % 10}", s"w$i"))
    val df = rows.toDF("key", "value")
    val direct = df.groupBy("key").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "key", col("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === direct)
  }

  test("salted distinct count equals direct countDistinct, dupes collapse") {
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
    val df = rows.toDF("key", "value")
    val out = Skew.saltedCountDistinct(df, "key", "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }

  test("salt is deterministic and within range") {
    val df = Seq("a", "b", "c", "a").toDF("v")
    val s1 = Skew.withSalt(df, col("v"), 8).select("_salt").as[Int].collect()
    val s2 = Skew.withSalt(df, col("v"), 8).select("_salt").as[Int].collect()
    assert(s1.toSeq === s2.toSeq)
    s1.foreach(s => assert(s >= 0 && s < 8))
    assert(s1(0) === s1(3)) // same content → same salt
  }

  test("heavyHitters: ranks by count with deterministic tiebreaks and exact shares") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .map(k => (k, 1)).toDF("k", "x")
    val got = Skew.heavyHitters(df, Seq("k"), topN = 3)
      .as[(Long, String, Long, Double)].collect().toSeq
    // b/c tie at 3 -> key order breaks it; d (1 row) cut by topN
    assert(got === Seq(
      (1L, "a", 6L, math.rint(6.0 / 13 * 1e6) / 1e6),
      (2L, "b", 3L, math.rint(3.0 / 13 * 1e6) / 1e6),
      (3L, "c", 3L, math.rint(3.0 / 13 * 1e6) / 1e6)))
  }
}
