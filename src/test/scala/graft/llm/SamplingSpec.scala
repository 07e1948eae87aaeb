package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = spark.range(20000).selectExpr(
    "id AS doc_id", "concat('c', id % 7) AS cls")

  test("hashSplit: proportions track weights, labels partition the corpus, deterministic") {
    val split = Sampling.hashSplit(corpus, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel.values.sum === 20000L)
    assert(math.abs(byLabel("train") - 16000L) < 400, byLabel)
    assert(math.abs(byLabel("val") - 2000L) < 200, byLabel)
    // pure function of the id: a second run assigns identically
    val again = Sampling.hashSplit(corpus, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("sampleFraction: pure filter, nested fractions, stable membership") {
    val s10 = Sampling.sampleFraction(corpus, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val s30 = Sampling.sampleFraction(corpus, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(math.abs(s10.size - 2000) < 200, s10.size)
    // consistent hashing: a smaller fraction is a SUBSET of a larger one
    assert(s10.subsetOf(s30))
  }

  test("stratifiedSample: exactly k lowest-hash docs per class, ranks 1..k") {
    val got = Sampling.stratifiedSample(corpus, "doc_id", "cls", 3)
    val perClass = got.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perClass.size === 7 && perClass.values.forall(_ === 3L))
    val ranks = got.filter(col("cls") === "c0")
      .select("sample_rank").as[Int].collect().sorted
    assert(ranks.toSeq === Seq(1, 2, 3))
  }
}
