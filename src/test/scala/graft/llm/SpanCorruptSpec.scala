package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 120L).map(i => (i, 3L + i)).toDF("id", "n")

  test("spans are disjoint, in range, and ordered per doc") {
    val spans = SpanCorrupt.maskSpans(docs, "id", "n")
      .orderBy("id", "span_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = spans.groupBy(_._1)
    val nOf = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until ss.length).toSeq)
      sorted.foreach { case (_, _, start, len) =>
        assert(len >= 1 && start >= 0 && start + len <= nOf(id),
          s"doc $id span out of range: start=$start len=$len n=${nOf(id)}")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          // STRICT separation: adjacent spans must never touch, or two
          // span_ids would merge into one effective masked region
          assert(s1 + l1 < s2, s"doc $id touching spans at $s1+$l1 vs $s2")
        case _ =>
      }
    }
  }

  test("mask budget: ratio near 15%, mean span length near 3") {
    val big = Seq((1L, 1000L), (2L, 997L), (3L, 1201L)).toDF("id", "n")
    val st = SpanCorrupt.maskStats(big, "id", "n").collect()
    st.foreach { r =>
      val ratio = r.getAs[Double]("mask_ratio")
      assert(ratio > 0.10 && ratio < 0.16, s"ratio $ratio")
      val meanLen = r.getAs[Long]("n_masked").toDouble /
        r.getAs[Long]("n_spans")
      assert(meanLen > 2.0 && meanLen <= 4.0, s"mean span $meanLen")
    }
  }

  test("deterministic across runs; tiny docs emit zero spans") {
    val a = SpanCorrupt.maskSpans(docs, "id", "n")
      .orderBy("id", "span_id").collect()
    val b = SpanCorrupt.maskSpans(docs, "id", "n")
      .orderBy("id", "span_id").collect()
    assert(a.sameElements(b))
    val tiny = Seq((1L, 3L), (2L, 0L), (3L, 4L)).toDF("id", "n")
    val spans = SpanCorrupt.maskSpans(tiny, "id", "n").collect()
    assert(spans.forall(_.getLong(0) == 3L))
    val st = SpanCorrupt.maskStats(tiny, "id", "n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(st(1L) === ((0L, 0L, 0.0)))
    assert(st(2L) === ((0L, 0L, 0.0))) // empty doc: 0.0, never NaN
    assert(st(3L)._1 >= 1L)
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      SpanCorrupt.maskSpans(docs, "id", "n", ratioPermille = 0)
    }
    intercept[IllegalArgumentException] {
      SpanCorrupt.maskSpans(docs, "id", "n", meanLen = 0)
    }
  }
}
