package graft.reports

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // classes on (region, band): A/x ×3, A/y ×2, B/x ×1
  private def df = Seq(
    ("A", "x", "s1"), ("A", "x", "s1"), ("A", "x", "s2"),
    ("A", "y", "s1"), ("A", "y", "s2"),
    ("B", "x", "s3")
  ).toDF("region", "band", "sensitive")

  test("kAnonymity: risky classes/rows below k and the achieved k") {
    val r = Privacy.kAnonymity(df, Seq("region", "band"), k = 3).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((6L, 3L, 2L, 3L, 1L))) // A/y(2) and B/x(1) are under k=3
  }

  test("lDiversity: a homogeneous class fails even when k-anonymous") {
    val got = Privacy.lDiversity(df, Seq("region", "band"), "sensitive", l = 2)
      .orderBy("region", "band")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    assert(got === Seq(
      ("A", "x", 3L, 2L, true),
      ("A", "y", 2L, 2L, true),
      ("B", "x", 1L, 1L, false)))
  }

  test("suppressToK keeps exactly the rows of classes at or above k") {
    val kept = Privacy.suppressToK(df, Seq("region", "band"), k = 2)
      .select("region", "band").collect().map(r => (r.getString(0), r.getString(1)))
    assert(kept.length === 5 && !kept.contains(("B", "x")))
    // degenerate: k above every class size suppresses everything
    assert(Privacy.suppressToK(df, Seq("region", "band"), k = 10).count() === 0L)
  }

  test("suppressToK matches NULL quasi values null-safely — a unique NULL-keyed " +
       "row is suppressed, not shipped") {
    val withNull = Seq(
      (Some("A"), "x", "s1"), (Some("A"), "x", "s1"), (Some("A"), "x", "s2"),
      (None: Option[String], "x", "s9") // its own class of size 1 — risky
    ).toDF("region", "band", "sensitive")
    val kept = Privacy.suppressToK(withNull, Seq("region", "band"), k = 2)
    assert(kept.count() === 3L && kept.filter(col("region").isNull).count() === 0L)
  }
}
