package graft.reports

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(1.5)), (2L, Some("b"), Some(-2.0)),
    (3L, None, Some(1.5)), (4L, Some("b"), None))
    .toDF("id", "s", "v")

  test("profileTable: per-column rows/nulls/ndv and typed min-max") {
    val p = Profile.profileTable(df, Seq("id", "s", "v"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect().toSeq
    assert(p === Seq(
      ("id", 4L, 0L, 4L, Some(1.0), Some(4.0), None, None),
      ("s", 4L, 1L, 2L, None, None, Some("a"), Some("b")),
      ("v", 4L, 1L, 2L, Some(-2.0), Some(1.5), None, None)))
  }

  test("profileTable: approx mode keeps the schema and lands near exact ndv") {
    val p = Profile.profileTable(df, Seq("id"), exact = false)
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect().head
    assert(p._1 === "id" && math.abs(p._4 - 4L) <= 1)
  }

  test("profileTable rejects unknown columns") {
    intercept[IllegalArgumentException] {
      Profile.profileTable(df, Seq("nope"))
    }
  }

  test("checkRules: one row per rule; NULL predicate counts as violation") {
    val r = Profile.checkRules(df, Seq(
        "v_positive" -> (col("v") > 0),      // -2.0 fails, null fails
        "s_present" -> col("s").isNotNull))  // one null
      .orderBy("rule")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r === Seq(
      ("s_present", 4L, 1L, 0.25),
      ("v_positive", 4L, 2L, 0.5)))
  }

  test("functionalDeps: holds on unique mapping, counts violating keys, nulls excluded") {
    val t = Seq(
      (1L, "a", Some("x")), (2L, "a", Some("x")),   // a -> x consistent
      (3L, "b", Some("y")), (4L, "b", Some("z")),   // b violates
      (5L, "c", None))                               // null dep: no value
      .toDF("id", "det", "dep")
    val got = Profile.functionalDeps(t, Seq("det" -> "dep", "id" -> "det"))
      .orderBy("determinant")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("det", "dep", 3L, 1L, false),  // keys a,b,c; only b violates
      ("id", "det", 5L, 0L, true)))
  }

  test("psiDrift: identical distribution scores ~0, shifted distribution scores high") {
    // the baseline is the BLENDED corpus, so the drifted group is kept
    // small — big stable groups then sit close to the baseline while
    // the concentrated group diverges
    val rows =
      (1 to 50).map(i => ("same", (i % 10) * 10L)) ++
      (1 to 50).map(i => ("alsoSame", (i % 10) * 10L)) ++
      (1 to 5).map(_ => ("hi", 95L))
    val df = rows.toDF("src", "v")
    val psi = Profile.psiDrift(df, "src", "v", nBins = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(psi("hi") > 0.3, s"shifted group must flag: ${psi("hi")}")
    assert(psi("same") < 0.1 && psi("alsoSame") < 0.1,
      s"stable groups must not: $psi")
    assert(psi("same") < psi("hi") && psi("alsoSame") < psi("hi"))
  }

  test("datasetCard: per-source sizes, dominant language share, duplicate mass") {
    val docs = Seq(
      (1L, "a", "en", "one two three"),
      (2L, "a", "en", "four five"),
      (3L, "a", "fr", "six"),
      (4L, "b", "fr", "shared text"),
      (5L, "b", "fr", "shared text"),      // exact dup inside b
      (6L, "c", "de", "shared text"))      // and a cross-source copy
      .toDF("doc_id", "source", "lang", "text")
    val out = Profile.datasetCard(docs, "source", "text", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4), r.getLong(5), r.getLong(6))))
      .toMap
    // a: 3 docs, 6 tokens, en 2/3 = 6666bp, no dups
    assert(out("a") === ((3L, 6L, "en", 6666L, 0L)))
    // b: both docs are corpus-wide dups
    assert(out("b") === ((2L, 4L, "fr", 10000L, 2L)))
    // c: its single doc duplicates b's text
    assert(out("c") === ((1L, 2L, "de", 10000L, 1L)))
  }

  test("fkOrphans: orphans vs null FKs counted separately, basis points exact") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None, Some(2L))
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profile.fkOrphans(child, "fk", parent, "pk")
      .as[(Long, Long, Long, Long)].collect().head
    // 5 children, 1 null FK, 1 orphan (9) of 4 non-null → 2500 bp
    assert(got === ((5L, 1L, 1L, 2500L)))
    // all-null child set: no division blow-up
    val allNull = Seq(Option.empty[Long], None).toDF("fk")
    assert(Profile.fkOrphans(allNull, "fk", parent, "pk")
      .as[(Long, Long, Long, Long)].collect().head === ((2L, 2L, 0L, 0L)))
  }
}
