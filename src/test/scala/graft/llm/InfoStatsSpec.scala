package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** InfoStats against hand-computed cases: entropies/MI from exact
  * counts, JSD's closed-form extremes (identical = 0, disjoint = ln 2),
  * the unbiased Simpson index, Kish ESS, and the loud NULL/negative
  * contracts.
  */
class InfoStatsSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation: perfect dependence gives mi = h_a, nmi = 1") {
    // a == b always: H(a,b) = H(a) = H(b) → mi = H, nmi = 1
    val df = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("z", "z"))
      .toDF("a", "b")
    val r = InfoStats.mutualInformation(df, "a", "b").head()
    assert(r.getAs[Long]("n") === 4L)
    // H = ln4 − (2 ln2)/4 = 1.039721
    assert(r.getAs[Double]("h_a") === 1.039721)
    assert(r.getAs[Double]("h_ab") === 1.039721)
    assert(r.getAs[Double]("mi") === 1.039721)
    assert(r.getAs[Double]("nmi") === 1.0)
  }

  test("mutualInformation: independent uniform 2x2 gives mi = 0 " +
    "(+0.0-normalized, never -0.0)") {
    val df = Seq(("0", "0"), ("0", "1"), ("1", "0"), ("1", "1"))
      .toDF("a", "b")
    val r = InfoStats.mutualInformation(df, "a", "b").head()
    assert(r.getAs[Double]("h_a") === 0.693147)
    assert(r.getAs[Double]("h_ab") === 1.386294)
    val mi = r.getAs[Double]("mi")
    assert(mi === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(mi) === 0L) // not -0.0
  }

  test("mutualInformation: a constant column has zero entropy — " +
    "nmi NULL, and NULL categories raise") {
    val const = Seq(("k", "0"), ("k", "1")).toDF("a", "b")
    val r = InfoStats.mutualInformation(const, "a", "b").head()
    assert(r.getAs[Double]("h_a") === 0.0)
    assert(r.isNullAt(r.fieldIndex("nmi")))
    val nulls = Seq((Some("x"), "0"), (None, "1")).toDF("a", "b")
    val e = intercept[Exception] {
      InfoStats.mutualInformation(nulls, "a", "b").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("tokenDiversityBySlice: hand counts — ttr, entropy, unbiased " +
    "Simpson; one-token slice gets NULL simpson; empty slice absent") {
    val df = Seq(("s1", "a a b"), ("s2", "zz"), ("s3", "  "))
      .toDF("s", "text")
    val got = InfoStats.tokenDiversityBySlice(df, "s", "text")
      .orderBy("slice").collect()
    assert(got.length === 2) // s3 has zero tokens → absent
    val s1 = got(0)
    assert(s1.getAs[Long]("n_tokens") === 3L)
    assert(s1.getAs[Long]("n_types") === 2L)
    assert(s1.getAs[Double]("ttr") === 0.666667)
    // ln3 − (2 ln2)/3 = 0.636514
    assert(s1.getAs[Double]("entropy") === 0.636514)
    // Σc(c−1)/(n(n−1)) = 2/6
    assert(s1.getAs[Double]("simpson") === 0.333333333)
    val s2 = got(1)
    assert(s2.getAs[Long]("n_tokens") === 1L)
    assert(s2.isNullAt(s2.fieldIndex("simpson")))
  }

  test("tokenJsdBySlice: identical distributions = 0, disjoint " +
    "vocabularies = ln 2, single slice = NULL") {
    val same = Seq(("s1", "a b"), ("s2", "a b")).toDF("s", "text")
    val gotSame = InfoStats.tokenJsdBySlice(same, "s", "text")
      .orderBy("slice").collect()
    assert(gotSame.forall(_.getAs[Double]("jsd") === 0.0))
    assert(gotSame.forall(r =>
      java.lang.Double.doubleToRawLongBits(r.getAs[Double]("jsd")) === 0L))
    val disjoint = Seq(("s1", "a"), ("s2", "b")).toDF("s", "text")
    val gotDis = InfoStats.tokenJsdBySlice(disjoint, "s", "text")
      .orderBy("slice").collect()
    assert(gotDis.forall(_.getAs[Double]("jsd") === 0.693147)) // ln 2
    val single = Seq(("only", "a b c")).toDF("s", "text")
    val r = InfoStats.tokenJsdBySlice(single, "s", "text").head()
    assert(r.getAs[Long]("n_rest") === 0L)
    assert(r.isNullAt(r.fieldIndex("jsd")))
  }

  test("tokenJsdBySlice: a skewed slice lands strictly between the " +
    "extremes and n_s/n_rest partition the corpus") {
    val df = Seq(("s1", "a a a b"), ("s2", "b b b a")).toDF("s", "text")
    val got = InfoStats.tokenJsdBySlice(df, "s", "text")
      .orderBy("slice").collect()
    assert(got.map(_.getAs[Long]("n_s")).sum === 8L)
    for (r <- got) {
      assert(r.getAs[Long]("n_s") + r.getAs[Long]("n_rest") === 8L)
      val jsd = r.getAs[Double]("jsd")
      assert(jsd > 0.0 && jsd < 0.693147, jsd)
    }
    // symmetric construction → both slices see the same divergence
    assert(got(0).getAs[Double]("jsd") === got(1).getAs[Double]("jsd"))
  }

  test("crossEntropyBySlice: the reference scores itself at kl >= 0 " +
    "near 0, an alien vocabulary scores high with full OOV, and a " +
    "missing reference raises") {
    // ref = s1 ("a a b"); s2 shares the distribution, s3 is disjoint
    val df = Seq(("s1", "a a b"), ("s2", "a a b"), ("s3", "x y z"))
      .toDF("s", "text")
    val got = InfoStats.crossEntropyBySlice(df, "s", "text", "s1")
      .orderBy("slice").collect()
    val Array(s1, s2, s3) = got
    // identical distributions → identical rows against the same model
    assert(s1.getAs[Double]("ce") === s2.getAs[Double]("ce"))
    assert(s1.getAs[Long]("n_oov") === 0L)
    assert(s1.getAs[Double]("kl") >= 0.0) // Gibbs, smoothing included
    // disjoint vocabulary: every token is OOV at the alpha floor
    // p = 1/(n_r + V) = 1/(3 + 5) → ce = ln 8
    assert(s3.getAs[Long]("n_oov") === 3L)
    assert(s3.getAs[Double]("ce") === 2.079442) // ln 8
    assert(s3.getAs[Double]("ce") > s1.getAs[Double]("ce"))
    val e = intercept[Exception] {
      InfoStats.crossEntropyBySlice(df, "s", "text", "nope").collect()
    }
    assert(e.getMessage.contains("has no tokens"))
    intercept[IllegalArgumentException] {
      InfoStats.crossEntropyBySlice(df, "s", "text", "s1", alphaMilli = 0L)
    }
  }

  test("concentrationProfile: uniform mixture hits the floor on all " +
    "three indices; a dominated one moves them together") {
    val uniform = Seq("a", "b", "c", "d").toDF("d")
    val u = InfoStats.concentrationProfile(uniform, "d").head()
    assert(u.getAs[Long]("k") === 4L)
    assert(u.getAs[Double]("hhi") === 0.25) // 1/k
    assert(u.getAs[Double]("gini") === 0.0)
    assert(u.getAs[Double]("theil") === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(
      u.getAs[Double]("gini")) === 0L) // not -0.0
    // counts (6, 1, 1): hhi = 38/64, gini = (2*(1*1+2*1+3*6)-4*8)/(3*8)
    val dom = (Seq.fill(6)("big") ++ Seq("s1", "s2")).toDF("d")
    val d = InfoStats.concentrationProfile(dom, "d").head()
    assert(d.getAs[Double]("max_share") === 0.75)
    assert(d.getAs[Double]("hhi") === 0.59375)
    assert(d.getAs[Double]("gini") === 0.416667) // 10/24
    assert(d.getAs[Double]("theil") > 0.0)
  }

  test("essWeights: equal weights give ess = n; a dominant weight " +
    "collapses ess toward 1; zero-sum group NULL; negative raises") {
    val eq = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 5L))
      .toDF("grp", "w")
    val r = InfoStats.essWeights(eq, "grp", "w").head()
    assert(r.getAs[Double]("ess") === 4.0)
    assert(r.getAs[Double]("ess_ratio") === 1.0)
    assert(r.getAs[Double]("max_share") === 0.25)
    val dom = Seq(("g", 100L), ("g", 1L)).toDF("grp", "w")
    val d = InfoStats.essWeights(dom, "grp", "w").head()
    assert(d.getAs[Double]("ess") === 1.019998) // 101²/10001
    assert(d.getAs[Double]("max_share") === 0.990099)
    val zero = Seq(("g", 0L), ("g", 0L)).toDF("grp", "w")
    val z = InfoStats.essWeights(zero, "grp", "w").head()
    assert(z.isNullAt(z.fieldIndex("ess")))
    val neg = Seq(("g", -1L)).toDF("grp", "w")
    val e = intercept[Exception] {
      InfoStats.essWeights(neg, "grp", "w").collect()
    }
    assert(e.getMessage.contains("negative"))
    // a NULL weight must raise with the NAMED message, not a blank one
    // (concat(NULL) would have nulled the whole error text)
    val nul = Seq(("g", Some(1L)), ("g", None)).toDF("grp", "w")
    val en = intercept[Exception] {
      InfoStats.essWeights(nul, "grp", "w").collect()
    }
    assert(en.getMessage.contains("essWeights") &&
      en.getMessage.contains("NULL"), en.getMessage)
  }
}
