package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RankStats against hand-computed textbook cases: the 2×-integer rank
  * algebra, U/D/rho values (cross-checked by hand against the standard
  * definitions, ties included), the tie-corrected z/rho closed forms,
  * and the loud two-group / NULL contracts.
  */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("avgRanks2: tie-averaged 2x ranks and the rank-sum invariant") {
    // values 10, 20, 20, 30 → ranks 1, 2.5, 2.5, 4 → rank2 2, 5, 5, 8
    val df = Seq(10L, 20L, 20L, 30L).toDF("v")
    val got = RankStats.avgRanks2(df, "v").orderBy("value")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((10L, 1L, 2L), (20L, 2L, 5L), (30L, 1L, 8L)))
    // Σ n·rank2 = N(N+1) for any frame — here and on a bigger mix
    val big = Seq.tabulate(97)(i => (i * 7919L) % 13L).toDF("v")
    val sums = RankStats.avgRanks2(big, "v")
      .agg(sum(col("n") * col("rank2")).as("s"), sum("n").as("n"))
      .as[(Long, Long)].head()
    assert(sums._1 === sums._2 * (sums._2 + 1))
  }

  test("avgRanks2 survives a blocked value space (maxBlocks = 2)") {
    val df = Seq(5L, 1L, 9L, 1L, 7L, 3L).toDF("v")
    // ranks: 1→1.5 avg (rank2 4), 3→3 (6+1=7)… compute: sorted
    // [1,1,3,5,7,9]: rank2(1)=2·0+2+1=3? No: rank2 = 2·below + n + 1
    // 1: below 0, n 2 → 3; 3: below 2, n 1 → 6; 5: 2·3+2=8? below 3,
    // n 1 → 8; 7: below 4 → 10; 9: below 5 → 12
    val got = RankStats.avgRanks2(df, "v", maxBlocks = 2).orderBy("value")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 3L), (3L, 1L, 6L), (5L, 1L, 8L),
      (7L, 1L, 10L), (9L, 1L, 12L)))
  }

  test("mannWhitney: textbook no-tie case") {
    // A = {1,2,4}, B = {3,5}: U_a = #(a>b pairs) = 1 → u_a2 = 2,
    // U_b = 5 → u_b2 = 10; R_a = 1+2+4 = 7 → r_a2 = 14
    val df = Seq((1L, "a"), (2L, "a"), (4L, "a"), (3L, "b"), (5L, "b"))
      .toDF("v", "g")
    val r = RankStats.mannWhitney(df, "v", "g").head()
    assert(r.getAs[String]("group_a") === "a")
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("r_a2") === 14L)
    assert(r.getAs[Long]("u_a2") === 2L)
    assert(r.getAs[Long]("u_b2") === 10L)
    assert(r.getAs[Double]("tie_term") === 0.0)
  }

  test("mannWhitney: ties give half-integral U, exactly in 2x units") {
    // A = {1,2}, B = {2,3}: ranks 1, 2.5, 2.5, 4 → R_a = 3.5,
    // U_a = 3.5 − 3 = 0.5 (one a>b tie pair counts ½) → u_a2 = 1
    val df = Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b")).toDF("v", "g")
    val r = RankStats.mannWhitney(df, "v", "g").head()
    assert(r.getAs[Long]("u_a2") === 1L)
    assert(r.getAs[Long]("u_b2") === 2L * 2L * 2L - 1L)
    assert(r.getAs[Double]("tie_term") === 6.0) // one pair: 2³−2
  }

  test("mannWhitney z matches the tie-corrected closed form") {
    val df = Seq.tabulate(40) { i =>
      ((i * 31L) % 17L, if (i % 2 == 0) "x" else "y")
    }.toDF("v", "g")
    val r = RankStats.mannWhitney(df, "v", "g").head()
    val (na, nb) = (r.getAs[Long]("n_a").toDouble, r.getAs[Long]("n_b").toDouble)
    val n = na + nb
    val tie = r.getAs[Double]("tie_term")
    val sig2 = na * nb / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0)))
    val want = (r.getAs[Long]("u_a2") / 2.0 - na * nb / 2.0) / math.sqrt(sig2)
    assert(math.abs(r.getAs[Double]("z") - want) < 1e-6)
  }

  test("mannWhitney: z is NULL when every value ties") {
    val df = Seq((7L, "a"), (7L, "a"), (7L, "b")).toDF("v", "g")
    val r = RankStats.mannWhitney(df, "v", "g").head()
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.getAs[Long]("u_a2") === 2L) // = n_a·n_b: U_a = n_a·n_b/2 on all-ties
  }

  test("ksTest: hand-computed D with the min-value tiebreak") {
    // A = {1,2,3}, B = {3,4}: devs in 6ths at v=1..4: 2, 4, 3, 0
    // → d_num 4 at v=2, D = 2/3
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (3L, "b"), (4L, "b"))
      .toDF("v", "g")
    val r = RankStats.ksTest(df, "v", "g").head()
    assert(r.getAs[Long]("d_num") === 4L)
    assert(r.getAs[Long]("d_at") === 2L)
    assert(math.abs(r.getAs[Double]("d") - 4.0 / 6.0) < 1e-6)
  }

  test("ksTest: identical samples give D = 0") {
    val df = Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b")).toDF("v", "g")
    val r = RankStats.ksTest(df, "v", "g").head()
    assert(r.getAs[Long]("d_num") === 0L)
    assert(r.getAs[Double]("d") === 0.0)
  }

  test("two-sample ops raise on a third group and on NULLs") {
    val three = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("v", "g")
    val e1 = intercept[Exception] {
      RankStats.mannWhitney(three, "v", "g").collect()
    }
    assert(e1.getMessage.contains("expected exactly 2 groups"))
    val nullv = Seq((Some(1L), "a"), (None, "b")).toDF("v", "g")
    val e2 = intercept[Exception] {
      RankStats.ksTest(nullv, "v", "g").collect()
    }
    assert(e2.getMessage.contains("NULL value"))
  }

  test("spearman: perfect monotone, reversed, and a hand tie case") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(RankStats.spearman(up, "x", "y").head().getAs[Double]("rho") === 1.0)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(RankStats.spearman(down, "x", "y").head()
      .getAs[Double]("rho") === -1.0)
    // x = [1,2,2,3], y = [1,3,2,4]: Pearson on tie-averaged ranks
    // = 4.5/√22.5 = 0.948683 (rank2x [2,5,5,8], rank2y [2,6,4,8] →
    // Σd²·4 = 2, Tx = 6, Ty = 0)
    val ties = Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 4L)).toDF("x", "y")
    val r = RankStats.spearman(ties, "x", "y").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("sum_d2_4") === 2.0)
    assert(r.getAs[Double]("tx") === 6.0)
    assert(r.getAs[Double]("ty") === 0.0)
    assert(math.abs(r.getAs[Double]("rho") - 0.948683) < 1e-6)
  }

  test("spearman: NULL rho on a constant column") {
    val const = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    val r = RankStats.spearman(const, "x", "y").head()
    assert(r.isNullAt(r.fieldIndex("rho")))
  }

  test("chi2Cells: 2x2 hand case including the zero-observed cell") {
    // rows: (p,1)×3, (p,2), (q,1) — margins r(p)=4, r(q)=1, c(1)=4,
    // c(2)=1, N=5; cell (q,2) observed 0 but present with E = 1·1/5
    val df = Seq(("p", "1"), ("p", "1"), ("p", "1"), ("p", "2"), ("q", "1"))
      .toDF("s", "l")
    val got = RankStats.chi2Cells(df, "s", "l").orderBy("a", "b").collect()
    assert(got.length === 4)
    val z = got.find(r => r.getString(0) == "q" && r.getString(1) == "2").get
    assert(z.getAs[Long]("o") === 0L)
    assert(math.abs(z.getAs[Double]("expected") - 0.2) < 1e-9) // 1·1/5
    // contrib = (0·5 − 1·1)²/(5·1·1) = 1/5
    assert(math.abs(z.getAs[Double]("contrib") - 0.2) < 1e-9)
    // Σ over cells = the χ² statistic, by hand:
    // (p,1): (15−16)²/(5·4·4) = .0125 ; (p,2): (5−4)²/(5·4·1) = .05
    // (q,1): (5−4)²/(5·1·4) = .05 ; (q,2): .2 → Σ = .3125
    val stat = got.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(stat - 0.3125) < 1e-9)
  }

  test("mannWhitneyPerSlice: two slices reproduce the two-sample U; " +
    "three slices match slice-vs-rest relabeling") {
    val two = Seq((1L, "a"), (2L, "a"), (4L, "a"), (3L, "b"), (5L, "b"))
      .toDF("v", "g")
    val per = RankStats.mannWhitneyPerSlice(two, "v", "g")
      .orderBy("slice").collect()
    assert(per.map(_.getAs[Long]("u_s2")).toSeq === Seq(2L, 10L))
    assert(per.map(_.getAs[Long]("n_rest")).toSeq === Seq(2L, 3L))
    // 3 slices: each row must equal the explicit slice-vs-rest binary MW
    val three = Seq.tabulate(30) { i =>
      ((i * 13L) % 11L, s"s${i % 3}")
    }.toDF("v", "g")
    val got = RankStats.mannWhitneyPerSlice(three, "v", "g")
      .orderBy("slice").collect()
    for (r <- got) {
      val s = r.getAs[String]("slice")
      val bin = three.withColumn("g",
        when(col("g") === s, "a").otherwise("b"))
      val want = RankStats.mannWhitney(bin, "v", "g").head()
      assert(r.getAs[Long]("u_s2") === want.getAs[Long]("u_a2"),
        s"slice $s U mismatch")
      assert(r.getAs[Double]("z") === want.getAs[Double]("z"),
        s"slice $s z mismatch")
    }
  }

  test("ksPerSlice: sup attained just BEFORE a slice step is caught") {
    // slice A = {5,6}, B = {1,2,3,4}: just before 5 the complement has
    // fully stepped while A hasn't → D_A = 1 (8 in 2·4 units); the
    // inclusive-only evaluation would report 4
    val df = Seq((5L, "A"), (6L, "A"), (1L, "B"), (2L, "B"), (3L, "B"),
      (4L, "B")).toDF("v", "g")
    val got = RankStats.ksPerSlice(df, "v", "g").orderBy("slice").collect()
    val a = got.find(_.getAs[String]("slice") == "A").get
    assert(a.getAs[Long]("d_num") === 8L)
    assert(a.getAs[Double]("d") === 1.0)
    // and the complement slice sees the same D by symmetry
    val b = got.find(_.getAs[String]("slice") == "B").get
    assert(b.getAs[Double]("d") === 1.0)
  }

  test("ksPerSlice: two slices agree with ksTest") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (3L, "b"), (4L, "b"))
      .toDF("v", "g")
    val per = RankStats.ksPerSlice(df, "v", "g").orderBy("slice").collect()
    val two = RankStats.ksTest(df, "v", "g").head()
    assert(per.head.getAs[Long]("d_num") === two.getAs[Long]("d_num"))
    assert(per.head.getAs[Double]("d") === two.getAs[Double]("d"))
  }

  test("pairedT: hand case and the identical-pairs NULL") {
    val df = Seq((3L, 2L), (5L, 3L), (7L, 4L)).toDF("a", "b")
    // d = [1,2,3]: Σd 6, Σd² 14, s² = 1, t = 2/√(1/3) = 3.464102
    val r = RankStats.pairedT(df, "a", "b").head()
    assert(r.getAs[Long]("n") === 3L && r.getAs[Long]("sum_d") === 6L)
    assert(r.getAs[Double]("sum_d2") === 14.0)
    assert(math.abs(r.getAs[Double]("t") - 3.464102) < 1e-6)
    val same = Seq((2L, 1L), (3L, 2L)).toDF("a", "b")
    val r2 = RankStats.pairedT(same, "a", "b").head()
    assert(r2.isNullAt(r2.fieldIndex("t"))) // constant d → s² = 0
  }

  test("wilcoxonSignedRank: hand case with zeros and tied |d|") {
    // d = [0, 1, −1, 2]: zero drops, |d| ranks 1.5, 1.5, 3 →
    // w_plus2 = 3+6 = 9, w_minus2 = 3, tie (t=2) = 6,
    // z = (4.5 − 3)/√(3.5 − .125) = 0.816497
    val df = Seq((5L, 5L), (6L, 5L), (4L, 5L), (7L, 5L)).toDF("a", "b")
    val r = RankStats.wilcoxonSignedRank(df, "a", "b").head()
    assert(r.getAs[Long]("n_eff") === 3L)
    assert(r.getAs[Long]("w_plus2") === 9L)
    assert(r.getAs[Long]("w_minus2") === 3L)
    assert(r.getAs[Double]("tie_term") === 6.0)
    assert(math.abs(r.getAs[Double]("z") - 0.816497) < 1e-6)
    // rank-sum invariant: w_plus2 + w_minus2 = n_eff(n_eff+1)
    assert(r.getAs[Long]("w_plus2") + r.getAs[Long]("w_minus2") === 12L)
  }

  test("wilcoxonSignedRank: all-zero differences give NULL z") {
    val df = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    val r = RankStats.wilcoxonSignedRank(df, "a", "b").head()
    assert(r.getAs[Long]("n_eff") === 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("cramerVonMises: hand case and identical samples") {
    // A = {1,2,3}, B = {3,5}: devs in 6ths at v=1,2,3,5: 2,4,3,0 with
    // counts 1,1,2,1 → t_num = 4+16+2·9 = 38; T = 38/(6·25) = 0.253333
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (3L, "b"), (5L, "b"))
      .toDF("v", "g")
    val r = RankStats.cramerVonMises(df, "v", "g").head()
    assert(r.getAs[Double]("t_num") === 38.0)
    assert(math.abs(r.getAs[Double]("t") - 38.0 / 150.0) < 1e-6)
    val same = Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b")).toDF("v", "g")
    assert(RankStats.cramerVonMises(same, "v", "g").head()
      .getAs[Double]("t") === 0.0)
  }

  test("wassersteinByKey: per-key W1 equals per-key wasserstein1 calls; " +
    "keys stay independent under tiny blocks") {
    val df = Seq(
      ("k1", 1L, "a"), ("k1", 2L, "a"), ("k1", 3L, "a"),
      ("k1", 3L, "b"), ("k1", 5L, "b"),
      ("k2", 10L, "a"), ("k2", 10L, "b"), ("k2", 20L, "a"), ("k2", 20L, "b"))
      .toDF("k", "v", "g")
    val got = RankStats.wassersteinByKey(df, "k", "v", "g", maxBlocks = 2)
      .orderBy("key").collect()
    // k1 is the wasserstein1 hand case (W1 = 2); k2 identical dists
    assert(got.map(_.getAs[String]("key")).toSeq === Seq("k1", "k2"))
    assert(got(0).getAs[Double]("w1") === 2.0)
    assert(got(1).getAs[Double]("w1") === 0.0)
    // and each row equals the standalone two-sample call on that key
    for (r <- got) {
      val solo = RankStats.wasserstein1(
        df.filter(col("k") === r.getAs[String]("key")).select("v", "g"),
        "v", "g", maxBlocks = 2).head()
      assert(r.getAs[Double]("w1_num") === solo.getAs[Double]("w1_num"))
    }
  }

  test("wasserstein1: hand case, block-boundary stitch, identical = 0") {
    // A = {1,2,3}, B = {3,5}: ∫|Fa−Fb| = 1/3 + 2/3 + 1/2·2 = 2
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (3L, "b"), (5L, "b"))
      .toDF("v", "g")
    val r = RankStats.wasserstein1(df, "v", "g").head()
    assert(r.getAs[Double]("w1_num") === 12.0) // in n_a·n_b = 6 units
    assert(r.getAs[Double]("w1") === 2.0)
    // tiny blocks force the successor to cross block boundaries
    val rb = RankStats.wasserstein1(df, "v", "g", maxBlocks = 2).head()
    assert(rb.getAs[Double]("w1_num") === 12.0)
    val same = Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b")).toDF("v", "g")
    assert(RankStats.wasserstein1(same, "v", "g").head()
      .getAs[Double]("w1") === 0.0)
  }

  test("exactQuantiles: type-1 lower quantiles, ties, q = 0 pins the min") {
    val df = Seq(10L, 20L, 30L, 40L).toDF("v")
    val got = RankStats.exactQuantiles(df, "v", Seq(0L, 250L, 500L, 1000L))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 1L, 10L), (250L, 1L, 10L), (500L, 2L, 20L),
      (1000L, 4L, 40L)))
    val ties = Seq(1L, 1L, 1L, 9L).toDF("v")
    val t = RankStats.exactQuantiles(ties, "v", Seq(750L, 1000L))
      .as[(Long, Long, Long)].collect().toSeq
    assert(t === Seq((750L, 3L, 1L), (1000L, 4L, 9L)))
    intercept[IllegalArgumentException] {
      RankStats.exactQuantiles(df, "v", Seq(1001L))
    }
  }

  test("weightedQuantiles: ranks in weight units, zero-weight rows " +
    "carry no mass, negative weights raise") {
    // values 10 (w 1), 20 (w 3), 30 (w 6): total 10 — median rank 5
    // lands inside 30's mass; q=0 pins the min CARRYING mass
    val df = Seq((10L, 1L), (20L, 3L), (30L, 6L), (99L, 0L))
      .toDF("v", "w")
    val got = RankStats.weightedQuantiles(df, "v", "w",
      Seq(0L, 400L, 500L, 1000L), maxBlocks = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 1L, 10L), (400L, 4L, 20L), (500L, 5L, 30L),
      (1000L, 10L, 30L)))
    // all-mass-on-zero-weight rows: empty output, not a crash
    val zero = Seq((10L, 0L)).toDF("v", "w")
    assert(RankStats.weightedQuantiles(zero, "v", "w", Seq(500L))
      .collect().isEmpty)
    val neg = Seq((10L, -1L)).toDF("v", "w")
    val e = intercept[Exception] {
      RankStats.weightedQuantiles(neg, "v", "w", Seq(500L)).collect()
    }
    assert(e.getMessage.contains("negative"))
    // weight 1 everywhere ≡ exactQuantiles
    val unit = Seq(10L, 20L, 30L, 40L).toDF("v").withColumn("w", lit(1L))
    val wq = RankStats.weightedQuantiles(unit, "v", "w",
      Seq(250L, 1000L)).as[(Long, Long, Long)].collect().toSeq
    val eq = RankStats.exactQuantiles(unit.select("v"), "v",
      Seq(250L, 1000L)).as[(Long, Long, Long)].collect().toSeq
    assert(wq === eq)
  }

  test("groupedQuantiles: per-group type-1 quantiles with blocked values") {
    val df = Seq(("x", 10L), ("x", 20L), ("x", 30L), ("x", 40L),
      ("y", 7L), ("y", 7L), ("y", 9L)).toDF("g", "v")
    val got = RankStats.groupedQuantiles(df, "v", "g",
      Seq(0L, 500L, 1000L), maxBlocks = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("x", 0L, 1L, 10L), ("x", 500L, 2L, 20L), ("x", 1000L, 4L, 40L),
      ("y", 0L, 1L, 7L), ("y", 500L, 2L, 7L), ("y", 1000L, 3L, 9L)))
  }

  test("wasserstein1: constant input yields one row with w1 = 0") {
    // a constant metric is zero drift, not an empty frame — a .head()
    // caller (a drift monitor) must not crash on it
    val df = Seq((5L, "a"), (5L, "b"), (5L, "a")).toDF("v", "g")
    val r = RankStats.wasserstein1(df, "v", "g").head()
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 1L)
    assert(r.getAs[Double]("w1_num") === 0.0)
    assert(r.getAs[Double]("w1") === 0.0)
  }

  test("wassersteinByKey: a key missing one group raises; a key with " +
    "one distinct value still gets a w1 = 0 row") {
    val missing = Seq(("k1", 1L, "a"), ("k1", 2L, "b"), ("k2", 3L, "a"))
      .toDF("k", "v", "g")
    val e = intercept[Exception] {
      RankStats.wassersteinByKey(missing, "k", "v", "g").collect()
    }
    assert(e.getMessage.contains("missing one of the two groups"))
    val const = Seq(("k1", 1L, "a"), ("k1", 3L, "b"),
      ("k2", 7L, "a"), ("k2", 7L, "b")).toDF("k", "v", "g")
    val got = RankStats.wassersteinByKey(const, "k", "v", "g")
      .orderBy("key").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Double]("w1") === 2.0) // k1: |1-3| balanced
    assert(got(1).getAs[Double]("w1") === 0.0) // k2: constant value
  }

  test("ksPerSlice: a single-slice frame emits NULL d, not NaN") {
    // n_rest = 0 would make d = 0/0 = NaN, and NaN > threshold is
    // false — a silently suppressed alert; NULL is "no verdict"
    val df = Seq((1L, "only"), (2L, "only"), (3L, "only")).toDF("v", "s")
    val r = RankStats.ksPerSlice(df, "v", "s").head()
    assert(r.getAs[Long]("n_rest") === 0L)
    assert(r.getAs[Long]("d_num") === 0L)
    assert(r.isNullAt(r.fieldIndex("d")))
  }

  test("chi2Cells raises on NULL categories") {
    val df = Seq((Some("p"), "1"), (None, "2")).toDF("s", "l")
    val e = intercept[Exception] {
      RankStats.chi2Cells(df, "s", "l").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("conformalQuantile: the (n+1) rank rule, NULL past the calibration size") {
    val cal = ((1L to 19L).map(v => ("a", v)) :+ ("b", 7L))
      .toDF("g", "v")
    val q = RankStats.conformalQuantile(cal, "v", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    // n=19: target = (950*20 + 999) div 1000 = 19 -> the max value
    assert(q("a") === ((19L, 19L, Some(19L))))
    // n=1: target = 2 > n -> no finite threshold, qhat NULL
    assert(q("b") === ((1L, 2L, None)))
    // alpha=500: target = (500*20 + 999) div 1000 = 10 -> the median
    val med = RankStats.conformalQuantile(cal.filter($"g" === "a"), "v", "g",
      alphaPermille = 500).collect().head
    assert(med.getLong(3) === 10L)
  }

  test("conformalCoverage: counts at-or-below qhat; NULL qhat covers all") {
    val cal = ((1L to 19L).map(v => ("a", v)) :+ ("b", 7L)).toDF("g", "v")
    val qh = RankStats.conformalQuantile(cal, "v", "g")
    val test = (Seq(("a", 5L), ("a", 19L), ("a", 20L), ("b", 1000L)))
      .toDF("g", "v")
    val cov = RankStats.conformalCoverage(test, qh, "v", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(cov("a") === ((3L, 2L, 0.666667))) // 20 > qhat=19 escapes
    assert(cov("b") === ((1L, 1L, 1.0)))      // whole-space rule
  }

  test("ecdfNormalize: exact within-group rank permilles") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L),
      ("b", 5L)).toDF("g", "v")
    val m = RankStats.ecdfNormalize(df, "v", "g")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(("a", 10L)) === ((1L, 4L, 250L)))
    assert(m(("a", 20L)) === ((3L, 4L, 750L))) // ties share the <=-rank
    assert(m(("a", 30L)) === ((4L, 4L, 1000L)))
    assert(m(("b", 5L)) === ((1L, 1L, 1000L)))
  }

  test("hillAlpha: exact on a synthetic Pareto grid; degenerate tail is NULL") {
    // values xmin*2^k with counts halving: alpha recovers a positive
    // exponent; exact check against the hand-computed closed form
    val df = (Seq.fill(8)(100L) ++ Seq.fill(4)(200L) ++ Seq.fill(2)(400L)
      ++ Seq.fill(1)(800L)).map(Tuple1(_)).toDF("v")
    val r = RankStats.hillAlpha(df, "v", xmin = 100L).collect().head
    assert(r.getLong(0) === 15L && r.getLong(1) === 100L)
    val lnsum = 4 * math.log(2.0) + 2 * math.log(4.0) + 1 * math.log(8.0)
    assert(math.abs(r.getDouble(2) -
      (1.0 + 15.0 / lnsum)) < 1e-5)
    // all-at-xmin tail: no defined exponent
    val flat = Seq.fill(5)(Tuple1(100L)).toDF("v")
    val f = RankStats.hillAlpha(flat, "v", xmin = 100L).collect().head
    assert(f.isNullAt(2))
  }

  private def kendallRow(df: org.apache.spark.sql.DataFrame,
                         maxBlocks: Long = 1024L) = {
    val r = RankStats.kendallTau(df, "x", "y", maxBlocks).head()
    (r.getAs[Long]("n"), r.getAs[Long]("n_pairs"),
      r.getAs[Long]("concordant"), r.getAs[Long]("discordant"),
      r.getAs[Long]("t1"), r.getAs[Long]("t2"), r.getAs[Long]("t3"),
      if (r.isNullAt(r.fieldIndex("tau_b"))) None
      else Some(r.getAs[Double]("tau_b")))
  }

  test("kendallTau: perfect monotone gives tau 1; hand-computed tie mix") {
    val mono = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val m = kendallRow(mono)
    assert(m === ((3L, 3L, 3L, 0L, 0L, 0L, 0L, Some(1.0))))
    // x=(1,1,2,3), y=(1,2,2,1): C=1, D=2, t1=1, t2=2, t3=0,
    // tau = −1/√((6−1)(6−2)) = −1/√20
    val ties = Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val t = kendallRow(ties)
    assert(t._1 === 4L && t._2 === 6L)
    assert(t._3 === 1L && t._4 === 2L)
    assert((t._5, t._6, t._7) === ((1L, 2L, 0L)))
    assert(math.abs(t._8.get - (-1.0 / math.sqrt(20.0))) < 1e-12)
    // Somers' D_y|x normalizes by x-untied pairs: (1−2)/(6−1) = −0.2
    val sd = RankStats.kendallTau(ties, "x", "y").head()
      .getAs[Double]("somers_d")
    assert(math.abs(sd - (-0.2)) < 1e-12)
  }

  test("kendallTau: duplicated points land in t3 and drop from the pair pool") {
    // two copies of (1,1) + (2,2): pairs = 3: one both-tied, two conc
    val df = Seq((1L, 1L), (1L, 1L), (2L, 2L)).toDF("x", "y")
    val r = kendallRow(df)
    assert(r === ((3L, 3L, 2L, 0L, 1L, 1L, 1L,
      Some(2.0 / math.sqrt(4.0)))))
  }

  test("kendallTau: all ties on one margin has no defined tau") {
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("x", "y")
    val r = kendallRow(df)
    assert(r._3 === 0L && r._4 === 0L && r._5 === 3L)
    assert(r._8.isEmpty)
  }

  test("kendallTau: blocked decomposition matches the brute-force pair " +
    "count on a randomized grid") {
    // deterministic pseudo-random 211-point cloud with heavy ties
    val pts = Seq.tabulate(211)(i =>
      ((i * 7919L) % 23L, (i * 104729L + 7L) % 17L))
    val df = pts.toDF("x", "y")
    // brute force over ordered index pairs
    val brute = {
      var c = 0L; var d = 0L; var t1 = 0L; var t2 = 0L; var t3 = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val ((xa, ya), (xb, yb)) = (pts(i), pts(j))
        if (xa == xb && ya == yb) { t1 += 1; t2 += 1; t3 += 1 }
        else if (xa == xb) t1 += 1
        else if (ya == yb) t2 += 1
        else if ((xa < xb) == (ya < yb)) c += 1
        else d += 1
      }
      (c, d, t1, t2, t3)
    }
    for (mb <- Seq(2L, 7L, 1024L)) {
      val r = kendallRow(df, maxBlocks = mb)
      assert((r._3, r._4, r._5, r._6, r._7) === brute,
        s"maxBlocks=$mb: got $r, brute $brute")
      assert(r._2 === 211L * 210L / 2)
    }
  }

  private def fdrRows(zs: Seq[(String, Option[Double])],
                      alphaPermille: Int = 50) =
    RankStats.bhFdr(
      zs.toDF("slice", "z"), "slice", "z", alphaPermille)
      .orderBy("slice")
      .collect()
      .map(r => r.getAs[String]("slice") ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("m"),
          r.getAs[Boolean]("significant"), r.getAs[Double]("p"))))
      .toMap

  test("bhFdr: the A&S p approximation tracks true erfc within 2e-7") {
    val m = fdrRows(Seq("a" -> Some(1.96), "b" -> Some(5.0),
      "c" -> Some(0.0), "d" -> Some(-1.96)))
    assert(math.abs(m("a")._4 - 0.04999579029644087) < 2e-7)
    assert(math.abs(m("b")._4 - 5.733031437583892e-07) < 2e-7)
    assert(math.abs(m("c")._4 - 1.0) < 2e-7)
    // two-sided: sign of z is irrelevant
    assert(m("d")._4 === m("a")._4)
  }

  test("bhFdr: step-up cutoff — only ranks at or below k* flag") {
    // p ≈ [5.7e-7, 0.0455, 0.92]: k* = 1 (0.0455 > 0.05·2/3)
    val m = fdrRows(Seq("hot" -> Some(5.0), "warm" -> Some(2.0),
      "cold" -> Some(0.1)))
    assert(m("hot") === ((1L, 3L, true, m("hot")._4)))
    assert(!m("warm")._3 && m("warm")._1 === 2L)
    assert(!m("cold")._3 && m("cold")._1 === 3L)
  }

  test("bhFdr: a non-qualifying middle p below k* still flags (the " +
    "step-up quirk)") {
    // p ≈ [0.0100, 0.0400, 0.0450]: i=2 fails its own 0.0333 threshold
    // but i=3 qualifies (0.045 ≤ 0.05) → k* = 3 → ALL flag
    val m = fdrRows(Seq("a" -> Some(2.576), "b" -> Some(2.054),
      "c" -> Some(2.005)))
    assert(m.values.forall(_._3), m.toString)
    assert(m("b")._1 === 2L)
  }

  test("bhFdr: NULL-z slices leave the family; m counts tested only") {
    val m = fdrRows(Seq("a" -> Some(5.0), "skip" -> None,
      "b" -> Some(0.5)))
    assert(!m.contains("skip"))
    assert(m("a")._2 === 2L && m("a")._3)
  }

  test("cupedAdjust: hand-computed theta/rho2 and per-arm adjusted means") {
    // x=(1,2,3,4), y=(2,4,7,7): vx=20, cxy=36, vy=72 → θ=1.8, ρ²=0.9;
    // arm a (x=1,2): mean_y=3, mean_adj=3−1.8·(1.5−2.5)=4.8;
    // arm b: 7−1.8·1=5.2 — CUPED pulls the x-imbalanced arms together
    val df = Seq((1L, 2L, "a"), (2L, 4L, "a"), (3L, 7L, "b"),
      (4L, 7L, "b")).toDF("x", "y", "arm")
    val m = RankStats.cupedAdjust(df, "x", "y", "arm")
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(math.abs(m("a").getAs[Double]("theta") - 1.8) < 1e-12)
    assert(math.abs(m("a").getAs[Double]("rho2") - 0.9) < 1e-12)
    assert(m("a").getAs[Long]("n") === 2L &&
      m("a").getAs[Long]("sum_x") === 3L)
    assert(math.abs(m("a").getAs[Double]("mean_adj") - 4.8) < 1e-12)
    assert(math.abs(m("b").getAs[Double]("mean_adj") - 5.2) < 1e-12)
  }

  test("cupedAdjust: a constant covariate means nothing to adjust with " +
    "(theta NULL, mean_adj = mean_y)") {
    val df = Seq((5L, 2L, "a"), (5L, 4L, "a"), (5L, 8L, "b"))
      .toDF("x", "y", "arm")
    val m = RankStats.cupedAdjust(df, "x", "y", "arm")
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(m("a").isNullAt(m("a").fieldIndex("theta")))
    assert(m("a").getAs[Double]("mean_adj") ===
      m("a").getAs[Double]("mean_y"))
  }

  test("upliftCurve: hand-computed cumulative uplift and qini; blocked " +
    "scan equivalence; contracts raise") {
    val df = Seq((2L, "t", 1L), (2L, "c", 0L), (1L, "t", 0L),
      (1L, "c", 1L)).toDF("s", "arm", "y")
    def rows(mb: Long) = RankStats.upliftCurve(df, "s", "arm", "t", "y",
      maxBlocks = mb).orderBy(col("score").desc)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    val got = rows(1L << 20)
    // top bucket: 1 treated converter vs 0 control → uplift 1, qini 1;
    // whole population: 1 vs 1 → uplift 0, qini 0
    assert(got === Seq((2L, 1L, 1L, 1L, 0L, 1.0, 1.0),
      (1L, 2L, 2L, 1L, 1L, 0.0, 0.0)))
    assert(rows(2L) === got)
    intercept[Exception] {
      RankStats.upliftCurve(
        Seq((1L, "t", 2L)).toDF("s", "arm", "y"), "s", "arm", "t", "y")
        .collect()
    }
  }

  test("diffInDiff: hand-computed contrast with Welch SE") {
    // treated deltas {4, 6} (mean 5, var 2); control {1, 3} (mean 2,
    // var 2): did = 3, se = √(2/2 + 2/2) = √2
    val df = Seq((0L, 4L, "t"), (0L, 6L, "t"), (0L, 1L, "c"),
      (0L, 3L, "c")).toDF("pre", "post", "arm")
    val r = RankStats.diffInDiff(df, "pre", "post", "arm", "t").head()
    assert(r.getAs[Long]("n_t") === 2L && r.getAs[Long]("n_c") === 2L)
    assert(math.abs(r.getAs[Double]("mean_diff_t") - 5.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("did") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 3.0 / math.sqrt(2.0)) < 1e-12)
    // single-unit arms have no delta variance → se/z NULL
    val tiny = RankStats.diffInDiff(
      Seq((0L, 4L, "t"), (0L, 1L, "c")).toDF("pre", "post", "arm"),
      "pre", "post", "arm", "t").head()
    assert(tiny.isNullAt(tiny.fieldIndex("se")) &&
      tiny.isNullAt(tiny.fieldIndex("z")))
    assert(math.abs(tiny.getAs[Double]("did") - 3.0) < 1e-12)
    // an empty arm has no contrast — loudly, not zero rows
    val ex = intercept[Exception] {
      RankStats.diffInDiff(
        Seq((0L, 4L, "t"), (0L, 6L, "t")).toDF("pre", "post", "arm"),
        "pre", "post", "arm", "t").collect()
    }
    assert(ex.getMessage.contains("control arm"))
  }

  test("stratifiedAte: standardization removes a planted Simpson " +
    "imbalance; one-arm strata drop loudly into n_dropped") {
    // stratum a: 1 treated {0} vs 3 control {0,0,0} — contrast 0;
    // stratum b: 3 treated {1,1,1} vs 1 control {1} — contrast 0;
    // stratum z: treated only → dropped.
    // naive over used: 3/4 − 1/4 = 0.5; stratified: exactly 0.
    val df = Seq(
      ("a", "t", 0L), ("a", "c", 0L), ("a", "c", 0L), ("a", "c", 0L),
      ("b", "t", 1L), ("b", "t", 1L), ("b", "t", 1L), ("b", "c", 1L),
      ("z", "t", 1L)).toDF("s", "arm", "y")
    val r = RankStats.stratifiedAte(df, "s", "arm", "t", "y").head()
    assert(r.getAs[Long]("n_used") === 8L &&
      r.getAs[Long]("n_strata") === 2L &&
      r.getAs[Long]("n_dropped") === 1L)
    assert(math.abs(r.getAs[Double]("ate_naive") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("ate_strat")) < 1e-12)
    // single-unit arms in both strata → no variance → se NULL
    assert(r.isNullAt(r.fieldIndex("se")))
    // balanced case: hand-computed stratified variance
    val bal = Seq(
      ("a", "t", 1L), ("a", "t", 0L), ("a", "c", 0L), ("a", "c", 0L),
      ("b", "t", 1L), ("b", "t", 1L), ("b", "c", 1L), ("b", "c", 0L))
      .toDF("s", "arm", "y")
    val b = RankStats.stratifiedAte(bal, "s", "arm", "t", "y").head()
    assert(math.abs(b.getAs[Double]("ate_strat") - 0.5) < 1e-12)
    assert(math.abs(b.getAs[Double]("se") - math.sqrt(0.125)) < 1e-12)
    // MIXED: one stratum with a 1-unit arm next to a balanced one —
    // a partial variance sum would understate se; it must be NULL
    val mixed = Seq(
      ("a", "t", 1L), ("a", "t", 0L), ("a", "c", 0L), ("a", "c", 1L),
      ("b", "t", 1L), ("b", "c", 0L), ("b", "c", 1L))
      .toDF("s", "arm", "y")
    val mx = RankStats.stratifiedAte(mixed, "s", "arm", "t", "y").head()
    assert(mx.getAs[Long]("n_strata") === 2L)
    assert(mx.isNullAt(mx.fieldIndex("se")) &&
      mx.isNullAt(mx.fieldIndex("z")),
      "a single under-sized stratum-arm must NULL the whole se")
  }

  test("sequentialBoundary: hand-computed running z vs the OBF-shaped " +
    "boundary; an overwhelming effect crosses") {
    val df = (Seq.fill(2)(("t", 1L, 1L)) ++ Seq.fill(2)(("c", 1L, 0L)) ++
      Seq(("t", 2L, 0L), ("c", 2L, 1L))).toDF("arm", "d", "y")
    val m = RankStats.sequentialBoundary(df, "d", "arm", "t", "y")
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    // day 1: z = (1−0)/√0.25 = 2, f = 4/6 → boundary ≈ 3.4254
    assert(math.abs(m(1L).getAs[Double]("z") - 2.0) < 1e-12)
    assert(math.abs(m(1L).getAs[Double]("boundary") -
      2.7969 / math.sqrt(4.0 / 6.0)) < 1e-12)
    assert(!m(1L).getAs[Boolean]("crossed"))
    // day 2: z = (2/3 − 1/3)/√(1/6), f = 1
    assert(math.abs(m(2L).getAs[Double]("z") -
      (1.0 / 3.0) / math.sqrt(1.0 / 6.0)) < 1e-12)
    assert(!m(2L).getAs[Boolean]("crossed"))
    // overwhelming one-day effect crosses the full-information bound
    val big = (Seq.fill(50)(("t", 1L, 1L)) ++ Seq.fill(50)(("c", 1L, 0L)))
      .toDF("arm", "d", "y")
    val r = RankStats.sequentialBoundary(big, "d", "arm", "t", "y").head()
    assert(math.abs(r.getAs[Double]("z") - 10.0) < 1e-12)
    assert(r.getAs[Boolean]("crossed"))
  }

  test("kendallTau: NULL values raise loudly") {
    val df = Seq((Some(1L), 1L), (None, 2L)).toDF("x", "y")
    intercept[Exception] {
      RankStats.kendallTau(df, "x", "y").collect()
    }
  }
}
