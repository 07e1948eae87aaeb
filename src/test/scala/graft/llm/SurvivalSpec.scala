package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Survival against hand-computed product-limit and Mantel–Haenszel
  * cases: exact risk-set integers, the censoring-vs-event step
  * semantics, the d = n_risk extinction pin, the blocked value space,
  * and the loud duration/event/group contracts.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(Long, Long)], maxBlocks: Long = 1L << 20) =
    Survival.kaplanMeier(rows.toDF("t", "e"), "t", "e", maxBlocks)
      .orderBy("t")
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        round(col("survival"), 6).as("s"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq

  test("kaplanMeier: textbook curve with interleaved censoring") {
    // (1,ev) (2,cens) (3,ev) (4,ev) (5,cens) (6,ev):
    //   S(1)=5/6, S(2)=5/6 (censor step), S(3)=5/6·3/4=0.625,
    //   S(4)=0.625·2/3=5/12, S(5)=5/12, S(6): d=n_risk → exactly 0
    val got = km(Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L),
      (6L, 1L)))
    assert(got === Seq(
      (1L, 6L, 1L, 0L, 0.833333),
      (2L, 5L, 0L, 1L, 0.833333),
      (3L, 4L, 1L, 0L, 0.625),
      (4L, 3L, 1L, 0L, 0.416667),
      (5L, 2L, 0L, 1L, 0.416667),
      (6L, 1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: tied deaths and a same-time censor share one row") {
    // t=2: n=4, d=2, c=1 → S=0.5; t=5: last subject dies → 0
    val got = km(Seq((2L, 1L), (2L, 1L), (2L, 0L), (5L, 1L)))
    assert(got === Seq((2L, 4L, 2L, 1L, 0.5), (5L, 1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: identical curve under a blocked value space") {
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L),
      (6L, 1L))
    assert(km(rows, maxBlocks = 2) === km(rows))
  }

  test("kaplanMeier: duration/event contracts raise loudly") {
    val nullDur = Seq((Some(1L), 1L), (None, 1L))
      .toDF("t", "e")
    intercept[Exception] {
      Survival.kaplanMeier(nullDur, "t", "e").collect()
    }
    intercept[Exception] {
      Survival.kaplanMeier(Seq((-1L, 1L)).toDF("t", "e"), "t", "e")
        .collect()
    }
    intercept[Exception] {
      Survival.kaplanMeier(Seq((1L, 2L)).toDF("t", "e"), "t", "e")
        .collect()
    }
  }

  test("nelsonAalen: hand-computed cumulative hazard and variance") {
    // (1,ev) (2,cens) (3,ev) (3,ev): H = 1/4, 1/4, 1/4+2/2;
    // var = 1/16, 1/16, 1/16+2/4
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L)).toDF("t", "e")
    val got = Survival.nelsonAalen(df, "t", "e").orderBy("t")
      .select(col("t"), col("n_risk"), col("d"),
        round(col("cum_hazard"), 9).as("h"),
        round(col("var_hazard"), 9).as("v"))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 1L, 0.25, 0.0625),
      (2L, 3L, 0L, 0.25, 0.0625),
      (3L, 2L, 2L, 1.25, 0.5625)))
  }

  test("rmst: hand-computed area under the step curve; horizon caps " +
    "and head interval") {
    // curve from the textbook case: S=1 on [0,1), 5/6 on [1,3), 0.625
    // on [3,4), 5/12 on [4,6), 0 at 6
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L),
      (6L, 1L))
    val df = rows.toDF("t", "e")
    // tau = 5: 1·1 + (5/6)·2 + 0.625·1 + (5/12)·1 = 3.708333…
    val r5 = Survival.rmst(df, "t", "e", tau = 5L).head()
    assert(r5.getAs[Long]("tau") === 5L && r5.getAs[Long]("n") === 6L)
    assert(math.abs(r5.getAs[Double]("rmst") -
      (1.0 + 5.0 / 6 * 2 + 0.625 + 5.0 / 12)) < 1e-9)
    // tau at/below the first time: S=1 throughout → rmst = tau
    val r1 = Survival.rmst(df, "t", "e", tau = 1L).head()
    assert(r1.getAs[Double]("rmst") === 1.0)
  }

  test("cumulativeIncidence: hand-computed Aalen–Johansen steps and " +
    "the sum-to-1-minus-survival invariant") {
    // (1,cause1) (2,cause2) (2,censor) (3,cause1):
    //   CIF1 = 1/4, 1/4, 3/4;  CIF2 = 0, 1/4, 1/4
    val df = Seq((1L, 1L), (2L, 2L), (2L, 0L), (3L, 1L)).toDF("t", "k")
    val got = Survival.cumulativeIncidence(df, "t", "k")
      .orderBy("cause", "t")
      .select(col("cause"), col("t"), col("n_risk"), col("d"),
        round(col("cif"), 6).as("cif"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 4L, 1L, 0.25), (1L, 2L, 3L, 0L, 0.25),
      (1L, 3L, 1L, 1L, 0.75),
      (2L, 1L, 4L, 0L, 0.0), (2L, 2L, 3L, 1L, 0.25),
      (2L, 3L, 1L, 0L, 0.25)))
    // Σ_k CIF_k(t) = 1 − Ŝ(t) exactly, at every time
    val s = Survival.kaplanMeier(
      df.select(col("t"), when(col("k") > 0, 1L).otherwise(0L).as("e")),
      "t", "e").select(col("t"), col("survival"))
    val sums = Survival.cumulativeIncidence(df, "t", "k")
      .groupBy("t").agg(sum("cif").as("cifsum"))
      .join(s, "t").collect()
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("cifsum") -
        (1.0 - r.getAs[Double]("survival"))) < 1e-12, r.toString)
    }
  }

  test("cumulativeIncidence: a negative cause raises loudly") {
    intercept[Exception] {
      Survival.cumulativeIncidence(
        Seq((1L, -1L)).toDF("t", "k"), "t", "k").collect()
    }
  }

  test("logRank: hand-computed two-group Mantel–Haenszel moments") {
    // a: (1,ev) (3,cens) (5,ev); b: (2,ev) (4,ev) (6,cens)
    //   o_minus_e = 1/2 − 2/5 − 1/3 + 1/2 = 4/15
    //   var_sum   = 1/4 + 6/25 + 2/9 + 1/4 = 866/900
    val df = Seq((1L, 1L, "a"), (3L, 0L, "a"), (5L, 1L, "a"),
      (2L, 1L, "b"), (4L, 1L, "b"), (6L, 0L, "b")).toDF("t", "e", "g")
    val r = Survival.logRank(df, "t", "e", "g").head()
    assert(r.getAs[String]("group_a") === "a")
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("d_a") === 2L && r.getAs[Long]("d_b") === 2L)
    assert(math.abs(r.getAs[Double]("o_minus_e") - 4.0 / 15) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_sum") - 866.0 / 900) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") -
      (4.0 / 15) / math.sqrt(866.0 / 900)) < 1e-12)
  }

  test("kaplanMeierByGroup: each group's curve equals batch kaplanMeier " +
    "on that group alone") {
    val df = Seq((1L, 1L, "a"), (2L, 0L, "a"), (3L, 1L, "a"),
      (1L, 1L, "b"), (4L, 1L, "b"), (5L, 0L, "b"), (6L, 1L, "b"))
      .toDF("t", "e", "g")
    val byG = Survival.kaplanMeierByGroup(df, "t", "e", "g")
      .orderBy("grp", "t").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    for (g <- Seq("a", "b")) {
      val solo = Survival.kaplanMeier(
        df.filter(col("g") === g), "t", "e").orderBy("t").collect()
      solo.foreach { r =>
        assert(byG((g, r.getLong(0))) ===
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))),
          s"group $g, t=${r.getLong(0)}")
      }
    }
  }

  test("weibullFit recovers the generating shape from uncensored " +
    "inverse-CDF durations") {
    // t_i = λ(−ln(1−u))^{1/k}, k=2, λ=500, u on a uniform grid; all
    // events — quantization to longs leaves the slope near 2
    val n = 400
    val rows = Seq.tabulate(n) { i =>
      val u = (i + 0.5) / n
      val t = 500.0 * math.pow(-math.log1p(-u), 0.5)
      (math.max(1L, math.round(t)), 1L)
    }
    val r = Survival.weibullFit(rows.toDF("t", "e"), "t", "e").head()
    val shape = r.getAs[Double]("shape")
    val scale = r.getAs[Double]("scale")
    assert(math.abs(shape - 2.0) < 0.15, s"shape $shape")
    assert(math.abs(scale - 500.0) < 40.0, s"scale $scale")
  }

  test("coxPh: a perfectly balanced design estimates beta = 0 with " +
    "hand-computed information") {
    // two subjects per x at each event time: U(0) = 0 term by term,
    // I(0) = 0.5 + 0.5 = 1 → se = 1, z = 0
    val df = Seq((1L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 0L), (2L, 1L, 1L))
      .toDF("t", "e", "x")
    val r = Survival.coxPh(df, "t", "e", "x").head()
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("n_events") === 4L)
    assert(math.abs(r.getAs[Double]("beta")) < 1e-12)
    assert(math.abs(r.getAs[Double]("se") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("z")) < 1e-12)
  }

  test("coxPh: the estimate is a root of the partial-likelihood score " +
    "computed independently from first principles") {
    // deterministic skewed data: high-x subjects fail earlier
    val subj = Seq.tabulate(40) { i =>
      val x = i % 4
      val t = 1L + ((i * 13) % 7) + (3 - x) * 2  // higher x → earlier
      val e = if (i % 5 == 0) 0L else 1L
      (t.toLong, e, x.toLong)
    }
    val r = Survival.coxPh(subj.toDF("t", "e", "x"), "t", "e", "x").head()
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.0, s"higher x must raise the hazard, got $beta")
    // definitional Breslow score at beta over raw subjects
    val eventTimes = subj.filter(_._2 == 1L).map(_._1).distinct
    val u = eventTimes.map { t =>
      val risk = subj.filter(_._1 >= t)
      val deaths = subj.filter(s => s._1 == t && s._2 == 1L)
      val rSum = risk.map(s => math.exp(beta * s._3)).sum
      val r1Sum = risk.map(s => s._3 * math.exp(beta * s._3)).sum
      deaths.map(_._3).sum - deaths.size * r1Sum / rSum
    }.sum
    assert(math.abs(u) < 1e-7, s"score at beta-hat should vanish, got $u")
  }

  test("coxPh: an over-fine grid fails the bounded-collect guard loudly") {
    val df = Seq.tabulate(20)(i => (i.toLong, 1L, i.toLong * 7L))
      .toDF("t", "e", "x")
    val ex = intercept[IllegalArgumentException] {
      Survival.coxPh(df, "t", "e", "x", maxCells = 10)
    }
    assert(ex.getMessage.contains("quantize coarser"))
  }

  test("coxPh: a constant covariate has nothing to estimate (NULLs)") {
    val df = Seq((1L, 1L, 5L), (2L, 1L, 5L), (3L, 0L, 5L))
      .toDF("t", "e", "x")
    val r = Survival.coxPh(df, "t", "e", "x").head()
    assert(r.isNullAt(r.fieldIndex("beta")) &&
      r.isNullAt(r.fieldIndex("se")) && r.isNullAt(r.fieldIndex("z")))
  }

  test("logRank: an all-censored cohort still reports its one row of " +
    "totals (zero moments, z NULL)") {
    val df = Seq((1L, 0L, "a"), (2L, 0L, "a"), (3L, 0L, "b"))
      .toDF("t", "e", "g")
    val rows = Survival.logRank(df, "t", "e", "g").collect()
    assert(rows.length === 1, "no-events input must not drop the row")
    val r = rows.head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 1L)
    assert(r.getAs[Long]("d_a") === 0L && r.getAs[Long]("d_b") === 0L)
    assert(r.getAs[Double]("o_minus_e") === 0.0 &&
      r.getAs[Double]("var_sum") === 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("logRank: z is NULL when the single event time exhausts the risk set") {
    // both groups die at t=1: n=d → var term 0/0 guarded to 0 → z NULL
    val df = Seq((1L, 1L, "a"), (1L, 1L, "b")).toDF("t", "e", "g")
    val r = Survival.logRank(df, "t", "e", "g").head()
    assert(r.getAs[Double]("var_sum") === 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("kaplanMeierCi: hand-computed Greenwood variance; log-log band " +
    "brackets the curve; extinction and S=1 rows are NULL") {
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L),
      (6L, 1L)).toDF("t", "e")
    val rows = Survival.kaplanMeierCi(df, "t", "e").orderBy("t").collect()
    def varAt(t: Long): Double = {
      val r = rows.find(_.getAs[Long]("t") == t).get
      math.rint(r.getAs[Double]("greenwood_var") * 1e6) / 1e6
    }
    // S(1)=5/6, Σ=1/(6·5)       → (5/6)²/30        = 0.023148
    // S(3)=5/8, Σ=1/30+1/(4·3)  → (5/8)²·7/60      = 0.045573
    // S(4)=5/12, Σ=…+1/(3·2)    → (5/12)²·17/60    = 0.049190
    assert(varAt(1L) === 0.023148 && varAt(2L) === 0.023148)
    assert(varAt(3L) === 0.045573)
    assert(varAt(4L) === 0.04919 && varAt(5L) === 0.04919)
    rows.filter(r => r.getAs[Long]("t") < 6L).foreach { r =>
      val s = r.getAs[Double]("survival")
      val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
      assert(0.0 < lo && lo < s && s < hi && hi < 1.0,
        s"band must bracket S strictly inside (0,1): ($lo, $s, $hi)")
    }
    val ext = rows.find(_.getAs[Long]("t") == 6L).get
    assert(ext.getAs[Double]("survival") === 0.0)
    Seq("greenwood_var", "ci_lo", "ci_hi").foreach(cn =>
      assert(ext.isNullAt(ext.fieldIndex(cn)), s"$cn at extinction"))
    // a censor-only head row: S = 1 → variance exactly 0, band NULL
    val head = Survival.kaplanMeierCi(
      Seq((1L, 0L), (2L, 1L)).toDF("t", "e"), "t", "e")
      .orderBy("t").collect().head
    assert(head.getAs[Double]("survival") === 1.0 &&
      head.getAs[Double]("greenwood_var") === 0.0)
    assert(head.isNullAt(head.fieldIndex("ci_lo")) &&
      head.isNullAt(head.fieldIndex("ci_hi")))
  }

  test("coxPh: complete separation is a NULL fit, not a runaway beta") {
    // every x=1 subject dies before any x=0 subject — monotone
    // partial likelihood, beta walks toward +inf; the closing
    // step-size check must land in the NULL branch, never return the
    // wherever-the-budget-stopped point estimate as converged
    val df = Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L),
      (4L, 1L, 0L), (5L, 1L, 0L), (6L, 1L, 0L)).toDF("t", "e", "x")
    val r = Survival.coxPh(df, "t", "e", "x").head()
    assert(r.getAs[Long]("n") === 6L && r.getAs[Long]("n_events") === 6L)
    assert(r.isNullAt(r.fieldIndex("beta")) &&
      r.isNullAt(r.fieldIndex("se")) && r.isNullAt(r.fieldIndex("z")))
  }

  test("coxPh2: an x2-balanced design decouples — beta1 matches the " +
    "one-covariate fit, beta2 vanishes; collinear covariates are NULL") {
    // duplicate every skewed-design subject once per x2 ∈ {0, 1}: by
    // symmetry u2(·, 0) = 0 and i12 = 0 term by term, so Newton keeps
    // b2 at 0 and b1 follows exactly the single-covariate trajectory
    val base = Seq.tabulate(40) { i =>
      val x = i % 4
      val t = 1L + ((i * 13) % 7) + (3 - x) * 2
      val e = if (i % 5 == 0) 0L else 1L
      (t.toLong, e, x.toLong)
    }
    val dup = base.flatMap { case (t, e, x) =>
      Seq((t, e, x, 0L), (t, e, x, 1L)) }
      .toDF("t", "e", "x1", "x2")
    val one = Survival.coxPh(base.toDF("t", "e", "x"), "t", "e", "x")
      .head().getAs[Double]("beta")
    val r = Survival.coxPh2(dup, "t", "e", "x1", "x2").head()
    assert(r.getAs[Long]("n") === 80L)
    assert(math.abs(r.getAs[Double]("beta1") - one) < 1e-8,
      s"beta1 ${r.getAs[Double]("beta1")} vs one-cov $one")
    assert(math.abs(r.getAs[Double]("beta2")) < 1e-9)
    assert(r.getAs[Double]("se1") > 0.0 && r.getAs[Double]("se2") > 0.0)
    // perfectly collinear covariates: singular information → NULL fit
    val col2 = base.map { case (t, e, x) => (t, e, x, x) }
      .toDF("t", "e", "x1", "x2")
    val rc = Survival.coxPh2(col2, "t", "e", "x1", "x2").head()
    Seq("beta1", "se1", "z1", "beta2", "se2", "z2").foreach(cn =>
      assert(rc.isNullAt(rc.fieldIndex(cn)), s"$cn under collinearity"))
  }

  test("nelsonAalen: contract violations name the actual entry point") {
    val df = Seq((Some(1L), 1L), (None, 1L)).toDF("t", "e")
    val ex = intercept[Exception] {
      Survival.nelsonAalen(df, "t", "e").collect()
    }
    assert(ex.getMessage.contains("nelsonAalen"),
      s"expected nelsonAalen in: ${ex.getMessage}")
  }

  test("logRank: a third group raises loudly") {
    val df = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"))
      .toDF("t", "e", "g")
    intercept[Exception] {
      Survival.logRank(df, "t", "e", "g").collect()
    }
  }

  test("schoenfeldPh: balanced design has zero residuals and zero " +
    "slope; residuals always sum to the (vanishing) score at beta-hat") {
    // the coxPh balanced fixture: beta-hat = 0, every risk set is
    // x-symmetric → resid(t) = s_t − d_t·0.5 = 0 at both event times
    val bal = Seq((1L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 0L), (2L, 1L, 1L))
      .toDF("t", "e", "x")
    val rows = Survival.schoenfeldPh(bal, "t", "e", "x").orderBy("t")
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("xbar") - 0.5) < 1e-12)
      assert(math.abs(r.getAs[Double]("resid")) < 1e-12)
      assert(math.abs(r.getAs[Double]("slope")) < 1e-12)
      // all-zero residuals have no correlation to report
      assert(r.isNullAt(r.fieldIndex("corr")))
    }
    // on the skewed fixture, Σ resid = U(β̂) ≈ 0 by the Newton fixed
    // point — the definitional cross-check tying the diagnostic to
    // the fit it diagnoses
    val subj = Seq.tabulate(40) { i =>
      val x = i % 4
      val t = 1L + ((i * 13) % 7) + (3 - x) * 2
      val e = if (i % 5 == 0) 0L else 1L
      (t.toLong, e, x.toLong)
    }.toDF("t", "e", "x")
    val total = Survival.schoenfeldPh(subj, "t", "e", "x")
      .agg(sum("resid")).head().getDouble(0)
    assert(math.abs(total) < 1e-6, s"sum of residuals = score = $total")
  }

  test("schoenfeldPh: a planted time-varying effect flags (|corr| " +
    "large); a non-converged fit emits zero rows") {
    // the covariate effect REVERSES: early event times are dominated
    // by x = 1 failures, late ones by x = 0 — symmetric by design so
    // the single-beta fit lands near 0 (finite, fast-converging; an
    // all-early/all-late split would be complete separation and a NULL
    // fit), leaving early residuals positive and late ones negative —
    // a strong monotone time trend
    val tv = (
      Seq.fill(3)((1L, 1L, 1L)) ++ Seq((1L, 1L, 0L)) ++
      Seq.fill(3)((2L, 1L, 1L)) ++ Seq((2L, 1L, 0L)) ++
      Seq((11L, 1L, 1L)) ++ Seq.fill(3)((11L, 1L, 0L)) ++
      Seq((12L, 1L, 1L)) ++ Seq.fill(3)((12L, 1L, 0L))
    ).toDF("t", "e", "x")
    val d = Survival.schoenfeldPh(tv, "t", "e", "x").collect()
    assert(d.nonEmpty)
    val corr = d.head.getAs[Double]("corr")
    assert(math.abs(corr) > 0.8,
      s"time-varying effect must show a residual-vs-time trend: $corr")
    // constant covariate: coxPh returns a NULL fit — the diagnostic of
    // a fit that doesn't exist is ZERO rows, not residuals at beta=0
    val const = Seq((1L, 1L, 5L), (2L, 1L, 5L), (3L, 0L, 5L))
      .toDF("t", "e", "x")
    assert(Survival.schoenfeldPh(const, "t", "e", "x").count() === 0L)
  }

  test("schoenfeldPh2: a time-varying effect planted on x1 ONLY flags " +
    "x1's corr, not x2's; residuals sum to the vanishing score") {
    // x1: the schoenfeldPh reversal fixture (early failures dominated
    // by x1=1, late by x1=0 — symmetric, so the fit converges near 0
    // with a strong residual-vs-time trend). x2: every row DOUBLED
    // over x2 ∈ {0, 1}, perfectly balanced within each (t, x1) cell —
    // its risk sets stay symmetric, so resid2(t) = 0 identically and
    // the all-zero residual stream has no correlation to report.
    val base =
      Seq.fill(3)((1L, 1L, 1L)) ++ Seq((1L, 1L, 0L)) ++
      Seq.fill(3)((2L, 1L, 1L)) ++ Seq((2L, 1L, 0L)) ++
      Seq((11L, 1L, 1L)) ++ Seq.fill(3)((11L, 1L, 0L)) ++
      Seq((12L, 1L, 1L)) ++ Seq.fill(3)((12L, 1L, 0L))
    val tv2 = base.flatMap { case (t, e, x1) =>
      Seq((t, e, x1, 0L), (t, e, x1, 1L)) }
      .toDF("t", "e", "x1", "x2")
    val d = Survival.schoenfeldPh2(tv2, "t", "e", "x1", "x2")
      .orderBy("t").collect()
    assert(d.nonEmpty, "converged fit must emit residual rows")
    val corr1 = d.head.getAs[Double]("corr1")
    assert(math.abs(corr1) > 0.8,
      s"planted x1 time-variation must flag corr1: $corr1")
    d.foreach { r =>
      assert(math.abs(r.getAs[Double]("xbar2") - 0.5) < 1e-9)
      assert(math.abs(r.getAs[Double]("resid2")) < 1e-9)
      assert(r.isNullAt(r.fieldIndex("corr2")),
        "x2's all-zero residuals have no correlation to report")
    }
    // Σ resid_j = U_j(β̂) ≈ 0 — the definitional tie to the fit
    val sums = Survival.schoenfeldPh2(tv2, "t", "e", "x1", "x2")
      .agg(sum("resid1"), sum("resid2")).head()
    assert(math.abs(sums.getDouble(0)) < 1e-6, s"score1 = ${sums.getDouble(0)}")
    assert(math.abs(sums.getDouble(1)) < 1e-6, s"score2 = ${sums.getDouble(1)}")
    // a collinear pair (x2 = x1) is a singular information matrix →
    // NULL fit → the diagnostic is ZERO rows, not residuals at 0
    val collinear = base.map { case (t, e, x) => (t, e, x, x) }
      .toDF("t", "e", "x1", "x2")
    assert(Survival.schoenfeldPh2(collinear, "t", "e", "x1", "x2")
      .count() === 0L)
  }

  test("cumulativeIncidenceCi: the single-cause case reduces exactly " +
    "to the Greenwood variance and band of 1 − KM") {
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L),
      (6L, 0L), (7L, 1L))
    val cifCi = Survival.cumulativeIncidenceCi(
        rows.toDF("t", "k"), "t", "k")
      .filter(col("cause") === 1L)
      .select("t", "cif", "var_cif", "ci_lo", "ci_hi")
      .collect().map(r => r.getLong(0) -> r).toMap
    val kmCi = Survival.kaplanMeierCi(
        rows.toDF("t", "e"), "t", "e")
      .select("t", "survival", "greenwood_var", "ci_lo", "ci_hi")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(cifCi.keySet === kmCi.keySet)
    kmCi.foreach { case (t, k) =>
      val c = cifCi(t)
      assert(math.abs(c.getAs[Double]("cif") -
        (1.0 - k.getAs[Double]("survival"))) < 1e-12, s"cif at $t")
      assert(math.abs(c.getAs[Double]("var_cif") -
        k.getAs[Double]("greenwood_var")) < 1e-12, s"var at $t")
      // F-band = 1 − the mirrored S-band (when both defined: S < 1)
      if (!k.isNullAt(k.fieldIndex("ci_lo"))) {
        assert(math.abs(c.getAs[Double]("ci_lo") -
          (1.0 - k.getAs[Double]("ci_hi"))) < 1e-12, s"ci_lo at $t")
        assert(math.abs(c.getAs[Double]("ci_hi") -
          (1.0 - k.getAs[Double]("ci_lo"))) < 1e-12, s"ci_hi at $t")
      }
    }
  }

  test("cumulativeIncidenceCi: matches a direct O(T²) evaluation of " +
    "the Gaynor delta-method formula on a two-cause fixture") {
    val raw = Seq((1L, 1L), (2L, 2L), (2L, 0L), (3L, 1L), (4L, 2L),
      (5L, 0L), (6L, 1L), (6L, 2L), (7L, 0L), (8L, 1L))
    val got = Survival.cumulativeIncidenceCi(
        raw.toDF("t", "k"), "t", "k")
      .orderBy("cause", "t").collect()
    // independent direct evaluation from the raw subjects
    val times = raw.map(_._1).distinct.sorted
    val n = raw.size
    def nRisk(t: Long): Int = raw.count(_._1 >= t)
    def dAll(t: Long): Int = raw.count(r => r._1 == t && r._2 > 0)
    def dK(t: Long, k: Long): Int = raw.count(r => r._1 == t && r._2 == k)
    def surv(t: Long): Double = times.filter(_ <= t)
      .map(u => 1.0 - dAll(u).toDouble / nRisk(u)).product
    def sPrev(t: Long): Double = times.filter(_ < t)
      .map(u => 1.0 - dAll(u).toDouble / nRisk(u)).product
    def cif(t: Long, k: Long): Double = times.filter(_ <= t)
      .map(u => sPrev(u) * dK(u, k).toDouble / nRisk(u)).sum
    def varCif(t: Long, k: Long): Double = {
      val us = times.filter(_ <= t)
      us.map { u =>
        val nu = nRisk(u).toDouble; val du = dAll(u).toDouble
        val dku = dK(u, k).toDouble
        val a = cif(t, k) - cif(u, k)
        (if (du > 0 && du < nu) a * a * du / (nu * (nu - du)) else 0.0) +
          sPrev(u) * sPrev(u) * dku * (nu - dku) / (nu * nu * nu) -
          2.0 * a * sPrev(u) * dku / (nu * nu)
      }.sum
    }
    // risk-set extinction time (t=8 exits the last subject by event):
    // the d/(n(n−d)) term is 0/0·∞ there, and the engine NULLs the
    // variance from extinction on (the Greenwood stance) rather than
    // adopting the skip-the-term convention the naive evaluator uses
    val extinct = times.filter(t => dAll(t) == nRisk(t)).min
    assert(got.nonEmpty)
    got.foreach { r =>
      val (t, k) = (r.getAs[Long]("t"), r.getAs[Long]("cause"))
      assert(math.abs(r.getAs[Double]("cif") - cif(t, k)) < 1e-12,
        s"cif($t, $k)")
      if (t >= extinct) {
        assert(r.isNullAt(r.fieldIndex("var_cif")), s"var_cif($t, $k)")
        assert(r.isNullAt(r.fieldIndex("ci_lo")), s"ci_lo($t, $k)")
      } else {
        assert(math.abs(r.getAs[Double]("var_cif") - varCif(t, k)) < 1e-12,
          s"var_cif($t, $k)")
        // band semantics: NULL while this cause has no events yet;
        // otherwise a proper interval around the estimate
        if (cif(t, k) == 0.0) assert(r.isNullAt(r.fieldIndex("ci_lo")))
        else {
          assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("cif") + 1e-12)
          assert(r.getAs[Double]("ci_hi") >= r.getAs[Double]("cif") - 1e-12)
        }
      }
    }
  }

  test("cumulativeIncidenceCi: variance and band are NULL from " +
    "risk-set extinction onward") {
    // t=2 exhausts the risk set (both remaining subjects exit by event)
    val df = Seq((1L, 1L), (2L, 1L), (2L, 2L)).toDF("t", "k")
    val last = Survival.cumulativeIncidenceCi(df, "t", "k")
      .filter(col("t") === 2L).collect()
    assert(last.nonEmpty)
    last.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("var_cif")))
      assert(r.isNullAt(r.fieldIndex("ci_lo")))
      assert(r.isNullAt(r.fieldIndex("ci_hi")))
    }
  }
}
