package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("pairs: tie rules, margin gate, and single-candidate prompts") {
    // prompt 1: clear winner/loser, margin 80 < 100 → dropped
    // prompt 2: margin 150, score tie at the top (cands 20,21 both 200)
    //   → chosen = LOWER cand 20; tie at the bottom (22,23 both 50)
    //   → rejected = HIGHER cand 23
    // prompt 3: single candidate → dropped (chosen would equal rejected)
    val cands = Seq(
      (1L, 10L, 100L, 500L), (1L, 11L, 180L, 400L),
      (2L, 20L, 200L, 300L), (2L, 21L, 200L, 310L),
      (2L, 22L, 50L, 320L), (2L, 23L, 50L, 330L),
      (3L, 30L, 999L, 100L)
    ).toDF("prompt_id", "cand_id", "score", "len")
    val got = Preference.pairs(cands, "prompt_id", "cand_id", "score", "len",
      minMargin = 100L).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("prompt_id") === 2L)
    assert(r.getAs[Long]("chosen_id") === 20L)
    assert(r.getAs[Long]("rejected_id") === 23L)
    assert(r.getAs[Long]("margin") === 150L)
    assert(r.getAs[Long]("chosen_len") === 300L)
    assert(r.getAs[Long]("rejected_len") === 330L)
  }

  test("pairs plans as one hash aggregate, not a per-prompt window sort") {
    val cands = Seq((1L, 10L, 100L, 500L)).toDF("prompt_id", "cand_id", "score", "len")
    val plan = Preference.pairs(cands, "prompt_id", "cand_id", "score", "len", 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("fleissKappa: hand-computed binary panel") {
    // 4 items, 3 raters; n1 per item = 3,0,2,1
    // pi_num = 6,6,2,2 → pn=16 → p_bar=16/24=2/3
    // s1=6 → p1=0.5 → p_e=0.5 → kappa=(2/3-1/2)/(1/2)=1/3
    val votes = Seq(
      (1L, 1), (1L, 1), (1L, 1),
      (2L, 0), (2L, 0), (2L, 0),
      (3L, 1), (3L, 1), (3L, 0),
      (4L, 1), (4L, 0), (4L, 0)
    ).toDF("item", "vote")
    val r = Preference.fleissKappa(votes, "item", "vote", n = 3).collect().head
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("n_invalid_items") === 0L)
    assert(r.getAs[Double]("p_bar") === 0.666667)
    assert(r.getAs[Double]("p_e") === 0.5)
    assert(r.getAs[Double]("kappa") === 0.333333)
  }

  test("fleissKappa: short/over-full panels are excluded and counted, not folded in") {
    // items 1-4 as above, plus a 2-vote item and a 4-vote item — both
    // violate the n=3 panel contract and must not corrupt the kappa
    // (pre-fix they fed the fixed-n algebra and silently shifted it)
    val votes = Seq(
      (1L, 1), (1L, 1), (1L, 1),
      (2L, 0), (2L, 0), (2L, 0),
      (3L, 1), (3L, 1), (3L, 0),
      (4L, 1), (4L, 0), (4L, 0),
      (5L, 1), (5L, 1), // short panel
      (6L, 0), (6L, 0), (6L, 1), (6L, 1) // over-full panel
    ).toDF("item", "vote")
    val r = Preference.fleissKappa(votes, "item", "vote", n = 3).collect().head
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("n_invalid_items") === 2L)
    assert(r.getAs[Double]("p_bar") === 0.666667)
    assert(r.getAs[Double]("p_e") === 0.5)
    assert(r.getAs[Double]("kappa") === 0.333333)
  }

  test("fleissKappa: no valid panel at all -> (0, k, NULL, NULL, NULL)") {
    val votes = Seq((1L, 1), (2L, 0)).toDF("item", "vote")
    val r = Preference.fleissKappa(votes, "item", "vote", n = 3).collect().head
    assert(r.getAs[Long]("n_items") === 0L)
    assert(r.getAs[Long]("n_invalid_items") === 2L)
    assert(r.isNullAt(r.fieldIndex("p_bar")))
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("fleissKappa: unanimous panel has p_e = 1 and NULL kappa") {
    val votes = Seq((1L, 1), (1L, 1), (2L, 1), (2L, 1))
      .toDF("item", "vote")
    val r = Preference.fleissKappa(votes, "item", "vote", n = 2).collect().head
    assert(r.getAs[Double]("p_e") === 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("btStrengths: 3:1 head-to-head fixes at the 3:1 strength ratio") {
    // A beats B 3x, B beats A 1x — MM fixed point: s_A/s_B = W_A/W_B
    val o = Seq(("A", "B", 3L), ("B", "A", 1L)).toDF("w", "l", "n")
    val got = Preference.btStrengths(o, "w", "l", "n", iters = 3)
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("A", 1500000L, 3L), ("B", 500000L, 1L)))
  }

  test("btStrengths: never-winners floor at 0; results are deterministic") {
    val o = Seq(("A", "B", 2L), ("A", "C", 2L), ("C", "B", 1L))
      .toDF("w", "l", "n")
    def run() = Preference.btStrengths(o, "w", "l", "n", iters = 3)
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val g1 = run()
    assert(g1 === run()) // bit-identical across runs (integer fixed-point)
    val byItem = g1.map(t => t._1 -> t._2).toMap
    assert(byItem("B") === 0L) // B never wins
    assert(byItem("A") > byItem("C") && byItem("C") > byItem("B"))
    assert(g1.map(_._3).sum === 5L)
  }

  test("lengthBias: buckets, cap, and equal-length exclusion") {
    val pairs = Seq(
      (1L, 310L, 300L),  // delta +10 → bucket 0, longer won
      (2L, 300L, 330L),  // delta -30 → bucket 0, shorter won
      (3L, 500L, 300L),  // delta +200 → bucket 4
      (4L, 300L, 9300L), // |delta| 9000 → capped bucket 5
      (5L, 400L, 400L)   // equal → excluded
    ).toDF("prompt_id", "chosen_len", "rejected_len")
    val got = Preference.lengthBias(pairs, "chosen_len", "rejected_len",
        bucketWidth = 50L, maxBucket = 5L)
      .orderBy("gap_bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (0L, 2L, 1L, 0.5), (4L, 1L, 1L, 1.0), (5L, 1L, 0L, 0.0)))
  }

  test("rougeN: clipped bigram counts on a handcrafted pair") {
    // ref "a b a b c": bigrams {a b:2, b a:1, b c:1} (4 total)
    // cand "a b a d":  bigrams {a b:1, b a:1, a d:1} (3 total)
    // clipped match = min(2,1)+min(1,1) = 2 → P=2/3, R=1/2, F1=4/7
    val pairs = Seq(
      (1L, "a b a b c", "a b a d"),
      (2L, "x y", "")
    ).toDF("pair_id", "ref_text", "cand_text")
    val got = Evals.rougeN(pairs, "pair_id", "ref_text", "cand_text", n = 2)
      .orderBy("pair_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("match_n") === 2L)
    assert(r1.getAs[Long]("ref_n") === 4L)
    assert(r1.getAs[Long]("cand_n") === 3L)
    assert(r1.getAs[Double]("precision") === 0.666667)
    assert(r1.getAs[Double]("recall") === 0.5)
    assert(r1.getAs[Double]("f1") === 0.571429)
    // empty candidate: no bigrams → all zeros, no NaN
    val r2 = got(1)
    assert(r2.getAs[Long]("match_n") === 0L && r2.getAs[Long]("cand_n") === 0L)
    assert(r2.getAs[Double]("precision") === 0.0 &&
      r2.getAs[Double]("f1") === 0.0)
  }

  test("wilsonPassRate: 70/100 matches the closed form; bounds bracket p") {
    val df = (1 to 100).map(i => ("g", if (i <= 70) 1 else 0)).toDF("grp", "pass")
    val r = Evals.wilsonPassRate(df, "grp", "pass").collect().head
    assert(r.getAs[Long]("n") === 100L && r.getAs[Long]("passes") === 70L)
    assert(r.getAs[Double]("pass_rate") === 0.7)
    val (lo, hi) = (r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
    assert(math.abs(lo - 0.604151) < 0.0005, s"lo=$lo")
    assert(math.abs(hi - 0.781054) < 0.0005, s"hi=$hi")
    assert(lo > 0.0 && lo < 0.7 && hi > 0.7 && hi < 1.0)
  }

  test("krippendorffAlpha: hand-computed variable panels; singles excluded") {
    // item A: [1,0] (m=2), item B: [1,1,0] (m=3), item C: [0] (m=1,
    // unpairable). n=5, n1=3, n0=2, Do = 1·1/1 + 2·1/2 = 2,
    // alpha = 1 − (5−1)·2/(3·2) = −1/3
    val votes = Seq(
      ("A", 1), ("A", 0),
      ("B", 1), ("B", 1), ("B", 0),
      ("C", 0)).toDF("item", "vote")
    val r = Preference.krippendorffAlpha(votes, "item", "vote").collect().head
    assert(r.getAs[Long]("n_items") === 2L)
    assert(r.getAs[Long]("n_single_items") === 1L)
    assert(r.getAs[Long]("n_values") === 5L)
    assert(r.getAs[Long]("n_ones") === 3L)
    assert(r.getAs[Double]("alpha") === -0.333333)
  }

  test("krippendorffAlpha: perfect within-item agreement -> 1; " +
      "one-category data -> NULL; no pairable item -> NULL") {
    val perfect = Seq(("A", 1), ("A", 1), ("B", 0), ("B", 0))
      .toDF("item", "vote")
    assert(Preference.krippendorffAlpha(perfect, "item", "vote")
      .collect().head.getAs[Double]("alpha") === 1.0)
    val oneCat = Seq(("A", 1), ("A", 1), ("B", 1)).toDF("item", "vote")
    assert(Preference.krippendorffAlpha(oneCat, "item", "vote")
      .collect().head.isNullAt(4))
    val singles = Seq(("A", 1), ("B", 0)).toDF("item", "vote")
    val r = Preference.krippendorffAlpha(singles, "item", "vote")
      .collect().head
    assert(r.getAs[Long]("n_items") === 0L && r.isNullAt(4))
  }

  test("krippendorffAlpha: a panel past 10 raters raises, never floors") {
    val big = (1 to 11).map(i => ("A", i % 2)).toDF("item", "vote")
    val e = intercept[Exception] {
      Preference.krippendorffAlpha(big, "item", "vote").collect()
    }
    assert(e.getMessage.contains("krippendorffAlpha") ||
      Option(e.getCause).exists(_.getMessage.contains("krippendorffAlpha")),
      e.toString)
  }

  test("calibrationBins: hand-computed bins; the 1.0 edge folds into " +
      "the top bin; ece_contrib sums to the ECE") {
    // bin 0: (50,0),(50,1) → avg_conf .05, acc .5, contrib (2/3)·.45
    // conf 1000 → bin 9 (not 10): (1000,1) → gap 0, contrib 0
    val df = Seq((50, 0), (50, 1), (1000, 1)).toDF("c", "y")
    val got = Evals.calibrationBins(df, "c", "y", nBins = 10)
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("bin")).toSeq === Seq(0L, 9L))
    val b0 = got(0)
    assert(b0.getAs[Long]("n") === 2L &&
      b0.getAs[Long]("conf_sum_milli") === 100L &&
      b0.getAs[Long]("n_pos") === 1L)
    assert(b0.getAs[Double]("avg_conf") === 0.05)
    assert(b0.getAs[Double]("accuracy") === 0.5)
    assert(b0.getAs[Double]("ece_contrib") === 0.3)
    val b9 = got(1)
    assert(b9.getAs[Double]("avg_conf") === 1.0 &&
      b9.getAs[Double]("accuracy") === 1.0 &&
      b9.getAs[Double]("ece_contrib") === 0.0)
    val ece = got.map(_.getAs[Double]("ece_contrib")).sum
    assert(math.abs(ece - 0.3) < 1e-9)
  }

  test("winRateMatrix: unordered pairs fold; wins split by canonical side") {
    // A beats B 3x, B beats A 1x, C beats A 2x
    val o = Seq(("A", "B", 3L), ("B", "A", 1L), ("C", "A", 2L))
      .toDF("w", "l", "n")
    val got = Preference.winRateMatrix(o, "w", "l", "n")
      .orderBy("lo", "hi").collect()
    assert(got.length === 2)
    val ab = got(0)
    assert(ab.getAs[String]("lo") === "A" && ab.getAs[String]("hi") === "B")
    assert(ab.getAs[Long]("wins_lo") === 3L && ab.getAs[Long]("wins_hi") === 1L)
    assert(ab.getAs[Long]("n_games") === 4L)
    assert(ab.getAs[Double]("win_rate_lo") === 0.75)
    val ac = got(1)
    assert(ac.getAs[String]("lo") === "A" && ac.getAs[String]("hi") === "C")
    assert(ac.getAs[Long]("wins_lo") === 0L && ac.getAs[Long]("wins_hi") === 2L)
  }

  test("mcnemar: discordant cells, the clamped corrected statistic, " +
      "and the all-concordant NULL") {
    // g1: 10 items, A right on 6 (1..6), B right on 6 (3..8):
    // n01 = {7,8} = 2, n10 = {1,2} = 2 -> balanced discordance, the
    // clamp keeps the no-signal point at exactly 0 (the unclamped
    // textbook form would report a spurious 0.25)
    val g1 = (1 to 10).map(i =>
      ("g1", if (i <= 6) 1 else 0, if (i >= 3 && i <= 8) 1 else 0))
    // g2: always agree -> no discordant pair -> NULL
    val g2 = (1 to 4).map(i => ("g2", i % 2, i % 2))
    // g3: n01 = 3, n10 = 1 -> (|3-1|-1)^2/(3+1) = 0.25
    val g3 = Seq(("g3", 0, 1), ("g3", 0, 1), ("g3", 0, 1), ("g3", 1, 0))
    val df = (g1 ++ g2 ++ g3).toDF("grp", "a", "b")
    val got = Evals.mcnemar(df, "grp", "a", "b").orderBy("grp").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n01") === 2L && r1.getAs[Long]("n10") === 2L)
    assert(r1.getAs[Double]("mcnemar_chi2") === 0.0)
    assert(got(1).isNullAt(4))
    val r3 = got(2)
    assert(r3.getAs[Long]("n01") === 3L && r3.getAs[Long]("n10") === 1L)
    assert(r3.getAs[Double]("mcnemar_chi2") === 0.25)
  }

  test("krippendorffAlpha rejects non-binary votes; calibrationBins " +
      "rejects out-of-range confidences (no silent bins)") {
    val bad = Seq(("A", 2), ("A", 0)).toDF("item", "vote")
    val e1 = intercept[Exception] {
      Preference.krippendorffAlpha(bad, "item", "vote").collect()
    }
    assert(e1.toString.contains("non-binary") ||
      Option(e1.getCause).exists(_.toString.contains("non-binary")),
      e1.toString)
    val neg = Seq((-5, 0)).toDF("c", "y")
    intercept[Exception] {
      Evals.calibrationBins(neg, "c", "y").collect()
    }
    val over = Seq((1500, 1)).toDF("c", "y")
    intercept[Exception] {
      Evals.calibrationBins(over, "c", "y").collect()
    }
  }
}
