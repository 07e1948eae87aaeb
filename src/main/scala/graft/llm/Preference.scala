package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** Preference-data (RLHF/reward-model) pipeline operators: chosen/
  * rejected pair construction from scored candidate pools, annotator
  * agreement, Bradley–Terry strength fitting, and the length-bias
  * audit every preference dataset needs before reward-model training.
  *
  * Reference has no preference tooling (its scope is relational
  * ingestion); this family exists because a training-data engine
  * feeding an LLM stack curates preference corpora with exactly these
  * shapes. Scale posture: every face is one keyed shuffle (groupBy on
  * the prompt/item key) or a bounded-iteration loop of item-keyed
  * joins — no windows over unkeyed frames, no driver-side collects.
  */
object Preference {

  /** Per-prompt chosen/rejected construction: among each prompt's
    * scored candidates, chosen = highest score (tie → LOWEST candidate
    * id), rejected = lowest score (tie → HIGHEST candidate id); pairs
    * below `minMargin` — too-close-to-call labels that teach a reward
    * model noise — are dropped, as are single-candidate prompts
    * (chosen would equal rejected).
    *
    * ONE groupBy shuffle via struct max/min (partial-agg friendly — a
    * per-prompt window would sort every partition instead of folding
    * map-side). Lexicographic struct order encodes the tie rules:
    * `max(struct(score, -cand))` picks max score then max(-cand) =
    * min cand; `min` of the same struct picks min score then max cand.
    */
  def pairs(df: DataFrame, promptCol: String, candCol: String,
            scoreCol: String, lenCol: String, minMargin: Long): DataFrame = {
    // the tie rule rides `-cand` inside the struct order; a string id
    // would cast to NULL there and silently INVERT both ties — demand a
    // numeric id up front (string ids: derive one, e.g. xxhash64)
    require(df.schema(candCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"pairs needs a numeric candidate id column, got " +
        s"$candCol: ${df.schema(candCol).dataType.simpleString}")
    val side = struct(col(scoreCol).as("s"),
      (-col(candCol)).as("nc"), col(candCol).as("id"), col(lenCol).as("len"))
    df.groupBy(col(promptCol))
      .agg(max(side).as("ch"), min(side).as("rj"))
      .filter(col("ch.id") =!= col("rj.id") &&
        col("ch.s") - col("rj.s") >= minMargin)
      .select(col(promptCol),
        col("ch.id").as("chosen_id"), col("rj.id").as("rejected_id"),
        (col("ch.s") - col("rj.s")).as("margin"),
        col("ch.len").as("chosen_len"), col("rj.len").as("rejected_len"))
  }

  /** Fleiss' kappa for BINARY votes with a CONSTANT panel of `n`
    * raters per item (the usual labeling setup; rows = (item, vote)).
    * Integer-exact: per-item agreement numerators (Σ n_c² − n, a small
    * integer) and category counts are summed as BIGINTs and divided
    * ONCE at the end, so the result never depends on float summation
    * order across partitions — p̄ = Σ(n₁²+n₀²−n) / (N·n·(n−1)),
    * p_e = p₁² + p₀², κ = (p̄−p_e)/(1−p_e).
    *
    * Panel validation: the formula is only meaningful when every item
    * holds exactly `n` votes — a short or over-full panel fed into the
    * fixed-n algebra produces a silently wrong kappa (r10 ADVICE).
    * Items whose vote count ≠ n are EXCLUDED from the statistic and
    * COUNTED in `n_invalid_items`, so the caller sees the violation in
    * the result row instead of a corrupted number; assert
    * n_invalid_items = 0 upstream when a strict panel is the contract.
    *
    * Output: one row (n_items, n_invalid_items, p_bar, p_e, kappa),
    * ratios round(6); kappa is NULL on the degenerate p_e = 1 (all
    * votes one category — chance agreement is certain, kappa
    * undefined) and the whole row is (0, k, NULL, NULL, NULL) when no
    * item has a valid panel.
    */
  def fleissKappa(votes: DataFrame, itemCol: String, voteCol: String,
                  n: Int): DataFrame = {
    require(n >= 2, s"fleiss kappa needs >= 2 raters, got $n")
    val per = votes.groupBy(col(itemCol))
      .agg(sum(col(voteCol)).cast("long").as("n1"),
        count(lit(1)).cast("long").as("nv"))
      .select(col("n1"), col("nv"),
        (col("n1") * col("n1") + (lit(n.toLong) - col("n1")) *
          (lit(n.toLong) - col("n1")) - n).as("pi_num"))
    per.agg(
        count(when(col("nv") === n.toLong, 1)).as("n_items"),
        count(when(col("nv") =!= n.toLong, 1)).as("n_invalid_items"),
        sum(when(col("nv") === n.toLong, col("pi_num"))).as("pn"),
        sum(when(col("nv") === n.toLong, col("n1"))).as("s1"))
      .select(col("n_items"), col("n_invalid_items"),
        round(col("pn").cast("double") /
          (col("n_items") * n * (n - 1)), 6).as("p_bar"),
        round(peExpr(n), 6).as("p_e"),
        when(peExpr(n) === 1.0, lit(null).cast("double"))
          .otherwise(round(
            (col("pn").cast("double") / (col("n_items") * n * (n - 1)) -
              peExpr(n)) / (lit(1.0) - peExpr(n)), 6)).as("kappa"))
  }

  private def peExpr(n: Int): Column = {
    val p1 = col("s1").cast("double") / (col("n_items") * n)
    p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
  }

  /** Bradley–Terry strengths via the MM recurrence, integer-exact so
    * the fixed-iteration result is bit-identical across engines (the
    * q_graph_pagerank convention): strengths live in micro units
    * (start 1e6), each pair's denominator term is
    * `n_ij·10¹² div (s_i + s_j)` (Long floor), and the update is
    * `s_i ← W_i·10¹² div Σ terms`. Items that never win fix at 0;
    * items with no games keep 1e6. BT is scale-invariant, so no
    * normalization pass — compare strengths, not absolute values.
    *
    * `outcomes` = (winner, loser, n) aggregated match counts. Each of
    * the `iters` rounds is one item-keyed aggregation over the
    * symmetrized game list joined with the current |items|-row
    * strengths frame (AQE broadcasts it when small); O(iters) jobs,
    * no collect. The games/wins frames are materialized once and each
    * round's strengths are eagerly checkpointed (then released), so the
    * plan stays O(1) deep — without that, `d` referencing `s` twice
    * doubles the lineage every round (the DupGraph.pageRank lesson).
    *
    * The `n·10¹²` and `W·10¹²` products run in decimal(38,0): a Long
    * multiply silently wraps past n ≈ 9.2e6 pair-counts in Spark while
    * the DuckDB oracle's HUGEINT errors — decimal keeps both engines
    * exact and identical. (Bound: the per-term QUOTIENT must still fit
    * a Long — needs n > 9.2e6·(s_i+s_j), unreachable with micro-unit
    * strengths ≥ 1 for any corpus that fits storage.)
    */
  def btStrengths(outcomes: DataFrame, winnerCol: String, loserCol: String,
                  nCol: String, iters: Int = 3): DataFrame = {
    val o = outcomes.select(col(winnerCol).as("w"), col(loserCol).as("l"),
      col(nCol).cast("long").as("n"))
    val games = o.select(col("w").as("id"), col("l").as("opp"), col("n"))
      .unionByName(o.select(col("l").as("id"), col("w").as("opp"), col("n")))
      .localCheckpoint(eager = true)
    val items = games.select(col("id")).distinct()
      .localCheckpoint(eager = true)
    val wins = o.groupBy(col("w").as("id")).agg(sum("n").as("wn"))
      .localCheckpoint(eager = true)
    var s = items.withColumn("sm", lit(1000000L))
    for (_ <- 1 to math.max(1, iters)) {
      val d = games
        .join(s.select(col("id"), col("sm").as("sa")), Seq("id"))
        .join(s.select(col("id").as("opp"), col("sm").as("sb")), Seq("opp"))
        .groupBy("id")
        .agg(sum(expr(
          "cast(n as decimal(38,0)) * 1000000000000 div (sa + sb)")
          .cast("decimal(38,0)")).as("dd"))
      val next = items
        .join(wins, Seq("id"), "left")
        .join(d, Seq("id"), "left")
        .select(col("id"),
          when(col("dd").isNull || col("dd") === 0L, lit(1000000L))
            .otherwise(expr(
              "cast(coalesce(wn, 0) as decimal(38,0)) * 1000000000000 div dd"))
            .as("sm"))
        .localCheckpoint(eager = true)
      CheckpointBridge.unpersistCheckpoint(s)
      s = next
    }
    // release the games table (the one data-sized checkpoint); the
    // |items|-row s/wins/items frames back the returned plan and stay
    CheckpointBridge.unpersistCheckpoint(games)
    s.join(wins, Seq("id"), "left")
      .select(col("id").as("item"), col("sm").as("strength_micro"),
        coalesce(col("wn"), lit(0L)).as("wins"))
  }

  /** Krippendorff's alpha for BINARY nominal votes with a VARIABLE
    * panel — the agreement statistic to reach for when panels are NOT
    * constant-size (missing annotations, adaptive routing), exactly
    * the setup [[fleissKappa]]'s fixed-n contract excludes. Rows =
    * (item, vote∈{0,1}); items with fewer than 2 votes are unpairable
    * and excluded (counted in `n_single_items`).
    *
    * Coincidence-matrix closed form for two nominal categories:
    * α = 1 − (n−1)·Σ_u[o_u(m_u−o_u)/(m_u−1)] / (n₁·n₀), where m_u =
    * item u's votes, o_u its 1-votes, n = Σm_u over pairable items,
    * n₁ = Σo_u, n₀ = n − n₁.
    *
    * Integer-exact: the per-item disagreement term is held in
    * 2520ths (2520 = lcm(1..9) makes `2520·o(m−o)/(m−1)` an exact
    * integer for any panel of ≤ 10 raters — larger panels are
    * rejected up front), summed as BIGINT, and divided once at the
    * end, so α never depends on float summation order. One groupBy
    * shuffle on the item key + a 1-row final fold.
    *
    * Output: one row (n_items, n_single_items, n_values, n_ones,
    * alpha round(6)); alpha is NULL when either category is absent
    * (n₁·n₀ = 0 — chance disagreement is zero, α undefined) or no
    * item is pairable.
    */
  def krippendorffAlpha(votes: DataFrame, itemCol: String,
                        voteCol: String): DataFrame = {
    // the coincidence algebra is only valid for votes in {0,1}; an
    // unmapped 3-way label would give o > per-category counts and a
    // plausible-looking wrong alpha — fail loudly instead (the same
    // contract stance as the panel-size bound below)
    val v = when(col(voteCol) === 0 || col(voteCol) === 1, col(voteCol))
      .otherwise(raise_error(concat(
        lit("krippendorffAlpha: non-binary vote "),
        coalesce(col(voteCol).cast("string"), lit("NULL")),
        lit(" (map multi-category labels to {0,1} upstream)"))))
    val per = votes.groupBy(col(itemCol))
      .agg(sum(v).cast("long").as("o"),
        count(lit(1)).cast("long").as("m"))
    val valid = col("m") >= 2L
    per.select(col("o"), col("m"),
        // (m-1) | 2520 for m <= 10, so this is EXACT integer algebra —
        // no float division anywhere in the statistic. The bound check
        // lives INSIDE the summed expression (a separate guard column
        // would be pruned as an unused aggregate and never fire): fail
        // loudly past the exactness bound instead of silently flooring
        when(col("m") > 10L, raise_error(concat(
          lit("krippendorffAlpha: panel larger than 10 raters on an " +
            "item (m="), col("m").cast("string"),
          lit(") exceeds the lcm(1..9) exact-arithmetic bound")))
          .cast("long"))
          .otherwise(when(valid, expr("(2520 div (m - 1)) * o * (m - o)"))
            .cast("long")).as("d2520"))
      .agg(count(when(valid, 1)).as("n_items"),
        count(when(!valid, 1)).as("n_single_items"),
        sum(when(valid, col("m"))).as("n_values"),
        sum(when(valid, col("o"))).as("n_ones"),
        sum(col("d2520")).as("dsum"))
      .select(col("n_items"), col("n_single_items"),
        coalesce(col("n_values"), lit(0L)).as("n_values"),
        coalesce(col("n_ones"), lit(0L)).as("n_ones"),
        when(col("n_values").isNull ||
            col("n_ones") === 0L || col("n_ones") === col("n_values"),
          lit(null).cast("double"))
          .otherwise(round(lit(1.0) -
            (col("n_values") - 1L).cast("double") * col("dsum") /
              (lit(2520.0) * col("n_ones") *
                (col("n_values") - col("n_ones"))), 6)).as("alpha"))
  }

  /** Pairwise win-rate matrix from aggregated (winner, loser, n)
    * outcomes — the descriptive companion to [[btStrengths]] (the
    * fitted strengths say who's better overall; the matrix says who
    * beats whom head-to-head, the non-transitivity audit). Each
    * unordered pair appears ONCE, canonicalized to (lo, hi) =
    * (least, greatest) so A-beats-B and B-beats-A rows fold together.
    * One groupBy on the pair key over the already-aggregated outcomes
    * frame (|items|² rows at most — tiny at any corpus scale).
    */
  def winRateMatrix(outcomes: DataFrame, winnerCol: String,
                    loserCol: String, nCol: String): DataFrame = {
    val w = col(winnerCol)
    val l = col(loserCol)
    outcomes.select(least(w, l).as("lo"), greatest(w, l).as("hi"),
        when(w <= l, col(nCol)).otherwise(0L).cast("long").as("_wlo"),
        col(nCol).cast("long").as("_n"))
      .groupBy("lo", "hi")
      .agg(sum("_wlo").as("wins_lo"), sum("_n").as("n_games"))
      .select(col("lo"), col("hi"), col("wins_lo"),
        (col("n_games") - col("wins_lo")).as("wins_hi"), col("n_games"),
        round(col("wins_lo").cast("double") / col("n_games"), 6)
          .as("win_rate_lo"))
  }

  /** Length-bias audit over a chosen/rejected pairs frame: does the
    * LONGER response win more often as the length gap grows? (The
    * classic reward-hacking signal — a healthy preference set stays
    * near 0.5 in every bucket.) Equal-length pairs carry no signal and
    * are excluded; buckets are |len gap| div `bucketWidth`, capped at
    * `maxBucket`. One groupBy on a ≤(maxBucket+1)-key frame.
    */
  def lengthBias(pairsDf: DataFrame, chosenLenCol: String,
                 rejectedLenCol: String, bucketWidth: Long = 50L,
                 maxBucket: Long = 5L): DataFrame = {
    val delta = col(chosenLenCol) - col(rejectedLenCol)
    pairsDf
      .filter(delta =!= 0L)
      // materialize |delta| under a fixed name before the SQL-string
      // `div` — interpolating CALLER column names into expr() breaks on
      // any name needing backticks; only the Long params are inlined
      .select(abs(delta).as("_gap"),
        when(delta > 0, 1L).otherwise(0L).as("longer_won"))
      .select(least(expr(s"_gap div $bucketWidth"),
          lit(maxBucket)).as("gap_bucket"),
        col("longer_won"))
      .groupBy("gap_bucket")
      .agg(count(lit(1)).as("n"), sum("longer_won").as("longer_wins"))
      .select(col("gap_bucket"), col("n"), col("longer_wins"),
        round(col("longer_wins").cast("double") / col("n"), 6)
          .as("longer_win_rate"))
  }
}

/** Eval-pipeline metrics: n-gram overlap scoring (ROUGE-style) between
  * reference/candidate text pairs, and Wilson-interval pass rates for
  * grouped binary outcomes — the aggregation layer of an eval harness,
  * distributed the same way the dedup stack is (explode → one keyed
  * shuffle → closed-form arithmetic).
  */
object Evals {

  /** ROUGE-n with standard clipped counts: per pair,
    * match = Σ_g min(count_ref(g), count_cand(g)) over word n-grams
    * (multiplicity kept — NOT the distinct-shingle Jaccard rule),
    * precision = match/cand_total, recall = match/ref_total,
    * f1 = 2PR/(P+R). Tokenizer = [[TextAnalysis.tokens]]. Pairs with
    * an empty side score 0. Ratios round(6); integer counts carried so
    * oracles can hash-compare exactly.
    *
    * Shape: explode both sides' n-grams, count per (pair, gram) — the
    * ref/cand count frames share that shuffle key, so the clip join is
    * co-partitioned; totals ride the same aggregates.
    */
  def rougeN(pairsDf: DataFrame, pairIdCol: String, refCol: String,
             candCol: String, n: Int = 2): DataFrame = {
    // explodeShingles, NOT an inline shingles(tokens(..)) + explode:
    // the inline form is the interpreted-HOF O(tokens²) trap (see the
    // PERF notes on TextAnalysis.shingles / explodeShingles)
    def grams(textCol: String, side: String): DataFrame =
      TextAnalysis.explodeShingles(
          pairsDf.select(col(pairIdCol), col(textCol)), textCol, n,
          col(pairIdCol))
        .withColumnRenamed("s", "g")
        .groupBy(col(pairIdCol), col("g"))
        .agg(count(lit(1)).as(s"c_$side"))
    val rc = grams(refCol, "ref")
    val cc = grams(candCol, "cand")
    val clipped = rc.join(cc, Seq(pairIdCol, "g"))
      .groupBy(col(pairIdCol))
      .agg(sum(least(col("c_ref"), col("c_cand"))).as("match_n"))
    val totals = rc.groupBy(col(pairIdCol)).agg(sum("c_ref").as("ref_n"))
      .join(cc.groupBy(col(pairIdCol)).agg(sum("c_cand").as("cand_n")),
        Seq(pairIdCol), "full")
    val m = pairsDf.select(col(pairIdCol))
      .join(totals, Seq(pairIdCol), "left")
      .join(clipped, Seq(pairIdCol), "left")
      .select(col(pairIdCol),
        coalesce(col("match_n"), lit(0L)).as("match_n"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cand_n"), lit(0L)).as("cand_n"))
    val p = when(col("cand_n") === 0L, lit(0.0))
      .otherwise(col("match_n").cast("double") / col("cand_n"))
    val r = when(col("ref_n") === 0L, lit(0.0))
      .otherwise(col("match_n").cast("double") / col("ref_n"))
    m.select(col(pairIdCol), col("match_n"), col("ref_n"), col("cand_n"),
      round(p, 6).as("precision"), round(r, 6).as("recall"),
      round(when(p + r === 0.0, lit(0.0))
        .otherwise(lit(2.0) * p * r / (p + r)), 6).as("f1"))
  }

  /** Per-group pass rate with the Wilson 95% score interval — the
    * right uncertainty band for small-n eval slices (a normal interval
    * goes negative near 0; Wilson stays in [0,1]). Closed-form from
    * the two integer aggregates (n, passes), so fully deterministic:
    * center = (p̂ + z²/2n)/(1+z²/n),
    * half = z·√(p̂(1−p̂)/n + z²/4n²)/(1+z²/n), z = 1.96.
    */
  def wilsonPassRate(df: DataFrame, groupCol: String,
                     passCol: String): DataFrame = {
    val z = 1.96
    // literal, NOT z*z: 1.96*1.96 rounds to 3.841600000000000...
    // differently than the decimal literal an oracle writes — the two
    // sides must start from the SAME double before any division
    val z2 = 3.8416
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(passCol)).cast("long").as("passes"))
    val nD = col("n").cast("double")
    val p = col("passes").cast("double") / nD
    val denom = lit(1.0) + lit(z2) / nD
    val center = (p + lit(z2) / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z2) / (lit(4.0) * nD * nD))) / denom
    g.select(col(groupCol), col("n"), col("passes"),
      round(p, 6).as("pass_rate"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }

  /** McNemar's paired test for two models graded on the SAME items
    * (rows = (group, pass_a, pass_b) binary outcomes): counts the
    * discordant cells n01 (A wrong, B right) and n10 (A right, B
    * wrong) per group and the continuity-corrected statistic
    * (max(0, |n01−n10|−1))²/(n01+n10) — the question "is B actually
    * better than A on these items?" that a plain pass-rate delta
    * can't answer (concordant items cancel). NULL when no discordant
    * pair exists (the test is undefined); the max(0,·) clamp keeps the
    * statistic at 0 on perfectly balanced discordance (n01 = n10),
    * where the unclamped textbook form reports spurious positive
    * evidence. One groupBy shuffle, integer cells, one closed-form
    * double.
    */
  def mcnemar(df: DataFrame, groupCol: String, aCol: String,
              bCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(aCol) === 0 && col(bCol) === 1, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col(aCol) === 1 && col(bCol) === 0, 1L).otherwise(0L))
          .as("n10"))
    val d = col("n01") + col("n10")
    val diff = greatest(
      abs(col("n01") - col("n10")).cast("double") - lit(1.0), lit(0.0))
    g.select(col(groupCol), col("n"), col("n01"), col("n10"),
      when(d === 0L, lit(null).cast("double"))
        .otherwise(round(diff * diff / d, 6)).as("mcnemar_chi2"))
  }

  /** Reliability diagram + Expected Calibration Error for a binary
    * classifier (the quality-score / reward-model calibration gate):
    * confidence arrives in integer MILLI units (0..1000 — the caller
    * quantizes; integer in, so bin assignment never floats), labels
    * are 0/1. Equal-width bins over [0, 1]: bin = min(c·nBins div
    * 1000, nBins−1) — the 1.0 edge folds into the top bin, the
    * standard reliability-diagram rule.
    *
    * Per bin: n, Σconf_milli and Σlabels as BIGINTs, avg_conf,
    * accuracy, and `ece_contrib` = (n/total)·|acc − conf| — summing
    * the column IS the ECE, so the per-bin frame carries the headline
    * number without a second pass. One groupBy shuffle to ≤nBins keys
    * (map-side combined), one 1-row total broadcast back.
    */
  def calibrationBins(df: DataFrame, confMilliCol: String,
                      labelCol: String, nBins: Int = 10): DataFrame =
    calibrationFromCells(calibrationCells(df, confMilliCol, labelCol, nBins))

  /** The integer per-bin cells behind [[calibrationBins]]:
    * (bin, n, conf_sum_milli, n_pos). A commutative monoid under
    * per-bin addition — cells from any batch split merge (by summing)
    * into EXACTLY the one-shot cells, which is what lets
    * [[graft.streaming.EvalStream]] maintain calibration incrementally
    * with zero approximation.
    */
  def calibrationCells(df: DataFrame, confMilliCol: String,
                       labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1: $nBins")
    // out-of-range confidences are a quantizer bug, not data: a
    // negative value would mint a silent bin -1 row and a value past
    // 1000 would masquerade as true top-bin confidence — fail loudly
    // (the curriculumStages/krippendorffAlpha contract stance)
    val c = when(col(confMilliCol) >= 0 && col(confMilliCol) <= 1000,
        col(confMilliCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("calibrationBins: confidence outside [0, 1000] milli: "),
        coalesce(col(confMilliCol).cast("string"), lit("NULL")))))
    df.select(c.as("_c"), col(labelCol).cast("long").as("_y"))
      .select(least(expr(s"_c * $nBins div 1000"), lit(nBins - 1L))
        .as("bin"), col("_c"), col("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_c").as("conf_sum_milli"),
        sum("_y").as("n_pos"))
  }

  /** Merge two [[calibrationCells]] frames (per-bin sums). */
  def calibrationMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("bin")
      .agg(sum("n").as("n"), sum("conf_sum_milli").as("conf_sum_milli"),
        sum("n_pos").as("n_pos"))

  /** The reliability-diagram finisher over [[calibrationCells]]. */
  def calibrationFromCells(per: DataFrame): DataFrame = {
    val tot = per.agg(sum("n").as("_total"))
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("conf_sum_milli"), col("n_pos"),
        round(col("conf_sum_milli").cast("double") /
          (col("n") * 1000.0), 6).as("avg_conf"),
        round(col("n_pos").cast("double") / col("n"), 6).as("accuracy"),
        round(col("n").cast("double") / col("_total") *
          abs(col("n_pos").cast("double") / col("n") -
            col("conf_sum_milli").cast("double") / (col("n") * 1000.0)),
          6).as("ece_contrib"))
  }
}
