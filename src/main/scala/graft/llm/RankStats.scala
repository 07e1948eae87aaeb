package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact nonparametric distribution-comparison statistics at corpus
  * scale: tie-averaged ranks, the two-sample Mann–Whitney U and
  * Kolmogorov–Smirnov tests, tie-corrected Spearman correlation, and
  * chi-square contingency cells — the "did this slice's distribution
  * move?" toolkit a curation pipeline runs before trusting a new
  * source, filter, or scorer (reference scope is relational ingestion;
  * its monitoring queries — `reports_check.sql` — count statuses, so
  * distributional comparison is part of this engine's beyond-reference
  * surface, next to Evals/Profile.psiDrift).
  *
  * Scale posture: every statistic here reduces over the DISTINCT-VALUE
  * frame, never a per-row global sort. Ranks/ECDFs need a global
  * ordered prefix sum, which a naive `Window.orderBy` computes on ONE
  * task over the whole corpus; instead the per-value counts (one keyed
  * shuffle, map-side combined) run the Packing two-level scan — span-
  * scaled value blocks, a window over the ≤ maxBlocks-row block-summary
  * frame, then per-block prefixes over distinct values — so a hot value
  * is ONE row and the plan shape survives 100 TB. Exactness: ranks are
  * kept in 2× integer units (a tie-averaged rank is always a multiple
  * of ½), ECDF deviations in n_a·n_b integer units, and the cubic tie
  * terms in decimal(38,0) — every headline double is derived from exact
  * integer aggregates in ONE closed-form expression a SQL oracle can
  * mirror term for term.
  *
  * Contract (the calibrationBins/curriculumStages stance): values must
  * be non-NULL and long-castable — a continuous score is quantized by
  * the CALLER (e.g. milli-units), which fixes the tie semantics
  * explicitly instead of trusting float equality; NULLs raise.
  */
object RankStats {

  /** Null-checked long cast: NULL raises with the op + column named. */
  private def checkedLong(c: Column, op: String, what: String): Column =
    when(c.isNull, raise_error(lit(s"$op: NULL $what"))).otherwise(c)
      .cast("long")

  /** Exclusive global prefix sums of `measures` over `vc` (one row per
    * distinct `_v`) in `_v` order, as `_pre_<m>`: the two-level scan of
    * [[Packing.withStreamOffsets]], run over the distinct-value frame.
    */
  private def withValuePrefixes(vc: DataFrame, measures: Seq[String],
                                maxBlocks: Long): DataFrame = {
    val base = Packing.withBoundedBlocks(vc, "_v", maxBlocks)
    val blk = base.groupBy("_blk")
      .agg(measures.map(m => sum(col(m)).as(s"_bs_$m")).head,
        measures.map(m => sum(col(m)).as(s"_bs_$m")).tail: _*)
    // global window over the ≤ maxBlocks-row block-summary frame only
    val wb = Window.orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = blk.select(col("_blk") +:
      measures.map(m =>
        coalesce(sum(col(s"_bs_$m")).over(wb), lit(0L)).as(s"_bo_$m")): _*)
    val wIn = Window.partitionBy("_blk").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    measures.foldLeft(base.join(broadcast(offs), Seq("_blk"))) { (d, m) =>
      d.withColumn(s"_pre_$m",
        col(s"_bo_$m") + coalesce(sum(col(m)).over(wIn), lit(0L)))
    }.drop("_blk" +: measures.map(m => s"_bo_$m"): _*)
  }

  /** Tie-averaged ranks in 2× integer units, one row per DISTINCT
    * value: (value, n, rank2) with rank2 = 2·(count below) + n + 1 —
    * every element of the value's tie group shares it, and
    * Σ n·rank2 = N·(N+1) (the rank-sum invariant SpearmanSpec pins).
    * Join back on the value column to rank a corpus; the frame itself
    * is distinct-values-sized.
    */
  def avgRanks2(df: DataFrame, valueCol: String,
                maxBlocks: Long = 1L << 20): DataFrame = {
    val vc = df
      .select(checkedLong(col(valueCol), "avgRanks2", s"value in $valueCol")
        .as("_v"))
      .groupBy("_v").agg(count(lit(1)).as("_n"))
    withValuePrefixes(vc, Seq("_n"), maxBlocks)
      .select(col("_v").as("value"), col("_n").as("n"),
        (lit(2L) * col("_pre__n") + col("_n") + 1L).as("rank2"))
  }

  /** The two group labels + totals of a two-sample frame as ONE
    * broadcastable row (group_a = lexicographic min), raising loudly
    * unless `groupCol` holds exactly two non-NULL labels — a silent
    * third group would corrupt both U and D.
    */
  private def twoGroupHeader(rows: DataFrame): DataFrame =
    rows.groupBy("_g").agg(count(lit(1)).as("_cnt"))
      .agg(count(lit(1)).as("_ng"), min("_g").as("_ga"),
        max("_g").as("group_b"),
        min_by(col("_cnt"), col("_g")).as("n_a"),
        max_by(col("_cnt"), col("_g")).as("n_b"))
      // the guard must ride a column the caller KEEPS — a dropped
      // guard column is pruned by the optimizer and never evaluates
      .select(
        when(col("_ng") =!= 2L, raise_error(concat(
          lit("RankStats: expected exactly 2 groups, got "),
          col("_ng").cast("string")))).otherwise(col("_ga")).as("group_a"),
        col("group_b"), col("n_a"), col("n_b"))

  /** Per-distinct-value two-group cells with exclusive prefixes:
    * (_v, _na, _nb, _pre__na, _pre__nb) plus the header columns.
    */
  private def twoGroupPrefixes(df: DataFrame, valueCol: String,
                               groupCol: String, op: String,
                               maxBlocks: Long): DataFrame = {
    val rows = df.select(
      checkedLong(col(valueCol), op, s"value in $valueCol").as("_v"),
      when(col(groupCol).isNull,
        raise_error(lit(s"$op: NULL group in $groupCol")))
        .otherwise(col(groupCol)).cast("string").as("_g"))
    val hdr = twoGroupHeader(rows)
    val vc = rows.crossJoin(broadcast(hdr))
      .groupBy("_v")
      .agg(sum(when(col("_g") === col("group_a"), 1L).otherwise(0L))
        .as("_na"),
        sum(when(col("_g") === col("group_b"), 1L).otherwise(0L)).as("_nb"))
    withValuePrefixes(vc, Seq("_na", "_nb"), maxBlocks)
      .crossJoin(broadcast(hdr))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum), tie-averaged, one
    * output row: U in 2× integer units (`u_a2` = 2·U_a — exact even
    * when ties make U half-integral), the 2× rank sum `r_a2`, the cubic
    * tie term Σ(t³−t), and the tie-corrected normal-approximation `z`
    * derived from those integers in one mirrored expression (NULL when
    * every value ties — σ = 0 has no z). Group a = lexicographic min
    * label. The test answers "is slice a's value distribution
    * stochastically larger?" without assuming normality — the right
    * tool for skewed corpus measures (lengths, scores).
    */
  def mannWhitney(df: DataFrame, valueCol: String, groupCol: String,
                  maxBlocks: Long = 1L << 20): DataFrame = {
    val pre = twoGroupPrefixes(df, valueCol, groupCol, "mannWhitney",
      maxBlocks)
    pre.groupBy("group_a", "group_b", "n_a", "n_b")
      .agg(
        sum(col("_na") * (lit(2L) * (col("_pre__na") + col("_pre__nb")) +
          col("_na") + col("_nb") + 1L)).as("r_a2"),
        // decimal(12,0) keeps the product precision at (38,0) without
        // hitting Spark's 38-digit multiplication cap (t ≤ 10¹² rows)
        sum((col("_na") + col("_nb")).cast("decimal(12,0)") *
          (col("_na") + col("_nb")).cast("decimal(12,0)") *
          (col("_na") + col("_nb")).cast("decimal(12,0)") -
          (col("_na") + col("_nb"))).cast("double").as("tie_term"))
      .withColumn("u_a2", col("r_a2") - col("n_a") * (col("n_a") + 1L))
      .withColumn("u_b2",
        lit(2L) * col("n_a") * col("n_b") - col("u_a2"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("r_a2"), col("u_a2"), col("u_b2"), col("tie_term"),
        round(mwZ(), 6).as("z"))
  }

  /** Tie-corrected z for [[mannWhitney]], mirrored term for term in the
    * SQL oracle: z = (U_a − μ)/σ with μ = n_a·n_b/2 and
    * σ² = n_a·n_b/12 · ((N+1) − T/(N(N−1))).
    */
  private def mwZ(): Column = {
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val sig2 = na * nb / 12.0 *
      ((n + 1.0) - col("tie_term") / (n * (n - 1.0)))
    when(sig2 > 0.0,
      (col("u_a2").cast("double") / 2.0 - na * nb / 2.0) / sqrt(sig2))
  }

  /** Two-sample Kolmogorov–Smirnov statistic, exact: the max ECDF
    * deviation in n_a·n_b integer units (`d_num` — D = d_num/(n_a·n_b),
    * emitted rounded as `d`) and the smallest value attaining it
    * (`d_at`, deterministic tiebreak). ECDFs step at the combined
    * sample's distinct values, so evaluating the inclusive cumulative
    * counts there is exact, and the deviation algebra
    * |cum_a·n_b − cum_b·n_a| never leaves Long. KS reacts to ANY
    * distribution change (shape, not just location) — the stricter
    * sibling of [[mannWhitney]]'s shift test.
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
             maxBlocks: Long = 1L << 20): DataFrame = {
    val devs = twoGroupPrefixes(df, valueCol, groupCol, "ksTest", maxBlocks)
      .withColumn("_dev",
        abs((col("_pre__na") + col("_na")) * col("n_b") -
          (col("_pre__nb") + col("_nb")) * col("n_a")))
    val mx = devs.groupBy("group_a", "group_b", "n_a", "n_b")
      .agg(max(col("_dev")).as("d_num"))
    devs.join(broadcast(mx), Seq("group_a", "group_b", "n_a", "n_b"))
      .filter(col("_dev") === col("d_num"))
      .groupBy("group_a", "group_b", "n_a", "n_b", "d_num")
      .agg(min(col("_v")).as("d_at"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("d_num"), col("d_at"),
        round(col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("d"))
  }

  /** Tie-corrected Spearman rank correlation of two long-valued
    * columns, one output row: n, Σd² in 4× integer units (`sum_d2_4` —
    * exact in decimal, emitted as double), the cubic tie terms `tx`/
    * `ty` = Σ(t³−t) per column, and `rho` by the tie-corrected
    * shortcut rho = ((n³−n) − 6Σd² − (Tx+Ty)/2) /
    * √((n³−n−Tx)(n³−n−Ty)) — algebraically Pearson on tie-averaged
    * ranks, NULL when either column is constant (zero rank variance
    * has no correlation). The monotone-association probe: "does
    * quality rise with length?" without assuming linearity.
    *
    * Both rank frames come from [[avgRanks2]] (distinct-value-sized)
    * and join back on the value — no per-row global sort. Exactness
    * bound: the double algebra is exact while n³ < 2⁵³ (n ≲ 2×10⁶);
    * past that rho loses ULPs but stays deterministic (same IEEE ops,
    * same order, both engines).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
               maxBlocks: Long = 1L << 20): DataFrame = {
    val rows = df.select(
      checkedLong(col(xCol), "spearman", s"value in $xCol").as("_x"),
      checkedLong(col(yCol), "spearman", s"value in $yCol").as("_y"))
    // per-ROW tie share: a value with t rows contributes t²−1 on each
    // of them, so the row sum is Σ t·(t²−1) = Σ(t³−t) — exact integer
    // algebra, no division. decimal(12,0) factors keep the product
    // inside Spark's 38-digit precision cap.
    def tieShare(n: Column): Column =
      n.cast("decimal(12,0)") * n.cast("decimal(12,0)") - 1
    val rx = avgRanks2(rows, "_x", maxBlocks)
      .select(col("value").as("_x"), col("rank2").as("_rx"),
        tieShare(col("n")).as("_txs"))
    val ry = avgRanks2(rows, "_y", maxBlocks)
      .select(col("value").as("_y"), col("rank2").as("_ry"),
        tieShare(col("n")).as("_tys"))
    val joined = rows.join(rx, Seq("_x")).join(ry, Seq("_y"))
    joined.agg(
      count(lit(1)).as("n"),
      sum((col("_rx") - col("_ry")).cast("decimal(18,0)") *
        (col("_rx") - col("_ry")).cast("decimal(18,0)"))
        .cast("double").as("sum_d2_4"),
      sum(col("_txs")).cast("double").as("tx"),
      sum(col("_tys")).cast("double").as("ty"))
      .select(col("n"), col("sum_d2_4"), col("tx"), col("ty"),
        round(spearmanRho(), 6).as("rho"))
  }

  /** The tie-corrected rho expression over [[spearman]]'s aggregate
    * row, mirrored term for term in the SQL oracle. Σd² = sum_d2_4/4,
    * so 6Σd² = 1.5·sum_d2_4.
    */
  private def spearmanRho(): Column = {
    val nd = col("n").cast("double")
    val cubic = nd * nd * nd - nd
    val den = (cubic - col("tx")) * (cubic - col("ty"))
    when(den > 0.0,
      (cubic - lit(1.5) * col("sum_d2_4") - (col("tx") + col("ty")) / 2.0) /
        sqrt(den))
  }

  /** Chi-square contingency cells for two categorical columns: the FULL
    * observed-margin grid (a zero-count cell still contributes its
    * expectation), one row per (a, b) with the observed count, margins,
    * `expected` = r·c/N, and the cell's χ² contribution
    * (O−E)²/E = (O·N − r·c)²/(N·r·c) computed in decimal(38,0) then
    * divided once as doubles — Σ contrib is the statistic, left to the
    * consumer (a cross-cell double sum is order-dependent; the cells
    * are exact). Answers "are source and language independent?" — the
    * slice-balance audit behind a mixture plan.
    *
    * The grid is |a-values|·|b-values| rows (a broadcast cross join of
    * the two margin aggregates) — categorical audits only; a
    * high-cardinality key belongs in [[mannWhitney]]/[[ksTest]] space.
    */
  def chi2Cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val rows = df.select(
      when(col(aCol).isNull, raise_error(lit(s"chi2Cells: NULL in $aCol")))
        .otherwise(col(aCol)).cast("string").as("a"),
      when(col(bCol).isNull, raise_error(lit(s"chi2Cells: NULL in $bCol")))
        .otherwise(col(bCol)).cast("string").as("b"))
    val ra = rows.groupBy("a").agg(count(lit(1)).as("r_tot"))
    val cb = rows.groupBy("b").agg(count(lit(1)).as("c_tot"))
    val nf = rows.agg(count(lit(1)).as("_n"))
    val cells = rows.groupBy("a", "b").agg(count(lit(1)).as("o"))
    // |dev| ≤ N² ≤ 10¹⁴ at 10⁷ rows: decimal(18,0) factors keep dev²
    // inside the 38-digit precision cap
    val dev = (col("o") * col("_n") - col("r_tot") * col("c_tot"))
      .cast("decimal(18,0)")
    ra.crossJoin(broadcast(cb))
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(nf))
      .select(col("a"), col("b"), col("o"), col("r_tot"), col("c_tot"),
        round(col("r_tot").cast("double") * col("c_tot").cast("double") /
          col("_n").cast("double"), 6).as("expected"),
        round((dev * dev).cast("double") /
          (col("_n").cast("decimal(12,0)") *
            col("r_tot").cast("decimal(12,0)") *
            col("c_tot").cast("decimal(12,0)"))
            .cast("double"), 9).as("contrib"))
  }
}
