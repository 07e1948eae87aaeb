package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Dataset profiling and declarative data-quality rules — the
  * operational layer a pipeline owner runs BEFORE trusting a new drop
  * of data (the reference eyeballs psql; this is the set-based
  * equivalent, one scan per answer).
  */
object Profile {

  /** Per-column profile, one output row per column: row count, null
    * count, exact distinct count, and min/max split by type family —
    * numeric min/max as DOUBLE, string min/max as VARCHAR. (Numeric
    * extremes are NOT stringified: engines disagree on double→string
    * formatting, and a profile consumer wants numbers anyway.)
    *
    * One logical aggregate over one scan; Catalyst expands the N
    * exact `count(DISTINCT col)`s into the multi-distinct Expand plan —
    * the price of exactness. At 100 TB swap in `approx_count_distinct`
    * via `exact = false` (HLL, one pass, no Expand) — same output
    * schema, ±2% ndv.
    */
  def profileTable(df: DataFrame, cols: Seq[String],
                   exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileTable needs at least one column")
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs: Seq[Column] = cols.flatMap { c =>
      val dt = fields.getOrElse(c,
        throw new IllegalArgumentException(s"no such column: $c"))
      val ndv = if (exact) countDistinct(col(c))
                else approx_count_distinct(col(c))
      val (minN, maxN, minS, maxS) = dt match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case StringType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(col(c)), max(col(c)))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(count(col(c)).as(s"_cnt_$c"), ndv.cast("long").as(s"_ndv_$c"),
        minN.as(s"_minn_$c"), maxN.as(s"_maxn_$c"),
        minS.as(s"_mins_$c"), maxS.as(s"_maxs_$c"))
    }
    val row = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column_name"), col("_n").as("n_rows"),
        (col("_n") - col(s"_cnt_$c")).as("n_nulls"),
        col(s"_ndv_$c").as("n_distinct"),
        col(s"_minn_$c").as("min_num"), col(s"_maxn_$c").as("max_num"),
        col(s"_mins_$c").as("min_str"), col(s"_maxs_$c").as("max_str"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Functional-dependency check: does determinant → dependent hold —
    * i.e. does every determinant value map to exactly ONE dependent
    * value? The schema-inference / key-discovery primitive (a column
    * pair that holds is a candidate for normalization or a safe join
    * key; a pair that ALMOST holds is a data-quality smell worth a
    * rules entry). One row per checked pair: distinct determinant
    * count, how many determinant values violate, and the verdict.
    *
    * Each pair costs one (det, dep)-distinct aggregate — partial
    * combine map-side, shuffle carries distinct pairs not rows. Rows
    * with a NULL determinant are excluded; NULL dependents don't count
    * as values (count(DISTINCT) semantics, same in any engine).
    */
  def functionalDeps(df: DataFrame,
                     pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "functionalDeps needs at least one pair")
    pairs.map { case (det, dep) =>
      df.filter(col(det).isNotNull)
        .groupBy(col(det))
        .agg(countDistinct(col(dep)).as("_ndv"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("_ndv") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_keys"), col("n_violating"),
          (col("n_violating") === 0).as("fd_holds"))
    }.reduce(_.unionByName(_))
  }

  /** Declarative data-quality rules in ONE pass: each rule is
    * (name, pass-predicate); output is one row per rule with the
    * violation count and rate. NULL predicate results count as
    * violations (a rule you can't evaluate didn't pass). The whole
    * rule set is a single aggregate over a single scan — adding a rule
    * adds a conditional sum, not a job.
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules needs at least one rule")
    val aggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"_v_$name")
    }
    val row = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col("_n").as("n_rows"),
        col(s"_v_$name").as("n_violations"),
        when(col("_n") > 0, round(col(s"_v_$name") / col("_n"), 6))
          .otherwise(lit(0.0)).as("violation_rate"))
    }
    row.select(explode(array(entries: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity audit: child rows whose foreign key has no
    * matching parent (orphans). NULL foreign keys are reported
    * separately, not as orphans — SQL FK semantics, where NULL means
    * "no reference", not "broken reference". One left join against the
    * DISTINCT parent key set (broadcast when small) + one conditional
    * aggregate: (n_child, n_null_fk, n_orphans, orphan_bp with integer
    * basis points over the non-null rows).
    */
  def fkOrphans(child: DataFrame, fkCol: String,
                parent: DataFrame, pkCol: String): DataFrame = {
    val pk = parent.select(col(pkCol).as("_pk")).distinct()
    child.select(col(fkCol).as("_fk"))
      .join(pk, col("_fk") === col("_pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("_fk").isNull, 1L).otherwise(0L)).as("n_null_fk"),
        sum(when(col("_fk").isNotNull && col("_pk").isNull, 1L).otherwise(0L))
          .as("n_orphans"))
      .select(col("n_child"), col("n_null_fk"), col("n_orphans"),
        when(col("n_child") > col("n_null_fk"),
          expr("n_orphans * 10000 div (n_child - n_null_fk)"))
          .otherwise(lit(0L)).as("orphan_bp"))
  }

  /** Distribution-drift detection: the Population Stability Index of an
    * integer column, per group vs the WHOLE-CORPUS baseline —
    * PSI = Σ_bins (q_i − p_i)·ln(q_i / p_i), the monitoring metric that
    * flags a source whose length/score distribution has shifted (rule
    * of thumb: < 0.1 stable, > 0.25 investigate). Bins are equal-width
    * over the corpus min..max in EXACT integer arithmetic (width =
    * (mx − mn + nBins) div nBins, clamped top bin), shares are add-one
    * smoothed so empty bins stay finite, and the one ln()/divide
    * happens after exact integer counts — compare after round(, 6), the
    * [[graft.llm.TextAnalysis.unigramLogProb]] convention.
    *
    * Shape: two aggregates over the binned corpus (corpus-wide + per
    * group), a groups×nBins grid join (tiny), broadcast scalars — the
    * corpus is scanned once, shuffled only by the groupBy.
    */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
               nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    // NULL values can't land in any 0..nBins-1 bin; dropping them up
    // front (the histogramPartial convention) keeps the p/q shares
    // summing to 1 — counting them only in the totals would skew PSI.
    val nonNull = df.filter(col(valueCol).isNotNull)
    val bounds = nonNull.agg(
      min(col(valueCol)).cast("long").as("_mn"),
      max(col(valueCol)).cast("long").as("_mx"))
    val binned = nonNull
      .select(col(groupCol), col(valueCol).cast("long").as("_v"))
      .crossJoin(broadcast(bounds))
      .withColumn("_w",
        expr(s"greatest(1L, (_mx - _mn + $nBins) div ${nBins}L)"))
      .withColumn("bin",
        least(expr("(_v - _mn) div _w"), lit(nBins - 1L)))
    val baseN = binned.agg(count(lit(1)).as("_n_base"))
    val base = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("_cb"))
    val grpN = binned.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n_grp"))
    val grid = grpN.crossJoin(broadcast(spark_range(df, nBins)))
    val grp = binned.groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("_cg"))
    grid
      .join(grp, Seq(groupCol, "bin"), "left")
      .na.fill(0L, Seq("_cg"))
      .join(broadcast(base), Seq("bin"), "left")
      .na.fill(0L, Seq("_cb"))
      .crossJoin(broadcast(baseN))
      .withColumn("_p",
        (col("_cb") + 1).cast("double") / (col("_n_base") + nBins))
      .withColumn("_q",
        (col("_cg") + 1).cast("double") / (col("_n_grp") + nBins))
      .groupBy(col(groupCol))
      .agg(max(col("_n_grp")).as("n_rows"),
        round(sum((col("_q") - col("_p")) * log(col("_q") / col("_p"))), 6)
          .as("psi"))
  }

  // small helper: a one-column 0..n-1 frame on df's session (the bin grid)
  private def spark_range(df: DataFrame, n: Int) = {
    val spark = df.sparkSession
    import spark.implicits._
    (0L until n.toLong).toDF("bin")
  }

  /** Dataset card: the one-row-per-source summary a dataset release
    * ships — sizes, token mass, dominant language (with its share in
    * basis points), and how many of the source's docs are corpus-wide
    * exact duplicates. Everything is exact-integer except the rounded
    * mean length. Shape: three aggregates over the corpus (base stats,
    * per-(source, lang) counts, md5 duplicate groups) joined on the
    * sources-sized result — the corpus shuffles by source/hash only.
    */
  def datasetCard(df: DataFrame, sourceCol: String, textCol: String,
                  langCol: String): DataFrame = {
    val base = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.llm.TextAnalysis.tokens(col(textCol)))).as("total_tokens"),
        round(avg(length(col(textCol))), 2).as("avg_chars"))
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("_lc").desc, col(langCol).asc)
    val topLang = df.groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("_lc"))
      .withColumn("_rn", row_number().over(wl))
      .filter(col("_rn") === 1)
      .select(col(sourceCol), col(langCol).as("top_lang"), col("_lc"))
    val hashes = df.select(col(sourceCol), md5(col(textCol)).as("_h"))
    val hot = hashes.groupBy(col("_h")).agg(count(lit(1)).as("_hc"))
      .filter(col("_hc") >= 2).select("_h")
    val dups = hashes.join(hot, Seq("_h"), "left_semi")
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("dup_docs"))
    base
      .join(topLang, Seq(sourceCol))
      .join(dups, Seq(sourceCol), "left")
      .na.fill(0L, Seq("dup_docs"))
      .select(col(sourceCol), col("n_docs"), col("total_tokens"),
        col("avg_chars"), col("top_lang"),
        expr("_lc * 10000 div n_docs").as("top_lang_bp"),
        col("dup_docs"))
  }
}
