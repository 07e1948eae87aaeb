package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source boilerplate detection — the CCNet/Dolma-family pass that
  * strips templated content (navigation chrome, license headers, scraper
  * artifacts) from a pretraining corpus: a k-shingle that appears in a
  * large fraction of one SOURCE's documents is boilerplate for that
  * source, and a document dominated by source-common shingles is
  * template, not content.
  *
  * Thresholds are exact integer ratios (df·pctDen ≥ n·pctNum), so any
  * engine computes the same profile. Scale shape: one distinct
  * (source, doc, shingle) explosion (the same shuffle MinHash pays),
  * a per-(source, shingle) count, and a (source, shingle)-keyed join of
  * the doc shingles against the FILTERED profile — common shingles are
  * by definition few per source, so the profile side stays small and
  * the join bucket-local; nothing is all-pairs.
  */
object Boilerplate {

  /** Distinct (idCol, sourceCol, s) shingle rows. */
  private def sourceShingles(df: DataFrame, idCol: String, sourceCol: String,
                             textCol: String, k: Int): DataFrame =
    TextAnalysis.explodeShingles(df, textCol, k, col(idCol), col(sourceCol))
      .distinct()

  /** The per-source common-shingle profile: shingles contained in at
    * least `minDf` documents AND at least pctNum/pctDen of the source's
    * shingle-bearing documents. (The denominator counts docs that HAVE
    * shingles — docs shorter than k tokens can't vote.)
    */
  def sourceProfile(df: DataFrame, idCol: String, sourceCol: String,
                    textCol: String, k: Int = 3, minDf: Long = 2L,
                    pctNum: Int = 1, pctDen: Int = 4): DataFrame = {
    val sh = sourceShingles(df, idCol, sourceCol, textCol, k)
    val dfc = sh.groupBy(col(sourceCol), col("s"))
      .agg(count(lit(1)).as("dfc"))
    val sz = sh.select(col(sourceCol), col(idCol)).distinct()
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    dfc.join(sz, sourceCol)
      .filter(col("dfc") >= minDf &&
        col("dfc") * pctDen >= col("n_docs") * pctNum)
      .select(col(sourceCol), col("s"), col("dfc"), col("n_docs"))
  }

  /** Per-document boilerplate mass: how many of the doc's distinct
    * shingles are source-common (`n_boiler` of `n_shingles`), plus the
    * integer-exact "more than half the doc is template" flag. Docs with
    * no shingles produce no row.
    */
  def boilerplateStats(df: DataFrame, idCol: String, sourceCol: String,
                       textCol: String, k: Int = 3, minDf: Long = 2L,
                       pctNum: Int = 1, pctDen: Int = 4): DataFrame = {
    val sh = sourceShingles(df, idCol, sourceCol, textCol, k)
    val prof = sourceProfile(df, idCol, sourceCol, textCol, k,
      minDf, pctNum, pctDen).select(col(sourceCol), col("s"))
    val tot = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val boil = sh.join(prof, Seq(sourceCol, "s"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_boiler"))
    tot.join(boil, Seq(idCol), "left")
      .na.fill(0L, Seq("n_boiler"))
      .select(col(idCol), col("n_shingles"), col("n_boiler"),
        (col("n_boiler") * 2 >= col("n_shingles")).as("is_templated"))
  }

  /** Cross-source contamination matrix: for every source pair, how many
    * DISTINCT shingles they share — the dataset diagnostic that finds
    * mirrored / re-scraped / syndicated sources before they defeat
    * per-source dedup budgets. One distinct (source, shingle) pass,
    * then a self-join keyed on the shingle: cost is Σ_s sdf(s)² where
    * sdf is the number of sources containing shingle s, so shingles in
    * more than `maxSources` sources are excluded — the same hot-key
    * guard as containment's maxDf (a universal shingle would otherwise
    * contribute |sources|² pairs while carrying no contamination
    * signal). Output: (src_a, src_b, shared_shingles, a_shingles,
    * b_shingles) with src_a < src_b.
    */
  def sourceOverlap(df: DataFrame, idCol: String, sourceCol: String,
                    textCol: String, k: Int = 3,
                    maxSources: Long = 64L): DataFrame = {
    val ss = TextAnalysis.explodeShingles(df, textCol, k, col(sourceCol))
      .select(col(sourceCol).as("_src"), col("s")).distinct()
    val rare = ss.groupBy(col("s")).agg(count(lit(1)).as("_sdf"))
      .filter(col("_sdf") <= maxSources)
      .select("s")
    val pruned = ss.join(rare, Seq("s"), "left_semi")
    val totals = ss.groupBy(col("_src")).agg(count(lit(1)).as("_tot"))
    val a = pruned.select(col("s"), col("_src").as("src_a"))
    val b = pruned.select(col("s"), col("_src").as("src_b"))
    a.join(b, Seq("s"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_shingles"))
      .join(totals.select(col("_src").as("src_a"), col("_tot").as("a_shingles")), "src_a")
      .join(totals.select(col("_src").as("src_b"), col("_tot").as("b_shingles")), "src_b")
      .select("src_a", "src_b", "shared_shingles", "a_shingles", "b_shingles")
  }
}
