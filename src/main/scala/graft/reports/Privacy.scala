package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audit over quasi-identifiers — the re-identification
  * gate a training-data release runs before shipping rows that carry
  * demographic-ish columns (region, segment, age band, ...):
  *
  *  - k-anonymity: every row must be indistinguishable from ≥ k−1
  *    others on the quasi-identifier tuple (Sweeney); classes smaller
  *    than k are linkage-attackable;
  *  - l-diversity: a k-anonymous class is still leaky when its
  *    SENSITIVE value is constant (homogeneity attack, Machanavajjhala
  *    et al.) — each class must carry ≥ l distinct sensitive values.
  *
  * Everything is exact-integer groupBy algebra: ONE shuffle on the
  * quasi-identifier key per audit, summaries over the classes-sized
  * frame — the corpus is never re-shuffled, so the audit runs at
  * ingest scale. Complements the column-masking PII ops
  * ([[graft.ingest.Stages]]) and free-text redaction
  * ([[graft.llm.TextAnalysis]]): those remove identifiers, this
  * MEASURES what the surviving quasi-identifiers still expose.
  */
object Privacy {

  private def classes(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("class_size"))
  }

  /** One-row k-anonymity summary: total rows, equivalence classes,
    * classes/rows below k, and the corpus's actual anonymity level
    * (min class size — the k the data ACHIEVES).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    classes(df, quasiCols).agg(
      sum(col("class_size")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      sum(when(col("class_size") < k, 1L).otherwise(0L)).as("n_risky_classes"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("n_risky_rows"),
      min(col("class_size")).as("achieved_k"))
  }

  /** The attackable equivalence classes themselves: quasi values +
    * size, for classes under k — the rows a release would suppress or
    * generalize. Classes-sized output.
    */
  def riskyClasses(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    classes(df, quasiCols).filter(col("class_size") < k)
  }

  /** Per-class l-diversity: class size, distinct sensitive values, and
    * the diversity verdict. A class can be k-anonymous yet fail here —
    * size ≥ k with one sensitive value leaks that value for everyone
    * in it. Classes-sized output, one shuffle.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2: $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"),
        (countDistinct(col(sensitiveCol)) >= l).as("is_diverse"))
  }

  /** Suppression plan: the corpus with under-k classes dropped — the
    * simplest k-anonymization (suppress, don't generalize), returning
    * only rows whose quasi tuple already satisfies k. The anti-join
    * side is the risky-classes frame; no broadcast hint on purpose —
    * it is usually tiny (AQE broadcasts it) but degenerates to
    * corpus-sized when the quasi tuple is near-unique, exactly when a
    * forced broadcast would OOM the driver.
    */
  def suppressToK(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    // NULL-SAFE join keys: groupBy puts NULL quasi values in their own
    // class, so the anti join must match them too (plain equality's
    // NULL = NULL is never true and would ship a unique NULL-keyed row
    // as "anonymized" — the exact row the audit flags as risky)
    val risky = riskyClasses(df, quasiCols, k)
      .select(quasiCols.map(c => col(c).as(s"_r_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"_r_$c")).reduce(_ && _)
    df.join(risky, cond, "left_anti")
  }
}
