package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and drop) training documents that
  * share word n-grams with an evaluation/benchmark set — the standard
  * guard against test-set leakage in a pretraining corpus.
  *
  * Shape, 100 TB-first: the corpus side explodes to DISTINCT
  * (doc, shingle) pairs (one shuffle, [[DedupOps.shingleSet]]); the
  * benchmark side reduces to a DISTINCT shingle set. Benchmarks are
  * small relative to a training corpus (millions of shingles vs
  * billions of documents), so the probe join BROADCASTs the benchmark
  * set and the whole scan stays map-side — no corpus-sized shuffle
  * beyond the per-doc shingle dedup. If the benchmark side ever
  * outgrows broadcast range, Spark falls back to a shuffled hash join
  * on the shingle key, which is still linear and bucket-local.
  */
object Decontam {

  /** Per-corpus-doc contamination stats: `n_overlap` = how many of the
    * doc's distinct k-shingles appear anywhere in the benchmark,
    * `n_shingles` = the doc's distinct shingle count (so callers can
    * threshold on an overlap RATIO with exact integer arithmetic).
    * Docs with zero overlap are not returned — at corpus scale the
    * clean set is the overwhelming majority and materializing a row per
    * clean doc would dwarf the real signal; [[decontaminate]] recovers
    * the clean corpus by anti-join instead.
    */
  def overlap(corpus: DataFrame, benchmark: DataFrame,
              idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val corpusShingles = DedupOps.shingleSet(corpus, idCol, textCol, k)
    val benchShingles = DedupOps.shingleSet(benchmark, idCol, textCol, k)
      .select(col("s")).distinct()
    val totals = corpusShingles.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    corpusShingles
      .join(broadcast(benchShingles), "s")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
      .join(totals, idCol)
      .select(col(idCol), col("n_overlap"), col("n_shingles"))
  }

  /** The clean corpus: drop every document whose distinct-shingle
    * overlap with the benchmark is at least `minOverlap` (default 1 =
    * any shared n-gram disqualifies, the conservative standard).
    * Broadcast anti-join on the contaminated id set — tiny by the same
    * argument as above.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, k: Int = 3,
                    minOverlap: Long = 1L): DataFrame = {
    val dirty = overlap(corpus, benchmark, idCol, textCol, k)
      .filter(col("n_overlap") >= minOverlap)
      .select(col(idCol))
    corpus.join(broadcast(dirty), Seq(idCol), "left_anti")
  }
}
