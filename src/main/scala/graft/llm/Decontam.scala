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

  /** Bloom-pruned decontamination — the shape for when even the
    * benchmark SHINGLE SET strains broadcast range (a suite of eval
    * sets can reach 10⁸ shingles ≈ tens of GB of strings, while its
    * Bloom filter is ~100 MB): the benchmark reduces to ONE binary
    * Bloom row ([[graft.functions.Bloom.bloomAgg]]), crossJoins in as
    * a broadcast scalar, and the corpus shingle stream prunes
    * map-locally on `mightContain` BEFORE the exact membership join.
    * Only might-contain shingles (true matches + the filter's false
    * positives) reach the exact join, so the result is IDENTICAL to
    * [[decontaminate]] — Bloom filters have no false negatives; false
    * positives are removed by the exact verify. The exact join's
    * benchmark side is unchanged; what shrinks is the corpus-side
    * probe stream, from every shingle to ≈ overlapping ones.
    *
    * The aggregated filter binary passes through the driver as a
    * LITERAL — `might_contain` requires a constant/scalar-subquery
    * filter side — which is the broadcast-variable pattern with the
    * same bounded footprint: the driver holds the compact sketch
    * (MBs), never the shingle strings it summarizes.
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, k: Int = 3,
                         minOverlap: Long = 1L,
                         expectedBenchShingles: Long = 1000000L): DataFrame = {
    import graft.functions.Bloom
    val benchShingles = DedupOps.shingleSet(benchmark, idCol, textCol, k)
      .select(col("s")).distinct()
    val bloomBytes = benchShingles
      .agg(Bloom.bloomAgg(col("s"), expectedBenchShingles).as("_bloom"))
      .head().getAs[Array[Byte]]("_bloom")
    val corpusShingles = DedupOps.shingleSet(corpus, idCol, textCol, k)
    val candidates = corpusShingles
      .filter(Bloom.mightContain(lit(bloomBytes), col("s")))
    val dirty = candidates
      .join(broadcast(benchShingles), "s") // exact verify kills false positives
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col(idCol))
    corpus.join(broadcast(dirty), Seq(idCol), "left_anti")
  }
}
