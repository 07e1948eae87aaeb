package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The verified near-duplicate PAIR INDEX as a build-once,
  * consume-many artifact. Every member of the dup family — the
  * cross-source duplication matrix, cluster resolution, the leak-free
  * split, the split-leakage audit — needs exactly the same frame: LSH
  * candidate pairs with exact integer Jaccard (id1, id2, jaccard_n,
  * jaccard_d). Re-running the shingle → MinHash → LSH → Jaccard chain
  * per consumer multiplies the heaviest corpus scan in the engine by
  * the number of reports (the r11 ledger's top cost: the matrix alone
  * re-paid 23 s at sf1.0); at 100 TB the pair index is computed once
  * per corpus snapshot and shared by every downstream read.
  *
  * Two lifecycles:
  *  - [[writePairStore]]/[[readPairs]] — a parquet store, the
  *    [[graft.streaming.IncrDedupStream]] signature-store posture.
  *    Survives process restarts AND the per-query cache isolation
  *    (`GraftSession.releaseAll`) that a plain `.cache()` does not;
  *    this is what the registered dup-family queries share.
  *  - passing any in-memory pairs frame (e.g. a still-cached
  *    [[DedupOps.nearDupPairs]] result) straight into the consumers —
  *    the single-session path.
  *
  * Consumers are PURE functions of the pair frame (+ tiny corpus
  * projections): no consumer re-touches document text, so their cost
  * is pairs-sized, ≪ corpus-sized. Thresholds apply per consumer by
  * integer cross-multiply (jaccard_n·den ≥ jaccard_d·num — exact, no
  * doubles), so one store at the candidate level serves every
  * downstream threshold ≥ the LSH band floor.
  *
  * Reference anchor: the reference dedups per-batch by file identity
  * (`file_loader.py` work-list skip); corpus-level near-dup indexing
  * is beyond-reference surface, designed Spark-first.
  */
object DedupIndex {

  /** `pairs` restricted to duplicates at num/den (default 0.8) by
    * exact integer cross-multiply.
    */
  def thresholded(pairs: DataFrame, thresholdNum: Int = 8,
                  thresholdDen: Int = 10): DataFrame =
    pairs.filter(
      col("jaccard_n") * thresholdDen >= col("jaccard_d") * thresholdNum)

  /** Materialize the verified pair index for `df` to a parquet store
    * at `path` (overwrite). One shingle explosion total: the chain is
    * [[DedupOps.nearDupPairs]] (shingle set cached once, feeding both
    * signatures and Jaccard verification), written out and the
    * function-scoped cache released before returning.
    */
  def writePairStore(df: DataFrame, idCol: String, textCol: String,
                     path: String, numHashes: Int = 8,
                     rowsPerBand: Int = 4, k: Int = 3): Unit = {
    val pairs =
      DedupOps.nearDupPairs(df, idCol, textCol, numHashes, rowsPerBand, k)
    pairs.write.mode("overwrite").parquet(path)
    pairs.unpersist()
    ()
  }

  /** The stored pair index — (id1, id2, jaccard_n, jaccard_d). */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Cross-source duplication matrix from a pair index — semantics of
    * [[DedupOps.dupSourceMatrix]], minus the chain re-run. NULL
    * sources raise (least/greatest SKIP NULLs, which would collapse a
    * cross-source pair onto the diagonal).
    */
  def sourceMatrix(pairs: DataFrame, df: DataFrame, idCol: String,
                   srcCol: String, thresholdNum: Int = 8,
                   thresholdDen: Int = 10): DataFrame = {
    val dup = thresholded(pairs, thresholdNum, thresholdDen)
      .select("id1", "id2")
    val src = df.select(col(idCol),
      when(col(srcCol).isNull,
        raise_error(lit(s"dupSourceMatrix: NULL source in $srcCol")))
        .otherwise(col(srcCol)).as(srcCol))
    dup
      .join(src.select(col(idCol).as("id1"), col(srcCol).as("_s1")),
        Seq("id1"))
      .join(src.select(col(idCol).as("id2"), col(srcCol).as("_s2")),
        Seq("id2"))
      .select(least(col("_s1"), col("_s2")).as("src_a"),
        greatest(col("_s1"), col("_s2")).as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_dup_pairs"))
  }

  /** Duplicate clusters from a pair index —
    * [[DupGraph.dupClusters]]'s (doc, component, is_canonical) over
    * the thresholded pairs.
    */
  def clusters(pairs: DataFrame, docs: DataFrame, idCol: String,
               thresholdNum: Int = 8, thresholdDen: Int = 10): DataFrame =
    DupGraph.dupClusters(docs.select(col(idCol)), idCol,
      thresholded(pairs, thresholdNum, thresholdDen).select("id1", "id2"))

  /** Quality-aware cluster representative from a pair index —
    * [[DupGraph.bestPerCluster]] over the thresholded pairs.
    */
  def bestPerCluster(pairs: DataFrame, docs: DataFrame, idCol: String,
                     qualityCol: String, thresholdNum: Int = 8,
                     thresholdDen: Int = 10): DataFrame =
    DupGraph.bestPerCluster(docs, idCol, qualityCol,
      thresholded(pairs, thresholdNum, thresholdDen).select("id1", "id2"))

  /** Leak-free split from a pair index — semantics of
    * [[DedupOps.leakFreeSplit]] (cluster-min component hash; the
    * frozen-corpus caveat documented there applies unchanged).
    */
  def leakFreeSplit(pairs: DataFrame, docs: DataFrame, idCol: String,
                    splits: Seq[(String, Double)], thresholdNum: Int = 8,
                    thresholdDen: Int = 10): DataFrame =
    DupGraph.dupClusters(docs.select(col(idCol)), idCol,
      thresholded(pairs, thresholdNum, thresholdDen).select("id1", "id2"))
      // pin the hash input's type: splitLabel md5's CAST(x AS STRING),
      // and both engines must see the same "123" text form
      .withColumn("component", col("component").cast("long"))
      .select(col(idCol), col("component"),
        Sampling.splitLabel(col("component"), splits).as("split"))

  /** Split-leakage audit from a pair index — semantics of
    * [[DedupOps.splitLeakage]]: duplicate pairs whose id-hash split
    * labels differ. Labels are pure expressions of the ids — no join
    * back to the corpus.
    */
  def splitLeakage(pairs: DataFrame, splits: Seq[(String, Double)],
                   thresholdNum: Int = 8,
                   thresholdDen: Int = 10): DataFrame =
    thresholded(pairs, thresholdNum, thresholdDen)
      .withColumn("split1", Sampling.splitLabel(col("id1"), splits))
      .withColumn("split2", Sampling.splitLabel(col("id2"), splits))
      .filter(col("split1") =!= col("split2"))
      .select("id1", "id2", "split1", "split2", "jaccard_n", "jaccard_d")
}
