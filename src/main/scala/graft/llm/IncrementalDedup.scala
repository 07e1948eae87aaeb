package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus deduplication: dedup a NEW batch of documents
  * against an already-ingested corpus WITHOUT rescanning the corpus
  * text. At 100 TB nobody re-deduplicates the whole corpus per
  * ingestion batch — the corpus is represented by a compact signature
  * index (one short row per document: an exact content hash plus a
  * MinHash signature, ~300 bytes vs KBs of text) that is built once
  * and appended to as batches are accepted.
  *
  * The batch pipeline then needs only:
  *   - an exact kill: batch content-hash joined against the index hash
  *     (a broadcast or shuffle hash join on a 32-char key — the index
  *     side carries no text);
  *   - a near kill: LSH band keys of the batch joined against band keys
  *     of the index (bucket-local, never all-pairs), with similarity
  *     estimated from the STORED signatures (fraction of matching
  *     minhashes — the standard MinHash estimator) instead of exact
  *     Jaccard, precisely so the corpus text never has to be re-read.
  *
  * Within-batch duplicates are handled by the same machinery (keep the
  * lowest id), so the surviving rows are both internally deduplicated
  * and novel w.r.t. the corpus; their signatures are what gets appended
  * to the index for the next batch.
  *
  * Hash family is the same portable md5 construction as
  * [[DedupOps.minhashSignatures]] — deterministic and reproducible in
  * any engine with md5, which is what makes the whole verdict frame
  * oracle-checkable.
  *
  * Reference context: the reference's idempotency probe
  * (`file_loader.py:111-119`) solves the degenerate form of this —
  * "was this exact file already ingested?" via a filename lookup in
  * `file_ingestion_log`. This operator is the content-level,
  * similarity-aware generalization a training-data pipeline needs.
  */
object IncrementalDedup {

  /** Compact signature index: one row per document with
    * (id, exact_h = md5(text), mh1..mhN minhash signature).
    * Documents with fewer than k tokens have no shingles → their mh
    * columns are null (they still participate in exact dedup; null
    * band keys never join, so they are transparent to the near path).
    *
    * One corpus pass: the exact hash rides the shingle explode as a
    * grouping key, so no second scan or self-join is needed.
    */
  def dedupIndex(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 8, k: Int = 3): DataFrame = {
    val sets = df
      .withColumn("_toks", TextAnalysis.tokens(col(textCol)))
      .select(col(idCol), md5(col(textCol)).as("exact_h"),
        explode_outer(TextAnalysis.shingles(col("_toks"), k)).as("s"))
    val aggs = (1 to numHashes).map(i =>
      min(md5(concat(lit(s"$i|"), col("s")))).as(s"mh$i"))
    sets.groupBy(col(idCol), col("exact_h")).agg(aggs.head, aggs.tail: _*)
  }

  /** Dedup verdict for every batch document against (corpus index +
    * the batch itself). Output: (idCol, verdict, match_id) where
    * verdict ∈ {exact_dup_corpus, exact_dup_batch, near_dup_corpus,
    * near_dup_batch, kept} — first match in that precedence order —
    * and match_id is the lowest matching document id (null for kept).
    *
    * Near-dup gate: ≥ `minMatches` of the `numHashes` stored minhashes
    * agree (the MinHash Jaccard estimator; 6/8 ≈ J ≥ 0.75). Candidate
    * generation is LSH-banded on both paths, so the join cost is
    * Σ bucket², not |batch|·|corpus|. Within-batch kills use the
    * keep-lowest-id convention of [[DedupOps.exactDedupKeep]]: a doc is
    * killed by ANY smaller-id batch doc that collides, matching the
    * one-pass streaming semantics of a keep-first dedup.
    *
    * `index` must be a frame produced by [[dedupIndex]] (or a union of
    * previously accepted batches' indexes — the append path).
    */
  def incrementalDedup(index: DataFrame, batch: DataFrame,
                       idCol: String, textCol: String,
                       numHashes: Int = 8, rowsPerBand: Int = 4,
                       k: Int = 3, minMatches: Int = 6): DataFrame = {
    // The batch index is read by six downstream branches (two exact,
    // two band explosions, two signature re-joins); cache the compact
    // signature frame rather than re-running the shingle explode per
    // branch. Function-scoped, same lifecycle note as
    // [[DedupOps.nearDupPairs]]. The corpus `index` is the caller's to
    // cache/persist — it is the durable artifact between batches.
    val bidx = dedupIndex(batch, idCol, textCol, numHashes, k).cache()
    incrementalDedupSigs(index, bidx, idCol, numHashes, rowsPerBand, minMatches)
  }

  /** [[incrementalDedup]] when the batch's signature index is already
    * computed (e.g. the streaming face, which also needs it for
    * [[survivorIndex]]). `batchIndex` is read by six branches — hand in
    * a cached frame.
    */
  def incrementalDedupSigs(index: DataFrame, batchIndex: DataFrame,
                           idCol: String, numHashes: Int = 8,
                           rowsPerBand: Int = 4,
                           minMatches: Int = 6): DataFrame = {
    val bidx = batchIndex
    val id = col(idCol)

    // exact vs corpus: lowest corpus id sharing the content hash
    val exC = bidx
      .join(index.select(col("exact_h"), col(idCol).as("_cid")), "exact_h")
      .groupBy(id).agg(min("_cid").as("m_exact_corpus"))

    // exact within batch: lowest batch id per hash kills the rest
    val exB = bidx.select(id, col("exact_h"))
      .join(bidx.groupBy("exact_h").agg(min(id).as("_mb")), "exact_h")
      .filter(col("_mb") < id)
      .select(id, col("_mb").as("m_exact_batch"))

    def matchCount(l: String, r: String) =
      (1 to numHashes).map(i =>
        when(col(s"$l.mh$i") === col(s"$r.mh$i"), 1).otherwise(0))
        .reduce(_ + _)

    // near vs corpus: band collision → signature-estimated similarity
    val bandsB = DedupOps.lshBands(bidx, idCol, numHashes, rowsPerBand)
    val bandsC = DedupOps.lshBands(index, idCol, numHashes, rowsPerBand)
    val candC = bandsB.select(col("band_id"), col("band_key"), id.as("_bid"))
      .join(bandsC.select(col("band_id"), col("band_key"), id.as("_cid")),
        Seq("band_id", "band_key"))
      .select("_bid", "_cid").distinct()
    val nearC = candC
      .join(bidx.as("b"), col("_bid") === col(s"b.$idCol"))
      .join(index.as("c"), col("_cid") === col(s"c.$idCol"))
      .filter(matchCount("b", "c") >= minMatches)
      .groupBy(col("_bid").as(idCol))
      .agg(min("_cid").as("m_near_corpus"))

    // near within batch: smaller-id batch doc kills the larger
    val candB = bandsB.select(col("band_id"), col("band_key"), id.as("_id1"))
      .join(bandsB.select(col("band_id"), col("band_key"), id.as("_id2")),
        Seq("band_id", "band_key"))
      .filter(col("_id1") < col("_id2"))
      .select("_id1", "_id2").distinct()
    val nearB = candB
      .join(bidx.as("l"), col("_id1") === col(s"l.$idCol"))
      .join(bidx.as("r"), col("_id2") === col(s"r.$idCol"))
      .filter(matchCount("l", "r") >= minMatches)
      .groupBy(col("_id2").as(idCol))
      .agg(min("_id1").as("m_near_batch"))

    bidx.select(id)
      .join(exC, Seq(idCol), "left")
      .join(exB, Seq(idCol), "left")
      .join(nearC, Seq(idCol), "left")
      .join(nearB, Seq(idCol), "left")
      .withColumn("verdict",
        when(col("m_exact_corpus").isNotNull, "exact_dup_corpus")
          .when(col("m_exact_batch").isNotNull, "exact_dup_batch")
          .when(col("m_near_corpus").isNotNull, "near_dup_corpus")
          .when(col("m_near_batch").isNotNull, "near_dup_batch")
          .otherwise("kept"))
      .withColumn("match_id",
        coalesce(col("m_exact_corpus"), col("m_exact_batch"),
          col("m_near_corpus"), col("m_near_batch")))
      .select(id, col("verdict"), col("match_id"))
  }

  /** The index rows to append after a batch is accepted: signatures of
    * the batch docs whose verdict is `kept`. Union with the existing
    * index (and compact/rewrite on your storage cadence) to advance the
    * corpus state for the next batch.
    */
  def survivorIndex(batchIndex: DataFrame, verdicts: DataFrame,
                    idCol: String): DataFrame =
    batchIndex.join(
      verdicts.filter(col("verdict") === "kept").select(idCol),
      Seq(idCol), "left_semi")
}
