package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental leak-free split assignment: extend
  * [[DedupOps.leakFreeSplit]]'s zero-leakage guarantee to a GROWING
  * corpus without ever re-splitting what was already assigned.
  *
  * The batch operator hashes each near-dup cluster's min id — correct
  * on a frozen corpus, but UNSTABLE under growth: a later-ingested doc
  * that joins a cluster with a lower id (or bridges two clusters)
  * changes the component min and silently migrates the WHOLE cluster
  * across train/val/test (the r10 verdict's "corpus v2" hole). A real
  * training-data pipeline needs the dual invariants:
  *
  *  1. STABILITY — a document's split, once assigned, never changes
  *     just because the corpus grew around it;
  *  2. LEAK-FREEDOM — no near-duplicate pair ever straddles splits.
  *
  * Assignment rules (the persisted state is one
  * (doc_id, cluster_id, cluster_seq, split, seq) row per doc, latest
  * `seq` wins):
  *  - a new doc near-duplicate of an EXISTING cluster INHERITS that
  *    cluster's split (and its cluster_id/cluster_seq) — the cluster's
  *    identity is its assignment, not its current min id;
  *  - a genuinely NEW cluster (no existing member reachable) hashes its
  *    component min id through [[Sampling.splitLabel]] — identical to
  *    what batch leakFreeSplit would assign on first sight;
  *  - a batch that MERGES existing clusters resolves to the OLDEST
  *    assignment: min (cluster_seq, cluster_id) over the component's
  *    existing members (tie rule: earliest ingestion batch wins; within
  *    a batch, the smaller anchor id). Every member of the merged
  *    component — including the absorbed clusters' old docs — is
  *    re-pointed at the winning (cluster_id, cluster_seq, split).
  *
  * The two invariants genuinely CONFLICT exactly once: a merge of two
  * clusters that were assigned DIFFERENT splits. Leak-freedom wins by
  * design — the absorbed cluster's docs migrate to the winning split
  * (the alternative, keeping both labels, IS the contamination this
  * operator exists to prevent) — and the migration is OBSERVABLE: the
  * migrated docs get a new assignment row at the merging batch's `seq`,
  * so downstream eval knows exactly which docs moved and when. Merges
  * of same-split clusters (and plain joins/growth) change no existing
  * doc's split — the common case is fully stable.
  *
  * Scale shape (the IncrementalDedup contract): the corpus is
  * represented by its signature index — candidate edges come from LSH
  * band joins over STORED signatures with the ≥minMatches-of-numHashes
  * MinHash agreement estimator (plus exact-hash star edges), never a
  * corpus text rescan; per batch the component graph holds batch docs +
  * the members of directly-touched clusters only, so the CC iteration
  * (DupGraph pointer jumping) is batch-neighborhood-sized, not
  * corpus-sized. Note the estimator (not exact Jaccard) decides
  * near-dup edges here, same as the incremental dedup family — cluster
  * boundaries can differ slightly from the one-shot exact-Jaccard
  * leakFreeSplit; that is the documented no-rescan trade.
  *
  * Reference context: generalizes the reference's filename-level
  * idempotency (file_loader.py:111-119) the same way IncrementalDedup
  * does, applied to eval-split integrity.
  */
object IncrementalSplit {

  /** Assignment rows for one batch: one row per batch doc (new
    * assignments) plus one row per EXISTING doc whose cluster merged
    * into a different winning assignment (migrations). Schema:
    * (idCol, cluster_id, cluster_seq, split, seq).
    *
    * `batchIndex`: the batch's [[IncrementalDedup.dedupIndex]] rows
    * (hand in a cached frame — read by several branches).
    * `priorSigs`: signature rows of EVERY previously assigned doc
    * (survivors AND duplicates — any old doc is a legal attachment
    * point). `priorAssign`: the store's latest-wins assignment view.
    * `seq`: this batch's monotonically increasing sequence number.
    */
  def assignBatch(batchIndex: DataFrame, priorSigs: DataFrame,
                  priorAssign: DataFrame, idCol: String,
                  splits: Seq[(String, Double)], seq: Long,
                  numHashes: Int = 8, rowsPerBand: Int = 4,
                  minMatches: Int = 6): DataFrame = {
    // cluster ids live as longs in the store and component labels hash
    // through CAST(long AS STRING) — a string id would null-cast here
    // and silently collapse clusters (string-id corpora: derive a
    // numeric id upstream, e.g. xxhash64, the Preference.pairs rule)
    require(batchIndex.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"assignBatch needs a numeric id column, got " +
        s"$idCol: ${batchIndex.schema(idCol).dataType.simpleString}")
    val id = col(idCol)

    def matchCount(l: String, r: String) =
      (1 to numHashes).map(i =>
        when(col(s"$l.mh$i") === col(s"$r.mh$i"), 1).otherwise(0))
        .reduce(_ + _)

    // within-batch exact edges as a star on the min id per content hash
    // (connectivity-equivalent to all pairs, group-bounded cost)
    val exW = batchIndex.select(id, col("exact_h"))
      .join(batchIndex.groupBy("exact_h").agg(min(id).as("_m")), "exact_h")
      .filter(id > col("_m"))
      .select(col("_m").as("id1"), id.as("id2"))

    // within-batch near edges: LSH band candidates, estimator-verified
    val bandsB = DedupOps.lshBands(batchIndex, idCol, numHashes, rowsPerBand)
    val candW = bandsB.select(col("band_id"), col("band_key"), id.as("_id1"))
      .join(bandsB.select(col("band_id"), col("band_key"), id.as("_id2")),
        Seq("band_id", "band_key"))
      .filter(col("_id1") < col("_id2"))
      .select("_id1", "_id2").distinct()
    val neW = candW
      .join(batchIndex.as("l"), col("_id1") === col(s"l.$idCol"))
      .join(batchIndex.as("r"), col("_id2") === col(s"r.$idCol"))
      .filter(matchCount("l", "r") >= minMatches)
      .select(col("_id1").as("id1"), col("_id2").as("id2"))

    // cross edges batch -> assigned corpus: exact-hash pairs + banded
    // estimator pairs over STORED signatures (no text rescan)
    val exC = batchIndex.select(id.as("id1"), col("exact_h"))
      .join(priorSigs.select(col("exact_h"), col(idCol).as("id2")), "exact_h")
      .select("id1", "id2")
    val bandsC = DedupOps.lshBands(priorSigs, idCol, numHashes, rowsPerBand)
    val candC = bandsB.select(col("band_id"), col("band_key"), id.as("_id1"))
      .join(bandsC.select(col("band_id"), col("band_key"), id.as("_id2")),
        Seq("band_id", "band_key"))
      .select("_id1", "_id2").distinct()
    val neC = candC
      .join(batchIndex.as("b"), col("_id1") === col(s"b.$idCol"))
      .join(priorSigs.as("c"), col("_id2") === col(s"c.$idCol"))
      .filter(matchCount("b", "c") >= minMatches)
      .select(col("_id1").as("id1"), col("_id2").as("id2"))
    val cross = exC.union(neC).distinct()

    // pull the WHOLE membership of every directly-touched cluster (one
    // semi-join on cluster_id): a merge must re-point the absorbed
    // cluster's every member, not just the doc the probe happened to
    // hit — partial re-pointing would leave intra-cluster split skew
    // AND break future touch-expansion by cluster_id
    val touchedClusters = priorAssign
      .join(cross.select(col("id2").as(idCol)).distinct(), Seq(idCol),
        "left_semi")
      .select("cluster_id").distinct()
    val members = priorAssign
      .join(touchedClusters, Seq("cluster_id"), "left_semi")
    // star edges member -> cluster anchor keep each old cluster one
    // component without materializing its internal pair graph (the
    // anchor is always a member: merges re-point everyone, including
    // the winning cluster's own anchor doc)
    val stars = members.filter(id =!= col("cluster_id"))
      .select(id.as("id1"), col("cluster_id").as("id2"))

    val edges = exW.union(neW).union(cross).union(stars)
    val comps = DupGraph.connectedComponents(edges) // (id, component)

    // batch docs with their component (isolated docs: own id), pinned
    // to long so splitLabel's md5(CAST AS STRING) sees the same text
    // form in both engines (the leakFreeSplit convention)
    val bcomp = batchIndex.select(id)
      .join(comps.withColumnRenamed("id", "_cc_id"),
        id === col("_cc_id"), "left")
      .select(id, coalesce(col("component"), id).cast("long").as("_comp"))

    // winner per component among existing members: lexicographic min of
    // (cluster_seq, cluster_id) — (seq, anchor) uniquely identifies a
    // cluster, so the struct min carries its split deterministically
    val pa = priorAssign.select(col(idCol).as("_pid"),
      col("cluster_id").as("_pcid"), col("cluster_seq").as("_pseq"),
      col("split").as("_psplit"))
    val winner = comps.join(pa, comps("id") === col("_pid"))
      .groupBy(col("component").cast("long").as("_wc"))
      .agg(min(struct(col("_pseq"), col("_pcid"), col("_psplit"))).as("_w"))
      .select(col("_wc"), col("_w._pseq").as("_wseq"),
        col("_w._pcid").as("_wcid"), col("_w._psplit").as("_wsplit"))

    val newRows = bcomp.join(winner, col("_comp") === col("_wc"), "left")
      .select(id,
        coalesce(col("_wcid"), col("_comp")).cast("long").as("cluster_id"),
        coalesce(col("_wseq"), lit(seq)).cast("long").as("cluster_seq"),
        coalesce(col("_wsplit"),
          Sampling.splitLabel(col("_comp"), splits)).as("split"),
        lit(seq).as("seq"))

    // migrations: existing members of merged components whose stored
    // assignment is not the winner — re-pointed (and, when the splits
    // differed, MOVED: the designed leak-freedom-beats-stability case)
    val migrations = priorAssign
      .join(comps.withColumnRenamed("id", "_mid"), id === col("_mid"))
      .join(winner, col("component").cast("long") === col("_wc"))
      .filter(col("cluster_id") =!= col("_wcid") ||
        col("split") =!= col("_wsplit"))
      .select(id,
        col("_wcid").cast("long").as("cluster_id"),
        col("_wseq").cast("long").as("cluster_seq"),
        col("_wsplit").as("split"),
        lit(seq).as("seq"))

    newRows.union(migrations)
  }
}
