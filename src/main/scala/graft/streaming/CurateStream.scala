package graft.streaming

import graft.llm.{Curation, DedupOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming corpus curation (§2.9 meets the LLM-pipeline family): the
  * continuously-maintained face of [[graft.llm.Curation.curate]] for a
  * document stream (file drops, a queue) —
  *
  *   pure-projection gates (language / quality / repetition)
  *   → static-benchmark decontamination
  *   → stateful first-seen dedup.
  *
  * Everything before the dedup is STATELESS column algebra
  * ([[Curation.pureGates]]) or a stream-static join, so the only state
  * the query carries is the dedup store (one entry per distinct
  * content hash, TTL-boundable). The benchmark is static by nature
  * (eval sets change on release cadence, not per batch), and its
  * decontamination face AUTO-SWITCHES on the measured distinct-shingle
  * count (one static-side aggregate at query build):
  *
  *  - ≤ `maxBroadcastShingles`: the exact path — the shingle set rides
  *    to every executor as ONE broadcast array row and contamination
  *    is an `arrays_overlap` per document, no stream-side shuffle;
  *  - above it: the [[graft.functions.Bloom]] sketch path — a
  *    fixed-size filter (30 bits/shingle, per-probe fpp ≈ 5e-7) built
  *    once on the driver, probed per shingle as a pure projection.
  *    Streaming CANNOT run the batch [[graft.llm.Decontam]]
  *    explode+join+re-aggregate here (a second stateful op before the
  *    dedup state), so the sketch is the stream-shaped scale path; its
  *    false positives only ever DROP a clean document (never keep a
  *    contaminated one — Bloom has no false negatives), at ≈ 5e-7 ×
  *    shingles-per-doc odds. Exact-or-died-trying pipelines can run
  *    batch Decontam over the landed output on release cadence.
  *
  * Ordering note vs the batch [[Curation.curate]]: here decontamination
  * runs BEFORE dedup, so when a content group's lowest-id copy is
  * contaminated but a later clean copy exists, the clean copy survives
  * (batch order drops the group). Streaming cannot know a future lower
  * id, so first-seen-wins with decontamination up front is the only
  * causal order — and arguably the better one.
  *
  * On a BATCH frame the identical plan is deterministic (state empty,
  * min-id representative per group) and equals: gates → drop docs
  * sharing a benchmark shingle → GROUP BY md5(text) → (min id, count) —
  * which is exactly what the q_stream_curation DuckDB oracle checks.
  */
object CurateStream {

  /** Emits one [[StreamDedup.FirstSeen]] row per distinct surviving
    * content: the curated-content registry (join `first_id` back to the
    * corpus for the text). Works on streaming and batch frames alike.
    */
  def curate(docs: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String,
             lang: String = "en", minScore: Long = 0L,
             shingleK: Int = 3, ttlMs: Long = 0L,
             maxBroadcastShingles: Long = 1000000L): Dataset[StreamDedup.FirstSeen] = {
    val gated = Curation.pureGates(docs, idCol, textCol, lang, minScore)
    // static side: measured once at query build (the benchmark changes
    // on release cadence — restart the query when it does). Cached:
    // the count() and the payload aggregate would otherwise each run
    // the full tokenize→shingle→distinct pipeline.
    val benchShingles = DedupOps.shingleSet(benchmark, idCol, textCol, shingleK)
      .select(col("s")).distinct().cache()
    val nBench = benchShingles.count()
    // the contamination verdict as ONE self-contained filter condition
    // with the token array bound as a LAMBDA VARIABLE (one-element
    // transform = the SQL "let"): the previous `_toks`/`_sh` helper
    // columns got substituted back into the pushed-down filter, and an
    // inlined tokenizer inside the shingle transform re-evaluates once
    // per shingle element — the documented O(tokens²)
    // InferFiltersFromGenerate trap (TextAnalysis.shingles perf note),
    // resurrected by PushDownPredicates. Binding keeps it one
    // tokenization + one shingle pass per document.
    def contaminated(probe: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      element_at(
        transform(array(graft.llm.TextAnalysis.tokens(col(textCol))),
          toks => probe(graft.llm.TextAnalysis.shingles(toks, shingleK))),
        1)
    val clean =
      if (nBench <= maxBroadcastShingles) {
        // exact face: the shingle set rides as an EXECUTOR BROADCAST
        // probed per-document-shingle through a hash set
        // ([[graft.functions.SetOverlapBroadcast]]) — same exact
        // membership as the previous one-row-crossJoin +
        // arrays_overlap form, but per-row cost is |doc shingles|
        // instead of a full |benchmark| walk (arrays_overlap re-scans
        // the longer side per row; measured 28M probes/run at sf0.1).
        // Like the Bloom face below, the plan carries only the
        // broadcast handle, so the shingle cache drains and releases
        // NOW instead of living with the streaming query.
        val benchArr = benchShingles.collect()
          .map(_.getString(0).getBytes("UTF-8"))
        benchShingles.unpersist()
        val benchBc = docs.sparkSession.sparkContext.broadcast(benchArr)
        gated.filter(!contaminated(shs =>
            graft.functions.SetProbe.overlapBroadcast(benchBc, shs)))
          .select(col(idCol), col(textCol))
      } else {
        // sketch face: fixed-size Bloom built once on the driver and
        // shipped as an EXECUTOR BROADCAST probed via
        // [[graft.functions.BloomProbeBroadcast]] — a lit(bytes)
        // literal here would be nBench*30 bits (~3.75MB at the 1M
        // threshold) re-serialized with every micro-batch's plan and
        // shipped inside every task binary, and neither of the
        // built-in shapes fits (BloomFilterMightContain rejects
        // crossJoin attributes, and the analyzer rejects scalar
        // subqueries inside the exists() lambda). The plan carries
        // only the broadcast handle; the shingle cache is drained
        // here and released NOW.
        import graft.functions.Bloom
        val bloomBytes = benchShingles
          .agg(Bloom.bloomAggBits(col("s"), nBench, nBench * 30).as("_b"))
          .head().getAs[Array[Byte]]("_b")
        benchShingles.unpersist()
        val bloomBc = docs.sparkSession.sparkContext.broadcast(bloomBytes)
        gated.filter(!contaminated(shs =>
            exists(shs, s => Bloom.mightContainBroadcast(bloomBc, s))))
          .select(col(idCol), col(textCol))
      }
    StreamDedup.firstSeen(clean, idCol, textCol, ttlMs)
  }
}
