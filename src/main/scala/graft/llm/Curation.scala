package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition every
  * pretraining data pipeline runs before tokenization —
  *
  *   language gate → quality-score gate → repetition gate →
  *   exact dedup (keep lowest id) → benchmark decontamination.
  *
  * Semantically each gate is exactly its standalone operator
  * ([[TextAnalysis.langId]], [[TextAnalysis.qualityScore]],
  * [[TextAnalysis.repetitionStats]], [[DedupOps.exactDedupKeep]],
  * [[Decontam.decontaminate]]) — but the implementation FUSES the
  * token-derived gates onto one shared (doc, token, count) aggregate
  * instead of calling the five operators back-to-back: called
  * separately, each would re-explode the token stream from the raw
  * text (Catalyst does not CSE subplans across joins), paying three
  * corpus-sized explode+shuffle passes where one suffices. The shared
  * aggregate is cached for its three consumers and released before
  * returning (the storage-lifecycle convention from
  * [[DedupOps.nearDupPairs]]).
  *
  * Corpus passes at scale: one token explode+aggregate (shared), one
  * shingle explode (decontamination), one md5 map (dedup) — all
  * aggregation-shaped (partial/final, map-side combine), no all-pairs
  * joins anywhere. The repetition gate needs only the top-TOKEN rule,
  * so no bigram pass. Gate results join back as broadcast-friendly
  * id-only semi/anti joins.
  */
object Curation {

  /** Curate `corpus` against an evaluation `benchmark`: returns the
    * surviving (idCol, textCol) rows — documents that are in `lang`,
    * score at least `minScore` ([[TextAnalysis.qualityScore]]), are not
    * repetitive (top token < 20% of tokens), are the lowest-id
    * representative of their exact content, and share no `shingleK`-gram
    * with the benchmark. Documents with zero tokens fail the gates by
    * construction (no language vote, no repetition row).
    */
  def curate(corpus: DataFrame, benchmark: DataFrame,
             idCol: String, textCol: String,
             lang: String = "en", minScore: Long = 0L,
             shingleK: Int = 3): DataFrame = {
    val (flags, tc) = gateFlags(corpus, idCol, textCol, lang, minScore)
    // gates: language, score, repetition — conjunction of the flags
    val gated = flags
      .filter(col("_lang_ok") && col("_score_ok") && col("_rep_ok"))
      .select(col(idCol), col(textCol))

    // exact dedup: keep the lowest id per identical content
    val keepIds = DedupOps.exactDedupKeep(gated, idCol, textCol).select(col(idCol))
    val deduped = gated.join(keepIds, Seq(idCol), "left_semi")

    // benchmark decontamination (broadcast anti-join on contaminated ids)
    val out = Decontam.decontaminate(deduped, benchmark, idCol, textCol, shingleK)
      .cache()
    out.count() // materialize: every consumer of `tc` has now run
    tc.unpersist()
    out
  }

  /** Per-document gate flags behind [[curate]] (and the per-stage
    * counts [[funnelReport]] publishes): one row per corpus doc with
    * `_lang_ok`, `_score_ok`, `_rep_ok`. Returns the flags frame plus
    * the cached (doc, token, count) aggregate the caller must
    * unpersist after its consumers run.
    */
  private def gateFlags(corpus: DataFrame, idCol: String, textCol: String,
                        lang: String, minScore: Long)
      : (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val toked = corpus.withColumn("_toks", TextAnalysis.tokens(col(textCol)))

    // ONE token explosion, aggregated to (doc, token, count) — shared by
    // the repetition, language, and stopword-hit gates below
    val tc = toked
      .select(col(idCol), explode(col("_toks")).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
      .cache()

    // repetition + token-mass stats from the shared aggregate
    val ta = tc.groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"), max("c").as("top_token_n"))

    // language votes: per-(doc, lang) hit mass against the broadcast
    // profile; winner by (count desc, lang asc). The same frame summed
    // over languages is the stopword hit count (profile words are
    // distinct across languages).
    val sw = TextAnalysis.stopwordProfiles.toDF("sl", "sw")
    val lv = tc.join(broadcast(sw), col("t") === col("sw"))
      .groupBy(col(idCol), col("sl")).agg(sum("c").as("lc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("lc").desc, col("sl").asc)
    val langWinner = lv.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("sl") === lang)
      .select(col(idCol), lit(true).as("_lang_ok"))
    val swHits = lv.groupBy(col(idCol)).agg(sum("lc").as("sw_hits"))

    // quality score = n_tokens + 2·sw_hits − 3·punct (integer, exact)
    val punct = toked.select(col(idCol), col(textCol),
      TextAnalysis.punctCount(col(textCol)).as("_punct"))
    val flags = punct
      .join(ta, Seq(idCol), "left")
      .join(swHits, Seq(idCol), "left")
      .na.fill(0L, Seq("sw_hits", "n_tokens", "top_token_n"))
      .join(langWinner, Seq(idCol), "left")
      .na.fill(false, Seq("_lang_ok"))
      .withColumn("_score",
        col("n_tokens") + lit(2) * col("sw_hits") - lit(3) * col("_punct"))
      .withColumn("_score_ok", col("_score") >= minScore)
      // zero-token docs have no tc rows: n_tokens = top_token_n = 0 and
      // 0*5 >= 0 holds, so they FAIL repetition — the pre-refactor
      // inner-join-on-ta semantics (zero-token docs never reached the
      // filter), kept explicit here
      .withColumn("_rep_ok", !(col("top_token_n") * 5 >= col("n_tokens")))
    (flags, tc)
  }

  /** The curation attrition funnel: one row per [[curate]] stage
    * (lang_id → quality_score → repetition → exact_dedup → decontam)
    * with docs in/out, dropped, and the stage survival rate — the
    * admin report a curation run publishes so mixture owners can see
    * WHERE their data went. Same gate machinery as [[curate]] (one
    * shared token aggregate, winner semi-joins, broadcast dirty set);
    * the five counts are five aggregates over bounded frames, unioned
    * into the ordered funnel.
    */
  def funnelReport(corpus: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String,
                   lang: String = "en", minScore: Long = 0L,
                   shingleK: Int = 3): DataFrame = {
    val (flags0, tc) = gateFlags(corpus, idCol, textCol, lang, minScore)
    // the count branches below re-derive the gate joins three times
    // otherwise (flags agg, dedup count, decontam count) — cache for
    // the one collect and release right after
    val flags = flags0.cache()
    val g3 = flags
      .filter(col("_lang_ok") && col("_score_ok") && col("_rep_ok"))
      .select(col(idCol), col(textCol))
    val keep = g3.join(
      DedupOps.exactDedupKeep(g3, idCol, textCol).select(col(idCol)),
      Seq(idCol), "left_semi")
    val clean = Decontam.decontaminate(keep, benchmark, idCol, textCol,
      shingleK)
    // coalesce: sum(when(..)) over an EMPTY corpus is NULL, not 0 — the
    // funnel must report zeros (and keep the n_out -> n_in chain) there
    val row =
      try flags.agg(
          count(lit(1)).as("n0"),
          coalesce(sum(when(col("_lang_ok"), 1L).otherwise(0L)), lit(0L))
            .as("n1"),
          coalesce(sum(when(col("_lang_ok") && col("_score_ok"), 1L)
            .otherwise(0L)), lit(0L)).as("n2"),
          coalesce(sum(when(col("_lang_ok") && col("_score_ok") &&
            col("_rep_ok"), 1L).otherwise(0L)), lit(0L)).as("n3"))
        .crossJoin(broadcast(keep.agg(count(lit(1)).as("n4"))))
        .crossJoin(broadcast(clean.agg(count(lit(1)).as("n5"))))
        .collect().head // 6 longs to the driver — nothing worth caching
      finally {
        // unconditional: a failed action (bad benchmark rows, executor
        // loss) must not leave corpus-sized frames pinned in the cache
        flags.unpersist()
        tc.unpersist()
      }
    val n = (0 to 5).map(i => row.getLong(i))
    val spark = corpus.sparkSession
    import spark.implicits._
    val stages = Seq(
      (1L, "lang_id", n(0), n(1)), (2L, "quality_score", n(1), n(2)),
      (3L, "repetition", n(2), n(3)), (4L, "exact_dedup", n(3), n(4)),
      (5L, "decontam", n(4), n(5)))
    stages.toDF("stage_idx", "stage", "n_in", "n_out")
      .select(col("stage_idx"), col("stage"), col("n_in"), col("n_out"),
        (col("n_in") - col("n_out")).as("dropped"),
        // Spark-side round so the HALF_UP semantics match the oracle
        when(col("n_in") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_out").cast("double") / col("n_in"), 6))
          .as("survival"))
  }

  /** STREAMING-SAFE pure-projection faces of the per-document gates:
    * language vote, quality score, and top-token repetition computed as
    * column algebra over the materialized token array — no explode, no
    * groupBy, no window function, so the same expressions run unchanged
    * on a streaming DataFrame (where aggregations need watermarks and
    * window functions are unsupported). Semantics match the aggregate
    * formulations above exactly:
    *  - language: per-lang hit mass over the token multiset, winner by
    *    (hits desc, lang asc) via an ascending strictly-greater fold;
    *    zero hits → "und";
    *  - top_token_n: max per-token multiplicity, via array_sort + a
    *    single run-length fold (O(n log n) per doc — a pathological
    *    10⁵-token document costs a sort, not the O(distinct·n) blowup
    *    a nested count-each-distinct HOF would; the batch [[curate]]
    *    path uses the shuffle aggregate instead);
    *  - score: n_tokens + 2·sw_hits − 3·punct, all integers.
    *
    * Returns (idCol, textCol) rows passing all three gates. Documents
    * with zero tokens fail (no language vote), matching [[curate]].
    */
  def pureGates(df: DataFrame, idCol: String, textCol: String,
                lang: String = "en", minScore: Long = 0L): DataFrame = {
    val byLang = TextAnalysis.stopwordProfiles.groupBy(_._1).view
      .mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    // r14 optimization — same gate algebra, restructured for single
    // evaluation: the old `_toks` column fed a strictly-greater fold
    // whose when-chains reference each language's hit count twice per
    // step (2^|langs| subtree copies), and predicate pushdown then
    // inlined `_toks` = tokenize(text) into every copy — interpreted
    // HOFs get no common-subexpression elimination, so each document
    // paid ~50 tokenize/filter passes (measured: the 5.4 s
    // q_stream_curation gate stage). Binding the token array and the
    // hit-count array as LAMBDA VARIABLES (one-element transform =
    // the SQL "let") makes every re-reference an O(1) variable read:
    // one tokenization, one filter pass per language, per document.
    val allStop = TextAnalysis.stopwordProfiles.map(_._2).distinct
    val gate = element_at(
      transform(array(TextAnalysis.tokens(col(textCol))), toks => {
        val hitsArr = array(byLang.map { case (_, words) =>
          size(filter(toks, t => t.isin(words: _*)))
        }: _*)
        element_at(transform(array(hitsArr), hs => {
          // winner by (hits desc, lang asc): ascending fold, strict >
          // — identical to the previous column fold, but over cheap
          // array reads instead of re-evaluated filter passes
          val (_, predLang) = byLang.zipWithIndex
            .foldLeft((lit(0), lit("und"))) {
              case ((bestHits, bestLang), ((l, _), i)) =>
                val hits = element_at(hs, i + 1)
                (when(hits > bestHits, hits).otherwise(bestHits),
                  when(hits > bestHits, lit(l)).otherwise(bestLang))
            }
          val swHits = size(filter(toks, t => t.isin(allStop: _*)))
          // max multiplicity = longest equal-run in the sorted token
          // array. The fold carries (prev, run, best); tokens are
          // never "" (the tokenizer drops empties), so the seed prev
          // never matches.
          val topTok = coalesce(
            aggregate(
              array_sort(toks),
              struct(lit("").as("prev"), lit(0L).as("run"),
                lit(0L).as("best")),
              (acc, t) => {
                val run = when(t === acc("prev"), acc("run") + lit(1L))
                  .otherwise(lit(1L))
                struct(t.as("prev"), run.as("run"),
                  greatest(acc("best"), run).as("best"))
              },
              acc => acc("best")),
            lit(0L))
          val nToks = size(toks)
          val score = nToks + lit(2) * swHits -
            lit(3) * TextAnalysis.punctCount(col(textCol))
          predLang === lang && score >= minScore &&
            nToks > 0 && !(topTok * 5 >= nToks)
        }), 1)
      }), 1)
    df.filter(gate).select(col(idCol), col(textCol))
  }
}
