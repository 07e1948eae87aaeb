package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic T5-style span corruption: given per-document token
  * counts, lay out the noise-span mask a denoising objective trains on
  * (Raffel et al. 2020 §3.1.4: corrupt ~15% of tokens in spans of mean
  * length 3, each span replaced by one sentinel). The reference
  * pipeline stops at ingesting documents; producing TRAINING LAYOUTS
  * from them is this engine's beyond-reference surface next to
  * [[Packing]].
  *
  * Everything is integer arithmetic on (n_tokens, doc id, span index):
  * span count and lengths from permille ratios, span positions from
  * the [[Sampling.hashBucket]] md5 bucket of (doc, span) — no RNG, so
  * the layout is reproducible across runs/engines and replayable by a
  * SQL oracle, and a re-run over a grown corpus never re-masks old
  * docs differently (the hashSplit growth-stability stance).
  *
  * Separation by construction: the doc is partitioned into `nSpans`
  * balanced segments (⌊s·n/k⌋ boundaries) and each span is placed
  * inside its own segment, offset by the hash bucket; every span but
  * the last stops at least one token short of its segment end, so two
  * spans can never touch and merge into one effective masked region
  * (a sentinel-per-span consumer keeps a bijection between span_ids
  * and masked regions) — T5's "spread spans through the doc" without
  * rejection sampling, which a declarative engine cannot express.
  *
  * Scale shape: one filter + one `sequence` explode emitting
  * ~n·ratio/meanLen rows per doc (≈5% of token count) — a pure
  * projection, no shuffle, no window; the stats face is one keyed
  * aggregate.
  */
object SpanCorrupt {

  /** Mask spans, one row per (id, span_id, start, len), 0-based token
    * offsets, spans disjoint and ordered by span_id. Docs with fewer
    * than 4 tokens emit no spans (nothing sensible to mask).
    *
    * Derivation (all integer): noise = max(1, n·ratio‰ div 1000);
    * nSpans = max(1, min(noise div meanLen, n div (2·meanLen))) —
    * the second bound keeps every segment at least twice the mean
    * span; span s gets len = noise div nSpans (+1 for the first
    * noise mod nSpans spans), clamped to segLen − 1 for non-last
    * spans (segLen for the last); start = segStart + bucket(id, s)
    * mod (segLen − len) for non-last spans (+1 for the last), so a
    * non-last span always leaves ≥ 1 unmasked token before the next
    * segment. The clamps stay ≥ 1: the nSpans bound guarantees
    * segLen ≥ 2.
    */
  def maskSpans(df: DataFrame, idCol: String, nTokCol: String,
                ratioPermille: Int = 150, meanLen: Int = 3): DataFrame = {
    require(ratioPermille >= 1 && ratioPermille <= 500,
      s"ratioPermille must be in [1, 500], got $ratioPermille")
    require(meanLen >= 1 && meanLen <= 100,
      s"meanLen must be in [1, 100], got $meanLen")
    val n = col(nTokCol).cast("long")
    df.filter(n >= 4L)
      .select(col(idCol), n.as("_n"))
      .withColumn("_noise",
        greatest(lit(1L), expr(s"_n * $ratioPermille div 1000")))
      .withColumn("_nspans",
        greatest(lit(1L), least(expr(s"_noise div $meanLen"),
          expr(s"_n div ${2 * meanLen}"))))
      .withColumn("span_id",
        explode(sequence(lit(0L), col("_nspans") - 1L)))
      .withColumn("_seg_start", expr("span_id * _n div _nspans"))
      .withColumn("_seg_len",
        expr("(span_id + 1) * _n div _nspans") - col("_seg_start"))
      .withColumn("_last", (col("span_id") === col("_nspans") - 1L).cast("long"))
      .withColumn("len",
        least(
          when(col("span_id") < expr("_noise % _nspans"),
            expr("_noise div _nspans") + 1L)
            .otherwise(expr("_noise div _nspans")),
          col("_seg_len") - 1L + col("_last")))
      .withColumn("start",
        col("_seg_start") + pmod(
          Sampling.hashBucket(concat(lit("sc_"), col(idCol).cast("string"),
            lit("_"), col("span_id").cast("string"))),
          col("_seg_len") - col("len") + col("_last")))
      .select(col(idCol), col("span_id"), col("start"), col("len"))
  }

  /** Per-document mask summary over ALL docs (unmaskable ones report
    * zeros): n_tokens, n_spans, n_masked, mask_ratio — the layout
    * audit a data card publishes next to the packing stats. One keyed
    * aggregate over [[maskSpans]] left-joined back onto the corpus.
    */
  def maskStats(df: DataFrame, idCol: String, nTokCol: String,
                ratioPermille: Int = 150, meanLen: Int = 3): DataFrame = {
    val spans = maskSpans(df, idCol, nTokCol, ratioPermille, meanLen)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_ns"), sum(col("len")).as("_nm"))
    df.select(col(idCol), col(nTokCol).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("_ns"), lit(0L)).as("n_spans"),
        coalesce(col("_nm"), lit(0L)).as("n_masked"),
        // empty docs report 0.0, not 0/0 = NaN (guard keys on the
        // exact integer, the r12 lesson)
        when(col("n_tokens") === 0L, lit(0.0d))
          .otherwise(round(coalesce(col("_nm"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 6)).as("mask_ratio"))
  }
}
