package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing operators: lay a document corpus out as the token
  * stream a trainer actually consumes, and measure what each packing
  * policy costs (boundary-crossing docs, padding waste).
  *
  * Reference has no packing (its scope is relational ingestion); this
  * family exists because LLM pretraining feeds fixed-capacity context
  * windows, and the two standard policies — concat-and-chunk (GPT-style,
  * zero padding, documents split at chunk boundaries) and no-split bin
  * packing (SFT-style, padding waste, documents intact) — are corpus-
  * level layout computations, exactly what a data engine should answer
  * before a single GPU spins up.
  *
  * Scale posture: the concat layout needs a GLOBAL prefix sum, which a
  * naive `Window.orderBy` computes on ONE task. [[withStreamOffsets]]
  * instead runs the classic two-level scan: per-block sums (one keyed
  * shuffle), a window over the |corpus|/blockSize-row block-summary
  * frame, then per-block intra-window partials — every data-sized step
  * is keyed on the block id, so 100 TB packs with the same plan shape.
  */
object Packing {

  /** Adds the exclusive global prefix sum of `lenCol` in `idCol` order
    * as `start_off`: row r's value = Σ len over all rows with smaller
    * id. Rows with len <= 0 are dropped (they occupy no stream space
    * and would only create zero-width chunk spans).
    *
    * `idCol` must be numeric and unique; blocks are `id div blockSize`
    * — monotonic in id, so block ranges tile the global order without
    * requiring dense ids. Two-level scan (see object doc). The summary
    * frame holds span(ids)/blockSize rows, NOT |ids|/blockSize: for a
    * SPARSE id space (composite sort keys) size blockSize to the span,
    * or use [[rankShards]]/[[binPack]], whose span-scaled blocking
    * bounds the summary at maxBlocks rows for any key distribution.
    * The fixed-width div is kept here because the stream-offset id is a
    * dense document id by contract and skipping the min/max stats pass
    * saves one scan per layout.
    */
  def withStreamOffsets(df: DataFrame, idCol: String, lenCol: String,
                        blockSize: Long = 1L << 20): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val base = df
      .withColumn("_id", col(idCol).cast("long"))
      .withColumn("_len", col(lenCol).cast("long"))
      .filter(col("_len") > 0L)
      .withColumn("_blk", expr(s"_id div $blockSize"))
    val blkSums = base.groupBy("_blk").agg(sum("_len").as("_bsum"))
    // deliberate global window over BLOCK SUMMARIES, not data rows —
    // span(ids)/blockSize rows (≈|ids|/blockSize only for DENSE ids;
    // see the scaladoc's sparse-key caveat)
    val wBlk = Window.orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blkSums
      .select(col("_blk"),
        coalesce(sum("_bsum").over(wBlk), lit(0L)).as("_boff"))
    val wIn = Window.partitionBy("_blk").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(offsets), Seq("_blk"))
      .withColumn("start_off",
        col("_boff") + coalesce(sum("_len").over(wIn), lit(0L)))
      .drop("_blk", "_boff")
  }

  /** Concat-and-chunk layout: the corpus as one token stream cut into
    * `capacity`-token training chunks. Per doc: stream offset, the
    * first/last chunk it lands in, and how many chunks it spans
    * (spans > 1 = split across a training-example boundary — the
    * attention-contamination rows a masking policy has to handle).
    */
  def tokenStreamPack(df: DataFrame, idCol: String, lenCol: String,
                      capacity: Long, blockSize: Long = 1L << 20): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    withStreamOffsets(df, idCol, lenCol, blockSize)
      .select(col(idCol), col("_len").as("n_tokens"), col("start_off"),
        expr(s"start_off div $capacity").as("chunk_first"),
        expr(s"(start_off + _len - 1) div $capacity").as("chunk_last"))
      .withColumn("n_chunks_spanned",
        col("chunk_last") - col("chunk_first") + 1L)
  }

  /** Per-chunk rollup of [[tokenStreamPack]]: docs overlapping each
    * chunk, how many of them cross a boundary, and the tokens the chunk
    * actually holds (== capacity everywhere but the tail — concat
    * packing wastes nothing). Explodes each doc to its spanned chunks
    * (spans are 1 + len/capacity, so the explode is ~|corpus| rows),
    * then one groupBy on the chunk id.
    */
  def streamChunkStats(packed: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    explodeChunkOverlap(packed, capacity,
        col("n_chunks_spanned"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chunks_spanned") > 1L, 1L).otherwise(0L))
          .as("n_boundary_docs"),
        sum(col("_tok")).as("tokens_in_chunk"))
  }

  /** Shared chunk-explode of a [[tokenStreamPack]] frame: one row per
    * (doc, spanned chunk) with `_tok` = the tokens that doc contributes
    * to that chunk (the least/greatest overlap algebra lives HERE once;
    * [[streamChunkStats]] and [[chunkSourceStats]] both fold it).
    */
  private def explodeChunkOverlap(packed: DataFrame, capacity: Long,
                                  keep: Column*): DataFrame =
    packed
      .select(keep ++ Seq(col("start_off"), col("n_tokens"),
        explode(expr("sequence(chunk_first, chunk_last)")).as("chunk_id")): _*)
      .withColumn("_tok",
        least(col("start_off") + col("n_tokens"),
          (col("chunk_id") + 1L) * capacity) -
          greatest(col("start_off"), col("chunk_id") * capacity))

  /** Source-diversity rollup of a [[tokenStreamPack]] layout: per
    * training chunk, how many distinct sources contribute and what
    * share of the chunk's tokens the DOMINANT source holds — the
    * shuffle-quality gate for concat packing (chunks dominated by one
    * source teach spurious in-context correlations; a healthy layout
    * keeps dom_share low everywhere but the tail).
    *
    * `meta` = (id, source) joined in by id (co-partitionable
    * equi-join). Shape: the same ~|corpus|-row chunk explode as
    * [[streamChunkStats]], then per-(chunk, source) partial sums →
    * per-chunk argmax via one struct max — two keyed shuffles total,
    * no windows, no corpus² anywhere. Share rides round(6).
    */
  def chunkSourceStats(packed: DataFrame, meta: DataFrame, idCol: String,
                       srcCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    // LEFT join + loud null check: an inner join would silently DROP
    // any packed doc missing a meta row, shrinking tokens_in_chunk and
    // skewing dom_share for every chunk that doc touches (and
    // disagreeing with streamChunkStats on the same frame) — fail
    // instead, the caller's metadata is incomplete
    val withSrc = packed
      .join(meta.select(col(idCol), col(srcCol).as("_src")),
        Seq(idCol), "left")
      .withColumn("_src",
        when(col("_src").isNull, raise_error(concat(
          lit("chunkSourceStats: no meta row for packed id "),
          col(idCol).cast("string"))))
          .otherwise(col("_src")))
    val perDocChunk = explodeChunkOverlap(withSrc, capacity, col("_src"))
      .select(col("chunk_id"), col("_src"), col("_tok"))
    perDocChunk
      .groupBy("chunk_id", "_src")
      .agg(count(lit(1)).as("_nd"), sum("_tok").as("_st"))
      .groupBy("chunk_id")
      .agg(sum("_nd").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum("_st").as("tokens_in_chunk"),
        // dominant source: most tokens, tie -> lexicographically
        // smallest source name — encoded as min(struct(-tokens, src)),
        // the negation turning "max tokens" into a min so the string
        // tie-break can be a plain lexicographic min too
        min(struct((-col("_st")).as("_ns"), col("_src").as("src"),
          col("_st").as("st"))).as("_dom"))
      .select(col("chunk_id"), col("n_docs"), col("n_sources"),
        col("tokens_in_chunk"), col("_dom.src").as("dominant_src"),
        col("_dom.st").as("dominant_tokens"),
        round(col("_dom.st").cast("double") / col("tokens_in_chunk"), 6)
          .as("dom_share"))
  }

  /** Adds `_blk`, an ORDER-PRESERVING block id over `key` with at most
    * `maxBlocks` distinct values regardless of how sparse the key space
    * is: block = (key − min) div ceil(span / maxBlocks). A plain
    * `key div B` keeps the summary frame bounded only for DENSE keys —
    * a composite key like score·2³² + id puts every key in its own
    * block and the "block summary" silently becomes corpus-sized, i.e.
    * the single-task global sort this machinery exists to avoid (r10
    * verdict task). The (min, width) stats row rides a 1-row broadcast,
    * one extra column-pruned pass over the frame.
    *
    * Contract: key is numeric and its span fits a Long
    * (max − min + maxBlocks < 2⁶³ — true for any composed sort key that
    * itself fits a Long with headroom). Determinism: min/max and the
    * floor divisions are exact integer algebra.
    */
  private[llm] def withBoundedBlocks(df: DataFrame, keyCol: String,
                                maxBlocks: Long,
                                as: String = "_blk"): DataFrame = {
    require(maxBlocks > 0, s"maxBlocks must be positive, got $maxBlocks")
    // loud span guard: a sentinel key like Long.MinValue next to normal
    // keys overflows (_hi - _lo); under ANSI that throws a bare
    // ArithmeticException mid-job and under non-ANSI it would wrap into
    // a negative width and mis-block every row — name the contract in
    // the error instead (try_* make the check engine-config-proof).
    // An EMPTY frame has NULL min/max: that is a legal no-op (the join
    // below yields nothing), NOT an overflow — guard only when _lo
    // exists, else a concat-NULLed message raised a blank error
    val stats = df.agg(min(col(keyCol).cast("long")).as("_lo"),
        max(col(keyCol).cast("long")).as("_hi"))
      .select(col("_lo"),
        when(col("_lo").isNotNull &&
          expr(s"try_add(try_subtract(_hi, _lo), ${maxBlocks}L)").isNull,
          raise_error(concat(
            lit(s"withBoundedBlocks: span of $keyCol overflows Long " +
              "(min="), col("_lo").cast("string"),
            lit(", max="), col("_hi").cast("string"),
            lit(") — rescale or split sentinel keys out"))).cast("long"))
          .otherwise(coalesce(
            expr(s"(_hi - _lo + ${maxBlocks}L) div ${maxBlocks}L"),
            lit(1L)))
          .as("_bw"))
    // key - _lo >= 0 by construction, so truncating `div` IS floor div
    df.join(broadcast(stats))
      .withColumn(as, expr(s"(cast($keyCol as bigint) - _lo) div _bw"))
      .drop("_lo", "_bw")
  }

  /** No-split bin packing, power-of-two length buckets: docs keep their
    * boundaries (SFT/eval batching), each bin holds
    * k = max(1, capacity div 2^(lb+1)) docs of bucket
    * lb = ⌊log₂ len⌋ — k docs of length < 2^(lb+1) always fit, so the
    * capacity guarantee is structural, not checked per bin.
    *
    * Scale posture: the per-bucket rank is the SAME two-level scan as
    * [[withStreamOffsets]], sub-sharded on [[withBoundedBlocks]] of the
    * id — a plain ROW_NUMBER over PARTITION BY len_bucket has at most
    * ~log₂(capacity)+2 partitions, and a corpus dominated by one length
    * bucket (the realistic token-length distribution) would sort that
    * whole bucket on a single task (r10 ADVICE). Per (bucket, block)
    * everything is keyed; the only windows run over the
    * (buckets × ≤maxBlocks)-row block-summary frame, partitioned by
    * bucket, and the corpus-sized frame sorts only within (bucket,
    * block).
    *
    * Per doc: (id, len, len_bucket, bin_idx, fits). Docs with
    * len > capacity can never pack — they get len_bucket = -1,
    * bin_idx = 0, fits = false (count them, then chunk or drop them
    * upstream). len <= 0 rows are dropped as in the stream layout.
    * `idCol` must be numeric and unique (the rank tiebreak).
    *
    * ⌊log₂ len⌋ rides `length(bin(len)) - 1` — exact in both engines,
    * unlike libm log2 which can flip 2^k boundaries.
    */
  def binPack(df: DataFrame, idCol: String, lenCol: String,
              capacity: Long, maxBlocks: Long = 1L << 20): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val base = withBoundedBlocks(
      df.withColumn("_id", col(idCol).cast("long"))
        .withColumn("_len", col(lenCol).cast("long"))
        .filter(col("_len") > 0L)
        .withColumn("len_bucket",
          when(col("_len") > capacity, lit(-1L))
            .otherwise(expr("length(bin(_len)) - 1").cast("long"))),
      "_id", maxBlocks)
    // two-level per-bucket rank: exclusive count of earlier blocks in
    // the same bucket + intra-(bucket, block) row_number. Equal to
    // ROW_NUMBER over (PARTITION BY len_bucket ORDER BY _id) - 1
    // because blocks tile the id order (withBoundedBlocks is monotonic
    // in the key). The summary window input is the aggregate frame.
    val blkCounts = base.filter(col("len_bucket") =!= -1L)
      .groupBy("len_bucket", "_blk").agg(count(lit(1)).as("_bc"))
    val wb = Window.partitionBy("len_bucket").orderBy("_blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = blkCounts.select(col("len_bucket"), col("_blk"),
      coalesce(sum("_bc").over(wb), lit(0L)).as("_boff"))
    val wIn = Window.partitionBy("len_bucket", "_blk").orderBy("_id")
    base
      .join(offs, Seq("len_bucket", "_blk"), "left") // -1 bucket: no offs row
      .withColumn("_rk",
        coalesce(col("_boff"), lit(0L)) + row_number().over(wIn) - 1L)
      .withColumn("bin_idx",
        when(col("len_bucket") === -1L, lit(0L))
          .otherwise(expr(
            s"""_rk div greatest(1L, $capacity div shiftleft(cast(1 as bigint),
               |          cast(len_bucket + 1 as int)))""".stripMargin)))
      .select(col(idCol), col("_len").as("len"), col("len_bucket"),
        col("bin_idx"), (col("len_bucket") =!= -1L).as("fits"))
  }

  /** Rank-based (global key-order) sharding: shard i holds the i-th
    * contiguous slice of the corpus in `keyCol` order, sizes balanced
    * within ±1 — the ORDERED complement of Sampling.writeShards' hash
    * shards (training wants shuffled; curriculum export, merge-joinable
    * deliveries, and zone-map-prunable layouts want sorted). Exact
    * global rank via the two-level scan over [[withBoundedBlocks]] of
    * the key, so no one-task window and no repartitionByRange sampling
    * nondeterminism: shard = rank·numShards div n, bit-stable across
    * runs and engines.
    *
    * Unlike [[withStreamOffsets]]' dense-id `div blockSize` tiling, the
    * blocking here is SPAN-SCALED — rank-shard keys are definitionally
    * composite/sparse (score·2³² + id), and a fixed-width div would put
    * every key in its own block, making the "summary" window
    * corpus-sized (the r10 verdict's single-task-sort hazard). The
    * summary frame is ≤ `maxBlocks` rows by construction.
    *
    * `keyCol` must be numeric and (keyCol, tieCol) UNIQUE. For a
    * tie-broken sort there are two shapes: compose score·2³² + id into
    * one key (only when id < 2³² at EVERY corpus size — a re-keyed or
    * grown id space silently overflows the shift), or — the safe,
    * scale-proof form — pass the unique id as `tieCols`: the rank
    * decomposes into A = rows with a strictly smaller key (block
    * offsets + a per-block DISTINCT-KEY prefix, so a hot key
    * contributes ONE summary row, never a one-task sort of its whole
    * group — the r11 review hazard) plus B = the row's position inside
    * its equal-key group (the binPack sub-block idiom: global tie
    * blocks, per-(key, tie-block) counts, ≤maxBlocks summary rows per
    * key, final row_number inside (key, tie-block) — a modal key's
    * group sorts spread across its tie blocks). No range constraint on
    * the tie column at all. Returns the input + (rank, shard).
    */
  def rankShards(df: DataFrame, keyCol: String, numShards: Int,
                 maxBlocks: Long = 1L << 20,
                 tieCols: Seq[String] = Nil): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    require(tieCols.size <= 1,
      s"rankShards supports at most one tie column, got $tieCols " +
        "(compose further ties upstream)")
    val ranked = tieCols match {
      case Nil =>
        val base = withBoundedBlocks(df, keyCol, maxBlocks)
        val blkCounts = base.groupBy("_blk").agg(count(lit(1)).as("_bc"))
        // global window over the ≤maxBlocks-row BLOCK SUMMARY frame only
        val wb = Window.orderBy("_blk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = blkCounts.select(col("_blk"),
          coalesce(sum("_bc").over(wb), lit(0L)).as("_boff"))
        val wIn = Window.partitionBy("_blk").orderBy(col(keyCol))
        base
          .join(broadcast(offs), Seq("_blk"))
          .withColumn("rank", col("_boff") + row_number().over(wIn) - 1L)
          .drop("_blk", "_boff")
      case Seq(tie) =>
        val base = withBoundedBlocks(
          withBoundedBlocks(df, tie, maxBlocks, as = "_tblk"),
          keyCol, maxBlocks)
        // A: rows with strictly smaller key = earlier-key-block counts
        // (disjoint ordered ranges) + within-block prefix over the
        // DISTINCT-KEY summary (a hot key is one row here)
        val blkCounts = base.groupBy("_blk").agg(count(lit(1)).as("_bc"))
        val wb = Window.orderBy("_blk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val boff = blkCounts.select(col("_blk"),
          coalesce(sum("_bc").over(wb), lit(0L)).as("_boff"))
        val keyCounts = base.groupBy(col("_blk"), col(keyCol))
          .agg(count(lit(1)).as("_kc"))
        val wk = Window.partitionBy("_blk").orderBy(col(keyCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        val aFrame = keyCounts
          .withColumn("_kpre", coalesce(sum("_kc").over(wk), lit(0L)))
          .join(broadcast(boff), Seq("_blk"))
          .select(col(keyCol), (col("_boff") + col("_kpre")).as("_arank"))
        // B: position inside the equal-key group by tie — global tie
        // blocks tile the tie order, so per-key tie-block counts give
        // the prefix and the final row_number sorts only (key, tblk)
        val tCounts = base.groupBy(col(keyCol), col("_tblk"))
          .agg(count(lit(1)).as("_tc"))
        val wt = Window.partitionBy(col(keyCol)).orderBy(col("_tblk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val toff = tCounts
          .withColumn("_toff", coalesce(sum("_tc").over(wt), lit(0L)))
          .select(col(keyCol), col("_tblk"), col("_toff"))
        val wIn = Window.partitionBy(col(keyCol), col("_tblk"))
          .orderBy(col(tie))
        base
          .join(toff, Seq(keyCol, "_tblk"))
          .join(aFrame, Seq(keyCol))
          .withColumn("rank",
            col("_arank") + col("_toff") + row_number().over(wIn) - 1L)
          .drop("_blk", "_tblk", "_toff", "_arank")
    }
    val n = ranked.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("shard", expr(s"(rank * $numShards) div _n"))
      .drop("_n")
  }

  /** Manifest of a [[rankShards]] layout: one row per shard with its
    * row count and key range — non-overlapping, ordered ranges BY
    * CONSTRUCTION, so a reader can zone-map-prune shards from the
    * manifest alone. One groupBy on the numShards-key frame.
    */
  def rankShardManifest(sharded: DataFrame, keyCol: String): DataFrame =
    sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("key_lo"), max(col(keyCol)).as("key_hi"))

  /** Greedy boundary-respecting chunker: each document's segments
    * (sentences, paragraphs — whatever the caller split on) are packed
    * left-to-right into `capacity`-token chunks, cutting BEFORE any
    * segment that would overflow the current chunk, so no segment is
    * ever split. A single segment larger than `capacity` still gets its
    * own (overflowing) chunk and is counted in `n_overflow_segments` —
    * the caller's signal to re-split or drop.
    *
    * `segCountsCol` is an array<long> of per-segment token counts in
    * document order (zero/negative entries are ignored). The greedy
    * scan is a per-document `aggregate()` fold over that array — pure
    * map-side column algebra: NO shuffle, no UDF, linear in total
    * segments, embarrassingly parallel at any corpus size. (The fold
    * state starts at cur = capacity so the first segment always opens
    * chunk 1 — no empty-chunk special case.)
    */
  def greedyChunks(df: DataFrame, idCol: String, segCountsCol: String,
                   capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val cap = lit(capacity)
    // materialize the filtered array ONCE, then run ONE fold over the
    // named column carrying every output (chunks/cur/ovf/token total)
    // in the state struct — aggregate() is interpreted, so a second
    // independent fold for n_tokens would double the per-segment cost,
    // and folding over the building expression would re-evaluate the
    // filter per consumer
    val folded = aggregate(
      col("_counts"),
      struct(lit(0L).as("chunks"), cap.as("cur"), lit(0L).as("ovf"),
        lit(0L).as("tot")),
      (acc, c) => struct(
        when(acc("cur") + c > cap, acc("chunks") + 1L)
          .otherwise(acc("chunks")).as("chunks"),
        when(acc("cur") + c > cap, c)
          .otherwise(acc("cur") + c).as("cur"),
        (acc("ovf") + when(c > cap, 1L).otherwise(0L)).as("ovf"),
        (acc("tot") + c).as("tot")))
    df
      .withColumn("_counts",
        filter(col(segCountsCol).cast("array<long>"), c => c > 0L))
      .withColumn("_fold", folded)
      .select(col(idCol),
        size(col("_counts")).cast("long").as("n_segments"),
        col("_fold.tot").as("n_tokens"),
        col("_fold.chunks").as("n_chunks"),
        col("_fold.ovf").as("n_overflow_segments"))
  }

  /** Waste audit of [[binPack]]: per length bucket, bins used, tokens
    * filled, padding waste against `n_bins · capacity`, and the fill
    * rate. The oversize bucket (-1) reports its doc count with zeroed
    * packing stats — those docs are unpacked by definition. One groupBy
    * on the ≤ log₂(capacity)+2-key bucket frame.
    */
  def binPackStats(assign: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val packable = col("len_bucket") =!= -1L
    assign.groupBy("len_bucket")
      .agg(count(lit(1)).as("n_docs"),
        max("bin_idx").as("_maxBin"), sum("len").as("_lenSum"))
      .select(col("len_bucket"), col("n_docs"),
        when(packable, col("_maxBin") + 1L).otherwise(0L).as("n_bins"),
        when(packable, col("_lenSum")).otherwise(0L).as("filled"),
        when(packable, (col("_maxBin") + 1L) * capacity - col("_lenSum"))
          .otherwise(0L).as("waste"),
        round(when(packable, col("_lenSum").cast("double") /
            ((col("_maxBin") + 1L) * capacity)).otherwise(lit(0.0)), 6)
          .as("fill_rate"))
  }
}
