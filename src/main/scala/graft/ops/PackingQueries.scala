package graft.ops

import graft.core.Tables
import graft.llm.{Conversations, Packing, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence-packing operators (graft.llm.Packing) with their DuckDB
  * oracles: the concat-and-chunk token-stream layout (per-doc offsets +
  * per-chunk rollup) and no-split power-of-two bin packing (documents
  * and assembled conversations).
  *
  * Oracle portability: the engine's two-level distributed prefix scan
  * must equal DuckDB's single `sum() OVER (ORDER BY id)` — that IS the
  * correctness claim for the scalable layout. ⌊log₂ n⌋ rides
  * `length(bin(n)) - 1` on both sides (libm log2 flips 2^k edges);
  * truncating integral division is `div` / `//` (identical semantics,
  * verified r8); everything else is BIGINT algebra + one round(6).
  */
object PackingQueries {

  private def tb(s: SparkSession, dir: String) = Tables(s, dir)

  /** documents with the whitespace token count, mirroring
    * TextAnalysis.tokens exactly (lower, split \s+, drop empties).
    */
  private def docTokens(s: SparkSession, dir: String): DataFrame =
    tb(s, dir).documents.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))

  private val docTokensCte =
    """t AS (SELECT doc_id,
      |        CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x <> '')) AS BIGINT) AS n
      |      FROM documents)""".stripMargin

  /** Shared binned-packing oracle tail over a (id, n) CTE named `nz`:
    * bucket = ⌊log₂ n⌋ (cap-overflow → -1), per-bucket row_number div
    * k = max(1, cap // 2^(lb+1)), then the per-bucket waste rollup.
    */
  private def binPackSql(idCol: String, cap: Long, nDocsAlias: String) =
    s"""b AS (SELECT $idCol, n,
       |        CASE WHEN n > $cap THEN CAST(-1 AS BIGINT)
       |             ELSE CAST(length(bin(n)) - 1 AS BIGINT) END AS lb
       |      FROM nz),
       |a AS (SELECT $idCol, n, lb,
       |        CASE WHEN lb = -1 THEN 0
       |             ELSE (row_number() OVER (PARTITION BY lb ORDER BY $idCol) - 1)
       |                  // greatest(1, $cap // (CAST(1 AS BIGINT) << CAST(lb + 1 AS INT)))
       |        END AS bin_idx
       |      FROM b)
       |SELECT lb AS len_bucket, CAST(count(*) AS BIGINT) AS $nDocsAlias,
       |  CAST(CASE WHEN lb = -1 THEN 0 ELSE max(bin_idx) + 1 END AS BIGINT) AS n_bins,
       |  CAST(CASE WHEN lb = -1 THEN 0 ELSE sum(n) END AS BIGINT) AS filled,
       |  CAST(CASE WHEN lb = -1 THEN 0 ELSE (max(bin_idx) + 1) * $cap - sum(n) END AS BIGINT) AS waste,
       |  round(CASE WHEN lb = -1 THEN 0.0
       |        ELSE CAST(sum(n) AS DOUBLE) / ((max(bin_idx) + 1) * $cap) END, 6) AS fill_rate
       |FROM a GROUP BY lb ORDER BY len_bucket""".stripMargin

  val all: Map[String, Q] = Map(

    // ---- concat-and-chunk layout, per-doc (Packing.tokenStreamPack):
    //      the distributed two-level prefix scan (blockSize 64 ≈ 8
    //      blocks at sf0.01, 80 at sf0.1 — boundaries exercised at
    //      every SF) vs DuckDB's single global cumsum window ----
    "q_pack_stream_docs" -> Q(
      s"""WITH $docTokensCte,
         |nz AS (SELECT * FROM t WHERE n > 0),
         |c AS (SELECT doc_id, n,
         |        coalesce(sum(n) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS so
         |      FROM nz)
         |SELECT doc_id, n AS n_tokens, CAST(so AS BIGINT) AS start_off,
         |       CAST(so // 512 AS BIGINT) AS chunk_first,
         |       CAST((so + n - 1) // 512 AS BIGINT) AS chunk_last,
         |       CAST((so + n - 1) // 512 - so // 512 + 1 AS BIGINT) AS n_chunks_spanned
         |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Packing.tokenStreamPack(docTokens(s, dir), "doc_id", "n",
          capacity = 512L, blockSize = 64L)
        .orderBy("doc_id")
    },

    // ---- per-chunk rollup (Packing.streamChunkStats): every chunk
    //      but the tail must hold exactly `capacity` tokens — concat
    //      packing has zero padding by construction ----
    "q_pack_stream_chunks" -> Q(
      s"""WITH $docTokensCte,
         |nz AS (SELECT * FROM t WHERE n > 0),
         |c AS (SELECT doc_id, n,
         |        CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS so
         |      FROM nz),
         |e AS (SELECT c.*, (so + n - 1) // 512 - so // 512 + 1 AS spans,
         |        unnest(range(CAST(so // 512 AS BIGINT),
         |                     CAST((so + n - 1) // 512 + 1 AS BIGINT))) AS chunk_id
         |      FROM c)
         |SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN spans > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
         |  CAST(sum(least(so + n, (chunk_id + 1) * 512)
         |           - greatest(so, chunk_id * 512)) AS BIGINT) AS tokens_in_chunk
         |FROM e GROUP BY chunk_id ORDER BY chunk_id""".stripMargin) { (s, dir) =>
      Packing.streamChunkStats(
          Packing.tokenStreamPack(docTokens(s, dir), "doc_id", "n",
            capacity = 512L, blockSize = 64L),
          capacity = 512L)
        .orderBy("chunk_id")
    },

    // ---- chunk source diversity (Packing.chunkSourceStats): per
    //      training chunk of the concat layout, distinct contributing
    //      sources and the dominant source's token share — the
    //      shuffle-quality gate for packed pretraining data. Dominant
    //      tie rule = most tokens, then lexicographically smallest
    //      source, encoded as min(struct(-tokens, src)) vs the
    //      oracle's (st DESC, source ASC) row_number ----
    "q_pack_chunk_diversity" -> Q(
      """WITH t AS (SELECT doc_id, source,
        |        CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |                             x -> x <> '')) AS BIGINT) AS n
        |      FROM documents),
        |nz AS (SELECT * FROM t WHERE n > 0),
        |c AS (SELECT doc_id, source, n,
        |        CAST(coalesce(sum(n) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS so
        |      FROM nz),
        |e AS (SELECT c.*, unnest(range(CAST(so // 512 AS BIGINT),
        |                              CAST((so + n - 1) // 512 + 1 AS BIGINT))) AS chunk_id
        |      FROM c),
        |pt AS (SELECT chunk_id, source, CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(least(so + n, (chunk_id + 1) * 512)
        |                  - greatest(so, chunk_id * 512)) AS BIGINT) AS st
        |       FROM e GROUP BY chunk_id, source),
        |r AS (SELECT *, row_number() OVER (PARTITION BY chunk_id
        |        ORDER BY st DESC, source ASC) AS rn FROM pt),
        |agg AS (SELECT chunk_id, CAST(sum(nd) AS BIGINT) AS n_docs,
        |          CAST(count(*) AS BIGINT) AS n_sources,
        |          CAST(sum(st) AS BIGINT) AS tokens_in_chunk
        |        FROM pt GROUP BY chunk_id)
        |SELECT CAST(a.chunk_id AS BIGINT) AS chunk_id, a.n_docs, a.n_sources,
        |  a.tokens_in_chunk, r.source AS dominant_src,
        |  r.st AS dominant_tokens,
        |  round(CAST(r.st AS DOUBLE) / a.tokens_in_chunk, 6) AS dom_share
        |FROM agg a JOIN r ON r.chunk_id = a.chunk_id AND r.rn = 1
        |ORDER BY chunk_id""".stripMargin) { (s, dir) =>
      Packing.chunkSourceStats(
          Packing.tokenStreamPack(docTokens(s, dir), "doc_id", "n",
            capacity = 512L, blockSize = 64L),
          tb(s, dir).documents.select("doc_id", "source"),
          "doc_id", "source", capacity = 512L)
        .orderBy("chunk_id")
    },

    // ---- no-split bin packing over documents (Packing.binPack +
    //      binPackStats): capacity 64 makes the corpus tail oversize,
    //      exercising the -1 bucket; the len-2^k bucket rule keeps the
    //      capacity guarantee structural (no per-bin check needed) ----
    "q_pack_binned" -> Q(
      s"""WITH $docTokensCte,
         |nz AS (SELECT doc_id, n FROM t WHERE n > 0),
         |${binPackSql("doc_id", 64L, "n_docs")}""".stripMargin) { (s, dir) =>
      Packing.binPackStats(
          Packing.binPack(docTokens(s, dir), "doc_id", "n", capacity = 64L),
          capacity = 64L)
        .orderBy("len_bucket")
    },

    // ---- rank-based ordered sharding (Packing.rankShards): 8
    //      contiguous key-order shards of documents by a composed
    //      (length, id) sort key, sizes balanced ±1; the manifest's
    //      key ranges are non-overlapping by construction (zone-map
    //      prunable). Exact rank via the block prefix scan — vs the
    //      oracle's one global row_number window ----
    // sort key = n_chars·2³² + doc_id: the shift must exceed max(doc_id)
    // at EVERY SF or the composed key stops being unique and the
    // rankShards unique-id contract breaks silently (r10 ADVICE — the
    // old ·100000 multiplier collided from sf where doc_id ≥ 100000)
    "q_pack_rank_shards" -> Q(
      """WITH t AS (SELECT n_chars * (CAST(1 AS BIGINT) << 32) + doc_id AS k FROM documents),
        |r AS (SELECT k, row_number() OVER (ORDER BY k) - 1 AS rk FROM t),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
        |s AS (SELECT k, (rk * 8) // n AS shard FROM r, tot)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(min(k) AS BIGINT) AS key_lo,
        |       CAST(max(k) AS BIGINT) AS key_hi
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin) { (s, dir) =>
      val keyed = tb(s, dir).documents
        .select((col("n_chars") * (1L << 32) + col("doc_id")).as("k"))
      Packing.rankShardManifest(
          Packing.rankShards(keyed, "k", numShards = 8, maxBlocks = 4096L),
          "k")
        .orderBy("shard")
    },

    // ---- the STREAMING face of token-stream packing (PackStream):
    //      per-source totals maintained through a 3-way batch split;
    //      each batch extends every source's stream from the
    //      accumulated total (replay-idempotent delta protocol). The
    //      oracle is the BATCH layout per source with (batch, id)
    //      arrival order — the equality IS the incremental-fold claim ----
    "q_stream_pack" -> Q(
      """WITH t AS (SELECT doc_id, source,
        |             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |                                  x -> x <> '')) AS BIGINT) AS n
        |           FROM documents),
        |nz AS (SELECT * FROM t WHERE n > 0),
        |o AS (SELECT doc_id, source, n,
        |        CAST(coalesce(sum(n) OVER (PARTITION BY source
        |          ORDER BY doc_id % 3, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS so
        |      FROM nz)
        |SELECT source, doc_id, n AS n_tokens, so AS start_off,
        |       CAST(so // 512 AS BIGINT) AS chunk_first,
        |       CAST((so + n - 1) // 512 AS BIGINT) AS chunk_last,
        |       CAST(doc_id % 3 AS BIGINT) AS batch_id
        |FROM o ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
      val tmp = Scratch.dir("graft_packstream_")
      val store = s"${tmp.getPath}/store"
      val d = tb(s, dir).documents.select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      (0 to 2).foreach { i =>
        graft.streaming.PackStream.applyBatch(
          d.filter(col("doc_id") % 3 === i), "doc_id", "n", "source",
          store, capacity = 512L, batchId = i.toLong, queryId = "q")
      }
      s.read.option("basePath", s"$store/layout")
        .parquet(s"$store/layout/batch=*")
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("start_off"), col("chunk_first"), col("chunk_last"),
          col("batch").cast("long").as("batch_id"))
        .orderBy("source", "doc_id")
    },

    // ---- greedy boundary-respecting chunker (Packing.greedyChunks):
    //      per-doc aggregate() fold, NO shuffle. Segments are ' the '-
    //      delimited spans (the synthetic corpus has no sentence
    //      punctuation; production callers split on [.!?]+\s+). The
    //      oracle replays the same greedy scan as a recursive CTE ----
    "q_pack_greedy_chunks" -> Q(
      """WITH RECURSIVE segs AS (
        |  SELECT doc_id, i, CAST(len(list_filter(string_split_regex(lower(sp), '\s+'), x -> x <> '')) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' the ')) AS sp,
        |               unnest(range(1, len(string_split(lower(text), ' the ')) + 1)) AS i
        |        FROM documents)
        |  WHERE len(list_filter(string_split_regex(lower(sp), '\s+'), x -> x <> '')) > 0),
        |ren AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i, c FROM segs),
        |mx AS (SELECT doc_id, max(i) AS m, CAST(sum(c) AS BIGINT) AS n_tokens,
        |              CAST(count(*) AS BIGINT) AS n_segments FROM ren GROUP BY doc_id),
        |r AS (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS i, CAST(1 AS BIGINT) AS chunks, c AS cur,
        |         CASE WHEN c > 24 THEN 1 ELSE 0 END AS ovf
        |  FROM ren WHERE i = 1
        |  UNION ALL
        |  SELECT r.doc_id, r.i + 1,
        |         CASE WHEN r.cur + s.c > 24 THEN r.chunks + 1 ELSE r.chunks END,
        |         CASE WHEN r.cur + s.c > 24 THEN s.c ELSE r.cur + s.c END,
        |         r.ovf + CASE WHEN s.c > 24 THEN 1 ELSE 0 END
        |  FROM r JOIN ren s ON s.doc_id = r.doc_id AND s.i = r.i + 1)
        |SELECT m.doc_id, m.n_segments, m.n_tokens, r.chunks AS n_chunks,
        |       CAST(r.ovf AS BIGINT) AS n_overflow_segments
        |FROM mx m JOIN r ON r.doc_id = m.doc_id AND r.i = m.m
        |ORDER BY m.doc_id""".stripMargin) { (s, dir) =>
      val segCounts = filter(
        transform(split(lower(col("text")), " the "),
          sp => size(TextAnalysis.tokens(sp)).cast("long")),
        c => c > 0L)
      Packing.greedyChunks(
          tb(s, dir).documents.select(col("doc_id"), segCounts.as("segc")),
          "doc_id", "segc", capacity = 24L)
        .filter(col("n_segments") > 0L)
        .orderBy("doc_id")
    },

    // ---- conversation packing (Conversations.assemble → binPack):
    //      pack whole assembled conversations into context windows by
    //      total turn length — the SFT batching question. conv key =
    //      user_id·10⁶ + conv_seq (sessions-per-user < 10⁶) ----
    "q_pack_conversations" -> Q(
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
         |                  length(coalesce(props, '')) AS len FROM events),
         |l AS (SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
         |s AS (SELECT *, sum(CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
         |      FROM l),
         |cv AS (SELECT user_id * 1000000 + session_seq AS conv_id,
         |              CAST(sum(len) AS BIGINT) AS n
         |       FROM s GROUP BY user_id, session_seq),
         |nz AS (SELECT conv_id, n FROM cv WHERE n > 0),
         |${binPackSql("conv_id", 4096L, "n_convs")}""".stripMargin) { (s, dir) =>
      val ev = tb(s, dir).events
        .withColumn("len", length(coalesce(col("props"), lit(""))).cast("long"))
      val convs = Conversations.assemble(ev, "user_id", "ts", "event_id",
          "event_type", "len")
        .select((col("user_id") * 1000000L + col("conv_seq")).as("conv_id"),
          col("total_len").as("n"))
      Packing.binPackStats(
          Packing.binPack(convs, "conv_id", "n", capacity = 4096L),
          capacity = 4096L)
        .withColumnRenamed("n_docs", "n_convs")
        .orderBy("len_bucket")
    },

    // ---- T5-style span corruption (SpanCorrupt.maskSpans): the
    //      deterministic denoising-mask layout — ~15% of tokens in
    //      spans of mean length 3, one span per balanced segment,
    //      positions from the (doc, span) md5 bucket, non-last spans
    //      stopping a token short of their segment so regions never
    //      merge. The oracle replays the whole integer derivation ----
    "q_pack_span_corruption" -> Q(
      s"""WITH $docTokensCte,
         |$spanCte
         |SELECT doc_id, CAST(s AS BIGINT) AS span_id,
         |  CAST(seg_start + (${OracleSql.bktFromHex("hx")}
         |       % (seg_len - len + islast)) AS BIGINT) AS span_start,
         |  CAST(len AS BIGINT) AS span_len
         |FROM h ORDER BY doc_id, span_id""".stripMargin) { (s, dir) =>
      graft.llm.SpanCorrupt.maskSpans(docTokens(s, dir), "doc_id", "n")
        .select(col("doc_id"), col("span_id"),
          col("start").as("span_start"), col("len").as("span_len"))
        .orderBy("doc_id", "span_id")
    },

    // ---- span-corruption audit (SpanCorrupt.maskStats): per-doc
    //      mask counts and ratio over ALL docs, unmaskable ones as
    //      zeros — the layout line of a dataset card ----
    "q_pack_span_stats" -> Q(
      s"""WITH $docTokensCte,
         |$spanCte,
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |          CAST(sum(len) AS BIGINT) AS n_masked
         |        FROM h GROUP BY doc_id)
         |SELECT t.doc_id, t.n AS n_tokens,
         |  coalesce(a.n_spans, 0) AS n_spans,
         |  coalesce(a.n_masked, 0) AS n_masked,
         |  CASE WHEN t.n = 0 THEN 0.0
         |       ELSE round(CAST(coalesce(a.n_masked, 0) AS DOUBLE)
         |                  / CAST(t.n AS DOUBLE), 6) END AS mask_ratio
         |FROM t LEFT JOIN agg a ON a.doc_id = t.doc_id
         |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      graft.llm.SpanCorrupt.maskStats(docTokens(s, dir), "doc_id", "n")
        .orderBy("doc_id")
    }
  )

  /** The span-corruption derivation CTE chain over the `t` doc-token
    * frame (defaults ratio 150‰ / mean span 3), shared by both span
    * oracles so parameters and algebra can never drift between them —
    * ends in `h`(doc_id, s, islast, seg_start, seg_len, len, hx).
    * A `def`, not a `val`: `all` initializes first and a forward val
    * reference interpolates null into the SQL (object-init order).
    */
  private def spanCte: String =
    """f AS (SELECT doc_id, n FROM t WHERE n >= 4),
      |p AS (SELECT doc_id, n, greatest(1, (n * 150) // 1000) AS noise FROM f),
      |q AS (SELECT doc_id, n, noise,
      |        greatest(1, least(noise // 3, n // 6)) AS nspans FROM p),
      |e AS (SELECT doc_id, n, noise, nspans,
      |        CAST(unnest(range(nspans)) AS BIGINT) AS s FROM q),
      |g AS (SELECT doc_id, s,
      |        CASE WHEN s = nspans - 1 THEN 1 ELSE 0 END AS islast,
      |        (s * n) // nspans AS seg_start,
      |        ((s + 1) * n) // nspans - (s * n) // nspans AS seg_len,
      |        noise // nspans AS base, noise % nspans AS rem FROM e),
      |h AS (SELECT doc_id, s, islast, seg_start, seg_len,
      |        least(CASE WHEN s < rem THEN base + 1 ELSE base END,
      |              seg_len - 1 + islast) AS len,
      |        md5('sc_' || CAST(doc_id AS VARCHAR) || '_' ||
      |            CAST(s AS VARCHAR)) AS hx
      |      FROM g)""".stripMargin
}
