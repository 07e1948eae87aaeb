package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: a coarse k-means quantizer partitions
  * the corpus into cells; a query probes only its `nprobe` nearest cells
  * and re-ranks candidates with the exact cosine. The clustered
  * alternative to the hyperplane-LSH path in [[Ann]] — better when the
  * corpus has natural cluster structure, at the cost of a training pass.
  *
  * Scale: training is `iters` passes of (broadcast k centroids → map-side
  * nearest-cell assign → groupBy-cell average); search touches
  * ~nprobe/k of the corpus. Centroids are dimension-sized (k·d doubles)
  * — always broadcastable.
  *
  * Fully deterministic, including across engines:
  *  - seeding filters on the first 4 hex digits of md5(id) (portable —
  *    no engine-specific hash) and keeps the k smallest surviving ids;
  *  - centroid means accumulate QUANTIZED integers — Σ floor(v·10⁶) as
  *    BIGINT (exact, order-independent) with ONE double division at the
  *    end — never a float running sum whose value depends on partial-
  *    aggregation order;
  *  - assignment argmax compares round(sim, 9) with cell-id tiebreak, so
  *    ULP-level differences in the dot product can't flip a cell choice.
  * The same recipe is SQL-expressible; q_ann_ivf_topk carries the full
  * fit+search DuckDB oracle.
  */
object Ivf {

  /** A trained index. `assignments` is cached (every [[topK]] call joins
    * it); call [[Index.unpersist]] when the index is retired — the cache
    * otherwise outlives the queries and crowds executor storage.
    */
  final case class Index(centroids: DataFrame, assignments: DataFrame) {
    def unpersist(): Unit = { assignments.unpersist(); () }
  }

  private val Quantum = 1000000.0 // centroid-mean quantization (1e-6)

  /** Nearest centroid per vector: broadcast centroids (with their norms
    * precomputed once), map-side similarity, then a partial/final
    * max_by aggregate — no row_number window, so no sort and no extra
    * shuffle beyond the groupBy itself.
    */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    df.select(col(idCol), col(vecCol), Ann.l2norm(col(vecCol)).as("_vn"))
      .join(cents)
      .withColumn("_sim", round(
        Ann.dot(col(vecCol), col("centroid")) / (col("_vn") * col("_cn")), 9))
      .groupBy(col(idCol))
      // argmax: highest _sim, ties to the lowest cell (negate for max_by)
      .agg(max_by(col("cell"),
        struct(col("_sim"), (-col("cell")).as("_nc"))).as("cell"))
  }

  /** Recompute centroids as the per-cell quantized mean vector:
    * exact integer sums of floor(v·10⁶), one double division — the
    * result is identical for any partitioning / aggregation order.
    */
  private def recompute(df: DataFrame, idCol: String, vecCol: String,
                        assignments: DataFrame): DataFrame =
    df.join(assignments, idCol)
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy("cell", "i")
      .agg((sum(floor(col("v").cast("double") * lit(Quantum)).cast("long"))
        .cast("double") / (lit(Quantum) * count(lit(1)))).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        x => x.getField("m")).as("centroid"))

  /** Train: deterministic seeding (an md5-strided sample — no global
    * window/sort over the corpus, and portable to any engine with md5)
    * then `iters` Lloyd iterations. Centroids are k·d doubles, so each
    * iteration materializes them to the driver — this truncates the
    * lineage (otherwise iteration i's plan re-executes every previous
    * assign/recompute) and keeps the per-iteration cost at exactly one
    * corpus pass.
    */
  /** [[fit]] with `k` sized FOR THE CORPUS instead of fixed: k =
    * max(4, n / targetCellSize). This is the scale knob that keeps
    * [[knnGraph]]/[[hardNegatives]] linear — their candidate volume is
    * ~nprobe·n²/k = nprobe·n·targetCellSize, so holding the CELL SIZE
    * (not the cell count) constant holds per-vector work constant as
    * the corpus grows. (Measured: a fixed k=16 at 10× corpus went 33×
    * in wall-clock; cell-size-held fit stays ~linear — see the
    * COVERAGE.md sf1.0 ledger.) Costs one count() over the corpus.
    */
  def fitForCellSize(df: DataFrame, idCol: String, vecCol: String,
                     targetCellSize: Int = 128, iters: Int = 2): Index = {
    require(targetCellSize >= 1, s"targetCellSize must be >= 1: $targetCellSize")
    val k = math.max(4L, df.count() / targetCellSize).toInt
    fit(df, idCol, vecCol, k, iters)
  }

  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int = 16, iters: Int = 2): Index = {
    val spark = df.sparkSession
    val n = df.count()
    // expect ~4k survivors from the md5 stride, keep the k smallest ids
    // (TakeOrderedAndProject — no global sort materialization)
    val stride = math.max(1L, n / math.max(1, 4 * k))
    val seedRows = df
      .filter(conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long") % stride === 0)
      .orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("centroid"))
      .collect()

    def toCentroidDf(rows: Array[org.apache.spark.sql.Row]): DataFrame = {
      import spark.implicits._
      rows.toIndexedSeq.zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](0)) }
        .toDF("cell", "centroid")
    }

    var centroids = toCentroidDf(seedRows)
    var it = 0
    while (it < iters) {
      val assignments = assign(df, idCol, vecCol, centroids)
      centroids = toCentroidDf(
        recompute(df, idCol, vecCol, assignments)
          .orderBy("cell").select("centroid").collect())
      it += 1
    }
    Index(centroids, assign(df, idCol, vecCol, centroids).cache())
  }

  /** Public face of the nearest-centroid assignment — (idCol, cell),
    * one row per vector. The streaming ingest
    * ([[graft.streaming.AnnIndexStream]]) labels each arriving vector
    * with its cell through this; same argmax rule as training.
    */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame): DataFrame =
    assign(df, idCol, vecCol, centroids)

  /** Search: probe the `nprobe` nearest cells per query (round(sim,9) +
    * cell tiebreak, same rule as training), exact-cosine re-rank inside
    * them on round(cos,4) + id tiebreak like the other ANN paths. Norms
    * are computed once per vector side, never per candidate pair.
    */
  def topK(df: DataFrame, queries: DataFrame, index: Index,
           idCol: String, vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val corpus = df.join(index.assignments, idCol)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        Ann.l2norm(col(vecCol)).as("c_nrm"), col("cell"))
    topKAgainst(corpus, queries, index.centroids, idCol, vecCol, k, nprobe)
  }

  /** The ONE implementation of the probe + exact re-rank rules
    * (round(sim,9) + cell tiebreak; round(cos,4) + id tiebreak;
    * self-exclusion; pair-level dedup) against an arbitrary prepared
    * corpus frame `(c_id, c_vec, c_nrm, cell)` — shared bit-for-bit by
    * [[topK]] and the streaming store search
    * ([[graft.streaming.AnnIndexStream.search]]); their DuckDB oracles
    * assume the two never diverge, so neither copy-pastes these rules.
    */
  private[graft] def topKAgainst(corpus: DataFrame, queries: DataFrame,
                                 centroids: DataFrame, idCol: String,
                                 vecCol: String, k: Int,
                                 nprobe: Int): DataFrame = {
    val cents = broadcast(centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("cell").asc)
    val probed = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        Ann.l2norm(col(vecCol)).as("q_nrm"))
      .join(cents)
      .withColumn("_sim", round(
        Ann.dot(col("q_vec"), col("centroid")) / (col("q_nrm") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    // pair-level dedup (a store vector re-ingested in a later batch
    // appears once per ingest partition): collapse on max(struct) —
    // DETERMINISTIC across runs, shuffle orders, and compactions,
    // unlike dropDuplicates' keep-arbitrary-first. When the copies are
    // byte-identical (the supported re-ingest case) any rule agrees;
    // if an id was re-ingested with a CHANGED embedding the pick is
    // still stable (greatest vector by array ordering) but which
    // embedding "wins" is undefined — updating a vector requires
    // forget() before re-ingest (the AnnIndexStream update contract).
    // max() is partial-aggregatable, so this map-side combines like
    // the dropDuplicates it replaces.
    corpus.join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(max(struct(col("c_vec"), col("c_nrm"),
        col("q_vec"), col("q_nrm"))).as("_r"))
      .select(col("q_id"), col("c_id"),
        col("_r.q_vec").as("q_vec"), col("_r.q_nrm").as("q_nrm"),
        col("_r.c_vec").as("c_vec"), col("_r.c_nrm").as("c_nrm"))
      .withColumn("cosine", round(
        Ann.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** All-corpus kNN GRAPH over the index — every vector's `kNeighbors`
    * approximate nearest neighbors (the SemDeDup / graph-clustering /
    * diversity-sampling substrate). Same probe rule as [[topK]]
    * (nprobe nearest cells, round(sim,9) + cell tiebreak; re-rank on
    * round(cos,4) + id), but the query side IS the corpus, so the
    * cell join is a plain shuffle equi-join — [[topK]]'s broadcast of
    * the probe side would ship the whole corpus to every task.
    *
    * Each (query, candidate) pair arises exactly once (members hold one
    * cell each, probes are distinct cells), so no dedup pass is needed.
    * Candidate volume is Σ_cell |probers|·|members| ≈ nprobe·n²/k for
    * balanced cells — `k` is the knob that keeps cells (and the per-cell
    * quadratic) bounded as the corpus grows; a skewed k-means fit
    * concentrates cost in its biggest cell, so size k for the corpus,
    * not for recall alone.
    */
  def knnGraph(df: DataFrame, index: Index, idCol: String, vecCol: String,
               kNeighbors: Int, nprobe: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    probeCandidates(df, index, idCol, vecCol, nprobe)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kNeighbors)
      .select(col("q_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** Hard-negative mining for contrastive / retriever training: every
    * vector's `k` NEAREST neighbors with a DIFFERENT label — the
    * "looks-identical, labeled-differently" pairs a trainer wants in
    * the batch. Same candidate engine as [[knnGraph]]; the label
    * mismatch filters BEFORE the rank window (ranking first would lose
    * negatives hiding behind same-label near neighbors).
    */
  def hardNegatives(df: DataFrame, index: Index, idCol: String,
                    vecCol: String, labelCol: String, k: Int,
                    nprobe: Int = 2): DataFrame = {
    val labels = df.select(col(idCol), col(labelCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    probeCandidates(df, index, idCol, vecCol, nprobe)
      .join(labels.select(col(idCol).as("q_id"),
        col(labelCol).as("q_label")), "q_id")
      .join(labels.select(col(idCol).as("c_id"),
        col(labelCol).as("c_label")), "c_id")
      .filter(!(col("q_label") <=> col("c_label")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("q_label"), col("c_id"), col("c_label"),
        col("cosine"), col("rn"))
  }

  /** Index-quality diagnostics: per cell, its population and the mean
    * member-to-centroid cosine — the skew/coherence report that decides
    * whether a fit needs more cells ([[fitForCellSize]]) or more
    * iterations before serving traffic. Same broadcast-centroid shape
    * as EmbeddingOps.labelCohesion; round(,4) mean under the usual
    * contract.
    */
  def clusterStats(df: DataFrame, index: Index,
                   idCol: String, vecCol: String): DataFrame = {
    val cents = broadcast(index.centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    df.join(index.assignments, idCol)
      .join(cents, "cell")
      .withColumn("_vn", Ann.l2norm(col(vecCol)))
      .withColumn("_cos",
        Ann.dot(col(vecCol), col("centroid")) / (col("_vn") * col("_cn")))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("_cos")), 4).as("mean_cos"))
  }

  /** Shared corpus-as-queries candidate generator: each vector probes
    * its `nprobe` nearest cells (round(sim,9) + cell tiebreak) and
    * meets that cell's members through a plain shuffle equi-join —
    * never a probe-side broadcast of the corpus. Emits each (q, c)
    * pair exactly once (members hold one cell, probes are distinct
    * cells) with the exact re-rank cosine.
    */
  private def probeCandidates(df: DataFrame, index: Index, idCol: String,
                              vecCol: String, nprobe: Int): DataFrame = {
    val cents = broadcast(index.centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("cell").asc)
    val probed = df
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        Ann.l2norm(col(vecCol)).as("q_nrm"))
      .join(cents)
      .withColumn("_sim", round(
        Ann.dot(col("q_vec"), col("centroid")) / (col("q_nrm") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
    val corpus = df.join(index.assignments, idCol)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        Ann.l2norm(col(vecCol)).as("c_nrm"), col("cell"))
    corpus.join(probed, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(
        Ann.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 4))
      .select("q_id", "c_id", "cosine")
  }
}
