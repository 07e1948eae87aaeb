package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  // -------------------------------------------------------------------
  // Literal-quantizer assignment (r14 optimization): every Lloyd loop
  // already materializes its centroids on the driver (lineage
  // truncation), yet [[assign]] shipped them back as a DataFrame and
  // paid a BroadcastNestedLoopJoin (k× row inflation) plus a groupBy-
  // argmax Exchange PER PASS — at bench scale that was 2 extra stages
  // and one extra corpus materialization per Lloyd iteration, and the
  // fused recompute below also drops [[recompute]]'s join back onto
  // the corpus (a third scan). The literal form computes the SAME
  // argmax as ONE projection expression: fold over a typedLit centroid
  // table, same Ann.dot fold, same round(sim, 9), ties to the lowest
  // cell (the ascending fold keeps the first best — exactly max_by on
  // (sim, -cell)), NaN ranking greatest like Spark's double ordering.
  // Guarded by a plan-size budget: past ~2 MB of centroid doubles the
  // table rides the task binary, so big quantizers (fitForCellSize at
  // huge n) keep the broadcast-join path — same math, same results.
  // -------------------------------------------------------------------

  // ~2 MB of centroid doubles — shared with Quant's codebook paths so
  // the literal-plan budget has exactly one definition (r14 advice)
  private[llm] val LitDoubleBudget = 262144L

  private def fitsLit(cents: Seq[(Int, Seq[Double])]): Boolean =
    cents.iterator.map(_._2.size + 2L).sum <= LitDoubleBudget

  /** Driver-side replica of [[Ann.l2norm]] — same left-to-right IEEE
    * fold, so literal-path norms are bit-identical to the column form.
    */
  private def l2normHost(v: Seq[Double]): Double =
    math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))

  /** The shared argmax fold over a [[graft.functions.CellSims]] result
    * (`struct(cells, sims)` — the per-group similarities, computed in
    * one compiled loop): highest round(sim, 9), ties to the FIRST
    * (lowest-cell) entry; NaN sims adopt over non-NaN (Spark's double
    * ordering ranks NaN greatest); all-null sims yield null like
    * max_by over null orderings. `cs` MUST be an attribute column —
    * its two getField references would otherwise re-run the kernel.
    */
  private def argmaxFold(cs: Column): Column = {
    // CleanupAliases strips names inside lambda bodies, so both structs
    // carry Spark's positional names: col1 = sim, col2 = cell
    def s(acc: Column) = acc.getField("col1")
    def c(acc: Column) = acc.getField("col2")
    aggregate(
      zip_with(cs.getField("cells"), cs.getField("sims"),
        (cc, ss) => struct(round(ss, 9), cc)
          .cast("struct<col1:double,col2:int>")),
      struct(lit(null).cast("double"), lit(null).cast("int")),
      (acc, p) => {
        val sim = p.getField("col1")
        val adopt = (c(acc).isNull && sim.isNotNull) ||
          sim > s(acc) ||
          (isnan(sim) && !isnan(s(acc)))
        when(adopt, p).otherwise(acc)
      },
      acc => c(acc))
  }

  private def litEntries(cents: Seq[(Int, Seq[Double])]): IndexedSeq[(Int, IndexedSeq[Double], Double)] =
    cents.sortBy(_._1)
      .map { case (c, arr) =>
        val a = arr.toIndexedSeq
        (c, a, l2normHost(a))
      }.toIndexedSeq

  private def flatTable(cents: Seq[(Int, Seq[Double])]): Map[Int, IndexedSeq[(Int, IndexedSeq[Double], Double)]] =
    Map(0 -> litEntries(cents))

  /** [[assign]] over a driver-side centroid table: a pure projection
    * (CellSims kernel + scalar argmax fold — no join, no Exchange).
    * Rows whose sims are all null are dropped. For k = 0 this mirrors
    * the join path (inner join against an empty centroid table). For a
    * NULL VECTOR the paths differ: the join path's max_by over
    * struct(null _sim, -cell) still returns the LOWEST cell (struct
    * itself non-null), where this path drops the row. Null vectors are
    * an upstream data error — every registered corpus is non-null —
    * so the drop stands; do not feed null vectors through either path
    * and expect parity (r14 advice).
    */
  private def assignLit(df: DataFrame, idCol: String, vecCol: String,
                        cents: Seq[(Int, Seq[Double])]): DataFrame =
    df.withColumn("_cs",
        graft.functions.CellSims.sims(col(vecCol), lit(0), flatTable(cents)))
      .select(col(idCol), argmaxFold(col("_cs")).as("cell"))
      .filter(col("cell").isNotNull)

  /** One fused Lloyd sweep over a driver-side centroid table: assign
    * (projection) + quantized-mean recompute in ONE corpus pass with a
    * single aggregation exchange — returns the new centroid rows
    * densely renumbered in cell order, exactly like
    * `toCentroidDf(recompute(...).orderBy("cell").collect())`.
    */
  private def lloydStepLit(df: DataFrame, vecCol: String,
                           cents: Seq[(Int, Seq[Double])]): IndexedSeq[(Int, Seq[Double])] =
    df.withColumn("_cs",
        graft.functions.CellSims.sims(col(vecCol), lit(0), flatTable(cents)))
      // cell becomes an ATTRIBUTE before the explode — an expression in
      // the same select as posexplode lands in the Project ABOVE the
      // Generate and re-runs the kernel once per exploded element
      .withColumn("cell", argmaxFold(col("_cs")))
      .filter(col("cell").isNotNull)
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy("cell", "i")
      .agg((sum(floor(col("v").cast("double") * lit(Quantum)).cast("long"))
        .cast("double") / (lit(Quantum) * count(lit(1)))).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        x => x.getField("m")).as("centroid"))
      .orderBy("cell").select("centroid")
      .collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }

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
    val rows = fitCentroidRows(df, idCol, vecCol, k, iters)
    val centroids = toCentroidDf(df.sparkSession, rows)
    val asg =
      if (fitsLit(rows)) assignLit(df, idCol, vecCol, rows)
      else assign(df, idCol, vecCol, centroids)
    Index(centroids, asg.cache())
  }

  private def toCentroidDf(spark: org.apache.spark.sql.SparkSession,
                           rows: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("cell", "centroid")
  }

  /** The Lloyd training pass alone — seed + `iters` iterations —
    * returning the driver-side centroid rows without assigning (or
    * caching) the corpus. [[fit]] layers the final assignment on top;
    * [[fitTwoLevel]] runs this on a bounded sample where a full-corpus
    * assignment would be wasted work. Each iteration is ONE fused
    * assign+recompute pass ([[lloydStepLit]]) when the quantizer fits
    * the literal budget, else the join-based pair.
    */
  private def fitCentroidRows(df: DataFrame, idCol: String, vecCol: String,
                              k: Int, iters: Int): IndexedSeq[(Int, Seq[Double])] = {
    val n = df.count()
    // expect ~4k survivors from the md5 stride, keep the k smallest ids
    // (TakeOrderedAndProject — no global sort materialization)
    val stride = math.max(1L, n / math.max(1, 4 * k))
    var cents: IndexedSeq[(Int, Seq[Double])] = df
      .filter(conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long") % stride === 0)
      .orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("centroid"))
      .collect().toIndexedSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }

    var it = 0
    while (it < iters) {
      cents =
        if (fitsLit(cents)) lloydStepLit(df, vecCol, cents)
        else {
          val centroids = toCentroidDf(df.sparkSession, cents)
          val assignments = assign(df, idCol, vecCol, centroids)
          recompute(df, idCol, vecCol, assignments)
            .orderBy("cell").select("centroid")
            .collect().toIndexedSeq.zipWithIndex
            .map { case (r, i) => (i, r.getSeq[Double](0)) }
        }
      it += 1
    }
    cents
  }

  // -------------------------------------------------------------------
  // Two-level coarse quantizer (r13 verdict, Missing #2): the flat fit
  // is quadratic twice over at fitForCellSize's corpus-sized k — Lloyd
  // assign and probe both compare every vector against all k = n/cell
  // centroids (n·k = n²/cellSize; measured: KnnScale killed at 900 s /
  // 200k vectors). The standard IVF fix, both halves:
  //  - SAMPLE-TRAINED Lloyd: centroids are fit on a bounded md5-stride
  //    sample (≤ sampleCap vectors), never the full corpus — training
  //    cost is sample-sized regardless of n;
  //  - TWO-LEVEL assign/probe: k1 ≈ √k top cells, each holding its own
  //    k2 ≈ k/k1 sub-quantizer. A vector finds its leaf cell in
  //    k1 + k2 ≈ 2√k comparisons instead of k; a query probes nprobe1
  //    top cells then ranks only their nprobe1·k2 leaves.
  // Per-vector index work is O(√(n/cellSize)) and the graph join stays
  // at the held cell size, so the whole kNN-graph chain is ~n^1.5 with
  // a tiny constant instead of n² — at the sf10 probe the assign term
  // is 16M dot products vs the flat path's 312M. All the determinism
  // rules of the flat path carry over unchanged (round(sim,9) +
  // lowest-cell argmax, quantized integer means, dense renumbering),
  // so the whole fit+probe chain stays DuckDB-replayable.
  // -------------------------------------------------------------------

  /** A trained two-level index. `l1Centroids` is (l1, centroid) — the
    * top-level quantizer; `centroids` is (cell, l1, centroid) — the
    * LEAF cells, globally numbered by (l1, sub) order; `assignments`
    * is (id, cell) over leaf cells, cached like [[Index]].
    */
  final case class Index2(l1Centroids: DataFrame, centroids: DataFrame,
                          assignments: DataFrame) {
    def unpersist(): Unit = { assignments.unpersist(); () }
  }

  /** Train a two-level index sized for the corpus: leaf-cell count
    * k = max(4, n/targetCellSize) split as k1 = ⌈√k⌉ top cells ×
    * k2 = ⌈k/k1⌉ sub-cells. Level 1 is the standard [[fit]] recipe on
    * a hash-stride sample of ≤ sampleCap vectors; level 2 runs the
    * same Lloyd rules per level-1 cell over the sample members (seeds:
    * the k2 lowest-id members; assign: argmax over the OWN cell's
    * sub-centroids, round(sim,9) + lowest-sub tiebreak; means:
    * quantized integer sums; dead subs renumbered per cell). A level-1
    * cell that ends up with no sample members keeps its level-1
    * centroid as its sole leaf, so every corpus vector always finds a
    * leaf. Only the bounded sample is ever compared against all
    * sub-centroids during training; the corpus is touched exactly
    * twice (level-1 assign, then leaf assign within the chosen cell).
    *
    * Centroid frames are driver-materialized between iterations (k·d
    * doubles — the lineage-truncation stance of [[fit]]); at extreme
    * k, swap the collects for localCheckpoint.
    */
  def fitTwoLevel(df: DataFrame, idCol: String, vecCol: String,
                  targetCellSize: Int = 128, iters: Int = 2,
                  sampleCap: Int = 65536): Index2 = {
    require(targetCellSize >= 1, s"targetCellSize must be >= 1: $targetCellSize")
    require(sampleCap >= 4, s"sampleCap must be >= 4: $sampleCap")
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val k = math.max(4L, n / targetCellSize)
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val k2 = ((k + k1 - 1) / k1).toInt

    val ss = math.max(1L, n / sampleCap)
    val sample = df.filter(
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long") % ss === 0)

    val l1Rows = fitCentroidRows(sample, idCol, vecCol, k1, iters)
    val l1Cents = toCentroidDf(spark, l1Rows).withColumnRenamed("cell", "l1")
    // sample → level-1 cell, fixed for the whole level-2 training —
    // a pure projection under the literal budget (no join, no argmax
    // Exchange), the broadcast-join [[assign]] otherwise.
    // every level-2 iteration re-reads the sample with its fixed l1
    // label; cache it for the training loop, released before return
    val sampleL1 =
      (if (fitsLit(l1Rows))
        sample.withColumn("_cs",
            graft.functions.CellSims.sims(col(vecCol), lit(0), flatTable(l1Rows)))
          .select(col(idCol),
            transform(col(vecCol), x => x.cast("double")).as("_v"),
            argmaxFold(col("_cs")).as("l1"))
          .filter(col("l1").isNotNull)
      else sample
        .select(col(idCol),
          transform(col(vecCol), x => x.cast("double")).as("_v"))
        .join(assign(sample, idCol, vecCol,
            l1Cents.withColumnRenamed("l1", "cell"))
          .withColumnRenamed("cell", "l1"), idCol))
      .cache()

    // seeds: per level-1 cell, the k2 lowest-id sample members
    val wseed = org.apache.spark.sql.expressions.Window
      .partitionBy("l1").orderBy(col(idCol))
    var subRows: IndexedSeq[(Int, Int, Seq[Double])] =
      sampleL1.withColumn("_rn", row_number().over(wseed))
        .filter(col("_rn") <= k2)
        .select(col("l1"), (col("_rn") - 1).as("sub"), col("_v"))
        .collect().toIndexedSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2))

    // the per-l1 sub-quantizer as the CellSims group table: l1 → its
    // (sub, centroid, cn) entries ascending — the kernel ranks only
    // the OWN cell's k2 subs (same work as the join it replaces), same
    // argmax rule (round(sim,9), ties to the lowest sub)
    def subTable(rows: Seq[(Int, Int, Seq[Double])]): Map[Int, IndexedSeq[(Int, IndexedSeq[Double], Double)]] =
      rows.groupBy(_._1).view.mapValues(rs =>
        rs.sortBy(_._2).map { case (_, s, c) =>
          val a = c.toIndexedSeq
          (s, a, l2normHost(a))
        }.toIndexedSeq).toMap

    var it = 0
    while (it < iters) {
      // fused assign+recompute: quantized per-(l1, sub) means in one
      // sample pass, then dead subs renumbered per cell (driver-side)
      val recomputed = sampleL1
        .withColumn("_cs",
          graft.functions.CellSims.sims(col("_v"), col("l1"),
            subTable(subRows)))
        // attribute-before-explode, as in lloydStepLit
        .withColumn("sub", argmaxFold(col("_cs")))
        .filter(col("sub").isNotNull)
        .select(col("l1"), col("sub"),
          posexplode(col("_v")).as(Seq("i", "v")))
        .groupBy("l1", "sub", "i")
        .agg((sum(floor(col("v") * lit(Quantum)).cast("long"))
          .cast("double") / (lit(Quantum) * count(lit(1)))).as("m"))
        .groupBy("l1", "sub")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          x => x.getField("m")).as("centroid"))
        .collect().toIndexedSeq
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2))
      subRows = recomputed.groupBy(_._1).toIndexedSeq.sortBy(_._1).flatMap {
        case (l1, rows) => rows.sortBy(_._2).zipWithIndex
          .map { case ((_, _, c), s) => (l1, s, c) }
      }
      it += 1
    }

    sampleL1.unpersist()
    // fallback: a level-1 cell with no surviving subs keeps its own
    // centroid as the single leaf — total coverage for the full assign
    val covered = subRows.map(_._1).toSet
    val leafRows = (subRows ++ l1Rows.filterNot(r => covered(r._1))
        .map(r => (r._1, 0, r._2)))
      .sortBy(t => (t._1, t._2))
    val leafHost = leafRows.zipWithIndex
      .map { case ((l1, _, c), cell) => (cell, l1, c) }
    val leafCents = leafHost.toDF("cell", "l1", "centroid")

    // hierarchical corpus assign as one projection when the WHOLE leaf
    // table fits the literal budget (it is driver-side either way)
    val asg =
      if (fitsLit(l1Rows) && fitsLit(leafHost.map(r => (r._1, r._3)))) {
        val leafTable = leafHost.groupBy(_._2).view.mapValues(rs =>
          rs.sortBy(_._1).map { case (cell, _, c) =>
            val a = c.toIndexedSeq
            (cell, a, l2normHost(a))
          }.toIndexedSeq).toMap
        df.withColumn("_cs1",
            graft.functions.CellSims.sims(col(vecCol), lit(0),
              flatTable(l1Rows)))
          .withColumn("_l1", argmaxFold(col("_cs1")))
          .withColumn("_cs2",
            graft.functions.CellSims.sims(col(vecCol), col("_l1"), leafTable))
          .select(col(idCol), argmaxFold(col("_cs2")).as("cell"))
          .filter(col("cell").isNotNull)
      } else assignTwoLevel(df, idCol, vecCol, l1Cents, leafCents)

    Index2(l1Cents, leafCents, asg.cache())
  }

  /** Hierarchical assignment: nearest level-1 cell (k1 comparisons,
    * the [[assign]] argmax rule), then nearest leaf within that cell
    * (k2 comparisons, lowest-global-cell tiebreak).
    */
  private def assignTwoLevel(df: DataFrame, idCol: String, vecCol: String,
                             l1Cents: DataFrame,
                             leafCents: DataFrame): DataFrame = {
    val a1 = assign(df, idCol, vecCol,
        l1Cents.withColumnRenamed("l1", "cell"))
      .withColumnRenamed("cell", "l1")
    val leafB = broadcast(leafCents
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    df.select(col(idCol), col(vecCol), Ann.l2norm(col(vecCol)).as("_vn"))
      .join(a1, idCol)
      .join(leafB, "l1")
      .withColumn("_sim", round(
        Ann.dot(col(vecCol), col("centroid")) / (col("_vn") * col("_cn")), 9))
      .groupBy(col(idCol))
      .agg(max_by(col("cell"),
        struct(col("_sim"), (-col("cell")).as("_nc"))).as("cell"))
  }

  /** [[knnGraph]] over a two-level index: probe nprobe1 level-1 cells
    * (round(sim,9) + lowest-l1 tiebreak), rank only THEIR leaves for
    * the nprobe probe cells (round(sim,9) + lowest-cell tiebreak) —
    * per-query probe work k1 + nprobe1·k2 ≈ O(√k) instead of k. The
    * candidate join and re-rank are identical to the flat path.
    */
  def knnGraph(df: DataFrame, index: Index2, idCol: String, vecCol: String,
               kNeighbors: Int, nprobe: Int, nprobe1: Int): DataFrame =
    graphRank(probeCandidates2(df, index, idCol, vecCol, nprobe, nprobe1),
      kNeighbors)

  /** [[hardNegatives]] over a two-level index — same probe as the
    * two-level [[knnGraph]], same label-mismatch-before-rank rule as
    * the flat path.
    */
  def hardNegatives(df: DataFrame, index: Index2, idCol: String,
                    vecCol: String, labelCol: String, k: Int,
                    nprobe: Int, nprobe1: Int): DataFrame =
    negativesRank(probeCandidates2(df, index, idCol, vecCol, nprobe, nprobe1),
      df, idCol, labelCol, k)

  /** Corpus-as-queries candidate generator over a two-level index:
    * level-1 probe ranks k1 centroids, leaf probe ranks only the
    * probed cells' leaves, then the same shuffle cell equi-join as
    * [[probeCandidates]] (never a probe-side broadcast of the corpus).
    * Leaf probe cells are distinct and members hold one leaf, so each
    * (q, c) pair still arises exactly once.
    */
  private def probeCandidates2(df: DataFrame, index: Index2, idCol: String,
                               vecCol: String, nprobe: Int,
                               nprobe1: Int): DataFrame = {
    val l1b = broadcast(index.l1Centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq1 = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("l1").asc)
    val p1 = df
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        Ann.l2norm(col(vecCol)).as("q_nrm"))
      .join(l1b)
      .withColumn("_sim", round(
        Ann.dot(col("q_vec"), col("centroid")) / (col("q_nrm") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq1))
      .filter(col("_rn") <= nprobe1)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("l1"))
    val leafB = broadcast(index.centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq2 = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("cell").asc)
    val probed = p1.join(leafB, "l1")
      .withColumn("_sim", round(
        Ann.dot(col("q_vec"), col("centroid")) / (col("q_nrm") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq2))
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

  /** Public face of the nearest-centroid assignment — (idCol, cell),
    * one row per vector. The streaming ingest
    * ([[graft.streaming.AnnIndexStream]]) labels each arriving vector
    * with its cell through this; same argmax rule as training. A
    * quantizer under the literal budget (it was about to be
    * driver-collected for the broadcast anyway) rides the
    * zero-shuffle [[assignLit]] projection.
    */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame): DataFrame = {
    val rows = collectCentroids(centroids)
    if (fitsLit(rows)) assignLit(df, idCol, vecCol, rows)
    else assign(df, idCol, vecCol, centroids)
  }

  private def collectCentroids(centroids: DataFrame): IndexedSeq[(Int, Seq[Double])] =
    centroids
      .select(col("cell").cast("int").as("cell"), col("centroid"))
      .collect().toIndexedSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

  /** [[assignCells]] keeping the vector column alongside —
    * (idCol, vecCol, cell) in ONE projection pass under the literal
    * budget (no join back onto the batch), the
    * [[graft.streaming.AnnIndexStream.applyBatch]] ingest shape.
    */
  private[graft] def withCells(df: DataFrame, idCol: String, vecCol: String,
                               centroids: DataFrame): DataFrame = {
    val rows = collectCentroids(centroids)
    if (fitsLit(rows))
      df.withColumn("_cs",
          graft.functions.CellSims.sims(col(vecCol), lit(0), flatTable(rows)))
        .withColumn("cell", argmaxFold(col("_cs")))
        .filter(col("cell").isNotNull)
        .select(col(idCol), col(vecCol), col("cell"))
    else df.select(col(idCol), col(vecCol))
      .join(assign(df, idCol, vecCol, centroids), idCol)
  }

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
    rerankProbed(corpus, probed, k)
  }

  /** [[topK]] over a two-level index: the [[probeCandidates2]]
    * two-stage probe (nprobe1 level-1 cells, nprobe leaves ranked over
    * only those cells' leaves — O(√k) per query instead of k) feeding
    * the SAME candidate dedup + exact re-rank tail as the flat search.
    */
  def topK(df: DataFrame, queries: DataFrame, index: Index2,
           idCol: String, vecCol: String, k: Int, nprobe: Int,
           nprobe1: Int): DataFrame = {
    val corpus = df.join(index.assignments, idCol)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        Ann.l2norm(col(vecCol)).as("c_nrm"), col("cell"))
    topKAgainst2(corpus, queries, index.l1Centroids, index.centroids,
      idCol, vecCol, k, nprobe, nprobe1)
  }

  /** The two-level analogue of [[topKAgainst]] against an arbitrary
    * prepared corpus frame `(c_id, c_vec, c_nrm, cell)` — shared by
    * the [[topK]] Index2 face and the streaming store search
    * ([[graft.streaming.AnnIndexStream.searchTwoLevel]]).
    */
  private[graft] def topKAgainst2(corpus: DataFrame, queries: DataFrame,
                                  l1Centroids: DataFrame,
                                  leafCentroids: DataFrame, idCol: String,
                                  vecCol: String, k: Int, nprobe: Int,
                                  nprobe1: Int): DataFrame = {
    val l1b = broadcast(l1Centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq1 = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("l1").asc)
    val p1 = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        Ann.l2norm(col(vecCol)).as("q_nrm"))
      .join(l1b)
      .withColumn("_sim", round(
        Ann.dot(col("q_vec"), col("centroid")) / (col("q_nrm") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq1))
      .filter(col("_rn") <= nprobe1)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("l1"))
    val leafB = broadcast(leafCentroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq2 = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("cell").asc)
    val probed = p1.join(leafB, "l1")
      .withColumn("_sim", round(
        Ann.dot(col("q_vec"), col("centroid")) / (col("q_nrm") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq2))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
    rerankProbed(corpus, probed, k)
  }

  /** The ONE candidate-join + dedup + exact-re-rank tail behind every
    * per-query search face (flat, two-level, streaming store), against
    * a prepared corpus `(c_id, c_vec, c_nrm, cell)` and a probed query
    * frame `(q_id, q_vec, q_nrm, cell)`.
    */
  private def rerankProbed(corpus: DataFrame, probed: DataFrame,
                           k: Int): DataFrame = {
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
               kNeighbors: Int, nprobe: Int = 2): DataFrame =
    graphRank(probeCandidates(df, index, idCol, vecCol, nprobe), kNeighbors)

  /** The ONE neighbor-rank tail (round(cos,4) already applied by the
    * candidate generators; rank on cosine desc + id tiebreak) — shared
    * by the flat and two-level graph faces so they cannot diverge.
    */
  private def graphRank(cands: DataFrame, kNeighbors: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    cands.withColumn("rn", row_number().over(w))
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
                    nprobe: Int = 2): DataFrame =
    negativesRank(probeCandidates(df, index, idCol, vecCol, nprobe),
      df, idCol, labelCol, k)

  /** The ONE hard-negative tail — label join, mismatch-BEFORE-rank
    * filter, rank window — shared by the flat and two-level faces.
    */
  private def negativesRank(cands: DataFrame, df: DataFrame, idCol: String,
                            labelCol: String, k: Int): DataFrame = {
    val labels = df.select(col(idCol), col(labelCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    cands
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
                   idCol: String, vecCol: String): DataFrame =
    statsAgainst(df, index.assignments,
      index.centroids.select("cell", "centroid"), idCol, vecCol)

  /** [[clusterStats]] over a two-level index — per LEAF population and
    * coherence, the report that decides whether a grown corpus needs a
    * [[graft.streaming.AnnIndexStream.refitTwoLevel]].
    */
  def clusterStats(df: DataFrame, index: Index2,
                   idCol: String, vecCol: String): DataFrame =
    statsAgainst(df, index.assignments,
      index.centroids.select("cell", "centroid"), idCol, vecCol)

  private def statsAgainst(df: DataFrame, assignments: DataFrame,
                           centroids: DataFrame, idCol: String,
                           vecCol: String): DataFrame = {
    val cents = broadcast(centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    df.join(assignments, idCol)
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
