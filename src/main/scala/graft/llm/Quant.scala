package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: symmetric per-vector int8, the storage/
  * bandwidth face of similarity search. A 100 TB corpus's float32
  * embedding column shrinks 4x (plus the per-vector scale), which is
  * routinely the difference between an ANN index that fits executor
  * memory and one that doesn't; candidate scoring then runs on int8
  * dot products and only the final re-rank touches float vectors.
  *
  * All pure column algebra over the array column (aggregate/transform
  * HOFs) — a single map-side pass, no shuffle, no UDF. Arithmetic is
  * pinned to double (`CAST(x AS DOUBLE)` before any op) with
  * `floor(x + 0.5)` rounding so every engine computes bit-identical
  * quantized codes (IEEE doubles + floor agree everywhere; `round()`
  * half-even/half-up conventions do not).
  */
object Quant {

  /** Max |component| as a double; 0.0 for empty vectors. HOF note: pass
    * attribute columns only (lambdas re-evaluate embedded expressions
    * per element — see TextAnalysis.shingles).
    */
  def absMax(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Quantized codes in [-127, 127]: q_i = floor(v_i * 127 / amax + 0.5)
    * (half-up, computed in double). All-zero vectors (amax = 0) map to
    * all-zero codes rather than dividing by zero.
    */
  def quantize(vec: Column, amax: Column): Column =
    when(amax > 0d,
      transform(vec, x =>
        floor(x.cast("double") * lit(127.0d) / amax + lit(0.5d)).cast("int")))
      .otherwise(transform(vec, x => lit(0)))

  /** Reconstructed doubles: q_i * amax / 127. */
  def dequantize(qvec: Column, amax: Column): Column =
    transform(qvec, q => q.cast("double") * amax / lit(127.0d))

  /** Attach `qvec` (array<int> codes) and `amax` (double, per-vector
    * scale) to the frame. One projection pass; `amax` is materialized
    * as a real column BEFORE the transform lambda references it, so the
    * interpreted HOF body only touches attributes.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("amax", absMax(col(vecCol)))
      .withColumn("qvec", quantize(col(vecCol), col("amax")))

  /** Integer dot product of two code arrays — the int8 ANN scoring
    * primitive (exact integer arithmetic, engine-portable).
    */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  // ---------------------------------------------------------------------
  // Product quantization (PQ) — the billion-scale ANN compression: the
  // vector splits into `m` contiguous subspaces, each subspace gets its
  // own k-centroid codebook (per-subspace Lloyd, the Ivf recipe), and a
  // vector stores only its m one-byte-ish cell ids — d·4 bytes become m.
  // Query scoring is ADC (asymmetric distance computation): the query
  // precomputes its distance to every codebook centroid (m·k doubles,
  // broadcast), and a candidate's distance is m table lookups summed —
  // no float vector is ever touched at scan time.
  //
  // Determinism, the Ivf contract: md5-stride seeding with the k
  // smallest surviving ids, quantized-integer centroid means,
  // round(dist, 9) + cell tiebreak on every argmin, dense per-subspace
  // cell renumbering — the whole fit+encode+search replays as unrolled
  // SQL (q_ann_pq_codes / q_ann_pq_topk).
  // ---------------------------------------------------------------------

  /** One row per (vector, subspace) with the sliced subvector. */
  private def subframe(df: DataFrame, idCol: String, vecCol: String,
                       m: Int, w: Int): DataFrame =
    df.select(col(idCol), col(vecCol))
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("subvec", slice(col(vecCol), col("sub") * w + 1, lit(w)))

  /** Squared L2 between the subvector and a codebook centroid,
    * round(, 9) — the argmin compare unit.
    */
  private def subDist(v: Column, c: Column): Column =
    round(aggregate(zip_with(v, c,
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0d), (acc, x) => acc + x), 9)

  /** Nearest codebook cell per (vector, subspace): broadcast codebooks,
    * min_by on (dist, cell) — ties to the smaller cell.
    */
  private def pqAssign(sf: DataFrame, idCol: String,
                       codebooks: DataFrame): DataFrame =
    sf.join(broadcast(codebooks), "sub")
      .withColumn("_d", subDist(col("subvec"), col("centroid")))
      .groupBy(col(idCol), col("sub"))
      .agg(min_by(col("cell"), struct(col("_d"), col("cell"))).as("cell"))

  // -------------------------------------------------------------------
  // Literal-codebook assignment (r14 optimization, the Ivf literal-
  // quantizer recipe): codebooks are m·k rows and driver-side by
  // contract, so the argmin is ONE projection — a CellDists kernel
  // (compiled Σ(x−y)² loop, bit-identical to subDist's zip_with fold)
  // plus a cheap scalar fold replicating min_by on (round(d,9), cell):
  // lowest distance, ties to the lowest cell (ascending fold keeps the
  // first best), NaN never beating a real distance, all-null → null —
  // no broadcast join, no groupBy(id, sub) Exchange per training pass.
  // -------------------------------------------------------------------

  private def argminFold(cd: Column): Column = {
    // CleanupAliases strips names inside lambdas — positional names
    def dBest(acc: Column) = acc.getField("col1")
    def c(acc: Column) = acc.getField("col2")
    aggregate(
      zip_with(cd.getField("cells"), cd.getField("dists"),
        (cc, dd) => struct(round(dd, 9), cc)
          .cast("struct<col1:double,col2:int>")),
      struct(lit(null).cast("double"), lit(null).cast("int")),
      (acc, p) => {
        val d = p.getField("col1")
        val adopt = (c(acc).isNull && d.isNotNull) ||
          d < dBest(acc) ||
          (isnan(dBest(acc)) && !isnan(d))
        when(adopt, p).otherwise(acc)
      },
      acc => c(acc))
  }

  /** The Ivf literal-plan budget applied to codebook rows — one shared
    * constant (r14 advice), one size rule for every literal call site.
    */
  private def fitsLit(rows: Seq[(Int, Int, Seq[Double])]): Boolean =
    rows.iterator.map(_._3.size + 2L).sum <= Ivf.LitDoubleBudget

  private def codebookTable(rows: Seq[(Int, Int, Seq[Double])]): Map[Int, IndexedSeq[(Int, IndexedSeq[Double])]] =
    rows.groupBy(_._1).view.mapValues(rs =>
      rs.sortBy(_._2).map { case (_, cell, c) => (cell, c.toIndexedSeq) }
        .toIndexedSeq).toMap

  /** [[pqAssign]] over driver-side codebook rows: a pure projection.
    * `cellCol` becomes an ATTRIBUTE before any downstream explode (the
    * Ivf.lloydStepLit Generate-projection rule).
    */
  private def pqAssignLit(sf: DataFrame,
                          rows: Seq[(Int, Int, Seq[Double])]): DataFrame =
    sf.withColumn("_cd",
        graft.functions.CellDists.dists(col("subvec"), col("sub"),
          codebookTable(rows)))
      .withColumn("cell", argminFold(col("_cd")))
      .filter(col("cell").isNotNull)
      .drop("_cd")

  /** Train the m per-subspace codebooks: (sub, cell, centroid) — m·k
    * rows, always broadcastable. Same seeding and per-iteration
    * driver materialization as Ivf.fit (lineage truncation; one corpus
    * pass per iteration).
    */
  def pqFit(df: DataFrame, idCol: String, vecCol: String,
            m: Int = 4, k: Int = 16, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(m >= 1 && k >= 1 && iters >= 0, "bad pq parameters")
    val dim = df.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val w = dim / m
    val n = df.count()
    val stride = math.max(1L, n / math.max(1, 4 * k))
    val seeds = df
      .filter(conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long") % stride === 0)
      .orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0))
    var cents: Seq[(Int, Int, Seq[Double])] = for {
      s <- 0 until m
      (vec, c) <- seeds.zipWithIndex
    } yield (s, c, vec.slice(s * w, (s + 1) * w))
    val sf = subframe(df, idCol, vecCol, m, w)
    var it = 0
    while (it < iters) {
      // fused literal assign + quantized-mean recompute: one corpus
      // pass per iteration, one aggregation Exchange (was: broadcast
      // join + argmin Exchange + join back + aggregate). The literal
      // path is budget-guarded like every other call site (r14
      // advice): an oversized m·k·w codebook would otherwise ride
      // every task binary — the broadcast-join assign (re-joined to
      // recover subvec) is the same math.
      val assigned =
        if (fitsLit(cents)) pqAssignLit(sf, cents)
        else pqAssign(sf, idCol, cents.toDF("sub", "cell", "centroid"))
          .join(sf, Seq(idCol, "sub"))
      val rec = assigned
        .select(col("sub"), col("cell"),
          posexplode(col("subvec")).as(Seq("j", "v")))
        .groupBy("sub", "cell", "j")
        .agg((sum(floor(col("v").cast("double") * lit(1000000.0d)).cast("long"))
          .cast("double") / (lit(1000000.0d) * count(lit(1)))).as("mn"))
        .collect()
      cents = rec.groupBy(_.getInt(0)).toSeq.flatMap { case (s, rs) =>
        rs.groupBy(_.getInt(1)).toSeq.sortBy(_._1).zipWithIndex.map {
          case ((_, crs), denseCell) =>
            (s, denseCell,
              crs.sortBy(_.getInt(2)).map(_.getDouble(3)).toIndexedSeq)
        }
      }
      it += 1
    }
    cents.toDF("sub", "cell", "centroid")
  }

  /** Encode: each vector's m codebook cells, ordered by subspace.
    * Codebooks are m·k rows (always broadcastable by contract), so the
    * argmin runs on the literal path — collected once, one projection,
    * one groupBy(id) Exchange; the join path stays as the fallback for
    * an oversized table (same math either way).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebooks: DataFrame, m: Int): DataFrame = {
    val dim = df.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sf = subframe(df, idCol, vecCol, m, dim / m)
    val rows = codebooks.select(col("sub"), col("cell"), col("centroid"))
      .collect().toIndexedSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val assigned =
      if (fitsLit(rows))
        pqAssignLit(sf, rows).select(col(idCol), col("sub"), col("cell"))
      else pqAssign(sf, idCol, codebooks)
    assigned
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("cell")))),
        x => x.getField("cell")).as("codes"))
  }

  /** IVF-filtered ADC top-k — the FAISS-style IVFPQ search shape
    * (minus residual encoding, documented simplification): the coarse
    * IVF index prunes candidates to the query's `nprobe` cells, and
    * only those candidates pay the m ADC lookups. Candidate volume is
    * ~nprobe·n/k_ivf per query instead of the whole corpus; the code
    * frame never carries float vectors. Probe rule = Ivf.topK's
    * (round(sim,9) + cell tiebreak); scoring rule = [[pqTopK]]'s.
    */
  def pqTopKIvf(encoded: DataFrame, codebooks: DataFrame,
                queries: DataFrame, index: Ivf.Index,
                idCol: String, vecCol: String, topK: Int, m: Int,
                nprobe: Int = 2): DataFrame = {
    val dim = queries.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val icents = broadcast(index.centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("cell").asc)
    val probed = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        Ann.l2norm(col(vecCol)).as("q_nrm"))
      .join(icents)
      .withColumn("_sim", round(
        Ann.dot(col("q_vec"), col("centroid")) / (col("q_nrm") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("cell"))
    val cand = probed
      .join(index.assignments.select(col(idCol).as("c_id"), col("cell")),
        Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id")
    val qsub = subframe(
      queries.select(col(idCol).as("q_id"), col(vecCol)), "q_id", vecCol,
      m, dim / m)
    val table = qsub.join(broadcast(codebooks), "sub")
      .select(col("q_id"), col("sub"), col("cell").as("pcell"),
        subDist(col("subvec"), col("centroid")).as("_qd"))
    val codeRows = encoded.select(col(idCol).as("c_id"),
      posexplode(col("codes")).as(Seq("sub", "pcell")))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc").asc, col("c_id").asc)
    cand.join(codeRows, "c_id")
      .join(broadcast(table), Seq("q_id", "sub", "pcell"))
      .groupBy("q_id", "c_id")
      .agg(round(sum(col("_qd")), 6).as("adc"))
      .withColumn("rn", row_number().over(wnd))
      .filter(col("rn") <= topK)
      .select(col("q_id"), col("c_id"), col("adc"), col("rn"))
  }

  /** Residual view for TRUE IVFPQ: each vector minus its assigned
    * coarse-cell centroid, as array<double> — PQ codebooks trained on
    * residuals capture the within-cell structure the coarse quantizer
    * left behind (the accuracy step FAISS's IVFPQ takes over plain
    * PQ). Feed the output's `resid` column to [[pqFit]]/[[pqEncode]].
    */
  def residuals(df: DataFrame, index: Ivf.Index,
                idCol: String, vecCol: String): DataFrame =
    df.join(index.assignments, idCol)
      .join(broadcast(index.centroids), "cell")
      .withColumn("resid",
        zip_with(col(vecCol), col("centroid"),
          (x, y) => x.cast("double") - y))
      .select(col(idCol), col("cell").as("ivf_cell"), col("resid"))

  /** TRUE residual IVFPQ search: candidates prune to the query's
    * `nprobe` coarse cells, and ADC runs on RESIDUALS — the query's
    * distance tables are computed per probed cell from
    * (query − that cell's centroid), matching how the candidates were
    * encoded. Tables are (queries·nprobe·m·k) rows — still broadcast;
    * the corpus contributes its narrow (id, ivf_cell, codes) frame
    * only. Same determinism contract as the whole PQ family.
    */
  def pqTopKIvfResidual(encodedRes: DataFrame, codebooks: DataFrame,
                        queries: DataFrame, index: Ivf.Index,
                        idCol: String, vecCol: String, topK: Int, m: Int,
                        nprobe: Int = 2): DataFrame = {
    val dim = queries.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val w = dim / m
    val icents = broadcast(index.centroids
      .withColumn("_cn", Ann.l2norm(col("centroid"))))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("cell").asc)
    val probed = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("_qv"),
        Ann.l2norm(col(vecCol)).as("_qn"))
      .join(icents)
      .withColumn("_sim", round(
        Ann.dot(col("_qv"), col("centroid")) / (col("_qn") * col("_cn")), 9))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("cell"), col("_qv"))
    val qres = probed.join(broadcast(index.centroids), "cell")
      .withColumn("_qres", zip_with(col("_qv"), col("centroid"),
        (x, y) => x.cast("double") - y))
      .select(col("q_id"), col("cell").as("ivf_cell"), col("_qres"))
    val qsub = qres
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("subvec", slice(col("_qres"), col("sub") * w + 1, lit(w)))
    val table = qsub.join(broadcast(codebooks), "sub")
      .select(col("q_id"), col("ivf_cell"), col("sub"),
        col("cell").as("pcell"),
        subDist(col("subvec"), col("centroid")).as("_qd"))
    val codeRows = encodedRes
      .join(index.assignments.select(col(idCol),
        col("cell").as("ivf_cell")), idCol)
      .select(col(idCol).as("c_id"), col("ivf_cell"),
        posexplode(col("codes")).as(Seq("sub", "pcell")))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc").asc, col("c_id").asc)
    codeRows.join(broadcast(table), Seq("ivf_cell", "sub", "pcell"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(round(sum(col("_qd")), 6).as("adc"))
      .withColumn("rn", row_number().over(wnd))
      .filter(col("rn") <= topK)
      .select(col("q_id"), col("c_id"), col("adc"), col("rn"))
  }

  /** ADC top-k: queries precompute (sub, cell) → distance tables
    * (broadcast, queries·m·k rows); candidate score = m lookups summed
    * (round(, 6) + id tiebreak). One equi join + one aggregate over the
    * corpus-sized narrow code frame — no float vectors at scan time.
    */
  def pqTopK(encoded: DataFrame, codebooks: DataFrame,
             queries: DataFrame, idCol: String, vecCol: String,
             topK: Int, m: Int): DataFrame = {
    val dim = queries.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val qsub = subframe(
      queries.select(col(idCol).as("q_id"), col(vecCol)), "q_id", vecCol,
      m, dim / m)
    val table = qsub.join(broadcast(codebooks), "sub")
      .select(col("q_id"), col("sub"), col("cell"),
        subDist(col("subvec"), col("centroid")).as("_qd"))
    val codeRows = encoded.select(col(idCol).as("c_id"),
      posexplode(col("codes")).as(Seq("sub", "cell")))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc").asc, col("c_id").asc)
    codeRows.join(broadcast(table), Seq("sub", "cell"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(round(sum(col("_qd")), 6).as("adc"))
      .withColumn("rn", row_number().over(wnd))
      .filter(col("rn") <= topK)
      .select(col("q_id"), col("c_id"), col("adc"), col("rn"))
  }
}
