package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column aggregation primitives: per-group mean pooling
  * (class prototypes / centroid features — the batch face of what
  * [[Ivf]] iterates) and L2 normalization.
  *
  * Mean pooling accumulates QUANTIZED integer micros, not doubles:
  * floating-point addition is not associative, so a double sum's value
  * depends on partial-aggregation order and differs run-to-run on a
  * cluster (and engine-to-engine); Σ floor(v·10⁶) is one exact integer
  * regardless of order — the same trick [[Ivf.recompute]] uses for its
  * centroid means. Shape: one posexplode + one partial/final hash
  * aggregate on (group, dim); d rows per group out.
  */
object EmbeddingOps {

  /** Exact integer accumulation face: one row per (group, dimension)
    * with the quantized component sum and the group size. The mean in
    * micros is `sum_micros / n_vecs` (integer div) — derivable, exact,
    * engine-portable.
    */
  def meanPoolQuantized(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("p", "v")))
      .withColumn("i", col("p") + 1).drop("p")
      .groupBy(col(groupCol), col("i"))
      .agg(sum(floor(col("v").cast("double") * lit(1000000.0d)).cast("long"))
          .as("sum_micros"),
        count(lit(1)).as("n_vecs"))

  /** Assembled per-group mean vector (double, for downstream use where
    * cross-engine bit-equality is not required): dims re-ordered by
    * position via array_sort over (i, m) structs.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    meanPoolQuantized(df, groupCol, vecCol)
      .withColumn("m",
        col("sum_micros").cast("double") / (col("n_vecs") * lit(1000000.0d)))
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("_im"))
      .select(col(groupCol),
        transform(col("_im"), x => x.getField("m")).as("centroid"))

  /** Per-label cohesion diagnostics for a labeled embedding set (the
    * classification-dataset quality check): each label's size and the
    * mean cosine of its members to the label centroid — low cohesion
    * flags mislabeled or noisy classes before training.
    *
    * Centroids come from [[meanPool]] (quantized integer accumulation,
    * order-independent); the centroid table is labels-sized, so it
    * broadcast-joins back to the corpus and the whole operator is one
    * posexplode aggregate + one broadcast join + one final aggregate —
    * no shuffle of the vector column beyond the centroid aggregation.
    * Norms materialize as columns before use (HOF-lambda trap, see
    * [[withL2Normalized]]).
    */
  def labelCohesion(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val cent = meanPool(df, labelCol, vecCol)
      .withColumn("_cnrm", Ann.l2norm(col("centroid")))
    df.join(broadcast(cent), Seq(labelCol))
      .withColumn("_vnrm", Ann.l2norm(col(vecCol)))
      .withColumn("_cos",
        Ann.dot(col(vecCol), col("centroid")) / (col("_vnrm") * col("_cnrm")))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("_cos")), 4).as("mean_cos"))
  }

  /** Per-VECTOR mislabel outlier flags — the row-level complement of
    * [[labelCohesion]]'s per-label diagnostic: each vector's cosine to
    * its own label centroid, flagged when it falls under `minCos`
    * (likely mislabeled / noise — prune or re-queue for labeling before
    * training). Same mechanism as cohesion: [[meanPool]] centroids
    * (exact-integer accumulation), labels-sized centroid table
    * broadcast back, one codegen'd dot per row. The cosine is rounded
    * to 4 decimals and the flag compares the ROUNDED value, so the
    * verdict is reproducible cross-engine at that precision.
    */
  def labelOutliers(df: DataFrame, idCol: String, labelCol: String,
                    vecCol: String, minCos: Double): DataFrame = {
    val cent = meanPool(df, labelCol, vecCol)
      .withColumn("_cnrm", Ann.l2norm(col("centroid")))
    df.join(broadcast(cent), Seq(labelCol))
      .withColumn("_vnrm", Ann.l2norm(col(vecCol)))
      .withColumn("cos_centroid",
        round(Ann.dot(col(vecCol), col("centroid")) /
          (col("_vnrm") * col("_cnrm")), 4))
      .withColumn("is_outlier", col("cos_centroid") < lit(minCos))
      .select(col(idCol), col(labelCol), col("cos_centroid"), col("is_outlier"))
  }

  /** Attach an L2-normalized copy of `vecCol` as `outCol`; zero vectors
    * stay zero. The norm is materialized as a real column FIRST so the
    * transform lambda references only an attribute — inlining
    * `l2norm(vec)` in the lambda would re-run the O(d) norm aggregate
    * once per element (the interpreted-HOF O(d²) trap, see
    * [[TextAnalysis.shingles]]).
    */
  def withL2Normalized(df: DataFrame, vecCol: String,
                       outCol: String = "unit_vec"): DataFrame =
    df.withColumn("_nrm", Ann.l2norm(col(vecCol)))
      .withColumn(outCol,
        when(col("_nrm") > 0d,
          transform(col(vecCol), x => x.cast("double") / col("_nrm")))
          .otherwise(transform(col(vecCol), x => lit(0.0d))))
      .drop("_nrm")
}
