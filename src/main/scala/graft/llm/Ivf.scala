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
  * — always broadcastable. Seeding is deterministic (every ⌈N/k⌉-th
  * vector by id), so the index is reproducible up to floating-point
  * averaging order.
  */
object Ivf {

  final case class Index(centroids: DataFrame, assignments: DataFrame)

  private def cosineTo(v: org.apache.spark.sql.Column,
                       c: org.apache.spark.sql.Column) =
    Ann.dot(v, c) / (Ann.l2norm(v) * Ann.l2norm(c))

  /** Nearest centroid per vector (broadcast centroids, map-side). */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("_sim").desc, col("cell").asc)
    df.join(broadcast(centroids))
      .withColumn("_sim", cosineTo(col(vecCol), col("centroid")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("cell"))
  }

  /** Recompute centroids as the per-cell mean vector. */
  private def recompute(df: DataFrame, idCol: String, vecCol: String,
                        assignments: DataFrame): DataFrame =
    df.join(assignments, idCol)
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy("cell", "i").agg(avg(col("v").cast("double")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        x => x.getField("m")).as("centroid"))

  /** Train: deterministic seeding (a hash-strided sample — no global
    * window/sort over the corpus) then `iters` Lloyd iterations.
    * Centroids are k·d doubles, so each iteration materializes them to
    * the driver — this truncates the lineage (otherwise iteration i's
    * plan re-executes every previous assign/recompute) and keeps the
    * per-iteration cost at exactly one corpus pass.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int = 16, iters: Int = 2): Index = {
    val spark = df.sparkSession
    val n = df.count()
    // expect ~4k survivors from the hash stride, keep the k smallest ids
    // (TakeOrderedAndProject — no global sort materialization)
    val stride = math.max(1L, n / math.max(1, 4 * k))
    val seedRows = df
      .filter(pmod(hash(col(idCol)), lit(stride)) === 0)
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

  /** Search: probe the `nprobe` nearest cells per query, exact-cosine
    * re-rank inside them. Ranking on round(cos,4) + id tiebreak like
    * the other ANN paths.
    */
  def topK(df: DataFrame, queries: DataFrame, index: Index,
           idCol: String, vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("_sim").desc, col("cell").asc)
    val probed = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .join(broadcast(index.centroids))
      .withColumn("_sim", cosineTo(col("q_vec"), col("centroid")))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    val corpus = df.join(index.assignments, idCol)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"), col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)
    corpus.join(broadcast(probed), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "q_vec", "c_id", "c_vec")
      .dropDuplicates("q_id", "c_id")
      .withColumn("cosine", round(
        Ann.dot(col("q_vec"), col("c_vec")) /
          (Ann.l2norm(col("q_vec")) * Ann.l2norm(col("c_vec"))), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cosine"), col("rn"))
  }
}
