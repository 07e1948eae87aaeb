package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (a handful of mega-facilities
  * among thousands — the realistic 100 TB shape of the reference's
  * per-facility data).
  *
  * Division of labor with AQE (audited in PlanAuditSpec):
  *  - JOIN skew: `spark.sql.adaptive.skewJoin` (on in GraftSession)
  *    splits an oversized shuffle partition of a sort-merge /
  *    shuffled-hash join at runtime and replicates the matching other
  *    side — so hot-key equi JOINS need no manual salt here; adding one
  *    anyway would only widen the key and defeat AQE's size stats.
  *  - AGGREGATION skew: AQE never splits a skewed groupBy partition (a
  *    partial aggregate can't be "replicated" the way a join side can),
  *    so hot-key aggregations use the explicit two-phase salt below:
  *    partial over (key, _salt), final over key. The salted first phase
  *    produces many small partitions; AQE's coalescePartitions folds
  *    them back — the two compose, not conflict.
  *  - The salt is content-derived (hash pmod buckets), NOT rand():
  *    retried/speculative tasks must agree on placement or the partial
  *    counts double.
  */
object Skew {

  /** Add a deterministic salt column in [0, buckets) derived from stable
    * row content — NOT rand(), so retries/speculative tasks agree.
    */
  def withSalt(df: DataFrame, saltFrom: Column, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(saltFrom), lit(buckets)))

  /** Two-phase skew-safe count per key: partial count over (key, salt),
    * final sum over key. Identical result to a direct groupBy(key) but
    * the first shuffle spreads a hot key across `buckets` reducers.
    */
  def saltedCount(df: DataFrame, keyCol: String, saltFrom: Column,
                  buckets: Int = 16): DataFrame =
    withSalt(df, saltFrom, buckets)
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("n"))

  /** Skew-safe distinct count per key: the (key, salt) pre-aggregation
    * dedups locally before the per-key exact distinct. NULL values are
    * excluded up front — countDistinct ignores NULLs, and without the
    * filter the (key, salt, NULL) row would survive the distinct and
    * count as one extra value. (Keys whose values are ALL null drop out
    * instead of reporting 0 — same as a groupBy over the filtered input.)
    */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
                          buckets: Int = 16): DataFrame =
    withSalt(df.filter(col(valueCol).isNotNull), col(valueCol), buckets)
      .select(col(keyCol), col("_salt"), col(valueCol)).distinct()
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_distinct"))

  /** Heavy-hitter diagnostic: the top-n values of a key (composite
    * keys welcome) by row count, with each value's share of the table —
    * the first thing to run when a shuffle stage straggles, and the
    * input to choosing a salting factor. groupBy + TakeOrderedAndProject
    * (orderBy.limit never global-sorts); the rank window runs on the
    * already-reduced n rows, and the total arrives as one broadcast
    * row. Ties break by key order so output is deterministic.
    */
  def heavyHitters(df: DataFrame, keyCols: Seq[String],
                   topN: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "heavyHitters needs at least one key column")
    val total = df.agg(count(lit(1)).as("_total"))
    val sortKeys = col("n").desc +: keyCols.map(col(_).asc)
    val top = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .orderBy(sortKeys: _*)
      .limit(topN)
    // deliberate global window: ranks the topN rows only (audited r9)
    val w = org.apache.spark.sql.expressions.Window.orderBy(sortKeys: _*)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("share", round(col("n") / col("_total"), 6))
      .select((col("rank") +: keyCols.map(col)) ++
        Seq(col("n"), col("share")): _*)
  }
}
