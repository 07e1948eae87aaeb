package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a materialized per-key
  * aggregate current by MERGING partial aggregates instead of
  * re-scanning the corpus — the algebraic-rollup property
  * (sum/count/min/max are associative+commutative monoids; avg derives
  * from sum+count) that makes 100 TB rollups maintainable from
  * per-batch deltas. The reference recomputes its patient-count
  * summaries from scratch every run (fetch_update_biodata_counts,
  * pcs_summary_report.py); this is the O(|delta| + |groups|)
  * alternative.
  *
  * `base` and `delta` are partial aggregates with the SAME schema
  * (keys + measure columns); the merge is one union + one groupBy over
  * |groups_base + groups_delta| rows — never over raw data. New keys
  * appear, existing keys combine; a count column rides along as a sum.
  * Derived measures (avg, rates) must be re-derived AFTER the merge
  * (deriveAvg) — averaging averages is the classic wrong answer.
  */
object IncrementalAgg {

  def mergePartials(base: DataFrame, delta: DataFrame, keys: Seq[String],
                    sumCols: Seq[String], minCols: Seq[String] = Nil,
                    maxCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "mergePartials needs at least one key")
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "nothing to merge")
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Re-derive a mean from merged (sumCol, countCol) partials. */
  def deriveAvg(merged: DataFrame, sumCol: String, countCol: String,
                as: String): DataFrame =
    merged.withColumn(as,
      when(col(countCol) > 0, col(sumCol) / col(countCol)))

  /** Order statistics (FIRST/LAST by an order key — the OHLC open/close
    * shape) as mergeable state: the measure is carried as
    * `min(struct(orderCols..., value))` / `max(struct(...))` — struct
    * ordering is lexicographic, so the struct min IS the value at the
    * minimal order key, and struct min/max are monoids: partials from
    * any sharding merge to the one-shot answer exactly. Use
    * [[firstLastPartial]] per batch, [[mergePartials]] with the struct
    * columns in min/max position, then [[deriveFirstLast]] to unwrap.
    */
  def firstLastPartial(df: DataFrame, keys: Seq[String],
                       orderCols: Seq[String], valueCol: String): DataFrame = {
    require(orderCols.nonEmpty, "order columns required")
    val key = struct((orderCols :+ valueCol).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min(key).as("first_s"), max(key).as("last_s"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"),
        count(lit(1)).as("n"))
  }

  /** Unwrap merged [[firstLastPartial]] structs to plain first/last
    * value columns.
    */
  def deriveFirstLast(merged: DataFrame, valueCol: String): DataFrame =
    merged
      .withColumn("first_val", col("first_s").getField(valueCol))
      .withColumn("last_val", col("last_s").getField(valueCol))
      .drop("first_s", "last_s")

  /** COUNT(DISTINCT) as mergeable state: per-key Datasketches HLL
    * sketches (`hll_sketch_agg`) — the distinct-count member of the
    * monoid family above, for the one aggregate that has NO algebraic
    * partial (you cannot sum distinct counts across shards). Merge
    * semantics, stated precisely: in the sparse (coupon) regime the
    * union is lossless — merged shards estimate IDENTICALLY to the
    * one-shot sketch (IncrementalAggSpec asserts the identity); once a
    * sketch crosses into dense HLL mode the sparse→dense transition
    * point depends on how the data was sharded, so merged and one-shot
    * estimates may differ WITHIN the sketch's error envelope
    * (~1.04/√2^lgK relative). Either way the state is a fixed few KB
    * per key and never re-scans history. Output: keys + `sketch`
    * (binary).
    */
  def hllPartial(df: DataFrame, keys: Seq[String], valueCol: String,
                 lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge [[hllPartial]] grids (cell-wise sketch union) and estimate:
    * keys + `approx_distinct`.
    */
  def hllMergeEstimate(partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty, "no partials to merge")
    val keys = partials.head.columns.filterNot(_ == "sketch").toSeq
    partials.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("_u"))
      .select(keys.map(col) :+
        hll_sketch_estimate(col("_u")).as("approx_distinct"): _*)
  }
}
