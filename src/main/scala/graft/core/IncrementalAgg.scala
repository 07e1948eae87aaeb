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

  /** Quantiles as mergeable state: equi-width histogram partials.
    * Quantiles, like distinct counts, have no algebraic partial (you
    * cannot merge medians) — but BIN COUNTS are a plain sum monoid, so
    * a fixed binning turns quantile maintenance into [[mergePartials]]
    * arithmetic: each shard contributes `(bucket, n)` rows, merging is
    * `groupBy(bucket).sum(n)`, and any quantile reads off the merged
    * cumulative row — resolution bounded by the bin width, state
    * bounded by `buckets` rows per shard, exact INTEGER arithmetic
    * throughout (bucket = capped ⌊v/width⌋; the only IEEE op is that
    * one divide, identical in any engine). The mergeable-sketch
    * alternative (t-digest/KLL) buys adaptive resolution at the cost of
    * engine-specific estimates; the fixed grid is reproducible
    * bit-for-bit, which is what a regression gate wants.
    *
    * Output of [[histogramPartial]]: `shard, bucket, n` — one
    * aggregation pass, map-side combined.
    */
  def histogramPartial(df: DataFrame, shard: org.apache.spark.sql.Column,
                       valueCol: String, width: Double,
                       buckets: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      // clamp BOTH ends: without the greatest(), negative values mint
      // one bucket id per distinct negative floor — unbounded state,
      // violating the "<= buckets rows per shard" contract this
      // operator (and histogramQuantiles' global window) depends on
      .groupBy(shard.as("shard"),
        greatest(lit(0L),
          least(lit((buckets - 1).toLong),
            floor(col(valueCol) / width).cast("long"))).as("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** Merge histogram partials (drop the shard key, sum the counts):
    * `bucket, n`. Associative+commutative — shards/batches fold in any
    * order.
    */
  def histogramMerge(partials: DataFrame*): DataFrame = {
    require(partials.nonEmpty, "no partials to merge")
    partials.reduce(_ unionByName _)
      .groupBy("bucket").agg(sum("n").cast("long").as("n"))
  }

  /** Read quantiles off a merged histogram: for each requested quantile
    * (basis points), the first bucket whose cumulative count reaches
    * ⌈q·total⌉ — compared by exact cross-multiplication
    * `cum·10000 >= q_bp·total`, no doubles. Output: `q_bp, bucket,
    * cum_n, total_n`, one row per requested quantile. The cumulative
    * window runs over the MERGED frame — at most `buckets` rows — so
    * the empty-frame (single partition) window is over a trivially
    * small input; the corpus was only ever touched by the partial pass.
    */
  def histogramQuantiles(merged: DataFrame, qBps: Seq[Int]): DataFrame = {
    require(qBps.nonEmpty, "no quantiles requested")
    // deliberate global window over the merged histogram (rows <=
    // buckets) — not a corpus-wide window (audited r9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().orderBy("bucket")
    val c = merged
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val qs = merged.sparkSession
      .createDataFrame(qBps.map(Tuple1(_))).toDF("q_bp")
      .select(col("q_bp").cast("long"))
    qs.join(c, c("cum") * 10000 >= col("q_bp") * c("total"))
      .groupBy("q_bp")
      .agg(min("bucket").cast("long").as("bucket"),
        min("cum").cast("long").as("cum_n"),
        min("total").cast("long").as("total_n"))
  }
}
