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
}
