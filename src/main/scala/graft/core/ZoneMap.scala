package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps (a.k.a. min/max data skipping, block-range indexes): one
  * stats row per storage shard — row count plus per-column min / max /
  * null count — consulted at planning time so a range predicate reads
  * ONLY the shards whose [min, max] interval intersects it. This is the
  * single biggest scan-reduction lever at 100 TB: on a time-partitioned
  * corpus a one-month predicate touches ~1% of shards, and the decision
  * costs one scan of the stats table (thousands of rows), not the data.
  * Parquet footers carry the same stats per row-group; this module is
  * the SHARD-level equivalent for engine-managed layouts (export shards,
  * compaction outputs) where the planner sees a file list, not footers.
  *
  * Correctness contract (the part that's easy to get wrong):
  *  - min/max are taken over NON-NULL values only (Spark and SQL agg
  *    semantics agree), so a shard of all-null values has NULL bounds —
  *    it can never satisfy a range predicate and is correctly skipped,
  *    but an IS NULL predicate must read exactly the shards with
  *    `nulls > 0`, which is why the null count is part of the map.
  *  - pruning is conservative: interval overlap keeps a shard that MAY
  *    contain matches; it never drops one that does. False keeps cost
  *    a read; false skips would be wrong answers.
  *
  * Build is one map-side-combined groupBy over the corpus (run it at
  * write time, alongside the shard export); prune touches only the
  * stats table. The reference has no analogue — its per-file loop reads
  * every file it is told about (file_loader.py work-list); a zone map is
  * how that work-list would shrink by 100× on a real archive.
  */
object ZoneMap {

  /** Per-shard stats for `cols`: `shard`, `n_rows`, then for each
    * column c: `c_min`, `c_max`, `c_nulls`. One aggregation pass,
    * partial+final combined — the build cost is a single corpus scan
    * regardless of how many columns are mapped.
    */
  def build(df: DataFrame, shard: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zone map needs at least one mapped column")
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      cols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
          count(when(col(c).isNull, 1)).cast("long").as(s"${c}_nulls"))
      }
    df.groupBy(shard.as("shard")).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge zone maps from independent batches/partials (same mapped
    * columns): min/max are min/max monoids, row and null counts are sum
    * monoids, so per-shard stats fold cell-wise — an appended batch
    * updates the map in O(|shards touched|) without rescanning history,
    * the same mergeable-state discipline as IncrementalAgg. Widening
    * only: a merged bound can only loosen, so pruning stays
    * conservative-correct mid-maintenance.
    */
  def merge(zoneMaps: Seq[DataFrame], cols: Seq[String]): DataFrame = {
    require(zoneMaps.nonEmpty, "no zone maps to merge")
    val aggs = sum("n_rows").cast("long").as("n_rows") +:
      cols.flatMap { c =>
        Seq(min(s"${c}_min").as(s"${c}_min"),
          max(s"${c}_max").as(s"${c}_max"),
          sum(s"${c}_nulls").cast("long").as(s"${c}_nulls"))
      }
    zoneMaps.reduce(_ unionByName _)
      .groupBy("shard").agg(aggs.head, aggs.tail: _*)
  }

  /** Shards a closed-range predicate `lo <= c AND c <= hi` must read:
    * those whose [min, max] interval intersects [lo, hi]. NULL-bounded
    * shards (all values null) drop out — `x <= lit` is NULL-false in a
    * WHERE. Pass `lo` or `hi` as `lit(null)` cast to the column type for
    * a half-open predicate; the corresponding bound check vanishes.
    * A null BOUND is tested explicitly (`lo.isNull || ...`) — the bare
    * conjunct `max >= NULL` is NULL, `TRUE AND NULL` gets dropped by
    * filter(), and every shard would FALSE-SKIP (the one failure a
    * zone map must never commit). A null STAT (all-null shard) still
    * skips: a range matches no NULL value.
    */
  private def rangeHit(colName: String, lo: Column, hi: Column): Column =
    (lo.isNull || col(s"${colName}_max") >= lo) &&
      (hi.isNull || col(s"${colName}_min") <= hi) &&
      col(s"${colName}_min").isNotNull

  def pruneRange(zoneMap: DataFrame, colName: String,
                 lo: Column, hi: Column): DataFrame =
    zoneMap.filter(rangeHit(colName, lo, hi))

  /** Shards an IS NULL predicate must read: exactly those that recorded
    * at least one null for the column.
    */
  def pruneIsNull(zoneMap: DataFrame, colName: String): DataFrame =
    zoneMap.filter(col(s"${colName}_nulls") > 0)

  /** Planning summary for a [[pruneRange]] decision — the numbers a
    * query planner (or a capacity review) wants: shards and rows total
    * vs to-read, both exact from the stats table alone. Returns one row:
    * `shards_total, shards_read, rows_total, rows_read`. Aggregates a
    * thousands-row stats frame; never touches the corpus.
    */
  def pruneStats(zoneMap: DataFrame, colName: String,
                 lo: Column, hi: Column): DataFrame = {
    // same NULL-safe hit rule as pruneRange; a bare NULL flag would
    // silently vanish from sum() and under-count shards_read
    val hit = rangeHit(colName, lo, hi).cast("long")
    zoneMap.agg(
      count(lit(1)).cast("long").as("shards_total"),
      sum(hit).cast("long").as("shards_read"),
      sum(col("n_rows")).cast("long").as("rows_total"),
      sum(col("n_rows") * hit).cast("long").as("rows_read"))
  }
}
