package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the canonical hard Structured
  * Streaming operator: match each left event with the right events of
  * the same key that happened in a bounded time interval before it
  * (views in the hour before a purchase, readings before an alarm).
  *
  * Why the interval bound is load-bearing: a stream-stream join can
  * only evict buffered state when the join condition bounds how far
  * apart matching event times can be. With watermarks on BOTH inputs
  * plus the `rightTs ∈ [leftTs − lookback, leftTs)` range condition,
  * Spark derives the state retention window per side and drops
  * buffered rows as the watermark passes — state is
  * O(events per key · lookback), not O(stream). Without the bound the
  * state grows forever (Spark rejects it in append mode).
  *
  * The same builder runs on BATCH DataFrames — identical semantics as
  * a plain equi join (key) + range residual, which is what the DuckDB
  * oracle for `q_stream_interval_join` checks; cross-micro-batch
  * arrival and watermark eviction are StreamJoinSpec's to verify.
  *
  * Scale shape: the key equality makes this a hash-partitioned
  * SortMergeJoin (or streaming symmetric hash join) — never a
  * BroadcastNestedLoop; both sides shuffle once on the key.
  */
object StreamJoin {

  /** Core interval-join condition over pre-renamed inputs (caller
    * disambiguates column names; keys zip left→right).
    * Right rows match when `rightTs ∈ [leftTs − lookbackSec, leftTs)`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keys: Seq[(String, String)],
                   leftTs: String, rightTs: String,
                   lookbackSec: Long): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equi key")
    require(lookbackSec > 0, "lookback must be positive")
    val keyCond: Column = keys.map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _)
    val range = right(rightTs) >= left(leftTs) - expr(s"INTERVAL '$lookbackSec' SECOND") &&
      right(rightTs) < left(leftTs)
    left.join(right, keyCond && range)
  }

  /** Streaming face: watermark both inputs (bounding lateness → state
    * eviction), then the same interval join. Use from `readStream`
    * sources with append-mode sinks.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         keys: Seq[(String, String)],
                         leftTs: String, rightTs: String,
                         lookbackSec: Long, maxLateness: String): DataFrame =
    intervalJoin(left.withWatermark(leftTs, maxLateness),
      right.withWatermark(rightTs, maxLateness),
      keys, leftTs, rightTs, lookbackSec)

  /** The registered query's shape: purchases joined to the same user's
    * views in the preceding `lookbackSec` (exclusive of the purchase
    * instant), with the exact integer gap. Works on the batch events
    * table and, with `stream = true`-style inputs, on streams.
    */
  def viewsBeforePurchases(events: DataFrame, lookbackSec: Long): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("vts"))
    intervalJoin(purchases, views, Seq("user_id" -> "v_user"), "pts", "vts",
        lookbackSec)
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        (unix_micros(col("pts")) - unix_micros(col("vts"))).as("gap_us"))
  }
}
