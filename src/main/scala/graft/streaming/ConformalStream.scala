package graft.streaming

import graft.core.Fs
import graft.llm.RankStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-maintained conformal calibration: each micro-batch's
  * (group, score) rows fold into a persistent (group, value, count)
  * cell state, and [[readQuantile]] serves the CURRENT
  * distribution-free anomaly threshold per group — the always-on gate:
  * yesterday's traffic calibrates, today's scores check against qhat
  * with the finite-sample false-alarm bound intact (scores must be
  * exchangeable across the window the caller folds — that assumption
  * is the caller's, exactly as in batch split-conformal).
  *
  * Exactness across batchings: cells are a commutative monoid, so the
  * maintained state is BIT-IDENTICAL to one-shot counting over the
  * concatenated stream — q_stream_conformal folds a 3-way split of
  * the calibration half and still hash-matches the SAME one-shot SQL
  * replay as q_stat_conformal (the BootStream/groupCiOracle
  * contract). State size is the distinct (group, quantized-value)
  * domain — the InfoStream vocabulary class, far below corpus-sized;
  * quantize scores at the call site (the RankStats long contract).
  *
  * Replay safety is [[ReplayGuard]]'s (queryId, batchId) marker:
  * cell addition is not idempotent, so a replayed foreachBatch batch
  * is skipped, while a fresh queryId re-keys and folds.
  */
object ConformalStream {

  /** Last batchId folded into `statePath`; -1 when missing. */
  def lastAppliedBatchId(statePath: String,
                         conf: org.apache.hadoop.conf.Configuration): Long =
    ReplayGuard.read(statePath, conf).map(_._2).getOrElse(-1L)

  /** Fold one batch of (groupCol, valueCol) calibration rows into the
    * cell state at `statePath` (missing state = empty). Staging write
    * + crash-safe swap, materialized BEFORE the swap.
    */
  def applyBatch(batch: DataFrame, groupCol: String, valueCol: String,
                 statePath: String,
                 batchId: Long = -1L, queryId: String = ""): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val marker = ReplayGuard.read(statePath, conf)
    if (ReplayGuard.alreadyApplied(marker, queryId, batchId)) return
    val cells = batch.select(
      when(col(groupCol).isNull,
        raise_error(lit(s"ConformalStream: NULL group in $groupCol")))
        .otherwise(col(groupCol)).cast("string").as("_g"),
      when(col(valueCol).isNull,
        raise_error(lit(s"ConformalStream: NULL value in $valueCol")))
        .otherwise(col(valueCol)).cast("long").as("_v"))
      .groupBy("_g", "_v").agg(count(lit(1)).as("_n"))
    val merged =
      if (Fs.exists(statePath, conf))
        spark.read.parquet(statePath).unionByName(cells)
          .groupBy("_g", "_v").agg(sum(col("_n")).as("_n"))
      else cells
    val staging = s"$statePath.staging"
    merged.write.mode("overwrite").parquet(staging)
    ReplayGuard.stamp(staging, conf, marker, queryId, batchId)
    if (Fs.exists(statePath, conf)) Fs.swapInPlace(statePath, staging, conf)
    else Fs.rename(staging, statePath, conf)
  }

  /** The current per-group conformal threshold from the persisted
    * cells — [[RankStats.conformalQuantileFromCells]].
    */
  def readQuantile(spark: org.apache.spark.sql.SparkSession,
                   statePath: String,
                   alphaPermille: Int = 50): DataFrame =
    RankStats.conformalQuantileFromCells(
      spark.read.parquet(statePath), alphaPermille)

  /** Wire a calibration stream into the state: foreachBatch + the fold
    * above (the InfoStream run signature).
    */
  def run(rows: DataFrame, groupCol: String, valueCol: String,
          statePath: String, checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, groupCol, valueCol, statePath,
          batchId, ReplayGuard.streamingQueryId(batch))
      }
      .start()
}
