package graft.streaming

import graft.core.Fs
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame

/** The replay-marker protocol for foreachBatch sinks that maintain a
  * READ-MODIFY-WRITE store — state the fold rewrites in place, like the
  * CMS grid ([[SketchStream]]), where a replay would double-apply:
  * a `_graft_batch_id` marker file INSIDE the store directory records
  * the last `(queryId, batchId)` folded in. The underscore prefix makes
  * it invisible to the parquet reader (the `_SUCCESS` convention), and
  * living inside the directory means [[Fs.swapInPlace]] promotes the
  * marker and the state it describes in the SAME atomic rename.
  *
  * Why both ids (the txnAppId+version pattern for idempotent
  * foreachBatch sinks): foreachBatch is at-least-once — a crash between
  * the store swap and the streaming checkpoint commit REPLAYS the
  * batch, and non-idempotent folds (cell addition, index append) would
  * double-apply, so a batch with `batchId <=` the recorded one under
  * the SAME queryId is skipped. But if the checkpoint is deleted or
  * relocated while the store is kept (a routine ops event), batchIds
  * restart at 0 under a NEW queryId — skipping on the bare id would
  * silently drop every new batch until the ids caught up. A mismatched
  * queryId therefore folds (and re-keys the marker to the new query).
  *
  * APPEND-shaped stores don't need this: [[IncrDedupStream]] keys each
  * batch's delta directory by (queryId, batchId) and recomputes-then-
  * overwrites on replay — idempotent by naming, no marker. Reach for
  * the marker only when the fold genuinely rewrites shared state.
  */
object ReplayGuard {

  /** Marker file name inside the store directory. */
  val MarkerName = "_graft_batch_id"

  /** Parse the marker into (queryId, batchId). Two formats:
    *  - v2 `"<queryId>:<batchId>"`; queryId may be empty (direct batch
    *    callers with no streaming identity);
    *  - legacy: a bare number — predates query tracking; surfaces as
    *    queryId "" so old stores keep their replay protection for
    *    callers that never pass a queryId.
    * None when the store is missing or untracked.
    */
  def read(storeDir: String, conf: Configuration): Option[(String, Long)] =
    Fs.readText(s"$storeDir/$MarkerName", conf).map { txt =>
      val s = txt.trim
      s.lastIndexOf(':') match {
        case -1 => ("", s.toLong)
        case i  => (s.substring(0, i), s.substring(i + 1).toLong)
      }
    }

  /** True when this (queryId, batchId) is already folded into the store
    * the marker was read from — i.e. the batch is a replay to skip.
    * Always false for direct calls (batchId < 0).
    */
  def alreadyApplied(marker: Option[(String, Long)],
                     queryId: String, batchId: Long): Boolean =
    batchId >= 0 && marker.exists { case (qid, bid) =>
      qid == queryId && batchId <= bid
    }

  /** Stamp the STAGING directory before the swap: the new (queryId,
    * batchId) for tracked batches, or the preserved pre-existing marker
    * for direct folds (batchId < 0) so replay protection survives
    * interleaved direct calls.
    */
  def stamp(stagingDir: String, conf: Configuration,
            existing: Option[(String, Long)],
            queryId: String, batchId: Long): Unit =
    if (batchId >= 0)
      Fs.writeText(s"$stagingDir/$MarkerName", s"$queryId:$batchId", conf)
    else existing.foreach { case (qid, bid) =>
      Fs.writeText(s"$stagingDir/$MarkerName", s"$qid:$bid", conf)
    }

  /** The streaming queryId for a foreachBatch batch frame: stable
    * across restarts from the same checkpoint (persisted in its
    * metadata) and fresh after a checkpoint reset — exactly the
    * identity the marker needs. StreamExecution exposes it as a local
    * property on the batch's context; "" outside a streaming query.
    */
  def streamingQueryId(batch: DataFrame): String =
    Option(batch.sparkSession.sparkContext
      .getLocalProperty("sql.streaming.queryId")).getOrElse("")
}
