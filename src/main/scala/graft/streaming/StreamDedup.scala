package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming deduplication (§2.9 + the LLM-pipeline dedup
  * family): exact dedup as a continuously-maintained operator instead of
  * a batch groupBy. Keyed by content hash via
  * `KeyValueGroupedDataset.flatMapGroupsWithState`: the state store
  * remembers (first id, copies) per hash across micro-batches, and a key
  * is EMITTED exactly once — on the batch where it is first seen — so the
  * downstream corpus sink receives each distinct content exactly once
  * even when duplicates arrive hours apart.
  *
  * Determinism: within the emitting batch the representative is the MIN
  * id of that batch's group (not iterator order). On a batch DataFrame
  * the same code is the whole-corpus answer — state starts empty, every
  * key is "first seen", and the output is exactly
  * `GROUP BY hash → (min(id), count(*))` — which is what the DuckDB
  * oracle checks (q_stream_dedup_state).
  *
  * Scale: state is one ~24-byte entry per DISTINCT content hash, hash-
  * partitioned across executors by the groupByKey shuffle; lookups are
  * state-store-local. For an unbounded corpus, bound state with the
  * `ttl` variant (ProcessingTimeTimeout evicts hashes idle longer than
  * the TTL — a re-arriving dup after eviction re-emits, the standard
  * recall/state trade).
  */
object StreamDedup {

  final case class KeyedDoc(content_hash: String, id: Long)
  final case class SeenState(firstId: Long, copies: Long)
  final case class FirstSeen(content_hash: String, first_id: Long, copies: Long)

  private implicit val keyedEnc: Encoder[KeyedDoc] = Encoders.product[KeyedDoc]
  private implicit val stateEnc: Encoder[SeenState] = Encoders.product[SeenState]
  private implicit val outEnc: Encoder[FirstSeen] = Encoders.product[FirstSeen]
  private implicit val strEnc: Encoder[String] = Encoders.STRING

  /** Works on both a streaming and a batch DataFrame (same plan, state
    * empty in batch). `ttlMs` > 0 bounds state via processing-time
    * timeout eviction; 0 keeps state forever (exact).
    */
  def firstSeen(df: DataFrame, idCol: String, textCol: String,
                ttlMs: Long = 0L): Dataset[FirstSeen] = {
    val keyed = df
      .select(md5(col(textCol)).as("content_hash"),
        col(idCol).cast("long").as("id"))
      .as[KeyedDoc]
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed.groupByKey(_.content_hash)
      .flatMapGroupsWithState[SeenState, FirstSeen](
        OutputMode.Append, timeoutConf) {
        (key: String, it: Iterator[KeyedDoc], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) { // eviction tick: no rows, drop the entry
            state.remove()
            Iterator.empty
          } else {
            var mn = Long.MaxValue
            var n = 0L
            it.foreach { d => if (d.id < mn) mn = d.id; n += 1 }
            val out =
              if (state.exists) {
                val s = state.get
                state.update(SeenState(s.firstId, s.copies + n))
                Iterator.empty[FirstSeen]
              } else {
                state.update(SeenState(mn, n))
                Iterator(FirstSeen(key, mn, n))
              }
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }
}
