package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming CEP face of [[graft.core.Temporal.sequenceMatch]]: detect
  * "A then B then C, without X between, within W of the first A" as a
  * continuously-maintained operator. Keyed by entity via
  * `flatMapGroupsWithState`; the state is the greedy chain progress
  * (matched step timestamps + a broken flag), ~(n_steps+1)·8 bytes per
  * TRACKED entity, hash-partitioned by the groupByKey shuffle. An
  * entity's match is emitted exactly once — on the micro-batch where
  * the final step lands — even when the steps arrive hours apart.
  *
  * Semantics match the batch operator's documented FIRST-MATCH greedy
  * chain (exhaustive for first-gap negations, first-match for later
  * gaps — see sequenceMatch): events are processed in
  * (ts, step-before-banned) order — the tie rule that makes a banned
  * event at EXACTLY the next step's timestamp non-breaking, like the
  * batch strict-betweens. Within a micro-batch the group iterator is
  * sorted; ACROSS batches events must arrive per-entity in event-time
  * order (the standard CEP watermark contract — a late earlier-step
  * event after the chain advanced is ignored). On a BATCH DataFrame the
  * same code sees each entity's whole history as one sorted group, so
  * the output is exactly `sequenceMatch(...).filter(matched)` — which
  * is what the q_stream_seq_match DuckDB oracle checks.
  *
  * Bot-cap note: apply Sessionize.capUserEvents upstream if needed; the
  * operator itself holds only the chain state, never the event stream.
  */
object SequenceStream {

  // entity keys travel as strings: lossless for numeric ids and correct
  // for string ids (a cast-to-long key would null out "u123" and crash
  // the non-nullable deserializer), matching sequenceMatch's
  // any-entity-type contract
  final case class Ev(entity: String, ts_us: Long, step: String, is_step: Int)
  final case class SeqState(ts: Seq[Long], broken: Boolean)
  final case class SeqMatch(entity: String, ts_us: Seq[Long])

  private implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  private implicit val stEnc: Encoder[SeqState] = Encoders.product[SeqState]
  private implicit val outEnc: Encoder[SeqMatch] = Encoders.product[SeqMatch]
  private implicit val strEnc: Encoder[String] = Encoders.STRING

  final case class SeqExist(entity: String, t1_us: Long, matched: Boolean,
                            matched_at_us: Option[Long])

  private implicit val existEnc: Encoder[SeqExist] = Encoders.product[SeqExist]

  /** EXISTENTIAL sequence matching — the exhaustive complement of the
    * first-match faces: does ANY clean chain exist? Anchored like the
    * whole family at each entity's FIRST step-1 event, but steps 2..n
    * range over every candidate: "a@0 b@1 x@3 b@5 c@10 with no x
    * between b and c" MATCHES here (via b@5) where the greedy faces
    * report broken.
    *
    * Implementation is an O(events·steps) per-entity DP scan, not
    * backtracking: process events in (ts, step-before-banned) order,
    * tracking per step k the LATEST feasible timestamp and per gap the
    * last banned timestamp. A step-k event at t is feasible iff the
    * latest feasible t_{k-1} is < t, ≥ the gap's last banned event
    * (some predecessor survives the negation — the latest feasible one
    * is the hardest to ban), and t ≤ t1 + W. `matched_at_us` is the
    * earliest feasible final-step timestamp. Intermediate chain
    * timestamps are not reported — under existential semantics multiple
    * chains witness a match.
    *
    * Runs per entity via flatMapGroups over the capped relevant-event
    * subset (`maxEventsPerEntity`, the Sessionize prefix rule) — the
    * sort is per-entity like every sessionizer, bounded by the cap.
    * The q_evt_seq_exist oracle expresses the same semantics as a
    * DuckDB join chain with NOT EXISTS negation windows.
    */
  def matchExistential(df: DataFrame, entityCol: String, tsCol: String,
                       stepCol: String, steps: Seq[String],
                       windowSeconds: Long,
                       negations: Map[Int, Seq[String]] = Map.empty,
                       maxEventsPerEntity: Option[Int] = None): Dataset[SeqExist] = {
    require(steps.size >= 2, "a sequence needs at least 2 steps")
    require(negations.keySet.forall(g => g >= 1 && g < steps.size),
      s"negation gaps must be in [1, ${steps.size - 1}]")
    val windowUs = windowSeconds * 1000000L
    val relevantTypes = (steps ++ negations.values.flatten).distinct
    val base = df
      .filter(col(stepCol).isin(relevantTypes: _*))
      .select(col(entityCol).cast("string").as("entity"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(stepCol).as("step"),
        when(col(stepCol).isin(steps: _*), 0).otherwise(1).as("is_step"))
    val capped = maxEventsPerEntity.fold(base) { cap =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("entity")).orderBy(col("ts_us").asc, col("step").asc)
      base.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= cap).drop("_rn")
    }
    val n = steps.size
    capped.as[Ev].groupByKey(_.entity).flatMapGroups {
      (entity: String, it: Iterator[Ev]) =>
        val evs = it.toIndexedSeq.sortBy(e => (e.ts_us, e.is_step, e.step))
        // per step k (1-based): the max feasible timestamp and the max
        // feasible timestamp STRICTLY below it — two levels are enough
        // because the only candidate blocked by `tp < t` is one at the
        // same tick, and the runner-up is then the best strictly-earlier
        // predecessor. lastBanned(g): latest banned-for-gap-g ts so far
        // (processed after step events at the same tick, so it always
        // means "latest banned strictly before the current event").
        val maxFeasible = Array.fill[Option[Long]](n + 1)(None)
        val prevFeasible = Array.fill[Option[Long]](n + 1)(None)
        val lastBanned = Array.fill[Long](n)(Long.MinValue)
        var earliestDone: Option[Long] = None
        // an event type may occupy SEVERAL step positions (a, b, a) —
        // indexOf would pin it to the first and the sequence could
        // never complete; process every matching position, highest k
        // first (tp < t already forbids an event chaining with itself)
        val positionsOf: Map[String, Seq[Int]] =
          steps.zipWithIndex.groupBy(_._1)
            .map { case (s, xs) => s -> xs.map(_._2 + 1).sortBy(-_) }
        evs.foreach { e =>
          val t = e.ts_us
          if (e.is_step == 0) positionsOf(e.step).foreach { k =>
            if (k == 1) {
              if (maxFeasible(1).isEmpty) maxFeasible(1) = Some(t) // anchor
            } else if (maxFeasible(1).exists(t1 => t <= t1 + windowUs)) {
              // best predecessor strictly before t (same-tick max falls
              // back to the runner-up), surviving the gap's negation
              val cand = maxFeasible(k - 1) match {
                case Some(tp) if tp < t => Some(tp)
                case Some(_)            => prevFeasible(k - 1)
                case None               => None
              }
              val prevOk = cand.exists(tp =>
                tp < t && (!negations.contains(k - 1) || tp >= lastBanned(k - 1)))
              if (prevOk) {
                maxFeasible(k) match {
                  case Some(m) if m >= t => () // duplicate tick, keep both levels
                  case m => prevFeasible(k) = m; maxFeasible(k) = Some(t)
                }
                if (k == n && earliestDone.isEmpty) earliestDone = Some(t)
              }
            }
          }
          // banned updates AFTER step checks at the same tick (the
          // family's strict-between tie rule)
          negations.foreach { case (g, banned) =>
            if (banned.contains(e.step) && t > lastBanned(g)) lastBanned(g) = t
          }
        }
        maxFeasible(1).map(t1 =>
          SeqExist(entity, t1, earliestDone.nonEmpty, earliestDone)).iterator
    }
  }

  /** Works on both a streaming and a batch DataFrame (same plan, state
    * empty in batch). Emits one [[SeqMatch]] per entity that completes
    * all `steps`, carrying the matched timestamps in epoch micros.
    */
  def detect(df: DataFrame, entityCol: String, tsCol: String,
             stepCol: String, steps: Seq[String], windowSeconds: Long,
             negations: Map[Int, Seq[String]] = Map.empty): Dataset[SeqMatch] = {
    require(steps.size >= 2, "a sequence needs at least 2 steps")
    require(negations.keySet.forall(g => g >= 1 && g < steps.size),
      s"negation gaps must be in [1, ${steps.size - 1}]")
    val windowUs = windowSeconds * 1000000L
    val relevantTypes = (steps ++ negations.values.flatten).distinct
    val keyed = df
      .filter(col(stepCol).isin(relevantTypes: _*))
      .select(col(entityCol).cast("string").as("entity"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(stepCol).as("step"),
        // step events sort BEFORE banned-only events at equal ts: the
        // batch strict-between means a banned event tied with the next
        // step's timestamp does not break the gap
        when(col(stepCol).isin(steps: _*), 0).otherwise(1)
          .as("is_step"))
      .as[Ev]
    keyed.groupByKey(_.entity)
      .flatMapGroupsWithState[SeqState, SeqMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: String, it: Iterator[Ev], state) =>
          val evs = it.toIndexedSeq.sortBy(e => (e.ts_us, e.is_step, e.step))
          var st = state.getOption.getOrElse(SeqState(Seq.empty, broken = false))
          var emit: Option[SeqMatch] = None
          evs.foreach { e =>
            val k = st.ts.length
            if (!st.broken && k < steps.length) {
              if (k == 0) {
                if (e.step == steps.head) st = SeqState(Seq(e.ts_us), broken = false)
              } else if (e.ts_us > st.ts.last) {
                if (e.step == steps(k) && e.ts_us <= st.ts.head + windowUs) {
                  st = SeqState(st.ts :+ e.ts_us, broken = false)
                  if (st.ts.length == steps.length)
                    emit = Some(SeqMatch(entity, st.ts))
                } else if (negations.getOrElse(k, Seq.empty).contains(e.step)) {
                  st = SeqState(st.ts, broken = true)
                }
              }
            }
          }
          state.update(st)
          emit.iterator
      }
  }
}
