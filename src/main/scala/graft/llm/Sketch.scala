package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token/key stream (Cormode & Muthukrishnan
  * 2005), as pure DataFrame algebra.
  *
  * Why a sketch at 100 TB: an exact per-token frequency table is
  * vocabulary-sized — fine for one corpus pass (TextAnalysis.docFrequency
  * does exactly that) but wrong when the count state must be SHIPPED
  * (broadcast to every executor for stream-side lookups, merged across
  * corpus shards, or kept per time-window). The CMS is a fixed
  * `depth × width` integer grid regardless of vocabulary: counters for
  * a 10¹¹-token corpus fit in kilobytes, merge by cell-wise addition,
  * and answer point queries with a one-sided error — estimates never
  * undercount, and overcount ≤ εN with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉.
  *
  * Determinism: the row hash is the first 4 hex digits of
  * md5("<seed>|<token>") mod width — the same portable md5 idiom as the
  * LSH bands and block sub-splits, bit-identical in any engine with
  * md5 (the oracle replays it in SQL). No JVM hashCode, no rng.
  *
  * Plan shape: build = one explode(depth) + groupBy(seed, bucket) —
  * partial aggregation collapses every partition to ≤ depth·width rows
  * before the shuffle, so the exchange carries sketch cells, never the
  * token stream. Estimate = broadcast the (tiny) counter grid against
  * the probe keys. Merge = union + re-aggregate over cell rows only.
  */
object Sketch {

  /** Deterministic CMS cell for one (seed, token) pair: first 4 md5 hex
    * digits of "<seed>|<token>", mod `width`. Non-negative by
    * construction, so % is safe.
    */
  def cmsBucket(seed: Column, token: Column, width: Int): Column =
    conv(substring(md5(concat(seed.cast("string"), lit("|"), token)), 1, 4),
      16, 10).cast("long") % width

  /** Build the counter grid from a key stream: one row per occupied
    * (seed, bucket) cell, `cnt` = number of stream items hashing there.
    * `items` is the already-exploded stream (one row per occurrence) —
    * pair with TextAnalysis.tokens for document text.
    */
  def cmsCounters(items: DataFrame, keyCol: String, depth: Int = 4,
                  width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape: $depth x $width")
    items.select(col(keyCol).as("_k"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("seed"), col("_k"))
      .select(col("seed"), cmsBucket(col("seed"), col("_k"), width).as("bucket"))
      .groupBy("seed", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Merge counter grids from independent shards/windows (cell-wise
    * addition): estimates over the merged grid ≡ estimates over the
    * concatenated streams — the property that makes the sketch a
    * partial aggregate.
    */
  def cmsMerge(grids: DataFrame*): DataFrame =
    grids.reduce(_ unionByName _)
      .groupBy("seed", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `probes` (one row per distinct key):
    * est(k) = min over seeds of the counter at that seed's cell —
    * never below the true count, above it only through collisions.
    * The counter grid is ≤ depth·width rows → broadcast; unoccupied
    * cells read as 0.
    */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .withColumn("bucket", cmsBucket(col("seed"), col(keyCol), width))
      .join(broadcast(counters), Seq("seed", "bucket"), "left")
      .groupBy(keyCol).agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Inner-product estimate between two counter grids (Cormode &
    * Muthukrishnan §4.2): est(Σ_k fA(k)·fB(k)) = min over seeds of
    * Σ_bucket cA·cB — never below the true value, above it by
    * ~‖fA‖₁‖fB‖₁/width in expectation. Σ_k fA·fB is exactly the row
    * count of the equi-join A ⋈ B on the sketched key, so this is JOIN
    * CARDINALITY ESTIMATION from kilobytes of mergeable state — the
    * planner's pre-shuffle answer to "can I afford this join / which
    * side do I broadcast", computed without touching either table
    * (grids were built at write time / maintained by SketchStream).
    * Both grids are ≤ depth·width rows; the inner join drops cells
    * empty on either side, which contribute 0 anyway. One row: `est`.
    * Pass the same grid twice for a self-join estimate (Σ fₖ² — also
    * the F₂ / skew diagnostic: a hot key dominates Σ f² long before it
    * dominates Σ f).
    */
  def cmsInnerProduct(gridA: DataFrame, gridB: DataFrame): DataFrame = {
    // every seed must vote: a seed whose occupied cells don't overlap
    // at all has Σ = 0 — the BEST (exact) estimate — and an inner-join
    // groupBy would silently drop it, inflating the min over the
    // remaining seeds; fully disjoint grids must answer 0, not NULL
    val dots = gridA.select(col("seed"), col("bucket"), col("cnt").as("_ca"))
      .join(broadcast(gridB.select(col("seed"), col("bucket"), col("cnt").as("_cb"))),
        Seq("seed", "bucket"))
      .groupBy("seed").agg(sum(col("_ca") * col("_cb")).as("_dot"))
    gridA.select("seed").distinct()
      .join(dots, Seq("seed"), "left")
      .na.fill(0L, Seq("_dot"))
      .agg(coalesce(min("_dot"), lit(0L)).cast("long").as("est"))
  }
}
