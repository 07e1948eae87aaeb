package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column faces of Spark's runtime-filter Bloom expressions
  * (BloomFilterAggregate / BloomFilterMightContain — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter`), exposed for
  * EXPLICIT use as a broadcast pre-filter: build one compact filter
  * over a small key set (benchmark shingles, deletion keys), broadcast
  * the single binary row, and prune a corpus-sized side map-locally
  * before the exact join.
  *
  * Values hash through xxhash64 on both faces, matching the aggregate's
  * expected input. A Bloom filter has NO false negatives, so
  * `mightContain` keeps every true match — pruned-then-exact pipelines
  * return results identical to the unpruned exact operator (false
  * positives only cost candidate width, removed by the exact verify).
  */
object Bloom {

  /** Aggregate: build a Bloom filter (binary) over the column's values.
    * `expectedItems` sizes the filter (bits ≈ items × 8 at the default
    * FPP); oversizing is cheap, undersizing raises the false-positive
    * rate but never drops a member.
    */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(c)), expectedItems)
        .toAggregateExpression())

  /** [[bloomAgg]] with an explicit bit budget, for probe-heavy uses
    * where the DEFAULT ~8 bits/item fpp (~2%) is too loose — e.g. an
    * any-of-N-shingles document gate, where per-item fpp compounds N
    * times per document. 30 bits/item gives fpp ≈ 0.62^30 ≈ 5e-7.
    * numBits above `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`
    * is silently clamped by Spark (fpp degrades, never false-negatives)
    * — GraftSession raises the cap to 1 Gib.
    */
  def bloomAggBits(c: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(c)),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
  }

  /** Membership probe against a Bloom binary (a foldable literal or a
    * scalar subquery — BloomFilterMightContain's type check rejects
    * everything else, including crossJoin attributes): false ⇒
    * definitely absent.
    */
  def mightContain(bloom: Column, c: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        ColumnBridge.expression(bloom),
        ColumnBridge.expression(xxhash64(c))))

  /** Membership probe against an EXECUTOR-BROADCAST Bloom binary, for
    * the two places the built-in faces can't go:
    *
    *  - inside a higher-order-function lambda (subquery expressions are
    *    rejected there by the analyzer), and
    *  - in a streaming micro-batch plan where a `lit(bytes)` literal
    *    would be re-serialized with every batch's plan and shipped in
    *    every task binary.
    *
    * The plan carries only the [[Broadcast]] HANDLE (a few bytes); the
    * filter payload moves once per executor over the torrent protocol
    * and deserializes once per JVM ([[BloomProbeBroadcast.filter]] is
    * transient-lazy). Interpreted-only (CodegenFallback) — irrelevant
    * inside HOFs, which Spark evaluates interpreted anyway.
    *
    * Hashes through xxhash64 like [[mightContain]], so it probes
    * [[bloomAgg]]/[[bloomAggBits]] binaries interchangeably.
    */
  def mightContainBroadcast(
      bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      c: Column): Column =
    ColumnBridge.column(
      BloomProbeBroadcast(bloom, ColumnBridge.expression(xxhash64(c))))
}

/** `mightContainLong` over a broadcast-resident Spark sketch
  * BloomFilter — see [[Bloom.mightContainBroadcast]]. Null in ⇒ null
  * out, matching BloomFilterMightContain.
  */
case class BloomProbeBroadcast(
    bytes: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types.{BooleanType, DataType}

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes.value))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe_broadcast"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeBroadcast =
    copy(child = newChild)
}
