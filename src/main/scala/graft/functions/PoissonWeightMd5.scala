package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Poisson(1) bootstrap weight from a composite-key string —
  * the per-(id, replicate) kernel behind
  * [[graft.llm.Bootstrap.replicateStats]]. Semantically identical to
  *
  *   poissonWeight(conv(substring(md5(key), 1, 4), 16, 10))
  *
  * (BootstrapSpec pins parity): the 16-bit bucket is the first two
  * md5 bytes big-endian — exactly the first 4 hex digits — and the
  * weight is the index of the first threshold above the bucket. One
  * reused MessageDigest per task, no hex string materialization, no
  * conv() parse, no 13-arm CASE chain — the md5-per-pair term that
  * dominated the rows×replicates resample pass (measured: 20 M pairs
  * for q_boot_ratio_ci at sf0.1) shrinks to its irreducible digest.
  *
  * Null in → null out (the column form is also null-propagating).
  */
case class PoissonWeightMd5(child: Expression, thresholds: IndexedSeq[Long])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType && thresholds.nonEmpty)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poisson_weight_md5 needs a string key and thresholds, got ${child.dataType.sql}")
  }

  override def dataType: DataType = LongType

  // ThreadLocal, not a plain cached instance: per-task deserialization
  // gives each task its own expression tree today, but a shared plan
  // fragment (reused references array) evaluating the same instance
  // from two threads would silently corrupt a single digest (r14
  // advice). One digest per (thread, expression) keeps the reuse win.
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(key: Any): Any = {
    val d = md.get().digest(key.asInstanceOf[UTF8String].getBytes)
    val bucket = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    var k = 0
    while (k < thresholds.length && bucket >= thresholds(k)) k += 1
    k.toLong
  }

  override protected def withNewChildInternal(
      newChild: Expression): PoissonWeightMd5 =
    copy(child = newChild)

  override def prettyName: String = "poisson_weight_md5"
}

object PoissonWeightMd5 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: Poisson(1) weight of the composite key. */
  def weight(key: Column, thresholds: Seq[Long]): Column =
    ColumnBridge.column(PoissonWeightMd5(
      ColumnBridge.expression(key), thresholds.toIndexedSeq))
}
