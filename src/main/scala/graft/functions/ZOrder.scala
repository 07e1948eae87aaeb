package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two dimensions' low 32 bits into one
  * long sort key: bit i of `x` lands at bit 2i, bit i of `y` at 2i+1.
  * Rows close in BOTH dimensions are close in z, so range-partitioning
  * and sorting the write by z clusters multidimensional locality into
  * few files — parquet min/max stats then prune scans filtered on
  * EITHER dimension, where a lexicographic (x, y) sort only ever prunes
  * on the leading column. The layout trick behind Delta/Iceberg
  * Z-order clustering, here as a pure codegen'd expression.
  *
  * Contract: inputs are long-typed with meaningful values in the low
  * 32 bits (callers quantize floats/timestamps first — e.g. epoch-day,
  * bucketed price). High bits are masked off, negatives therefore wrap
  * into unsigned-32 space. Null in → null out.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "z_interleave expects two BIGINT arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spread = ctx.addNewFunction("graftZSpread",
      s"""
         |private long graftZSpread(long v) {
         |  v &= 0xFFFFFFFFL;
         |  v = (v | (v << 16)) & 0x0000FFFF0000FFFFL;
         |  v = (v | (v << 8))  & 0x00FF00FF00FF00FFL;
         |  v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL;
         |  v = (v | (v << 2))  & 0x3333333333333333L;
         |  v = (v | (v << 1))  & 0x5555555555555555L;
         |  return v;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $spread($a) | ($spread($b) << 1);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_interleave"
}

object ZOrder {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private[functions] def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  private[functions] def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Column API: z = interleave(x, y) (low 32 bits each). */
  def z(x: Column, y: Column): Column =
    ColumnBridge.column(
      ZInterleave(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Re-cluster a frame for a z-ordered write: range-partition on the
    * z key (equal-frequency boundaries from a sample, so skewed
    * dimensions still split evenly) and sort each partition by z. Write
    * the result with any sink; each output file then covers a tight z
    * range → tight min/max on BOTH source dimensions → scan pruning on
    * either. One shuffle; the sort is within-partition only.
    */
  def cluster(df: DataFrame, x: Column, y: Column,
              numPartitions: Int): DataFrame = {
    // collision-proof working name: a hardcoded "_z" would silently
    // overwrite (and then drop) a user column of the same name
    var zc = "_z"
    while (df.columns.contains(zc)) zc = zc + "_"
    df.withColumn(zc, z(x, y))
      .repartitionByRange(numPartitions, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
  }
}
