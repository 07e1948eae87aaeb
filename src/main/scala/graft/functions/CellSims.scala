package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Cosine similarities of one vector against a DRIVER-SIDE centroid
  * group, in one primitive loop — the per-row kernel behind the
  * literal-quantizer assignment in [[graft.llm.Ivf]].
  *
  * `table` maps a group id (level-1 cell for the two-level leaf
  * assign, 0 for a flat quantizer) to its entries
  * `(cell, centroid, cn)`, cn being the centroid's precomputed
  * l2 norm. For a row `(vec, grp)` the result is
  * `struct(cells: array<int>, sims: array<double>)` where
  * `sims[j] = Σ vec[i]·c_j[i] / (‖vec‖ · cn_j)` — every fold
  * left-to-right in double exactly like the
  * `aggregate(zip_with(...))` built-in formulation it replaces
  * (IvfSpec determinism tests pin the parity), so the downstream
  * round(sim, 9) + lowest-cell argmax sees bit-identical inputs.
  *
  * Null semantics mirror the HOF path: null vector or null element →
  * null; a centroid whose length mismatches the vector → that entry's
  * sim is null; a group id absent from the table → null.
  *
  * Why an expression and not `aggregate` over a typedLit table: HOF
  * lambdas evaluate interpreted per ELEMENT and re-evaluate embedded
  * subtrees per reference — measured 13× slower than the broadcast-
  * join assign it was meant to replace. This kernel is one compiled
  * k·d loop per row; the argmax stays in (cheap, scalar) SQL so the
  * round/tiebreak semantics are Spark's own, not a reimplementation.
  */
case class CellSims(left: Expression, right: Expression,
                    table: Map[Int, IndexedSeq[(Int, IndexedSeq[Double], Double)]])
  extends BinaryExpression with CodegenFallback {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (vecOk(left.dataType) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cell_sims expects (array<float>|array<double>, int), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cells", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("sims", ArrayType(DoubleType, containsNull = true),
      nullable = false)))

  override def nullable: Boolean = true

  // eval-ready form: shared immutable cell-id ArrayData + primitive
  // centroid arrays per group (the case-class field keeps IndexedSeq
  // so equals/hashCode stay structural for plan canonicalization)
  @transient private lazy val compiled
      : Map[Int, (GenericArrayData, Array[Array[Double]], Array[Double])] =
    table.map { case (g, entries) =>
      g -> (new GenericArrayData(entries.map(_._1).toArray),
        entries.map(_._2.toArray).toArray,
        entries.map(_._3).toArray)
    }

  override protected def nullSafeEval(vecAny: Any, grpAny: Any): Any = {
    compiled.get(grpAny.asInstanceOf[Int]) match {
      case None => null
      case Some((cellsAd, cents, cns)) =>
        val v = vecAny.asInstanceOf[ArrayData]
        val n = v.numElements()
        var i = 0
        while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
        val x = new Array[Double](n)
        val isF = elemType == FloatType
        i = 0
        while (i < n) {
          x(i) = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
          i += 1
        }
        var vnAcc = 0.0
        i = 0
        while (i < n) { vnAcc += x(i) * x(i); i += 1 }
        val vn = math.sqrt(vnAcc)
        val k = cents.length
        val sims = new Array[Any](k)
        var j = 0
        while (j < k) {
          val c = cents(j)
          if (c.length != n) sims(j) = null
          else {
            var s = 0.0
            var t = 0
            while (t < n) { s += x(t) * c(t); t += 1 }
            sims(j) = s / (vn * cns(j))
          }
          j += 1
        }
        InternalRow(cellsAd, new GenericArrayData(sims))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cell_sims"
}

object CellSims {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API. */
  def sims(vec: Column, grp: Column,
           table: Map[Int, IndexedSeq[(Int, IndexedSeq[Double], Double)]]): Column =
    ColumnBridge.column(CellSims(
      ColumnBridge.expression(vec), ColumnBridge.expression(grp), table))
}
