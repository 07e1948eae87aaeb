package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact membership overlap of a string-array column against an
  * EXECUTOR-BROADCAST string set — the hash-set form of
  * `arrays_overlap(arr, lit(benchArray))` for a big static side.
  *
  * `arrays_overlap` rebuilds a hash set from the SHORTER side per row
  * and then walks the LONGER side, so a 5k+-shingle benchmark array
  * made every document pay a full benchmark scan (measured: the
  * q_stream_curation decontamination stage at 28 M probes/run). This
  * probe holds the set once per executor (broadcast, like
  * [[BloomProbeBroadcast]]) and walks only the ROW's elements —
  * per-row cost |doc shingles|, not |benchmark|. Exact, no false
  * positives — this is the exact face, the Bloom sketch face stays
  * for past-broadcast-size sets.
  *
  * Null semantics mirror ArraysOverlap with a null-free set side:
  * null array → null; any common element → true; no common element
  * but a null element present → null; else false.
  */
case class SetOverlapBroadcast(
    bytes: Broadcast[Array[Array[Byte]]],
    child: Expression)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](bytes.value.length * 2)
    bytes.value.foreach(b => s.add(UTF8String.fromBytes(b)))
    s
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"set_overlap_broadcast needs array<string>, got ${dt.sql}")
    }
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "set_overlap_broadcast"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sawNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true
      else if (set.contains(arr.getUTF8String(i))) return true
      i += 1
    }
    if (sawNull) null else false
  }

  override protected def withNewChildInternal(
      newChild: Expression): SetOverlapBroadcast =
    copy(child = newChild)
}

object SetProbe {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: any element of `arr` present in the broadcast set. */
  def overlapBroadcast(bc: Broadcast[Array[Array[Byte]]],
                       arr: Column): Column =
    ColumnBridge.column(
      SetOverlapBroadcast(bc, ColumnBridge.expression(arr)))
}
