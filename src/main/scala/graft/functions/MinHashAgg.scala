package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash sketch: for each permutation i in 1..n,
  * tracks min over input strings of md5("<i>|" + s), as a single
  * 16·n-byte mutable buffer.
  *
  * Semantically identical to the pure-column formulation
  * `min(md5(concat(lit("i|"), col)))` ×n (DedupOpsSpec asserts parity;
  * the DuckDB oracle validates it end-to-end) but one aggregate instead
  * of n: one reused MessageDigest per partition, one byte-array buffer
  * instead of n UTF8String min-buffers, no per-row hex encoding —
  * hex materializes once per group at eval. Hex comparison equals byte
  * comparison (the nibble→'0'-'f' map is monotonic), so byte-wise
  * unsigned-lexicographic min gives exactly the same winner as the
  * column version's string min.
  *
  * Runs under ObjectHashAggregate (TypedImperativeAggregate is not
  * whole-stage-codegen'd); the md5 work dominates either way and is
  * ~n× cheaper here.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val DigestLen = 16
  private def bufLen = DigestLen * numHashes

  // fail at ANALYSIS, not mid-task: a non-string child would otherwise
  // ClassCastException on every executor after the shuffle is paid for,
  // and a non-positive numHashes would crash buffer creation (or
  // silently null every group at 0). VecDot/ZInterleave in this package
  // set the same precedent.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs needs a string column, got ${child.dataType.sql}")
    else if (numHashes < 1)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs needs numHashes >= 1, got $numHashes")
    else TypeCheckResult.TypeCheckSuccess
  }

  // ThreadLocal digest (r14 advice): per-task deserialization gives
  // each task its own instance today, but a shared plan fragment
  // evaluated concurrently would silently corrupt one cached digest
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (1 to numHashes).map(i => s"$i|".getBytes("UTF-8")).toArray

  override def createAggregationBuffer(): Array[Byte] =
    Array.fill[Byte](bufLen)(-1) // 0xFF.. = +inf for unsigned-lex min

  private def isLess(cand: Array[Byte], buf: Array[Byte], off: Int): Boolean =
    isLessAt(cand, 0, buf, off)

  // dual-offset compare so merge() needs no per-slot copyOfRange
  private def isLessAt(a: Array[Byte], aOff: Int,
                       b: Array[Byte], bOff: Int): Boolean = {
    var i = 0
    while (i < DigestLen) {
      val x = a(aOff + i) & 0xff
      val y = b(bOff + i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val dig = md.get()
      var h = 0
      while (h < numHashes) {
        dig.reset()
        dig.update(seedPrefixes(h))
        dig.update(bytes)
        val d = dig.digest()
        if (isLess(d, buffer, h * DigestLen))
          System.arraycopy(d, 0, buffer, h * DigestLen, DigestLen)
        h += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var h = 0
    while (h < numHashes) {
      val off = h * DigestLen
      if (isLessAt(other, off, buffer, off))
        System.arraycopy(other, off, buffer, off, DigestLen)
      h += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    // all-0xFF in every slot = no non-null input → null (matches min())
    if (buffer.forall(_ == -1)) return null
    val hex = "0123456789abcdef"
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      val sb = new java.lang.StringBuilder(DigestLen * 2)
      var i = 0
      while (i < DigestLen) {
        val b = buffer(h * DigestLen + i) & 0xff
        sb.append(hex.charAt(b >>> 4)).append(hex.charAt(b & 0xf))
        i += 1
      }
      out(h) = UTF8String.fromString(sb.toString)
      h += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "minhash_sigs"
}

object MinHashAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: array of n minhash hex signatures for the group. */
  def minhashSigs(c: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(c), numHashes).toAggregateExpression())
}
