package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: symmetric per-vector int8, the storage/
  * bandwidth face of similarity search. A 100 TB corpus's float32
  * embedding column shrinks 4x (plus the per-vector scale), which is
  * routinely the difference between an ANN index that fits executor
  * memory and one that doesn't; candidate scoring then runs on int8
  * dot products and only the final re-rank touches float vectors.
  *
  * All pure column algebra over the array column (aggregate/transform
  * HOFs) — a single map-side pass, no shuffle, no UDF. Arithmetic is
  * pinned to double (`CAST(x AS DOUBLE)` before any op) with
  * `floor(x + 0.5)` rounding so every engine computes bit-identical
  * quantized codes (IEEE doubles + floor agree everywhere; `round()`
  * half-even/half-up conventions do not).
  */
object Quant {

  /** Max |component| as a double; 0.0 for empty vectors. HOF note: pass
    * attribute columns only (lambdas re-evaluate embedded expressions
    * per element — see TextAnalysis.shingles).
    */
  def absMax(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Quantized codes in [-127, 127]: q_i = floor(v_i * 127 / amax + 0.5)
    * (half-up, computed in double). All-zero vectors (amax = 0) map to
    * all-zero codes rather than dividing by zero.
    */
  def quantize(vec: Column, amax: Column): Column =
    when(amax > 0d,
      transform(vec, x =>
        floor(x.cast("double") * lit(127.0d) / amax + lit(0.5d)).cast("int")))
      .otherwise(transform(vec, x => lit(0)))

  /** Reconstructed doubles: q_i * amax / 127. */
  def dequantize(qvec: Column, amax: Column): Column =
    transform(qvec, q => q.cast("double") * amax / lit(127.0d))

  /** Attach `qvec` (array<int> codes) and `amax` (double, per-vector
    * scale) to the frame. One projection pass; `amax` is materialized
    * as a real column BEFORE the transform lambda references it, so the
    * interpreted HOF body only touches attributes.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("amax", absMax(col(vecCol)))
      .withColumn("qvec", quantize(col(vecCol), col("amax")))

  /** Integer dot product of two code arrays — the int8 ANN scoring
    * primitive (exact integer arithmetic, engine-portable).
    */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)
}
