package graft.ops

/** Shared DuckDB-dialect oracle fragments. Cross-engine determinism
  * hangs on these staying byte-identical wherever they appear — one
  * home, not per-file private copies (r12 review finding).
  */
object OracleSql {

  /** 16-bit bucket from a precomputed md5 hex column/expression — the
    * DuckDB face of [[graft.llm.Sampling.hashBucket]]'s digit
    * arithmetic over an already-hashed value (composite keys hash once
    * in their own CTE, then feed this).
    */
  def bktFromHex(hex: String): String =
    s"""((strpos('0123456789abcdef', substr($hex, 1, 1)) - 1) * 4096
       | + (strpos('0123456789abcdef', substr($hex, 2, 1)) - 1) * 256
       | + (strpos('0123456789abcdef', substr($hex, 3, 1)) - 1) * 16
       | + (strpos('0123456789abcdef', substr($hex, 4, 1)) - 1))""".stripMargin

  /** Bucket of a raw id expression: md5 applied in place (repeats the
    * hash sub-expression four times — DuckDB CSE collapses it; prefer
    * [[bktFromHex]] with a hashed CTE column when composing keys).
    */
  def duckBucket(idExpr: String): String =
    bktFromHex(s"md5(CAST($idExpr AS VARCHAR))")
}
