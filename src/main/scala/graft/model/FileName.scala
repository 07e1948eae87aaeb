package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** File-name convention parsers (reference: the naming-convention heart
  * of the pipeline).
  *
  * Semantics derived from:
  *  - table-name derivation: `staging_records_ingestion/file_loader.py:288-309`
  *    (split basename on '_', keep parts that are neither all-digits nor
  *    the literal 'decrypted.json', re-join)
  *  - batch-id extraction: `staging_records_ingestion/file_loader.py:556`
  *    (second-to-last '_'-token of the path)
  *  - decrypted-name derivation: `staging_records_ingestion/file_loader.py:264,559`
  *  - SQL regexp flavor: `summary_report/file_ingestion_summary_report.sql:29`
  *
  * Two forms each: a pure Scala function (driver-side, exact reference
  * semantics — it runs once per file, not per row) and a Catalyst
  * `Column` expression (codegen'd, for per-row derivation over millions
  * of file names at scale — stays inside WholeStageCodegen, no UDF).
  */
object FileName {

  /** F1: 'patient_person_0_20250103141949_decrypted.json' -> 'patient_person'. */
  def deriveTableName(filePath: String): String = {
    val base = filePath.split('/').last
    base.split('_')
      .filter(p => !(p.nonEmpty && p.forall(_.isDigit)) && p != "decrypted.json")
      .mkString("_")
  }

  /** Destination staging table: `stg_` + derived name (file_loader.py:267). */
  def stagingTable(filePath: String): String = s"stg_${deriveTableName(filePath)}"

  /** F3: second-to-last '_'-token — the timestamp token, despite the name
    * (file_loader.py:556).
    */
  def batchId(filePath: String): String = {
    val parts = filePath.split('_')
    if (parts.length >= 2) parts(parts.length - 2) else ""
  }

  /** F4: encrypted name -> decrypted name and back (file_loader.py:264,559). */
  def decryptedName(encrypted: String): String =
    encrypted.replace(".json", "_decrypted.json")
  def encryptedName(decrypted: String): String =
    decrypted.replace("_decrypted", "")

  // ----- Column-expression flavors (distributed, codegen-friendly) -----

  /** F1/F2 as an expression: strip the '(_decrypted).json' tail, then all
    * '_<digits>' segments. Matches deriveTableName on well-formed
    * '<entity>_<n>_<ts>[_decrypted].json' names; mixed alpha-digit parts
    * (e.g. 'x_2person_y') diverge from the Python part-filter — documented
    * drift, not hit by the naming convention.
    */
  def deriveTableNameCol(file: Column): Column =
    regexp_replace(
      regexp_replace(file, "_decrypted\\.json$|\\.json$", ""),
      "_[0-9]+", "")

  def stagingTableCol(file: Column): Column =
    concat(lit("stg_"), deriveTableNameCol(file))

  /** F3 as an expression. */
  def batchIdCol(file: Column): Column =
    element_at(split(file, "_"), -2)

  /** F4 as an expression. */
  def decryptedNameCol(file: Column): Column =
    regexp_replace(file, "\\.json$", "_decrypted.json")
  def encryptedNameCol(file: Column): Column =
    regexp_replace(file, "_decrypted", "")
}
