package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FileNameSpec extends SparkSpec {

  test("F1: derives table name from decrypted file name") {
    assert(FileName.deriveTableName("patient_person_0_20250103141949_decrypted.json")
      === "patient_person")
    assert(FileName.stagingTable("patient_person_0_20250103141949_decrypted.json")
      === "stg_patient_person")
  }

  test("F1: drops every all-digit part, keeps mixed parts") {
    assert(FileName.deriveTableName("hiv_art_clinical_12_0_987_decrypted.json")
      === "hiv_art_clinical")
    // digits inside an alpha part survive (reference isdigit() semantics)
    assert(FileName.deriveTableName("hts2_client_1_2_decrypted.json")
      === "hts2_client")
  }

  test("F1: handles a full path (basename only)") {
    assert(FileName.deriveTableName("/srv/temp/FAC1/biometric_3_20240101_decrypted.json")
      === "biometric")
  }

  test("F3: batch id is the second-to-last underscore token") {
    assert(FileName.batchId("patient_person_0_20250103141949_decrypted.json")
      === "20250103141949")
  }

  test("F4: decrypted/encrypted name round trip") {
    val enc = "patient_person_0_20250103141949.json"
    val dec = FileName.decryptedName(enc)
    assert(dec === "patient_person_0_20250103141949_decrypted.json")
    assert(FileName.encryptedName(dec) === enc)
  }

  test("column expressions agree with the pure functions on convention names") {
    import spark.implicits._
    val names = Seq(
      "patient_person_0_20250103141949_decrypted.json",
      "hiv_art_clinical_12_0_987_decrypted.json",
      "biometric_3_20240101_decrypted.json",
      "prep_eligibility_7_20231231235959_decrypted.json")
    val df = names.toDF("f")
    val got = df.select(
      FileName.deriveTableNameCol(col("f")).as("t"),
      FileName.batchIdCol(col("f")).as("b"),
      col("f")).collect()
    got.foreach { r =>
      assert(r.getString(0) === FileName.deriveTableName(r.getString(2)))
      assert(r.getString(1) === FileName.batchId(r.getString(2)))
    }
  }
}
