package graft.model

import graft.SparkSpec
import graft.ingest.{Pipeline, Stages}
import graft.logs.LogStore
import graft.model.SchemaRegistry.EntityRegistry
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Config-driven entity registry: the reference adds a table by adding a
  * catalog row (`information_schema.columns` lookup,
  * file_loader.py:45-49); we add one by adding a JSON overlay entry —
  * no code change, verified end-to-end through Pipeline.run.
  */
class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val overlay =
    """{
      |  "stagingTables": ["stg_wellness_visit"],
      |  "flatPiiColumns": {"stg_wellness_visit": ["contact_phone"]},
      |  "excludedColumns": {"stg_wellness_visit": ["internal_notes"]},
      |  "entitySchemas": {"stg_wellness_visit":
      |    "id BIGINT, contact_phone STRING, internal_notes STRING, visit_date STRING"}
      |}""".stripMargin

  test("fromJson merges additively over the compiled-in defaults") {
    val reg = SchemaRegistry.fromJson(overlay)
    // novel entity appended; the 44 compiled-in tables all survive
    assert(reg.stagingTables.contains("stg_wellness_visit"))
    assert(SchemaRegistry.default.stagingTables.forall(reg.stagingTables.contains))
    // per-table maps override/extend per key
    assert(reg.flatPiiColumns("stg_wellness_visit") === Seq("contact_phone"))
    assert(reg.flatPiiColumns("stg_patient_person") ===
      SchemaRegistry.default.flatPiiColumns("stg_patient_person"))
    assert(reg.excludedColumns("stg_biometric") ===
      SchemaRegistry.biometricExcluded)
    // absent fields keep defaults
    assert(reg.nestedPiiKeys === SchemaRegistry.default.nestedPiiKeys)
    assert(reg.dsdFamilies === SchemaRegistry.default.dsdFamilies)
    // DDL schema parses to a full StructType
    assert(reg.entitySchemas("stg_wellness_visit") === StructType(Seq(
      StructField("id", LongType),
      StructField("contact_phone", StringType),
      StructField("internal_notes", StringType),
      StructField("visit_date", StringType))))
  }

  test("fromJson is strict: typos and wrong shapes throw instead of silently unmasking") {
    // misspelled key → error, not a silently ignored PII config
    intercept[IllegalArgumentException] {
      SchemaRegistry.fromJson("""{"flatPIIColumns": {"t": ["c"]}}""")
    }
    // string where an array of strings is required
    intercept[IllegalArgumentException] {
      SchemaRegistry.fromJson("""{"flatPiiColumns": {"t": "phone"}}""")
    }
    // non-string array element
    intercept[IllegalArgumentException] {
      SchemaRegistry.fromJson("""{"stagingTables": [1, 2]}""")
    }
    // invalid DDL names the offending entry
    val e = intercept[IllegalArgumentException] {
      SchemaRegistry.fromJson("""{"entitySchemas": {"t": "id NOTATYPE,"}}""")
    }
    assert(e.getMessage.contains("entitySchemas.t"))
    // top-level non-object
    intercept[IllegalArgumentException] {
      SchemaRegistry.fromJson("""["a"]""")
    }
  }

  test("nested-payload masking is config-driven and composes with flat masks") {
    val reg = SchemaRegistry.fromJson(
      """{"nestedPiiTables": {"stg_wellness_visit": "extra"},
        |  "flatPiiColumns": {"stg_wellness_visit": ["contact_phone"]}}""".stripMargin)
    val df = Seq((1L, "080111", ("note", """{"surname":"Ann","city":"X"}""")))
      .toDF("id", "contact_phone", "extra")
      .withColumn("extra", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.col("extra._1").as("type"),
        org.apache.spark.sql.functions.col("extra._2").as("value")))
    val out = Stages.entityTransforms("stg_wellness_visit", reg)(df).collect().head
    assert(out.getAs[String]("contact_phone") === Stages.Mask)
    val value = out.getAs[org.apache.spark.sql.Row]("extra").getAs[String]("value")
    assert(value.contains(Stages.Mask) && value.contains("\"city\":\"X\""))
  }

  test("load reads the overlay through the Hadoop FS API (file:// URI)") {
    val f = Files.createTempFile("graft_reg_", ".json")
    Files.writeString(f, overlay)
    val reg = SchemaRegistry.load(spark, "file://" + f.toAbsolutePath)
    assert(reg.stagingTables.contains("stg_wellness_visit"))
  }

  test("a novel entity ingests through Pipeline.run purely via config") {
    val root = Files.createTempDirectory("graft_regpipe_").toFile
    root.deleteOnExit()
    val parent = new java.io.File(root, "temp")
    val reg: EntityRegistry = SchemaRegistry.fromJson(overlay)
    val cfg = Pipeline.Config(
      parentDir = parent.getPath,
      warehouseDir = new java.io.File(root, "warehouse").getPath,
      logStore = LogStore(spark, new java.io.File(root, "logs").getPath),
      registry = reg)

    val fac = new java.io.File(parent, "FAC9")
    fac.mkdirs()
    Files.writeString(new java.io.File(fac,
      "wellness_visit_0_20250104120000_decrypted.json").toPath,
      """[{"id": 1, "contact_phone": "080111", "internal_notes": "drop me",
        | "visit_date": "2025-01-02"},
        |{"id": 2, "contact_phone": "080222", "internal_notes": "me too",
        | "visit_date": "2025-01-03"}]""".stripMargin.replace("|", ""))

    cfg.logStore.append("sync_file", Seq(
      (1L, "FAC9", "wellness_visit_0_20250104120000.json",
        "wellness_visit_0_20250104120000_decrypted.json", SyncState.Ready,
        Timestamp.valueOf("2025-02-01 00:00:00"),
        Timestamp.valueOf("2025-02-01 10:00:00"),
        null.asInstanceOf[Timestamp], null.asInstanceOf[Timestamp],
        null.asInstanceOf[String], null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[Integer],
        null.asInstanceOf[String])
    ).toDF("id", "facility_id", "file_name", "decrypted_file_name",
      "processed", "create_date", "modified_date", "ingest_start_time",
      "ingest_end_time", "ingest_file_name", "ingest_table_name",
      "ingest_status_check", "json_rec_count", "ingest_error_message"))

    val res = Pipeline.run(spark, cfg)
    assert(res.filesIngested === 1 && res.recordsIngested === 2)

    val stg = spark.read.parquet(s"${cfg.warehouseDir}/stg_wellness_visit")
      .orderBy("id").collect()
    assert(stg.length === 2)
    // config-driven flat PII mask applied
    assert(stg.forall(_.getAs[String]("contact_phone") === Stages.Mask))
    // config-driven column exclusion applied
    assert(!spark.read.parquet(s"${cfg.warehouseDir}/stg_wellness_visit")
      .columns.contains("internal_notes"))
  }

  test("typed read uses the config-loaded schema (readEntityBatch)") {
    val reg = SchemaRegistry.fromJson(overlay)
    val dir = Files.createTempDirectory("graft_regread_").toFile
    Files.writeString(new java.io.File(dir, "wv.json").toPath,
      """[{"id": 5, "contact_phone": "1", "internal_notes": "n",
        | "visit_date": "2025-01-02"}]""".stripMargin.replace("|", ""))
    val df = graft.ingest.JsonSource.readEntityBatch(spark,
      reg.entitySchemas("stg_wellness_visit"),
      Seq(new java.io.File(dir, "wv.json").getPath))
    assert(df.schema("id").dataType === LongType)
    assert(df.select("id").as[Long].collect().toSeq === Seq(5L))
  }
}
