package graft.ingest

import graft.SparkSpec
import graft.logs.LogStore
import graft.model.SyncState
import java.sql.Timestamp

class FacilityBatchesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sync = Seq(
    (1L, "FAC1", "a.json", SyncState.Ready, ts("2025-01-01 10:00:00")),
    (2L, "FAC1", "b.json", SyncState.Ready, ts("2025-01-01 11:00:00")),
    (3L, "FAC2", "c.json", SyncState.Ready, ts("2025-01-01 12:00:00")),
    (4L, "FAC3", "d.json", SyncState.Ingested, ts("2025-01-01 13:00:00"))
  ).toDF("id", "facility_id", "file_name", "processed", "modified_date")

  test("seed: pending counts per facility over the capped slice, UNPROCESSED") {
    val seeded = FacilityBatches.seedBatches(sync)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(seeded === Map(
      "FAC1" -> (2, "UNPROCESSED"), "FAC2" -> (1, "UNPROCESSED")))
  }

  test("seed honors the slice cap (reference LIMIT 50 → here LIMIT 2)") {
    val seeded = FacilityBatches.seedBatches(sync, sliceCap = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // earliest two sync rows are both FAC1
    assert(seeded === Map("FAC1" -> 2))
  }

  test("claim + ack round trip through the LogStore claim table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fb_").toFile
    val store = LogStore(spark, dir.getPath)
    store.append("batch_facility_processing", FacilityBatches.seedBatches(sync))
    val view = store.latest("batch_facility_processing", Seq("facility_id"))
    val claimed = FacilityBatches.claim(view, batchSize = 1).collect()
    assert(claimed.length === 1 && claimed.head.getString(0) === "FAC1")

    FacilityBatches.ack(store, "batch_facility_processing", view, "FAC1", ok = true)
    val after = store.latest("batch_facility_processing", Seq("facility_id"))
    val status = after.collect().map(r =>
      r.getAs[String]("facility_id") -> r.getAs[String]("status")).toMap
    assert(status("FAC1") === "PROCESSED")
    assert(status("FAC2") === "UNPROCESSED")
    // next claim skips the acked facility
    val next = FacilityBatches.claim(after).collect().map(_.getString(0))
    assert(next.toSeq === Seq("FAC2"))
  }
}
