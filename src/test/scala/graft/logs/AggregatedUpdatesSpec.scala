package graft.logs

import graft.SparkSpec

class AggregatedUpdatesSpec extends SparkSpec {
  import spark.implicits._

  test("S13: patient counts per facility, archived excluded, distinct uuids") {
    val staging = Seq(
      ("FAC1", "u1", 0), ("FAC1", "u1", 0), // duplicate uuid counts once
      ("FAC1", "u2", 0),
      ("FAC1", "u3", 1),                    // archived → excluded
      ("FAC2", "u9", 0)
    ).toDF("stg_datim_id", "uuid", "archived")
    val counts = AggregatedUpdates.patientCounts(staging)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(counts === Map("FAC1" -> 2, "FAC2" -> 1))
    // DSD flavor: no archived filter (dsd_loader.py:215-218)
    val dsd = AggregatedUpdates.patientCounts(staging, archivedFilter = false)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dsd === Map("FAC1" -> 3, "FAC2" -> 1))
  }

  test("S13: refresh touches only aggregated facilities") {
    val mapping = Seq(
      ("FAC1", 10, "ip_a"), ("FAC2", 20, "ip_b"), ("FAC3", 30, "ip_c")
    ).toDF("datim_id", "patient_count", "ip_name")
    val counts = Seq(("FAC1", 2)).toDF("datim_id", "patient_count")
    val out = AggregatedUpdates.refreshPatientCounts(mapping, counts)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out === Map("FAC1" -> 2, "FAC2" -> 20, "FAC3" -> 30))
  }
}
