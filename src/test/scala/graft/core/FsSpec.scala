package graft.core

import graft.SparkSpec

class FsSpec extends SparkSpec {

  test("broadcastConf carries session hadoop conf keys into tasks") {
    // Object-store deployments set credentials/endpoints on the SESSION
    // hadoop conf; the distributed FS loops (Pipeline existence probes,
    // Maintenance.deleteFiles) must see them inside tasks — a default
    // Configuration() there would silently drop every override.
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "xyz")
    try {
      val bc = Fs.broadcastConf(spark)
      val seen = spark.sparkContext.parallelize(1 to 8, 4)
        .map(_ => bc.value.value.get("graft.test.marker", "MISSING"))
        .collect()
      assert(seen.toSet === Set("xyz"))
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.marker")
  }

  test("readText returns None for a missing path instead of throwing") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files.createTempDirectory("fs_spec").toFile
    assert(Fs.readText(s"${dir.getPath}/nope/_marker", conf) === None)
    Fs.writeText(s"${dir.getPath}/_marker", "42", conf)
    assert(Fs.readText(s"${dir.getPath}/_marker", conf) === Some("42"))
    // delete between a reader's hypothetical exists() and open() — the
    // open-and-catch contract means a racing reader sees None, not FNF
    Fs.delete(s"${dir.getPath}/_marker", conf)
    assert(Fs.readText(s"${dir.getPath}/_marker", conf) === None)
  }
}
