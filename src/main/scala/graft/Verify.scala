package graft

import graft.core.GraftSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev loop —
    // the driver always runs the full set)
    val only = args.lift(2).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-verify", s"local[$cpus]",
        shufflePartitions = math.max(cpus, 4)).getOrCreate())
    new java.io.File(outDir).mkdirs()
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // remove any PREVIOUS run's output first: in the reused-outDir dev
      // loop a query that starts failing would otherwise leave its old
      // parquet behind and check_oracle.py would PASS on stale data —
      // a masked regression inside the correctness gate itself
      deleteRec(new java.io.File(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      GraftSession.releaseAll(spark) // per-query storage isolation
    }
    // shared with Bench — see graft.core.JsonEscape for the control-char
    // rationale (driver json.load)
    def q(s: String): String = graft.core.JsonEscape.str(s)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
