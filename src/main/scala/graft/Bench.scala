package graft

import graft.core.GraftSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * A failing query reports {"err": "..."} instead of a fake timing
  * (round-1 verdict: a swallowed Throwable must never look like a fast
  * success).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-bench", s"local[$cpus]",
        shufflePartitions = math.max(cpus, 4)).getOrCreate())

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    // untimed warm-ups: JVM/codegen/reader startup otherwise lands
    // entirely on the alphabetically-first query of each path — entry()
    // warms the parquet/join path, a smallest-SF ingest run warms the
    // JSON-read + LogStore control-plane path
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    try SparkEntry.queries("q_pipeline_ingest_e2e")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    GraftSession.releaseAll(spark)

    // stable ordering for readable diffs between rounds; storage released
    // between queries (outside the timed region) so each timing is
    // independent of what the alphabetically-earlier queries left cached
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300)) }
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSession.releaseAll(spark)
      (name, sec, outcome)
    }
    val qs = results.map {
      case (k, v, None) => s""""${esc(k)}":$v"""
      case (k, _, Some(err)) => s""""${esc(k)}":{"err":"${esc(err)}"}"""
    }.mkString("{", ",", "}")
    val ok = results.filter(_._3.isEmpty)
    val total = ok.map(_._2).sum
    val nErr = results.count(_._3.nonEmpty)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nErr,"sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
