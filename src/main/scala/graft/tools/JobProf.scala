package graft.tools

import graft.core.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-Spark-job profile of a single registered query: prints every
  * job's wall ms and submitting call site so fixture-heavy closures
  * can be attributed line by line (guide §1: measure first).
  *
  *   runMain graft.tools.JobProf <query_name> <sfDir> [reps]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-jobprof", s"local[$cpus]",
        shufflePartitions = math.max(cpus, 4)).getOrCreate())
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (collecting && s != null)
          println(f"  job ${je.jobId}%4d ${(System.nanoTime() - s._1) / 1e6}%8.1f ms  ${s._2}")
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      collecting = r == reps // profile only the last (warm) rep
      val t0 = System.nanoTime()
      val frame = fn(spark, sfDir)
      val tMid = System.nanoTime()
      val n = frame.count()
      val tEnd = System.nanoTime()
      // give listener events a beat to drain before the summary line
      Thread.sleep(300)
      println(f"$name rep$r: total ${(tEnd - t0) / 1e9}%.3f s (setup ${(tMid - t0) / 1e9}%.3f, query ${(tEnd - tMid) / 1e9}%.3f, $n rows)")
      GraftSession.releaseAll(spark)
    }
    spark.stop()
  }
}
