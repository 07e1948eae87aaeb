package graft.tools

import graft.core.GraftSession

/** Time a single registered query without the full Bench sweep:
  *   runMain graft.tools.QTime <query_name> <sfDir> [reps]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-qtime", "local[32]", shufflePartitions = 32)
        .getOrCreate())
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"$name rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
