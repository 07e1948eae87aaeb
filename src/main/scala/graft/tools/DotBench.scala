package graft.tools

import graft.core.GraftSession
import graft.llm.Ann
import org.apache.spark.sql.functions._

/** A/B micro-bench: native VecDot vs the zip_with/aggregate HOF on the
  * cosine-scoring join shape (|Q|·|C| pairs). Run:
  *   runMain graft.tools.DotBench <sfDir> [nQueries]
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-dotbench", "local[32]", shufflePartitions = 32)
        .getOrCreate())
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    emb.count()
    val q = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then 3 timed reps
      mk.count()
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-8s min=${reps.min}%.3f s  reps=${reps.map(r => f"$r%.3f").mkString(",")}")
    }
    val pairs = c.join(broadcast(q), col("q_id") =!= col("c_id"))
    time("native") {
      pairs.select(sum(Ann.dotNative(col("q_vec"), col("c_vec"))).as("s"))
    }
    time("hof") {
      pairs.select(sum(Ann.dot(col("q_vec"), col("c_vec"))).as("s"))
    }
    spark.stop()
  }
}
