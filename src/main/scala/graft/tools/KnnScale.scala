package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Scale probe for the kNN-graph family: times [[graft.llm.Ivf.knnGraph]]
  * under (a) a FIXED k=16 fit — the q_ann_knn_graph correctness-face
  * parameters, whose candidate volume grows n²/k; (b) the
  * [[graft.llm.Ivf.fitForCellSize]] fit that holds cell size constant
  * but re-pays n·k in Lloyd assign; and (c) `two` — the
  * [[graft.llm.Ivf.fitTwoLevel]] sample-trained two-level path whose
  * per-vector index work is O(√k), the 100 TB posture.
  * Ledger evidence for the COVERAGE.md sf1.0/sf10 sections:
  *
  *   runMain graft.tools.KnnScale /root/repo/tmp/sf1.0 fixed
  *   runMain graft.tools.KnnScale /root/repo/tmp/sf1.0 sized
  *   runMain graft.tools.KnnScale /root/repo/tmp/sf10 two
  */
object KnnScale {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("two")
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-knnscale", "local[32]", shufflePartitions = 32)
        .getOrCreate())
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val t0 = System.nanoTime()
      def timeGraph(mk: => org.apache.spark.sql.DataFrame,
                    unpersist: () => Unit): Unit = {
        val tFit = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val rows = mk.count()
        val tGraph = (System.nanoTime() - t1) / 1e9
        println(f"knnScale mode=$mode n=$n fit=$tFit%.2fs graph=$tGraph%.2fs rows=$rows")
        unpersist()
      }
      mode match {
        case "two" =>
          val index = graft.llm.Ivf.fitTwoLevel(emb, "vec_id", "embedding",
            targetCellSize = 128, iters = 2)
          timeGraph(graft.llm.Ivf.knnGraph(emb, index, "vec_id", "embedding",
            kNeighbors = 3, nprobe = 2, nprobe1 = 2), () => index.unpersist())
        case "fixed" =>
          val index = graft.llm.Ivf.fit(emb, "vec_id", "embedding",
            k = 16, iters = 2)
          timeGraph(graft.llm.Ivf.knnGraph(emb, index, "vec_id", "embedding",
            kNeighbors = 3, nprobe = 2), () => index.unpersist())
        case _ =>
          val index = graft.llm.Ivf.fitForCellSize(emb, "vec_id", "embedding",
            targetCellSize = 128, iters = 2)
          timeGraph(graft.llm.Ivf.knnGraph(emb, index, "vec_id", "embedding",
            kNeighbors = 3, nprobe = 2), () => index.unpersist())
      }
    } finally spark.stop()
  }
}
