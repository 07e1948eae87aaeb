package graft

import graft.core.GraftSession

/** Dev tool: dump formatted physical plans for registered queries so the
  * scan pushdown (PushedFilters/ReadSchema), join strategies (broadcast
  * vs shuffle), and WholeStageCodegen spans can be audited.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  * With no names, explains a representative subset.
  */
object Explain {
  private val defaults = Seq(
    "q_s3_worklist_scan", "q_p1_column_exclusion", "q_j2_anti_join",
    "q_j4_semi_in_chain", "q_w1_rownumber_dedup", "q_o1_orderby_limit",
    "q_llm_minhash_sig", "q_llm_near_dup", "q_ann_cosine_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else defaults
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-explain", "local[4]", 4).getOrCreate())
    names.foreach {
      case "entry" =>
        println("\n========== entry (flagship smoke) ==========")
        val df = SparkEntry.entry(spark)
        df.explain("formatted")
        println(s"entry rows: ${df.count()}")
      case n =>
        SparkEntry.queries.get(n) match {
          case Some(fn) =>
            println(s"\n========== $n ==========")
            fn(spark, sfDir).explain("formatted")
          case None => println(s"unknown query: $n")
        }
    }
    spark.stop()
  }
}
