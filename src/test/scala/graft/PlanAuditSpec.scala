package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Plan audits — the scan-level properties the 100 TB design depends
  * on, asserted as tests so a regression in an operator's
  * projection/filter shape fails the build rather than silently reading
  * whole rows at scale:
  *  - column pruning must reach the parquet reader (`ReadSchema` carries
  *    only the referenced columns);
  *  - filters must reach the source (`PushedFilters` non-empty for
  *    pushable predicates).
  */
class PlanAuditSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("langId's documents scan prunes to (doc_id, text)") {
    val docs = Tables(spark, sfDir).documents
    val plan = planOf(graft.llm.TextAnalysis.langId(docs, "doc_id", "text"))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected a 2-column pruned scan:\n$plan")
  }

  test("a source-filtered projection pushes the filter into the scan") {
    val docs = Tables(spark, sfDir).documents
    val plan = planOf(
      docs.filter(col("source") === "web").select("doc_id"))
    assert(plan.contains("PushedFilters: [IsNotNull(source), EqualTo(source,web)]"),
      s"expected the equality pushed to the reader:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"expected only (doc_id, source) read:\n$plan")
  }

  test("an aggregate over two lineitem columns reads exactly those columns") {
    val li = Tables(spark, sfDir).lineitem
    val plan = planOf(
      li.groupBy("l_returnflag").agg(sum("l_quantity").as("q")))
    assert(plan.contains("ReadSchema: struct<l_quantity:") &&
      plan.contains("l_returnflag:string"),
      s"expected a 2-column pruned scan:\n$plan")
    assert(!plan.contains("l_extendedprice"),
      s"unreferenced columns must not be read:\n$plan")
  }

  test("rareTokenProfile reads only (doc_id, text); join is aggregation-shaped") {
    val docs = Tables(spark, sfDir).documents
    val plan = planOf(
      graft.llm.TextAnalysis.rareTokenProfile(docs, "doc_id", "text"))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected a 2-column pruned scan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
