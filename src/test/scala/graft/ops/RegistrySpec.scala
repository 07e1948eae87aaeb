package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: SparkEntry merges seven Map literals — a
  * duplicated query name (within one file or across files) would
  * silently collapse to one entry and drop an oracle from the
  * correctness gate. Scala can't see duplicate Map keys at compile
  * time, so this spec counts the `"q_…" -> Q` registrations in the
  * SOURCE text and requires the merged registry to have exactly that
  * many entries.
  */
class RegistrySpec extends AnyFunSuite {

  test("every source-registered query name survives the registry merge") {
    val opsDir = new java.io.File("src/main/scala/graft/ops")
    assume(opsDir.isDirectory, s"ops source dir not found at ${opsDir.getAbsolutePath}")
    val reg = "\"(q_[a-z0-9_]+)\"\\s*->\\s*Q".r
    val sourceNames = opsDir.listFiles().filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        reg.findAllMatchIn(text).map(_.group(1)).toSeq
      }.toSeq
    val dups = sourceNames.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query registrations: $dups")
    val registered = graft.SparkEntry.queries.keySet
    assert(registered === sourceNames.toSet,
      s"registry/source mismatch: missing=${sourceNames.toSet -- registered} " +
        s"extra=${registered -- sourceNames.toSet}")
  }

  test("every oracle key is a registered query") {
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(
      graft.SparkEntry.queries.keySet))
  }

  /** Growth guard: a new query must ship WITH its DuckDB oracle — the
    * correctness gate only covers what has one. Spark-only entries are
    * sanctioned individually here, each with a reason and a named spec
    * that covers it instead; additions to this set should be rare and
    * deliberate, not a side effect of skipping oracle work.
    */
  test("every registered query has an oracle, except the sanctioned spark-only set") {
    // (r9: q_a13_approx_distinct left this set — its HLL estimate is
    // now oracle-checked as an integer-exact 3σ tolerance assertion
    // against the exact distinct, hash-comparable in DuckDB.)
    val sanctioned = Set.empty[String]
    val noOracle = graft.SparkEntry.queries.keySet --
      graft.SparkEntry.oracleSql.keySet
    assert(noOracle === sanctioned,
      s"unsanctioned oracle-less queries: ${noOracle -- sanctioned}; " +
        s"stale sanctions: ${sanctioned -- noOracle}")
  }
}
