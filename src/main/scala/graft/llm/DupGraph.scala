package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup PAIRS (DedupOps.nearDupPairs,
  * embeddingNearDups, ...) are only half of dedup — a usable training
  * corpus needs each doc mapped to its duplicate CLUSTER and one
  * canonical representative kept per cluster. The pair graph's clusters
  * are its connected components.
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with its own id; each round does
  *   (1) spread:   comp(v) ← min(comp(v), min over neighbors comp(u))
  *   (2) shortcut: comp(v) ← comp(comp(v))
  * Step 2 is the classic path-halving trick: labels chase the component
  * minimum through the LABEL graph, not the edge graph, so convergence
  * is O(log n) rounds even on a path graph — plain propagation is
  * O(diameter), which on a 100 TB corpus with chained near-dups (doc A ~
  * B ~ C ~ ...) is unbounded. Each round is two shuffles (neighbor-min
  * aggregate + label self-join), both on the id key.
  *
  * Scale notes: label state is one (id, component) row per VERTEX OF THE
  * PAIR GRAPH — near-dup vertices only, typically a small fraction of
  * the corpus; unpaired docs never enter the iteration and are attached
  * as singletons afterwards (dupClusters). Lineage is truncated per
  * round with an eager localCheckpoint (same reason as Ivf.fit: the
  * round-i plan must not re-execute rounds 1..i-1), and convergence is
  * detected by the label-sum invariant — labels only ever decrease, so
  * sum(comp) is strictly decreasing until the fixpoint; one cheap
  * aggregate per round, no changed-row join.
  */
object DupGraph {

  /** Connected components of the undirected pair graph. Input: one row
    * per edge (src, dst). Output: (id, component) for every endpoint,
    * component = min id reachable. Deterministic for any partitioning.
    */
  def connectedComponents(edges: DataFrame, src: String = "id1",
                          dst: String = "id2", maxIter: Int = 20): DataFrame = {
    // materialize the edge list ONCE before fanning out: the union below
    // references it twice and every round joins it — without the eager
    // checkpoint an expensive upstream DAG (e.g. the whole MinHash-LSH
    // near-dup pipeline) would execute once per reference
    val e = edges.select(col(src).as("a"), col(dst).as("b"))
      .localCheckpoint(true)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .groupBy(col("a")).agg(min("component").as("nmin"))
      val spread = labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
      // components are always node ids (min only selects ids), so the
      // shortcut self-join is total: every comp value has a label row
      val ptr = spread.select(col("id").as("p_id"), col("component").as("p_comp"))
      val next = spread.join(ptr, spread("component") === ptr("p_id"))
        .select(spread("id"), col("p_comp").as("component"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .first().getDecimal(0)
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      it += 1
    }
    labels
  }

  /** Per-document cluster view over the WHOLE corpus: docs absent from
    * the pair graph are their own singleton component. `is_canonical`
    * marks the kept representative (min id of the cluster).
    */
  def dupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                  src: String = "id1", dst: String = "id2"): DataFrame = {
    val comps = connectedComponents(pairs, src, dst)
      .withColumnRenamed("id", "_cc_id")
    docs.join(comps, docs(idCol) === comps("_cc_id"), "left")
      .withColumn("component", coalesce(col("component"), docs(idCol)))
      .withColumn("is_canonical", col("component") === docs(idCol))
      .drop("_cc_id")
  }

  /** The deduplicated corpus: one doc per cluster (the min-id
    * representative), all unpaired docs untouched. The anti-join drops
    * exactly the non-canonical members.
    */
  def dedupCorpus(docs: DataFrame, idCol: String, pairs: DataFrame,
                  src: String = "id1", dst: String = "id2"): DataFrame =
    dupClusters(docs, idCol, pairs, src, dst)
      .filter(col("is_canonical"))
      .drop("component", "is_canonical")
}
