package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF: clustered data lands in coherent cells and search finds cluster-mates") {
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // two tight clusters on orthogonal axes; ids 0 and 1 (the smallest,
    // hence the deterministic seeds) sit in different clusters
    val emb = Seq(
      (0L, v(1, 0.01, 0, 0)), (2L, v(0.99, 0.02, 0, 0)), (3L, v(1, 0.03, 0, 0)),
      (1L, v(0, 0.01, 1, 0)), (11L, v(0.01, 0, 0.99, 0)), (12L, v(0, 0.02, 1, 0))
    ).toDF("vec_id", "embedding")
    val index = Ivf.fit(emb, "vec_id", "embedding", k = 2, iters = 2)
    val cells = index.assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(cells(0L), cells(2L), cells(3L)).size === 1, "cluster A coherent")
    assert(Set(cells(1L), cells(11L), cells(12L)).size === 1, "cluster B coherent")
    assert(cells(0L) !== cells(1L), "clusters separated")

    val topk = Ivf.topK(emb, emb.filter($"vec_id" === 0L), index,
      "vec_id", "embedding", k = 2, nprobe = 1)
    val got = topk.orderBy("rn").collect().map(_.getAs[Long]("c_id")).toSet
    assert(got === Set(2L, 3L), s"nprobe=1 search stays in the cluster: $got")
  }

  test("IVF: recall vs brute force on real embeddings with nprobe=4 of k=8") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val brute = Ann.cosineTopK(queries, emb, "vec_id", "embedding", 3)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val ivf = Ivf.topK(emb, queries, index, "vec_id", "embedding", 3, nprobe = 4)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // probing half the cells must recover a solid share of true neighbors
    assert(recall >= 0.4, s"recall=$recall brute=${brute.size} ivf=${ivf.size}")
  }

  test("knnGraph: every vector gets ranked neighbors; agrees with per-query topK") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val index = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val g = Ivf.knnGraph(emb, index, "vec_id", "embedding",
      kNeighbors = 3, nprobe = 2).cache()
    // full coverage: every corpus vector appears as a query with rn 1..3
    val perQ = g.groupBy("q_id")
      .agg(count(lit(1)).as("c"), max("rn").as("mx"), min("rn").as("mn"))
      .collect()
    assert(perQ.length.toLong === n)
    perQ.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(3) === 1, s"ranks broken: $r")
    }
    // graph rows for a few queries == topK restricted to the same probes
    val qs = emb.filter($"vec_id" < 5)
    val tk = Ivf.topK(emb, qs, index, "vec_id", "embedding", 3, nprobe = 2)
      .select("q_id", "c_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gg = g.filter($"q_id" < 5)
      .select("q_id", "c_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gg === tk, "corpus-as-queries face diverges from per-query topK")
    g.unpersist()
  }

  test("clusterStats: populations cover the corpus; tight clusters score high") {
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val emb = Seq(
      (0L, v(1, 0.01, 0, 0)), (2L, v(0.99, 0.02, 0, 0)), (3L, v(1, 0.03, 0, 0)),
      (1L, v(0, 0.01, 1, 0)), (11L, v(0.01, 0, 0.99, 0)), (12L, v(0, 0.02, 1, 0))
    ).toDF("vec_id", "embedding")
    val index = Ivf.fit(emb, "vec_id", "embedding", k = 2, iters = 2)
    val stats = Ivf.clusterStats(emb, index, "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
    assert(stats.map(_._2._1).sum === 6L, "every vector belongs to a cell")
    stats.foreach { case (_, (_, cos)) =>
      assert(cos > 0.99, s"tight synthetic clusters must cohere: $cos")
    }
  }

  test("two-level: assignments cover the corpus exactly once, leaf " +
    "cells nest in their level-1 cell, and the fit is deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    // targetCellSize 8 over ~200 vectors → k≈25, k1=5, k2=5: both
    // levels genuinely multi-cell
    val index = Ivf.fitTwoLevel(emb, "vec_id", "embedding",
      targetCellSize = 8, iters = 2)
    assert(index.assignments.count() === n, "every vector assigned")
    assert(index.assignments.select("vec_id").distinct().count() === n,
      "exactly one leaf per vector")
    val leaves = index.centroids.select("cell", "l1").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(leaves.keys.toSeq.sorted === (0 until leaves.size).toSeq,
      "leaf cells densely numbered")
    val l1s = index.l1Centroids.select("l1").collect().map(_.getInt(0)).toSet
    assert(leaves.values.toSet.subsetOf(l1s), "every leaf nests in a level-1 cell")
    // determinism: a second fit reproduces assignments bit-for-bit
    val again = Ivf.fitTwoLevel(emb, "vec_id", "embedding",
      targetCellSize = 8, iters = 2)
    assert(index.assignments.orderBy("vec_id").collect().toSeq ===
      again.assignments.orderBy("vec_id").collect().toSeq)
    // leaf diagnostics cover the corpus exactly
    assert(Ivf.clusterStats(emb, index, "vec_id", "embedding")
      .agg(sum("n_vecs")).head().getLong(0) === n)
    index.unpersist(); again.unpersist()
  }

  test("two-level knnGraph: ranked per-query neighbors with honest " +
    "recall against brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val index = Ivf.fitTwoLevel(emb, "vec_id", "embedding",
      targetCellSize = 16, iters = 2)
    val g = Ivf.knnGraph(emb, index, "vec_id", "embedding",
      kNeighbors = 3, nprobe = 4, nprobe1 = 3).cache()
    val perQ = g.groupBy("q_id")
      .agg(count(lit(1)).as("c"), max("rn").as("mx"), min("rn").as("mn"))
      .collect()
    assert(perQ.length.toLong === n, "every vector queries the graph")
    perQ.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(3) === 1, s"ranks broken: $r")
    }
    assert(g.filter($"q_id" === $"c_id").count() === 0L, "no self pairs")
    assert(g.select("q_id", "c_id").distinct().count() === g.count(),
      "each (q, c) pair exactly once")
    val brute = Ann.cosineTopK(emb, emb, "vec_id", "embedding", 3)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = g.select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.4, s"two-level recall=$recall")
    g.unpersist(); index.unpersist()
  }

  test("two-level topK: agrees with the corpus-as-queries graph face " +
    "on shared probes and recovers brute-force neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = Ivf.fitTwoLevel(emb, "vec_id", "embedding",
      targetCellSize = 16, iters = 2)
    val qs = emb.filter($"vec_id" < 5)
    val tk = Ivf.topK(emb, qs, index, "vec_id", "embedding",
        k = 3, nprobe = 2, nprobe1 = 2)
      .select("q_id", "c_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val g = Ivf.knnGraph(emb, index, "vec_id", "embedding",
        kNeighbors = 3, nprobe = 2, nprobe1 = 2)
      .filter($"q_id" < 5)
      .select("q_id", "c_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(tk === g, "per-query face diverges from corpus-as-queries face")
    // generous probes recover a solid share of the exact neighbors
    val brute = Ann.cosineTopK(qs, emb, "vec_id", "embedding", 3)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = Ivf.topK(emb, qs, index, "vec_id", "embedding",
        k = 3, nprobe = 6, nprobe1 = 3)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & wide).size.toDouble / brute.size
    assert(recall >= 0.4, s"two-level topK recall=$recall")
    index.unpersist()
  }

  test("two-level hardNegatives: label mismatch filters before the " +
    "rank; generous probes recover the planted infiltrator") {
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val emb = Seq(
      (0L, v(1, 0, 0, 0), 1),
      (1L, v(0.99, 0.01, 0, 0), 1),
      (2L, v(0.98, 0.02, 0, 0), 2),   // the hard negative for label 1
      (3L, v(0, 0, 1, 0), 2),
      (10L, v(0, 0.01, 0.99, 0), 1)
    ).toDF("vec_id", "embedding", "label")
    val index = Ivf.fitTwoLevel(emb, "vec_id", "embedding",
      targetCellSize = 2, iters = 2)
    // probe everything: nprobe1/nprobe ≥ cell counts → exact semantics
    val neg = Ivf.hardNegatives(emb, index, "vec_id", "embedding", "label",
        k = 1, nprobe = 16, nprobe1 = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(1), r.getInt(3))))
      .toMap
    assert(neg(0L)._1 === 2L, s"anchor 0 must find the infiltrator: $neg")
    Ivf.hardNegatives(emb, index, "vec_id", "embedding", "label", 3, 16, 16)
      .collect().foreach(r => assert(r.getInt(1) !== r.getInt(3)))
    index.unpersist()
  }

  test("hardNegatives: only different-label neighbors, nearest first") {
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // label-1 cluster on x-axis with one label-2 infiltrator very close;
    // the infiltrator must outrank the farther label-2 point
    val emb = Seq(
      (0L, v(1, 0, 0, 0), 1),
      (1L, v(0.99, 0.01, 0, 0), 1),
      (2L, v(0.98, 0.02, 0, 0), 2),   // the hard negative for label 1
      (3L, v(0, 0, 1, 0), 2),
      (10L, v(0, 0.01, 0.99, 0), 1)
    ).toDF("vec_id", "embedding", "label")
    val index = Ivf.fit(emb, "vec_id", "embedding", k = 2, iters = 2)
    val neg = Ivf.hardNegatives(emb, index, "vec_id", "embedding", "label",
        k = 1, nprobe = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(1), r.getInt(3))))
      .toMap
    // anchor 0 (label 1): nearest different-label is 2, not 3
    assert(neg(0L)._1 === 2L)
    assert(neg(0L)._2 === 1 && neg(0L)._3 === 2)
    // every emitted pair disagrees on label
    Ivf.hardNegatives(emb, index, "vec_id", "embedding", "label", 3, 2)
      .collect().foreach(r => assert(r.getInt(1) !== r.getInt(3)))
  }
}
