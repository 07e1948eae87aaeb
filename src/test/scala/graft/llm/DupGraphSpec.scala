package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DupGraphSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: path graph collapses to min id (pointer jump beats diameter)") {
    // 1-2-3-...-9: diameter 8, must converge well inside maxIter=20 and
    // label everything with 1
    val edges = (1L until 9L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = DupGraph.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 9L).map(_ -> 1L).toMap)
  }

  test("connectedComponents: separate components stay separate") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("id1", "id2")
    val got = DupGraph.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dupClusters: unpaired docs are singletons; canonical = cluster min") {
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("id1", "id2")
    val got = DupGraph.dupClusters(docs, "doc_id", pairs)
      .select("doc_id", "component", "is_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set((1L, 1L, true), (2L, 2L, true), (3L, 3L, true),
      (4L, 2L, false), (5L, 2L, false), (6L, 6L, true)))
  }

  test("dedupCorpus: keeps one doc per cluster plus all unpaired docs") {
    val docs = (1L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 4L), (4L, 5L), (3L, 6L)).toDF("id1", "id2")
    val kept = DupGraph.dedupCorpus(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
    // schema untouched: no helper columns leak
    assert(DupGraph.dedupCorpus(docs, "doc_id", pairs).columns.toSeq ===
      Seq("doc_id", "text"))
  }

  test("bestPerCluster: keeps the highest-score member, ties break low id") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (4L, "c", 30L), (5L, "d", 20L), // cluster {2,4,5}
      (3L, "e", 7L), (6L, "f", 9L),                                    // cluster {3,6}
      (7L, "g", 1L))                                                   // singleton
      .toDF("doc_id", "text", "score")
    val pairs = Seq((2L, 4L), (4L, 5L), (3L, 6L)).toDF("id1", "id2")
    val rows = DupGraph.bestPerCluster(docs, "doc_id", "score", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster 2: scores 30/30/20 → tie between 2 and 4 → keep 2
    // cluster 3: 9 > 7 → keep 6; singleton 1 and 7 keep themselves
    assert(rows === Map(2L -> 2L, 3L -> 6L, 1L -> 1L, 7L -> 7L))
    // doc columns pass through plus component
    assert(DupGraph.bestPerCluster(docs, "doc_id", "score", pairs)
      .columns.toSeq === Seq("component", "doc_id", "text", "score"))
  }

  test("connectedComponents: empty edge set yields empty labels") {
    val edges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(DupGraph.connectedComponents(edges).count() === 0L)
  }

  test("connectedComponents: reliable checkpointDir path — same labels, files on disk") {
    // durability contract: with checkpointDir set, per-round state goes
    // through reliable checkpoint() files (survives executor loss) and
    // the result is identical to the localCheckpoint default
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
      val got = DupGraph.connectedComponents(edges, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // the rounds actually went through the reliable path
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(wrote > 0, "expected reliable checkpoint rdd-* dirs")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("connectedComponents: intermediate round state is released, not accreted") {
    // lifecycle contract: after the call, at most the RETURNED labels
    // frame stays persisted — rounds 1..n-1, the edge list, and the
    // symmetrized edges must all have been unpersisted inside the loop
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = (1L until 30L).map(i => (i, i + 1)).toDF("id1", "id2")
    val labels = DupGraph.connectedComponents(edges)
    labels.count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"expected <=1 persisted RDD (final labels), got ${leaked.size}")
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    assert(CheckpointBridge.unpersistCheckpoint(labels))
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("triangleStats: K4 is fully clustered, a path has wedges but no triangles") {
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b))
      .toDF("id1", "id2")
    val gotK4 = DupGraph.triangleStats(k4)
      .as[(Long, Long, Double)].collect().head
    assert(gotK4 === ((4L, 12L, 1.0))) // C(4,3)=4 triangles, 4 nodes x C(3,2)=12 wedges
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2")
    val gotPath = DupGraph.triangleStats(path)
      .as[(Long, Long, Double)].collect().head
    assert(gotPath === ((0L, 2L, 0.0)))
  }

  test("triangleStats: duplicate/reversed/self edges canonicalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("id1", "id2")
    val got = DupGraph.triangleStats(messy)
      .as[(Long, Long, Double)].collect().head
    assert(got === ((1L, 3L, 1.0)))
  }

  private def prMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank: symmetric 2-cycle is the uniform fixpoint (exactly 1e6)") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(prMap(DupGraph.pageRank(edges, iterations = 3)) ===
      Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: star hub/leaf ranks match the hand-rolled floor recurrence") {
    // undirected star 1-{2,3,4}, passed as the symmetric directed list
    val e0 = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val sym = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    // iter1: hub = 150000 + (17 * 3*1000000) div 20 = 2700000
    //        leaf = 150000 + (17 * (1000000 div 3)) div 20 = 433333
    val r1 = prMap(DupGraph.pageRank(sym, iterations = 1))
    assert(r1 === Map(1L -> 2700000L, 2L -> 433333L, 3L -> 433333L, 4L -> 433333L))
    // iter2: hub = 150000 + (17 * 3*433333) div 20 = 1254999
    //        leaf = 150000 + (17 * (2700000 div 3)) div 20 = 915000
    val r2 = prMap(DupGraph.pageRank(sym, iterations = 2))
    assert(r2 === Map(1L -> 1254999L, 2L -> 915000L, 3L -> 915000L, 4L -> 915000L))
  }

  test("pageRank: dangling mass evaporates, no-inlink nodes hold the teleport floor") {
    val edges = Seq((1L, 2L)).toDF("src", "dst") // 2 is dangling, 1 has no in-links
    val r2 = prMap(DupGraph.pageRank(edges, iterations = 2))
    // iter1: n1=150000 (no in), n2=150000+850000=1000000
    // iter2: n1=150000, n2=150000+(17*150000) div 20 = 277500
    assert(r2 === Map(1L -> 150000L, 2L -> 277500L))
  }

  test("personalizedPageRank: mass concentrates near seeds, unreachable decays to 0") {
    // star 1-{2,3,4} plus a disjoint pair 10-11; seed = leaf 2
    val e0 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
    val sym = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(2L).toDF("id")
    val r2 = prMap(DupGraph.personalizedPageRank(sym, seeds, iterations = 2))
    // hand-rolled: r0 = {2:1e6, rest 0}
    // r1: hub = 0 + (17·(1e6 div 1)) div 20 = 850000; seed = 150000; rest 0
    // r2: seed = 150000 + (17·(850000 div 3)) div 20 = 390833
    //     other leaves = (17·283333) div 20 = 240833; hub = (17·150000) div 20 = 127500
    assert(r2 === Map(1L -> 127500L, 2L -> 390833L, 3L -> 240833L,
      4L -> 240833L, 10L -> 0L, 11L -> 0L))
    // seed proximity ordering: seed > its peers > the far component
    assert(r2(2L) > r2(3L) && r2(3L) > r2(10L))
  }

  test("bfsDistances: hop budget, multi-source min, off-graph seeds stay at 0") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val one = Seq(1L).toDF("id")
    val d1 = prMap(DupGraph.bfsDistances(path, one, maxHops = 2))
    assert(d1 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4, 5 beyond budget
    val multi = Seq(1L, 5L, 99L).toDF("id") // 99 has no edges
    val d2 = prMap(DupGraph.bfsDistances(path, multi, maxHops = 2))
    assert(d2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 1L, 5L -> 0L, 99L -> 0L))
  }

  test("labelPropagation: min-tie sweeps converge a pendant-triangle to one community") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    // sweep 1: 1→min{2,3,4}=2, 2→min{1,3}=1, 3→min{1,2}=1, 4→1
    val l1 = prMap(DupGraph.labelPropagation(edges, iterations = 1))
    assert(l1 === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // sweep 3: everything settles on label 1
    val l3 = prMap(DupGraph.labelPropagation(edges, iterations = 3))
    assert(l3 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("labelPropagation: disjoint cliques keep separate communities; isolated self-loop survives") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 20L)).toDF("src", "dst")
    val got = prMap(DupGraph.labelPropagation(edges, iterations = 4))
    // self-loop-only node is dropped (no real edges) — communities split 1 vs 10
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("kCore: a chain peels one vertex per round from each end; " +
    "the triangle is the 2-core fixpoint") {
    // 1-2-3-4 chain attached to triangle 4-5-6: 2-core = {4,5,6},
    // reached only by CASCADING peels (1 goes, then 2, then 3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    def core(rounds: Int) =
      DupGraph.kCore(edges, k = 2, rounds = rounds)
        .orderBy("id").as[(Long, Long)].collect().toSeq
    // round 1 removes only vertex 1 (the single deg-1 vertex)
    assert(core(1).map(_._1) === Seq(2L, 3L, 4L, 5L, 6L))
    // round 2 removes 2; round 3 removes 3 → the pure triangle, deg 2 each
    assert(core(3) === Seq((4L, 2L), (5L, 2L), (6L, 2L)))
    // fixpoint: more rounds change nothing
    assert(core(5) === core(3))
  }

  test("kCore: self-loops and duplicate/reversed edges don't inflate degree") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    // true simple graph is triangle 1-2-3 → 2-core keeps all three
    val got = DupGraph.kCore(edges, k = 2, rounds = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("degreeProfile: star graph — hub and leaves land in the right " +
    "bins with exact neighbor-degree means") {
    // star: hub 0 ↔ leaves 1..5. deg(hub)=5 (bin 2), deg(leaf)=1 (bin 0);
    // leaves' only neighbor is the hub (mean 5), hub's neighbors are
    // leaves (mean 1)
    val edges = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    val got = DupGraph.degreeProfile(edges)
      .orderBy("deg_bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 5L, 1L, 1L, 5L), (2L, 1L, 5L, 5L, 1L)))
  }
}
