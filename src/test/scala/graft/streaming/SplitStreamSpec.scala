package graft.streaming

import graft.SparkSpec
import graft.llm.{IncrementalDedup, Sampling}
import org.apache.spark.sql.functions._

/** Growth-stability contract of the incremental leak-free split (the
  * r10 verdict's top task): new docs inherit, merges keep the OLDEST
  * assignment, untouched docs never move, and leakage stays zero by
  * construction — with the one designed exception (different-split
  * merge) observable in the store.
  */
class SplitStreamSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  // texts: TA/TB share no tokens (no near-dup edge between them); TC
  // concatenates both (near-dup of each under the 8-hash estimator)
  private val ta = (1 to 30).map(i => s"aa$i").mkString(" ")
  private val tb = (1 to 30).map(i => s"bb$i").mkString(" ")
  private val tc = s"$ta $tb"

  // spec-wide estimator knobs: 8 bands of 1 row (candidate on ANY
  // matching hash) with a >=2/8 agreement gate — loose enough that the
  // concat bridge deterministically connects both sides (preconditions
  // asserted below), strict enough that disjoint token sets never join
  private val rpb = 1
  private val mm = 2

  private def labelMap(upTo: Long): Map[Long, String] =
    spark.range(1, upTo)
      .select(col("id"), Sampling.splitLabel(col("id"), splits).as("l"))
      .as[(Long, String)].collect().toMap

  private def agreement(t1: String, t2: String): Int = {
    val idx = IncrementalDedup.dedupIndex(
      Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    (1 to 8).count(i =>
      idx(0).getAs[String](s"mh$i") == idx(1).getAs[String](s"mh$i"))
  }

  private def store(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_split_").toFile
    d.deleteOnExit()
    s"${d.getPath}/store"
  }

  private def view(dir: String): Map[Long, (Long, Long, String, Long)] =
    SplitStream.assignments(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_seq"),
          r.getAs[String]("split"), r.getAs[Long]("seq")))).toMap

  test("estimator preconditions: the bridge connects both sides, the sides " +
      "never connect directly") {
    assert(agreement(ta, tb) < mm, s"TA~TB agreement ${agreement(ta, tb)}")
    assert(agreement(tc, ta) >= mm, s"TC~TA agreement ${agreement(tc, ta)}")
    assert(agreement(tc, tb) >= mm, s"TC~TB agreement ${agreement(tc, tb)}")
  }

  test("fresh batch: clusters hash their min id — exactly the batch " +
      "leakFreeSplit rule on first sight") {
    val dir = store()
    val docs = Seq((10L, ta), (12L, ta), (14L, tb), (16L, "solo zz text"))
      .toDF("doc_id", "text")
    SplitStream.applyBatch(docs, "doc_id", "text", dir, splits, seq = 0L,
      rowsPerBand = rpb, minMatches = mm)
    val v = view(dir)
    val lm = labelMap(20L)
    // exact pair {10,12} clusters at 10; 14 and 16 are singletons
    assert(v(10L) === ((10L, 0L, lm(10L), 0L)))
    assert(v(12L) === ((10L, 0L, lm(10L), 0L)))
    assert(v(14L) === ((14L, 0L, lm(14L), 0L)))
    assert(v(16L) === ((16L, 0L, lm(16L), 0L)))
  }

  test("growth: a new doc joining an existing cluster inherits its split; " +
      "prior docs get NO new rows (stability by absence)") {
    val dir = store()
    SplitStream.applyBatch(Seq((10L, ta), (14L, tb)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 0L,
      rowsPerBand = rpb, minMatches = mm)
    // doc 5 has a SMALLER id than its cluster's anchor — the batch
    // operator would re-hash the cluster on min id 5 and migrate it;
    // the incremental rule must keep cluster 10's original assignment
    SplitStream.applyBatch(Seq((5L, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 1L,
      rowsPerBand = rpb, minMatches = mm)
    val v = view(dir)
    val lm = labelMap(20L)
    assert(v(5L) === ((10L, 0L, lm(10L), 1L)), "inherit, not re-hash")
    assert(v(10L) === ((10L, 0L, lm(10L), 0L)), "anchor row untouched")
    assert(v(14L) === ((14L, 0L, lm(14L), 0L)), "unrelated cluster untouched")
  }

  test("merge: oldest assignment wins (seq before anchor id), the absorbed " +
      "cluster re-points, same-split merge changes no doc's split, and the " +
      "final state has zero cross-split near-dup pairs") {
    val lm = labelMap(400L)
    // idB < idA with the SAME label: seq must dominate the tie, and the
    // same-split merge must leave every earlier doc's split unchanged
    val trains = lm.collect { case (i, l) if l == "train" => i }.toSeq.sorted
    val (idB, idA) = (trains.head, trains(1))
    assert(lm(idA) === "train" && lm(idB) === "train" && idB < idA)
    val dir = store()
    SplitStream.applyBatch(Seq((idA, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 0L,
      rowsPerBand = rpb, minMatches = mm)
    SplitStream.applyBatch(Seq((idB, tb)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 1L,
      rowsPerBand = rpb, minMatches = mm)
    SplitStream.applyBatch(Seq((999L, tc)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 2L,
      rowsPerBand = rpb, minMatches = mm)
    val v = view(dir)
    // A (older batch) won although B has the smaller anchor id
    assert(v(idA) === ((idA, 0L, "train", 0L)), "winner untouched (no new row)")
    assert(v(idB) === ((idA, 0L, "train", 2L)), "absorbed cluster re-pointed")
    assert(v(999L) === ((idA, 0L, "train", 2L)), "bridge inherits the winner")
    // every batch-1/2 doc's split unchanged AND one split across the
    // merged component = zero cross-split near-dup pairs by construction
    assert(v.values.map(_._3).toSet === Set("train"))
  }

  test("different-split merge: leak-freedom beats stability — the absorbed " +
      "cluster MIGRATES, observably, and leakage is zero afterwards") {
    val lm = labelMap(400L)
    val idA = lm.collect { case (i, l) if l == "train" => i }.min
    val idB = lm.collect { case (i, l) if l == "test" => i }.min
    val dir = store()
    SplitStream.applyBatch(Seq((idA, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 0L,
      rowsPerBand = rpb, minMatches = mm)
    SplitStream.applyBatch(Seq((idB, tb)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 1L,
      rowsPerBand = rpb, minMatches = mm)
    val before = view(dir)
    assert(before(idB)._3 === "test")
    SplitStream.applyBatch(Seq((999L, tc)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 2L,
      rowsPerBand = rpb, minMatches = mm)
    val v = view(dir)
    assert(v(idA) === ((idA, 0L, "train", 0L)))
    // the migration is visible: a fresh row at the merging batch's seq
    assert(v(idB) === ((idA, 0L, "train", 2L)), "migrated to the older split")
    assert(v(999L)._3 === "train")
    // post-merge the component is single-split: zero straddling pairs
    assert(v.values.map(_._3).toSet === Set("train"))
    // the migration AUDIT surfaces exactly this move: idB, at the
    // merging batch's seq, test → train, flagged as a split move
    val mig = SplitStream.migrations(spark, dir).collect()
    assert(mig.length === 1)
    val m = mig.head
    assert(m.getAs[Long]("doc_id") === idB &&
      m.getAs[Long]("seq") === 2L &&
      m.getAs[Long]("from_cluster") === idB &&
      m.getAs[Long]("to_cluster") === idA &&
      m.getAs[String]("from_split") === "test" &&
      m.getAs[String]("to_split") === "train" &&
      m.getAs[Boolean]("moved_split"))
  }

  test("first-batch crash recovery: a store whose ONLY delta is an " +
      "uncommitted partial (no _SUCCESS) does not wedge the replay") {
    // the r11 review wedge: read.parquet over a dir holding only a
    // partial write throws 'Unable to infer schema' BEFORE the healing
    // overwrite — DeltaStore's committed-dirs read must skip it
    val dir = store()
    val partial = new java.io.File(s"$dir/assign/ingest_batch=q_0")
    partial.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(partial, "part-00000.parquet").toPath, "not parquet")
    new java.io.File(s"$dir/sigs/ingest_batch=q_0").mkdirs()
    SplitStream.applyBatch(Seq((10L, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 0L, queryId = "q",
      rowsPerBand = rpb, minMatches = mm)
    val v = view(dir)
    assert(v(10L) === ((10L, 0L, v(10L)._3, 0L)))
  }

  test("replay idempotence: re-running a batch with the same (queryId, seq) " +
      "recomputes into an identical store") {
    val dir = store()
    SplitStream.applyBatch(Seq((10L, ta), (14L, tb)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 0L, queryId = "q",
      rowsPerBand = rpb, minMatches = mm)
    SplitStream.applyBatch(Seq((5L, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 1L, queryId = "q",
      rowsPerBand = rpb, minMatches = mm)
    val before = view(dir)
    // replay batch 1 (crash-after-commit, retry): self-excluding tag →
    // identical recompute, overwrite in place
    SplitStream.applyBatch(Seq((5L, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 1L, queryId = "q",
      rowsPerBand = rpb, minMatches = mm)
    assert(view(dir) === before)
  }

  test("compact: latest-wins assignments and future folds survive the " +
      "delta absorption") {
    val dir = store()
    SplitStream.applyBatch(Seq((10L, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 0L,
      rowsPerBand = rpb, minMatches = mm)
    SplitStream.applyBatch(Seq((5L, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 1L,
      rowsPerBand = rpb, minMatches = mm)
    val before = view(dir)
    SplitStream.compact(spark, dir)
    assert(view(dir) === before)
    // the compacted store still answers a later batch correctly
    SplitStream.applyBatch(Seq((7L, ta)).toDF("doc_id", "text"),
      "doc_id", "text", dir, splits, seq = 2L,
      rowsPerBand = rpb, minMatches = mm)
    val v = view(dir)
    assert(v(7L)._1 === 10L && v(7L)._3 === before(10L)._3)
  }

  test("auto-compaction: a low trigger yields identical assignments as " +
      "no trigger; both delta stores stay bounded; replay after an " +
      "auto-compact is still idempotent") {
    val (dirA, dirB) = (store(), store())
    val batches = Seq(
      Seq((10L, ta), (12L, ta)),
      Seq((20L, tb)),
      Seq((30L, "solo zz text")),
      Seq((40L, tc)),                 // bridges the TA and TB clusters
      Seq((50L, "other yy words")))
    batches.zipWithIndex.foreach { case (b, i) =>
      val df = b.toDF("doc_id", "text")
      SplitStream.applyBatch(df, "doc_id", "text", dirA, splits,
        seq = i.toLong, queryId = "qa", rowsPerBand = rpb,
        minMatches = mm, autoCompactMinDeltas = 2)
      SplitStream.applyBatch(df, "doc_id", "text", dirB, splits,
        seq = i.toLong, queryId = "qb", rowsPerBand = rpb,
        minMatches = mm, autoCompactMinDeltas = 0)
    }
    assert(view(dirA) === view(dirB))
    // the migration AUDIT must survive compaction identically: the
    // assign fold is identity (r12 review finding — a latest-wins fold
    // silently erased every pre-compaction migration)
    def migs(d: String) = SplitStream.migrations(spark, d).collect()
      .map(_.toString).sorted.toSeq
    assert(migs(dirA) === migs(dirB))
    // compaction fires before the batch writes, so each store holds at
    // most compacted + own = 2 dirs; the untriggered one keeps all 5
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(SplitStream.assignPath(dirA), SplitStream.sigsPath(dirA))
      .foreach(p => assert(graft.core.Fs.listDirs(p, conf).length <= 2,
        s"unbounded store at $p"))
    assert(graft.core.Fs.listDirs(SplitStream.assignPath(dirB), conf)
      .length === 5)
    // replay of the last batch: its committed tag is present when the
    // trigger fires — the compaction excludes it and the replay
    // rewrites it, landing on the same view
    SplitStream.applyBatch(batches.last.toDF("doc_id", "text"),
      "doc_id", "text", dirA, splits, seq = 4L, queryId = "qa",
      rowsPerBand = rpb, minMatches = mm, autoCompactMinDeltas = 2)
    assert(view(dirA) === view(dirB))
  }

  test("streaming face: run() over a file stream folds batches through the " +
      "same store protocol") {
    val dir = store()
    val in = java.nio.file.Files.createTempDirectory("graft_splitin_").toFile
    in.deleteOnExit()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_splitck_").toFile
    ckpt.deleteOnExit()
    Seq((10L, ta), (12L, ta), (14L, tb)).toDF("doc_id", "text")
      .write.mode("append").json(in.getPath)
    val schema = "doc_id BIGINT, text STRING"
    val q = SplitStream.run(
      spark.readStream.schema(schema).json(in.getPath),
      "doc_id", "text", dir, ckpt.getPath, splits,
      rowsPerBand = rpb, minMatches = mm)
    q.awaitTermination()
    val v = view(dir)
    assert(v(10L)._1 === 10L && v(12L)._1 === 10L && v(14L)._1 === 14L)
    assert(v(12L)._3 === v(10L)._3)
  }
}
