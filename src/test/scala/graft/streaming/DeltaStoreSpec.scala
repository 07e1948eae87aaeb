package graft.streaming

import graft.SparkSpec
import graft.core.Fs

/** DeltaStore protocol edges not already covered through the store
  * suites: the auto-compaction TRIGGER must count exactly the deltas
  * the fold will absorb (committed, minus the caller's excluded tag) —
  * a store polluted with crashed partials, or holding the replaying
  * batch's own delta, must not trip a compaction of fewer real deltas
  * than the threshold (r12 advice).
  */
class DeltaStoreSpec extends SparkSpec {
  import spark.implicits._

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("deltastore").toFile
    try f(d.getPath)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  private def conf = spark.sparkContext.hadoopConfiguration

  private def writeDelta(store: String, tag: String,
                         committed: Boolean = true): Unit = {
    val dir = s"$store/ingest_batch=$tag"
    Seq((tag, 1L)).toDF("k", "v").write.mode("overwrite").parquet(dir)
    if (!committed) Fs.delete(s"$dir/_SUCCESS", conf)
  }

  test("compactIfNeeded triggers on COMMITTED deltas, not raw dirs: " +
    "partials and the excluded tag don't count") {
    withDir { store =>
      writeDelta(store, "q_0")
      writeDelta(store, "q_1")
      // two crashed partials + the replaying batch's own delta: raw
      // dir count is 5, but only 2 deltas are foldable
      writeDelta(store, "crash_a", committed = false)
      writeDelta(store, "crash_b", committed = false)
      writeDelta(store, "q_2")
      assert(!DeltaStore.compactIfNeeded(spark, store, minDeltas = 3,
        excludeTag = Some("q_2"))(identity))
      // with a third committed non-excluded delta the trigger fires,
      // and the fold absorbed exactly the foldable three
      writeDelta(store, "q_3")
      assert(DeltaStore.compactIfNeeded(spark, store, minDeltas = 3,
        excludeTag = Some("q_2"))(identity))
      val dirs = DeltaStore.committedDirs(store, conf)
      assert(dirs.length === 1 && dirs.head.contains("compacted_"))
      assert(spark.read.parquet(dirs.head).as[(String, Long)]
        .collect().map(_._1).sorted.toSeq === Seq("q_0", "q_1", "q_3"))
    }
  }
}
