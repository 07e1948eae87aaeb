package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The pair-store memo's corpus fingerprint must be position- and
  * path-sensitive: the r12 XOR-sum stamp collided for corpora that
  * merely swapped compensating (length, mtime) values between files.
  */
class CorpusStampSpec extends AnyFunSuite {

  private def withCorpus(f: java.io.File => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("stamp").toFile
    try f(d)
    finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(d)
    }
  }

  private def put(dir: java.io.File, name: String, content: String,
                  mtime: Long): Unit = {
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    f.setLastModified(mtime)
    ()
  }

  test("swapping two files' contents (lengths trade places, mtimes " +
    "pinned) changes the stamp") {
    withCorpus { dir =>
      val docs = new java.io.File(dir, "documents.parquet")
      docs.mkdirs()
      val t = 1700000000000L
      put(docs, "part-0", "aa", t)
      put(docs, "part-1", "bbbb", t)
      val s1 = LlmQueries.corpusStamp(dir.getPath)
      // swap the two files' contents: same name set, same length
      // MULTISET, same mtimes — the old XOR-sum stamp was identical
      put(docs, "part-0", "bbbb", t)
      put(docs, "part-1", "aa", t)
      val s2 = LlmQueries.corpusStamp(dir.getPath)
      assert(s1 !== s2)
      // and the stamp is stable for an unchanged corpus
      assert(LlmQueries.corpusStamp(dir.getPath) === s2)
    }
  }

  test("adding or touching a file changes the stamp; a missing corpus " +
    "stamps empty-but-valid") {
    withCorpus { dir =>
      val docs = new java.io.File(dir, "documents.parquet")
      docs.mkdirs()
      val t = 1700000000000L
      put(docs, "part-0", "aa", t)
      val s1 = LlmQueries.corpusStamp(dir.getPath)
      put(docs, "part-1", "cc", t)
      val s2 = LlmQueries.corpusStamp(dir.getPath)
      assert(s1 !== s2)
      put(docs, "part-1", "cc", t + 1000L)
      assert(LlmQueries.corpusStamp(dir.getPath) !== s2)
      // non-local / absent corpus: degrades to a constant, documented
      assert(LlmQueries.corpusStamp("/nonexistent/nowhere")
        === LlmQueries.corpusStamp("/nonexistent/elsewhere"))
    }
  }
}
