package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Verdicts are checked against an independent brute-force reference
  * (plain-Scala md5/minhash/banding over the collected rows), so the
  * spec pins semantics, not a snapshot.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // ---- brute-force reference implementation (mirrors the md5 hash
  //      family of DedupOps.minhashSignatures exactly) ----
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def shingles(t: String): Seq[String] = {
    val ts = toks(t)
    if (ts.size >= 3) (0 to ts.size - 3).map(i => ts.slice(i, i + 3).mkString(" "))
    else Seq.empty
  }

  private def sig(t: String): Option[IndexedSeq[String]] = {
    val sh = shingles(t)
    if (sh.isEmpty) None
    else Some((1 to 8).map(i => sh.map(s => md5hex(s"$i|$s")).min))
  }

  private def bandKeys(s: IndexedSeq[String]): Seq[(Int, String)] =
    Seq(0 -> md5hex(s.slice(0, 4).mkString),
        1 -> md5hex(s.slice(4, 8).mkString))

  private def shareBand(a: IndexedSeq[String], b: IndexedSeq[String]): Boolean =
    bandKeys(a).toSet.intersect(bandKeys(b).toSet).nonEmpty

  private def nMatch(a: IndexedSeq[String], b: IndexedSeq[String]): Int =
    a.zip(b).count { case (x, y) => x == y }

  private def referenceVerdicts(corpus: Seq[(Long, String)],
                                batch: Seq[(Long, String)]): Map[Long, (String, Option[Long])] =
    batch.map { case (id, text) =>
      val eh = md5hex(text)
      val sg = sig(text)
      def near(other: Seq[(Long, String)], pred: Long => Boolean) =
        (for {
          s0 <- sg.toSeq
          (oid, ot) <- other if pred(oid)
          os <- sig(ot).toSeq
          if shareBand(s0, os) && nMatch(s0, os) >= 6
        } yield oid).minOption
      val exactC = corpus.filter(c => md5hex(c._2) == eh).map(_._1).minOption
      val exactB = batch.filter(c => c._1 < id && md5hex(c._2) == eh).map(_._1).minOption
      val nearC = near(corpus, _ => true)
      val nearB = near(batch, _ < id)
      val v =
        if (exactC.isDefined) ("exact_dup_corpus", exactC)
        else if (exactB.isDefined) ("exact_dup_batch", exactB)
        else if (nearC.isDefined) ("near_dup_corpus", nearC)
        else if (nearB.isDefined) ("near_dup_batch", nearB)
        else ("kept", None)
      id -> v
    }.toMap

  // ---- fixture: planted exact/near/short-doc structure ----
  private def template(t: Int): String =
    (0 until 30).map(j => s"w${(t * 7 + j * 3) % 50}").mkString(" ")

  private val corpusDocs: Seq[(Long, String)] =
    (0 until 12).map(t => (t + 1).toLong -> template(t)) :+ (13L -> template(0))

  private val batchDocs: Seq[(Long, String)] = Seq(
    101L -> template(0),                                  // exact copy of corpus 1/13
    102L -> template(20),                                 // novel
    103L -> template(20),                                 // copy of 102 (within batch)
    104L -> template(1).replace(" w22 ", " zz9 "),        // near corpus 2
    105L -> (0 until 30).map(j => s"u$j").mkString(" "),  // unique vocab → kept
    106L -> "one two",                                    // < 3 tokens: no signature
    107L -> "one two",                                    // exact copy of 106
    108L -> template(0))                                  // corpus AND batch exact dup

  private lazy val corpusDf = corpusDocs.toDF("doc_id", "text")
  private lazy val batchDf = batchDocs.toDF("doc_id", "text")

  test("dedupIndex: one row per doc; short docs keep exact hash with null signature") {
    val idx = IncrementalDedup.dedupIndex(batchDf, "doc_id", "text").collect()
    assert(idx.length === batchDocs.size)
    val short = idx.find(_.getLong(0) == 106L).get
    assert(short.getString(1) === md5hex("one two"))
    assert((2 to 9).forall(short.isNullAt), "short doc must have null minhashes")
    val full = idx.find(_.getLong(0) == 101L).get
    assert((2 to 9).map(full.getString) === sig(template(0)).get)
  }

  test("incrementalDedup: verdicts match the brute-force reference") {
    val index = IncrementalDedup.dedupIndex(corpusDf, "doc_id", "text")
    val got = IncrementalDedup
      .incrementalDedup(index, batchDf, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    val want = referenceVerdicts(corpusDocs, batchDocs)
    assert(got === want)
    // the planted certainties hold regardless of minhash collisions
    assert(got(101L) === ("exact_dup_corpus", Some(1L)))
    assert(got(103L) === ("exact_dup_batch", Some(102L)))
    assert(got(105L)._1 === "kept")
    assert(got(106L)._1 === "kept") // short doc, novel content
    assert(got(107L) === ("exact_dup_batch", Some(106L)))
    // corpus match outranks the equally-exact batch match (101 < 108)
    assert(got(108L) === ("exact_dup_corpus", Some(1L)))
  }

  test("survivorIndex: exactly the kept docs' signatures, ready to append") {
    val index = IncrementalDedup.dedupIndex(corpusDf, "doc_id", "text")
    val bidx = IncrementalDedup.dedupIndex(batchDf, "doc_id", "text")
    val verdicts = IncrementalDedup.incrementalDedup(index, batchDf, "doc_id", "text")
    val kept = verdicts.filter(col("verdict") === "kept")
      .select("doc_id").as[Long].collect().toSet
    val surv = IncrementalDedup.survivorIndex(bidx, verdicts, "doc_id")
    assert(surv.select("doc_id").as[Long].collect().toSet === kept)
    assert(surv.columns.toSeq === bidx.columns.toSeq)
    // the advanced index accepts the next batch: re-running the SAME
    // batch against (index ∪ survivors) kills every doc as a dup
    val advanced = index.unionByName(surv)
    val again = IncrementalDedup.incrementalDedup(advanced, batchDf, "doc_id", "text")
    assert(again.filter(col("verdict") === "kept").count() === 0L)
  }
}
