package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("outlierFlags: Tukey fences flag far values, exact at integer quartiles") {
    // group g: values 10,10,12,12,100 → p25=10, p75=12, IQR=2,
    // fences [7, 15] → only 100 flagged
    val rows = Seq(
      (1L, "g", 10L), (2L, "g", 10L), (3L, "g", 12L), (4L, "g", 12L),
      (5L, "g", 100L),
      // single-value group: IQR 0 → nothing flagged
      (6L, "h", 5L), (7L, "h", 5L))
      .toDF("id", "grp", "v")
    val out = TextAnalysis.outlierFlags(rows, "grp", "id", "v")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true, 6L -> false, 7L -> false))
  }

  test("rareTokenProfile: integer-exact rare counts and basis points") {
    val docs = Seq(
      (1L, "common common rare1"), // rare1 df=1
      (2L, "common zz common"),    // zz df=1
      (3L, "common"),              // common df=3 → never rare at maxDf=1
      (4L, "   ")).toDF("doc_id", "text") // zero tokens → no row
    val out = TextAnalysis.rareTokenProfile(docs, "doc_id", "text", maxDf = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      1L -> ((3L, 1L, 3333L)), // 1/3 rare → floor(10000/3)
      2L -> ((3L, 1L, 3333L)),
      3L -> ((1L, 0L, 0L))))
  }

  test("docFrequency counts docs per token once and carries corpus size") {
    val docs = Seq(
      (1L, "the fox the fox jumps"),
      (2L, "the river"),
      (3L, "fox")).toDF("doc_id", "text")
    val rows = TextAnalysis.docFrequency(docs, "doc_id", "text")
      .select("token", "df_docs", "n_docs")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("the") === (2L, 3L))   // repeated in doc 1 counts once
    assert(rows("fox") === (2L, 3L))
    assert(rows("jumps") === (1L, 3L))
    assert(rows("river") === (1L, 3L))
    // smoothed idf: ln((N+1)/(df+1))
    val idf = TextAnalysis.docFrequency(docs, "doc_id", "text")
      .filter(col("token") === "jumps").select("idf")
      .collect().head.getDouble(0)
    assert(math.abs(idf - math.log(4.0 / 2.0)) < 1e-12)
  }

  test("repetitionStats: token/bigram tops and the 20%-top-token rule") {
    val docs = Seq(
      (1L, "spam spam spam spam ham"),   // top token 4/5 → repetitive
      (2L, "all words here are different"),
      (3L, "solo")).toDF("doc_id", "text") // 1 token, no bigrams
    val rows = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(rows(1L) === ((5L, 2L, 4L, 3L, true))) // "spam spam" x3
    assert(rows(2L) === ((5L, 5L, 1L, 1L, true))) // 1*5 >= 5: degenerate all-distinct
    assert(rows(3L) === ((1L, 1L, 1L, 0L, true)))
    // a genuinely diverse longer doc is NOT repetitive
    val div = TextAnalysis.repetitionStats(
      Seq((9L, "one two three four five six")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(!div.getBoolean(5))
  }

  test("dupNgramStats counts shingles shared with at least one other doc") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),   // shingles: 3, all shared with 2
      (2L, "the quick brown fox sleeps"),  // 3 shingles, 2 shared with 1
      (3L, "completely different text lives here"),
      (4L, "too short")).toDF("doc_id", "text")
    val rows = TextAnalysis.dupNgramStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: "the quick brown","quick brown fox" shared; "brown fox jumps" unique
    assert(rows(1L) === ((3L, 2L)))
    assert(rows(2L) === ((3L, 2L)))
    assert(rows(3L) === ((3L, 0L)))
    assert(!rows.contains(4L)) // < k tokens → no shingles → no row
  }

  test("valueProfile: exact discrete percentiles from the histogram") {
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 5L), ("b", 5L), ("b", 7L))).toDF("src", "v")
    val rows = TextAnalysis.valueProfile(df, "src", "v", Seq(50, 90))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // a: 1..10 → p50 = value at rank ceil(5) = 5, p90 = rank 9
    assert(rows("a") === ((10L, 1L, 10L, 55L, 5L, 9L)))
    // b: [5,5,7] → p50 = rank ceil(1.5)=2 → 5, p90 = rank ceil(2.7)=3 → 7
    assert(rows("b") === ((3L, 5L, 7L, 17L, 5L, 7L)))
  }

  test("winnowOverlapPairs: passage-sharing docs pair, unrelated docs don't") {
    val lifted = "zebra quantum lighthouse meridian velvet"
    val docs = Seq(
      (1L, s"first document begins here $lifted and then diverges wildly"),
      (2L, s"totally different opening $lifted closing words differ too"),
      (3L, "nothing in common with anything else at all here"),
      (4L, "another fully unrelated piece of writing entirely")).toDF("doc_id", "text")
    val out = TextAnalysis.winnowOverlapPairs(docs, "doc_id", "text")
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.unpersist()
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) >= 2L)
  }

  test("chunkDocs: overlapping chunks cover all tokens; short docs one chunk") {
    val doc = (1 to 20).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, doc), (2L, "a b"), (3L, "   ")).toDF("doc_id", "text")
    // chunk=8, overlap=2, stride=6 → starts 1,7,13 (start 19 is inside
    // the final overlap); chunks: t1..t8, t7..t14, t13..t20
    val rows = TextAnalysis.chunkDocs(docs, "doc_id", "text", 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(rows((1L, 0L)) === (((1 to 8).map("t" + _).mkString(" "), 8L)))
    assert(rows((1L, 1L)) === (((7 to 14).map("t" + _).mkString(" "), 8L)))
    assert(rows((1L, 2L)) === (((13 to 20).map("t" + _).mkString(" "), 8L)))
    assert(!rows.contains((1L, 3L)))
    assert(rows((2L, 0L)) === (("a b", 2L)))   // short doc: single chunk
    assert(!rows.keys.exists(_._1 == 3L))      // zero tokens → no rows
    // consecutive chunks share exactly the overlap
    val c0 = rows((1L, 0L))._1.split(" ").toSet
    val c1 = rows((1L, 1L))._1.split(" ").toSet
    assert(c0.intersect(c1) === Set("t7", "t8"))
  }

  test("packByBudget: first-fit bins per shard, integer cumulative sums") {
    val docs = Seq(
      (1L, "a", (1 to 100).map(_ => "x").mkString(" ")),  // 100 tokens
      (2L, "a", (1 to 100).map(_ => "x").mkString(" ")),  // cum_before 100 → bin 0
      (3L, "a", (1 to 100).map(_ => "x").mkString(" ")),  // cum_before 200 → bin 0
      (4L, "a", "y"),                                      // cum_before 300 → bin 1
      (5L, "b", (1 to 600).map(_ => "z").mkString(" ")),  // own shard, bin 0
      (6L, "b", "w"))                                      // cum_before 600 → bin 2
      .toDF("doc_id", "source", "text")
    val rows = TextAnalysis.packByBudget(docs, "source", "doc_id", "text", 256L)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) === ((100L, 0L)))
    assert(rows(2L) === ((100L, 0L)))
    assert(rows(3L) === ((100L, 0L)))
    assert(rows(4L) === ((1L, 1L)))
    assert(rows(5L) === ((600L, 0L)))
    assert(rows(6L) === ((1L, 2L)))
  }

  test("tfidfKeywords ranks rare repeated tokens above ubiquitous ones") {
    val docs = Seq(
      (1L, "zebra zebra the the the"),  // zebra: tf 2 rare; the: tf 3 ubiquitous
      (2L, "the quick fox"),
      (3L, "the slow fox")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    // doc1: zebra tf=2, df=1 → 2*ln(4/2)=1.386; the tf=3, df=3 → 3*ln(4/4)=0
    assert(rows((1L, 1L)) === (("zebra", 2L)))
    assert(rows((1L, 2L)) === (("the", 3L)))
    // doc2: quick/fox tie on tf=1; fox df=2 < quick df=1? quick df=1 is rarer
    assert(rows((2L, 1L)) === (("quick", 1L)))
    assert(rows((2L, 2L)) === (("fox", 1L)))
  }

  test("topTokens ranks by occurrences then lexicographically, with doc frequency") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry banana"),
      (3L, "cherry")).toDF("doc_id", "text")
    val rows = TextAnalysis.topTokens(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("apple", 3L, 2L), ("banana", 2L, 2L)))
  }

  test("winnow: docs sharing a substring of length >= k+w-1 share a fingerprint") {
    // k=8, w=4: guarantee kicks in at 11 shared chars; share a much
    // longer run to be safely past boundary effects
    val shared = "zebra quantum lighthouse"
    val docs = Seq(
      (1L, s"first document begins here $shared and then diverges"),
      (2L, s"totally different opening $shared closing words differ")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
    val common = fps.filter(col("doc_id") === 1L).select("fp")
      .intersect(fps.filter(col("doc_id") === 2L).select("fp"))
    assert(common.count() >= 1)
    // and two unrelated docs share nothing
    val other = Seq(
      (3L, "aaaa bbbb cccc dddd eeee ffff"),
      (4L, "gggg hhhh iiii jjjj kkkk llll")).toDF("doc_id", "text")
    val ofps = TextAnalysis.winnowFingerprints(other, "doc_id", "text")
    assert(ofps.filter(col("doc_id") === 3L).select("fp")
      .intersect(ofps.filter(col("doc_id") === 4L).select("fp")).count() === 0)
  }

  test("winnow: whitespace/case variants produce identical summaries") {
    val docs = Seq(
      (1L, "The Quick   Fox\tJumps over it"),
      (2L, "the quick fox jumps over it")).toDF("doc_id", "text")
    val rows = TextAnalysis.winnow(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(rows(0) === rows(1))
  }

  test("winnow: shorter than k yields no row; fewer than w grams yields one window") {
    val docs = Seq(
      (1L, "tiny"),               // 4 chars < k=8 → no row
      (2L, "abcdefghi")).toDF("doc_id", "text") // 9 chars → 2 grams < w → 1 window
    val out = TextAnalysis.winnow(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L))
    assert(out.head.getLong(1) === 1L) // single window → single fingerprint
  }

  test("winnow: summary n_fps equals the exploded distinct count") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again")).toDF("doc_id", "text")
    val n = TextAnalysis.winnow(docs, "doc_id", "text")
      .select("n_fps").collect().head.getLong(0)
    val exploded = TextAnalysis.winnowFingerprints(docs, "doc_id", "text").count()
    assert(n === exploded)
  }

  test("tokens drop empties and lowercase") {
    val out = Seq("The  Quick   fox ").toDF("t")
      .select(TextAnalysis.tokens(col("t")).as("ts"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("the", "quick", "fox"))
  }

  test("shingles: k=3 over tokens; short docs yield empty array") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(TextAnalysis.shinglesOfText(col("t")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
    // token-array form agrees (the materialized fast path)
    val viaToks = Seq("a b c d").toDF("t")
      .withColumn("ts", TextAnalysis.tokens(col("t")))
      .select(TextAnalysis.shingles(col("ts")).as("s"))
      .collect().head.getSeq[String](0)
    assert(viaToks === Seq("a b c", "b c d"))
  }

  test("token counts: whitespace vs BPE-ish with punctuation") {
    val r = Seq("hello, world! it's 42").toDF("t").select(
      TextAnalysis.tokenCountWs(col("t")).as("ws"),
      TextAnalysis.tokenCountBpe(col("t")).as("bpe"),
      TextAnalysis.punctCount(col("t")).as("p"),
      TextAnalysis.alnumCharCount(col("t")).as("a")).collect().head
    assert(r.getAs[Int]("ws") === 4)
    // hello , world ! it ' s 42 → 8
    assert(r.getAs[Int]("bpe") === 8)
    assert(r.getAs[Int]("p") === 3)  // , ! '
    assert(r.getAs[Int]("a") === 15) // helloworldits42
  }

  test("language ID votes stopwords, ties break lexicographically, no hits → und") {
    val docs = Seq(
      (1L, "the quick fox"),        // en
      (2L, "data row stuff"),       // es (data+row)
      (3L, "qqq zzz www"),          // no hits → und
      (4L, "the data")              // tie en(1) es(1) → en
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "es", 3L -> "und", 4L -> "en"))
  }

  test("langMix: code-switched doc flagged, monolingual and zero-hit docs not") {
    val docs = Seq(
      (1L, "the a fast slow the a"),      // pure en → second share 0
      (2L, "the a fast data row stuff"),  // en 3, es 2 → es at 4000bp, mixed
      (3L, "qqq zzz"),                    // zero hits → und, not mixed
      (4L, "the data")                    // en 1, es 1 → 5000bp each, mixed
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langMix(docs, "doc_id", "text", mixedBp = 3000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2),
          Option(r.getString(3)), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) === (("en", 10000L, None, 0L, false)))
    assert(out(2L) === (("en", 6000L, Some("es"), 4000L, true)))
    assert(out(3L) === (("und", 0L, None, 0L, false)))
    assert(out(4L) === (("en", 5000L, Some("es"), 5000L, true)))
  }

  test("bigramLogProb: hand-computed interpolated probabilities on a tiny corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "solo")).toDF("doc_id", "text")
    // unigrams a:3 b:3 solo:1, N=7; bigrams (a,b):2 (b,a):2
    // p(b|a) = .8*2/3 + .2*3/7; p(a|b) = .8*2/3 + .2*3/7 — identical
    val p = 0.8 * 2.0 / 3.0 + 0.2 * 3.0 / 7.0
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text", 8000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - math.log(p)) < 1e-9)
    assert(out(2L) === ((1L, out(2L)._2)))
    assert(math.abs(out(2L)._2 - math.log(p)) < 1e-9)
    assert(!out.contains(3L), "single-token doc has no bigrams")
  }

  test("bigramLogProb: corpus-typical word order outscores shuffled order") {
    // model trained on text where 'x y' always follows that order; a doc
    // using the reverse order must score strictly lower
    val docs = Seq(
      (1L, "x y x y x y x y"), (2L, "x y x y"), (3L, "y x y x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text", 8000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) > out(3L))
  }

  test("blocklistFlags: exact hit mass in basis points, zero-hit and any-hit modes") {
    val docs = Seq(
      (1L, "bad bad ok ok ok ok ok ok ok ok"),  // 2/10 = 2000bp
      (2L, "all clean tokens here"),            // 0 hits
      (3L, "bad")                               // 1/1 = 10000bp
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFlags(docs, "doc_id", "text",
        Seq("bad"), maxBp = 1500L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((10L, 2L, 2000L, true)))
    assert(out(2L) === ((4L, 0L, 0L, false)))
    assert(out(3L) === ((1L, 1L, 10000L, true)))
    // maxBp = 0 → any single hit blocks
    val any = TextAnalysis.blocklistFlags(docs, "doc_id", "text",
        Seq("clean"), maxBp = 0L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(any === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("fingerprint is whitespace/case-insensitive and 16 hex chars") {
    val out = Seq("The  Quick Fox", "the quick fox", "other")
      .toDF("t").select(TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect().map(_.getString(0))
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
    assert(out(0).matches("[0-9a-f]{16}"))
  }

  test("scrubPii redacts emails, phones, and long ids; clean text untouched") {
    val out = Seq(
      "write to jane.doe+x@mail.example.org today",
      "call +1 (555) 123-4567 now",
      "ssn-ish 987654321 in line",
      "short 12345 stays; clean prose stays")
      .toDF("t").select(TextAnalysis.scrubPii(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(out(0) === "write to <EMAIL> today")
    assert(out(1) === "call <PHONE> now")
    assert(out(2) === "ssn-ish <ID> in line")
    assert(out(3) === "short 12345 stays; clean prose stays")
  }

  test("unigramLogProb: common-token docs outscore rare-token docs; exact on a tiny corpus") {
    // corpus: "a a a b" -> p(a)=3/4, p(b)=1/4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._2) === Seq(3L, 1L))
    assert(math.abs(got(0)._3 - math.log(0.75)) < 1e-12)
    assert(math.abs(got(1)._3 - math.log(0.25)) < 1e-12)
    assert(got(0)._3 > got(1)._3)
  }

  test("madOutliers: known medians, integer-exact threshold, MAD=0 degeneracy") {
    // group g: values 10,10,10,100 -> med=10, adev=0,0,0,90 -> mad=0
    //   -> only the 90-deviation row flags (0.6745*90 > 0)
    // group h: 1..7 -> med=4, adev=3,2,1,0,1,2,3 -> mad=2
    //   -> flag iff 0.6745*adev > 7.0: none (max adev 3 -> 2.02)
    val df = (Seq((1L, "g", 10L), (2L, "g", 10L), (3L, "g", 10L), (4L, "g", 100L)) ++
      (1 to 7).map(i => (10L + i, "h", i.toLong))).toDF("id", "grp", "v")
    val got = TextAnalysis.madOutliers(df, "grp", "id", "v")
      .orderBy("id").as[(Long, String, Long, Long, Long, Boolean)].collect().toSeq
    val g = got.filter(_._2 == "g")
    assert(g.map(_._4).distinct === Seq(10L) && g.map(_._5).distinct === Seq(0L))
    assert(g.map(r => r._1 -> r._6).toMap === Map(1L -> false, 2L -> false,
      3L -> false, 4L -> true))
    val h = got.filter(_._2 == "h")
    assert(h.map(_._4).distinct === Seq(4L) && h.map(_._5).distinct === Seq(2L))
    assert(h.forall(!_._6))
  }

  test("normalizeText: lowercase, whitespace collapse, control strip, trim") {
    val got = Seq("  Hello\t\tWorld\u0007 x\n", "A\nB").toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got === Seq("hello world x", "a b"))
  }

  test("bm25: hand-computed score on a two-doc corpus; non-matching docs absent") {
    // corpus: d1="x x y", d2="z z z"; query=("x") -> only d1 matches
    // N=2, df(x)=1, idf=ln(1+(2-1+0.5)/1.5)=ln(2); dl1=3, avgdl=3
    // term = ln(2)*2*2.2/(2+1.2*(0.25+0.75*1)) = ln(2)*4.4/3.2
    val docs = Seq((1L, "x x y"), (2L, "z z z")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("x"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(1L))
    assert(got.head._2 === 1L)
    assert(math.abs(got.head._3 - math.log(2.0) * 4.4 / 3.2) < 1e-12)
  }

  test("bm25 ranks the doc with more query-term mass higher under equal length") {
    val docs = Seq((1L, "q q q a"), (2L, "q a a a"), (3L, "a a a a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("q"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) > got(2L))
  }

  test("winsorize clamps to the sample percentiles; standardize z-scores per group") {
    val vals = (1 to 99).map(_.toDouble) :+ 1000.0 // one extreme outlier
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val w = TextAnalysis.winsorize(df, "v", pLo = 1, pHi = 99)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val hi = w.values.max
    assert(hi < 1000.0 && hi > 99.0)   // the outlier is capped at p99
    assert(w(49L) === 50.0)            // interior values untouched
    val z = TextAnalysis.standardize(
        Seq(("a", 1.0), ("a", 3.0), ("b", 7.0), ("b", 7.0)).toDF("g", "v"),
        "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // group a: mean 2, sample stddev sqrt(2) → z = ±1/sqrt(2)
    val za = z.filter(_._1 == "a").map(_._3).sorted
    assert(math.abs(za(0) + 1 / math.sqrt(2)) < 1e-12 &&
      math.abs(za(1) - 1 / math.sqrt(2)) < 1e-12)
    // constant group: σ = 0 → exactly 0, never NaN
    assert(z.filter(_._1 == "b").forall(_._3 === 0.0))
  }

  test("buildVocab + encodeDocs: frequency-ranked ids, positional round-trip") {
    val docs = Seq((1L, "b b a c"), (2L, "c c b")).toDF("doc_id", "text")
    // counts: b=3, c=3, a=1 → ids by (count desc, token): b=1, c=2, a=3
    val vocab = TextAnalysis.buildVocab(docs, "doc_id", "text")
    val v = vocab.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v === Map("b" -> (1L, 3L), "c" -> (2L, 3L), "a" -> (3L, 1L)))
    val enc = TextAnalysis.encodeDocs(docs, "doc_id", "text", vocab)
      .orderBy("doc_id", "pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc === Seq((1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 3L), (1L, 3L, 2L),
      (2L, 0L, 2L), (2L, 1L, 2L), (2L, 2L, 1L)))
  }

  test("dsirWeights: target-like documents outscore off-target ones") {
    val docs = Seq(
      (1L, "good clean prose here", true),   // target slice
      (2L, "good clean words too", true),    // target slice
      (3L, "spam junk spam junk", false),    // raw-only
      (4L, "good clean prose words", false), // held out, target-like
      (5L, "junk spam junk noise", false))   // held out, off-target
      .toDF("doc_id", "text", "is_tgt")
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(w(4L) > w(5L))     // target-like held-out doc wins
    assert(w(1L) > w(3L))     // target member beats pure off-target
    // n_tokens passes through
    val n = TextAnalysis.dsirWeights(docs, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) === 4L && n(3L) === 4L)
  }

  test("searchAll: AND semantics — all terms required, repeats don't " +
    "double-count, case-folds") {
    val docs = Seq(
      (1L, "the data table join"),          // all three
      (2L, "data data data table"),         // repeats of 2 terms only
      (3L, "Data TABLE Join extra words"),  // case variants of all three
      (4L, "nothing relevant"),
      (5L, "join table"))                   // 2 of 3
      .toDF("doc_id", "text")
    val got = TextAnalysis.searchAll(docs, "doc_id", "text",
        Seq("data", "table", "join"))
      .orderBy("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L))
  }

  test("searchPhrase: adjacency required, order matters, repeated-word " +
    "phrases and multi-occurrence docs work") {
    val docs = Seq(
      (1L, "big data table scan"),      // "data table" adjacent
      (2L, "data in the table"),        // both words, not adjacent
      (3L, "table data"),               // reversed order
      (4L, "data table and data table"),// two occurrences → one row
      (5L, "data data stream"))         // repeated-word phrase target
      .toDF("doc_id", "text")
    val got = TextAnalysis.searchPhrase(docs, "doc_id", "text",
        Seq("data", "table"))
      .orderBy("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 4L))
    val rep = TextAnalysis.searchPhrase(docs, "doc_id", "text",
        Seq("data", "data"))
      .orderBy("doc_id").as[Long].collect().toSeq
    assert(rep === Seq(5L))
    // three-term phrase chains through both joins
    val tri = TextAnalysis.searchPhrase(docs, "doc_id", "text",
        Seq("big", "data", "table"))
      .as[Long].collect().toSeq
    assert(tri === Seq(1L))
  }

  test("minMaxScale: exact endpoints, per-group bounds, constant group → 0") {
    val rows = Seq(("a", 10.0), ("a", 20.0), ("a", 15.0),
      ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val got = TextAnalysis.minMaxScale(rows, "g", "v")
      .orderBy("g", "v").select("g", "v", "v_mm")
      .as[(String, Double, Double)].collect().toSeq
    assert(got === Seq(("a", 10.0, 0.0), ("a", 15.0, 0.5), ("a", 20.0, 1.0),
      ("b", 7.0, 0.0), ("b", 7.0, 0.0)))
  }

  test("benfordProfile: exact digit shares; absent digits emit 0; " +
    "non-positive values excluded") {
    // values 1.00, 1.50, 19.99, 2.00, -3.0, 0.0 → digits 1,1,1,2
    val rows = Seq(1.00, 1.50, 19.99, 2.00, -3.0, 0.0).toDF("v")
    val got = TextAnalysis.benfordProfile(rows, "v")
      .orderBy("digit").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) === Seq(
      (1L, 3L, 7500L), (2L, 1L, 2500L), (3L, 0L, 0L), (4L, 0L, 0L),
      (5L, 0L, 0L), (6L, 0L, 0L), (7L, 0L, 0L), (8L, 0L, 0L), (9L, 0L, 0L)))
    assert(got.head._4 === 3010L)   // expected distribution rides along
  }

  test("encodingAnomalies: replacement / mojibake / control counts " +
      "and the clean flag; tab and newline are NOT control hits") {
    val repl = "\ufffd"
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "bad " + repl + " byte " + repl),
      (3L, "caf\u00c3\u00a9 double-encoded \u00c3\u00a9"),
      (4L, "bell\u0007 and tab\t and nl\n stay"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.encodingAnomalies(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_replacement", "n_mojibake", "n_control", "clean")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got(0) === ((0L, 0L, 0L, true)))
    assert(got(1) === ((2L, 0L, 0L, false)))
    assert(got(2) === ((0L, 2L, 0L, false)))
    assert(got(3) === ((0L, 0L, 1L, false)), "only BEL counts, not tab/nl")
    assert(got(4) === ((0L, 0L, 0L, true)))
  }

  test("tokenizerFertility: hand counts; empty-text group reports NULL ratios") {
    val docs = Seq(
      ("en", "it's a test"),        // ws 3; bpe: it ' s a test = 5; chars 11
      ("en", "plain words"),        // ws 2; bpe 2; chars 11
      ("xx", "")).toDF("lang", "text")
    val got = TextAnalysis.tokenizerFertility(docs, "lang", "text")
      .orderBy("lang").collect()
    val en = got(0)
    assert(en.getAs[Long]("n_docs") === 2L)
    assert(en.getAs[Long]("total_chars") === 22L)
    assert(en.getAs[Long]("total_ws_tokens") === 5L)
    assert(en.getAs[Long]("total_bpe_tokens") === 7L)
    assert(en.getAs[Double]("fertility") === 1.4)
    assert(en.getAs[Double]("chars_per_token") === 3.142857)
    val xx = got(1)
    assert(xx.getAs[Long]("total_ws_tokens") === 0L)
    assert(xx.isNullAt(5) && xx.isNullAt(6))
  }

  test("shingleNovelty: first doc owns its shingles; a verbatim repeat " +
      "scores 0; short docs report 0 shingles") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles: "a b c","b c d" -> both first here
      (2L, "a b c d"),   // same shingles, later id -> novelty 0
      (3L, "a b c x"),   // "a b c" old, "b c x" new -> 0.5
      (4L, "a b")        // < 3 tokens -> no shingles
    ).toDF("doc_id", "text")
    val got = TextAnalysis.shingleNovelty(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .select("n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got(0) === ((2L, 2L, 1.0)))
    assert(got(1) === ((2L, 0L, 0.0)))
    assert(got(2) === ((2L, 1L, 0.5)))
    assert(got(3) === ((0L, 0L, 0.0)))
  }

  test("oovProfile: top-K vocab with count-then-token ties; " +
      "multiplicity-weighted OOV; empty doc reports zeros") {
    // counts: a=4, b=3, c=2, d=2 -> vocabSize=3 keeps a,b,c
    // (c beats d on the token tie)
    val docs = Seq(
      (1L, "a a b c d"),
      (2L, "a a b b c d"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.oovProfile(docs, "doc_id", "text", vocabSize = 3)
      .orderBy("doc_id")
      .select("n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got(0) === ((5L, 1L, 0.2)))
    assert(got(1) === ((6L, 1L, 0.166667)))
    assert(got(2) === ((0L, 0L, 0.0)))
  }

  test("oovProfile plans the vocab as TakeOrderedAndProject, not a " +
      "global sort") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.oovProfile(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("compressionRatio: repetitive text compresses far below noisy " +
      "text; bounds and degenerate rows hold") {
    val rep = "spam spam spam " * 200
    // deterministic pseudo-noise (seeded PRNG — an arithmetic
    // progression mod 94 is itself highly compressible)
    val rng = new scala.util.Random(42)
    val noise = Seq.fill(3000)((rng.nextInt(94) + 33).toChar).mkString
    val docs = Seq((1L, rep), (2L, noise), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    val repRatio = byId(1L).getAs[Long]("ratio_milli")
    val noiseRatio = byId(2L).getAs[Long]("ratio_milli")
    assert(repRatio < 100L, s"repetitive text should crush: $repRatio")
    assert(noiseRatio > 700L, s"noise should resist: $noiseRatio")
    assert(byId(1L).getAs[Long]("n_bytes") === rep.length.toLong)
    got.foreach { r =>
      assert(r.getAs[Long]("n_deflate") > 0L) // deflate of "" is 2 bytes
    }
    // empty and null text: no content → NULL ratio (NOT the 2000 the
    // 2-byte empty deflate would imply, which would out-noise any
    // real document)
    for (id <- Seq(3L, 4L)) {
      assert(byId(id).getAs[Long]("n_bytes") === 0L)
      assert(byId(id).isNullAt(byId(id).fieldIndex("ratio_milli")))
    }
  }

  test("compressionRatio raises on a NULL id instead of dropping the row") {
    val docs = Seq((Some(1L), "ok"), (None, "lost")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.compressionRatio(docs, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("NULL id"))
  }

  test("compressionRatio is stable across partitionings (per-partition " +
      "Deflater reset cannot leak state between rows)") {
    val docs = Seq.tabulate(20)(i => (i.toLong, s"doc $i " * (i + 1)))
      .toDF("doc_id", "text")
    val one = TextAnalysis.compressionRatio(docs.coalesce(1),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    val many = TextAnalysis.compressionRatio(docs.repartition(7),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(one === many)
  }

  test("cooccurrencePmi: exact pair/marginal counts and the closed form") {
    val docs = Seq(("x y x y")).toDF("text")
    // window 2 pairs: (x,y) x3, (x,x), (y,y); T=5; slot marginals x=5, y=5
    val rows = TextAnalysis.cooccurrencePmi(docs, "text", minCount = 1L)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows(("x", "x"))._1 === 1L)
    assert(rows(("y", "y"))._1 === 1L)
    val (np, na, nb, pmi) = rows(("x", "y"))
    assert(np === 3L && na === 5L && nb === 5L)
    assert(math.abs(pmi - math.log(4.0 * 5 * 3 / 25.0)) < 1e-6)
    // minCount prunes the tail but marginals stay full-stream
    val pruned = TextAnalysis.cooccurrencePmi(docs, "text", minCount = 2L)
      .collect()
    assert(pruned.length === 1 && pruned.head.getString(0) === "x"
      && pruned.head.getLong(3) === 5L)
  }

  test("zipfFit: an exact power-law corpus fits slope −2 with r² = 1") {
    import spark.implicits._
    // counts 144/r² at ranks 1..4: ln-ln is an exact line of slope −2
    val text = Seq.tabulate(4) { i =>
      val cnt = 144 / ((i + 1) * (i + 1))
      Seq.fill(cnt)(s"t$i").mkString(" ")
    }.mkString(" ")
    val r = TextAnalysis.zipfFit(Seq(Tuple1(text)).toDF("text"), "text",
      k = 10).head()
    assert(r.getAs[Long]("k_used") === 4L &&
      r.getAs[Long]("n_distinct") === 4L)
    assert(math.abs(r.getAs[Double]("slope") - (-2.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
    assert(math.abs(math.exp(r.getAs[Double]("intercept")) - 144.0) < 1e-6)
  }

  test("heapsFit: an exact V = n^0.5 growth curve fits beta 0.5, K 1, " +
    "r2 1; saturated vocabulary NULLs r2 on the exact guard") {
    import spark.implicits._
    // 4 docs = 4 blocks; cumulative (tokens, vocab) = (4,2) (16,4)
    // (64,8) (256,16) — exactly on the ln-ln line of slope 1/2
    def doc(newToks: Seq[String], filler: Int): String =
      (newToks ++ Seq.fill(filler)("a")).mkString(" ")
    val docs = Seq(
      (0L, "a b a b"),
      (1L, doc(Seq("c", "d"), 10)),
      (2L, doc(Seq("e", "f", "g", "h"), 44)),
      (3L, doc((1 to 8).map(i => s"n$i"), 184))
    ).toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(docs, "doc_id", "text", maxBlocks = 4L)
      .head()
    assert(r.getAs[Long]("n_blocks") === 4L &&
      r.getAs[Long]("n_tokens") === 256L &&
      r.getAs[Long]("n_vocab") === 16L)
    assert(math.abs(r.getAs[Double]("beta") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("k") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
    // saturated vocabulary: growth flat → r2 undefined via the exact
    // min = max guard (the float moment is a ±1e-9 rounding residue)
    val flat = Seq((0L, "a b"), (1L, "a b a"), (2L, "b a b"))
      .toDF("doc_id", "text")
    val f = TextAnalysis.heapsFit(flat, "doc_id", "text", maxBlocks = 3L)
      .head()
    assert(!f.isNullAt(f.fieldIndex("beta")))
    assert(f.isNullAt(f.fieldIndex("r2")))
    // a NULL doc id raises (the checkedLong stance) instead of
    // silently forming a first-sorting NULL block that skews the fit
    val withNull = Seq((Some(0L), "a b"), (None, "c d"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      TextAnalysis.heapsFit(withNull, "doc_id", "text", maxBlocks = 3L)
        .collect()
    }
    assert(ex.getMessage.contains("heapsFit"),
      s"expected heapsFit in: ${ex.getMessage}")
  }

  test("readability: exact counts and hand-computed Flesch/FK; floors " +
    "and the zero-word NULL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It ran fast!"),   // 6 words, 2 sentences, 6 syl
      (2L, "beautiful"),                   // eau+i+u = 3 syl, no terminal
      (3L, "7 !"),                         // both floor to 1 syllable
      (4L, "")                             // zero words → NULL scores
    ).toDF("doc_id", "text")
    val m = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((m(1L).getLong(1), m(1L).getLong(2), m(1L).getLong(3)) ===
      ((6L, 2L, 6L)))
    assert(math.abs(m(1L).getDouble(4) -
      (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-9)
    assert(math.abs(m(1L).getDouble(5) -
      (0.39 * 3.0 + 11.8 * 1.0 - 15.59)) < 1e-9)
    assert((m(2L).getLong(1), m(2L).getLong(2), m(2L).getLong(3)) ===
      ((1L, 1L, 3L)))
    assert((m(3L).getLong(1), m(3L).getLong(3)) === ((2L, 2L)))
    assert(m(4L).getLong(1) === 0L && m(4L).isNullAt(4) && m(4L).isNullAt(5))
  }
}
