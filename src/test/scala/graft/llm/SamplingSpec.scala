package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = spark.range(20000).selectExpr(
    "id AS doc_id", "concat('c', id % 7) AS cls")

  test("hashSplit: proportions track weights, labels partition the corpus, deterministic") {
    val split = Sampling.hashSplit(corpus, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel.values.sum === 20000L)
    assert(math.abs(byLabel("train") - 16000L) < 400, byLabel)
    assert(math.abs(byLabel("val") - 2000L) < 200, byLabel)
    // pure function of the id: a second run assigns identically
    val again = Sampling.hashSplit(corpus, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("sampleFraction: pure filter, nested fractions, stable membership") {
    val s10 = Sampling.sampleFraction(corpus, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val s30 = Sampling.sampleFraction(corpus, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(math.abs(s10.size - 2000) < 200, s10.size)
    // consistent hashing: a smaller fraction is a SUBSET of a larger one
    assert(s10.subsetOf(s30))
  }

  test("domainMixture: caps at 1, downsamples over-represented domains only") {
    // skewed corpus: a=6000, b=3000, c=1000 docs (total 10000, 3 domains)
    val skewed = spark.range(10000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id < 6000 THEN 'a' WHEN id < 9000 THEN 'b' ELSE 'c' END AS dom")
    val plan = Sampling.domainMixture(skewed, "dom").collect()
      .map(r => r.getAs[String]("dom") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("rate"), r.getAs[Long]("keep_threshold")))
      .toMap
    // a: rate = 10000/(6000*3) ≈ 0.5556; b and c cap at 1.0
    assert(math.abs(plan("a")._2 - 10000.0 / 18000.0) < 1e-12)
    assert(plan("b")._2 === 1.0 && plan("c")._2 === 1.0)
    assert(plan("b")._3 === 65536L && plan("c")._3 === 65536L)
    assert(plan("a")._3 === math.floor(10000.0 / 18000.0 * 65536).toLong)
  }

  test("mixtureSample: under-represented domains intact, kept set stable under other-domain growth") {
    val skewed = spark.range(10000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id < 6000 THEN 'a' WHEN id < 9000 THEN 'b' ELSE 'c' END AS dom")
    val kept = Sampling.mixtureSample(skewed, "dom", "doc_id")
    val byDom = kept.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("b") === 3000L && byDom("c") === 1000L) // never upsampled/cut
    assert(math.abs(byDom("a") - 10000.0 / 18000.0 * 6000) < 200, byDom)
    // consistent hashing: growing OTHER domains raises a's rate (a is now
    // relatively less over-represented), and because membership is a
    // hash-threshold filter the old kept set is PRESERVED — docs are only
    // added, never swapped (no train-set churn on corpus growth)
    val grown = spark.range(12000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id < 6000 THEN 'a' WHEN id < 11000 THEN 'b' ELSE 'c' END AS dom")
    val keptA = kept.filter($"dom" === "a").select("doc_id").as[Long].collect().toSet
    val grownA = Sampling.mixtureSample(grown, "dom", "doc_id")
      .filter($"dom" === "a").select("doc_id").as[Long].collect().toSet
    assert(keptA.subsetOf(grownA))
  }

  test("stratifiedSample: exactly k lowest-hash docs per class, ranks 1..k") {
    val got = Sampling.stratifiedSample(corpus, "doc_id", "cls", 3)
    val perClass = got.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perClass.size === 7 && perClass.values.forall(_ === 3L))
    val ranks = got.filter(col("cls") === "c0")
      .select("sample_rank").as[Int].collect().sorted
    assert(ranks.toSeq === Seq(1, 2, 3))
  }

  test("temperatureMixture: T=2 thresholds are exact sqrt ratios; T=1 keeps everything") {
    val df = (Seq.fill(4)("big") ++ Seq("small")).zipWithIndex
      .map { case (d, i) => (i.toLong, d) }.toDF("id", "dom")
    val t2 = Sampling.temperatureMixture(df, "dom", 2.0)
      .orderBy("dom").as[(String, Long, Double, Long)].collect().toSeq
    assert(t2 === Seq(
      ("big", 4L, 0.5, 32768L),      // sqrt(1/4) = 0.5
      ("small", 1L, 1.0, 65536L)))
    val t1 = Sampling.temperatureMixture(df, "dom", 1.0)
      .orderBy("dom").as[(String, Long, Double, Long)].collect().toSeq
    assert(t1.map(_._3) === Seq(1.0, 1.0)) // natural mixture untouched
  }

  test("temperatureSample membership is consistent-hash stable and domain-local") {
    val df = (1L to 200L).map(i => (i, if (i <= 160) "big" else "small"))
      .toDF("id", "dom")
    val kept = Sampling.temperatureSample(df, "dom", "id")
      .as[(Long, String)].collect().toMap
    // every small-domain doc survives (rate 1); big is downsampled
    assert((161L to 200L).forall(kept.contains))
    val bigKept = kept.keys.count(_ <= 160)
    assert(bigKept > 0 && bigKept < 160)
    // growing the OTHER domain raises n_min -> big's rate can only rise,
    // so membership grows MONOTONICALLY (consistent hashing: no churn)
    val grown = (1L to 160L).map(i => (i, "big")) ++
      (161L to 260L).map(i => (i, "small"))
    val kept2 = Sampling.temperatureSample(grown.toDF("id", "dom"), "dom", "id")
      .as[(Long, String)].collect().toMap
    assert(kept.keys.filter(_ <= 160).toSet
      .subsetOf(kept2.keys.filter(_ <= 160).toSet))
  }

  test("weightedBernoulli: size-biased, deterministic, saturating heavy items") {
    // 200 light rows (w=1) + 1 heavy row (w=10000): the heavy row's
    // p = 20*10000/10200 >> 1 → always kept; light rows keep ~2%
    val df = ((1L to 200L).map(i => (i, 1L)) :+ (999L, 10000L)).toDF("id", "w")
    val kept = Sampling.weightedBernoulli(df, "id", "w", targetCount = 20L)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(kept.contains(999L))
    assert(kept.size < 30) // expected ≈ 20, light rows are rare picks
    // deterministic membership
    val again = Sampling.weightedBernoulli(df, "id", "w", targetCount = 20L)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(again === kept)
    // zero-weight rows can never be selected
    val withZero = df.union(Seq((5000L, 0L)).toDF("id", "w"))
    assert(!Sampling.weightedBernoulli(withZero, "id", "w", 20L)
      .as[(Long, Long)].collect().map(_._1).contains(5000L))
  }

  test("mixture samplers rate NULL-domain docs instead of dropping them") {
    // 160 docs in "big", 40 with a NULL domain: the NULL stratum must
    // be sampled like any other (a null-unsafe plan join silently
    // drops all of them)
    val df = (1L to 200L).map(i =>
        (i, if (i <= 160) "big" else null.asInstanceOf[String]))
      .toDF("id", "dom")
    val mixKept = Sampling.mixtureSample(df, "dom", "id")
      .as[(Long, String)].collect().map(_._1).toSet
    val nullKept = mixKept.count(_ > 160)
    assert(nullKept > 0, "NULL-domain docs vanished from mixtureSample")
    // under-represented stratum passes through whole (rate 1)
    assert(nullKept === 40)
    val tempKept = Sampling.temperatureSample(df, "dom", "id")
      .as[(Long, String)].collect().map(_._1).toSet
    assert(tempKept.count(_ > 160) === 40,
      "NULL-domain docs vanished from temperatureSample")
  }

  test("weightedBernoulli rejects inputs that would overflow the keep test") {
    // Σw beyond 2⁶³⁻¹/65536 would silently wrap the Long cross-multiply
    val huge = Seq((1L, Long.MaxValue / 65536), (2L, Long.MaxValue / 65536))
      .toDF("id", "w")
    intercept[IllegalArgumentException] {
      Sampling.weightedBernoulli(huge, "id", "w", 1L)
    }
    // negative weights are meaningless and must be refused, not sampled
    intercept[IllegalArgumentException] {
      Sampling.weightedBernoulli(Seq((1L, -5L)).toDF("id", "w"), "id", "w", 1L)
    }
    // empty input stays empty rather than dividing by a null Σw
    assert(Sampling.weightedBernoulli(
      Seq.empty[(Long, Long)].toDF("id", "w"), "id", "w", 1L).count() === 0)
  }

  test("domainCap: exact cap per domain, small domains untouched, deterministic") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 105L).map(i => (i, "small"))).toDF("id", "dom")
    val kept = Sampling.domainCap(df, "dom", "id", 10)
      .as[(Long, String)].collect()
    val byDom = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byDom("big").size === 10)
    assert(byDom("small") === (101L to 105L).toSet) // under cap: all stay
    // deterministic: second run keeps the identical set
    val again = Sampling.domainCap(df, "dom", "id", 10)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(again === kept.map(_._1).toSet)
    // schema passes through untouched
    assert(Sampling.domainCap(df, "dom", "id", 10).columns.toSeq === Seq("id", "dom"))
  }

  test("shardPlan: partitions ids, contiguous in-shard positions, deterministic, seed-sensitive") {
    val docs = spark.range(5000).selectExpr("id AS doc_id")
    val plan = Sampling.shardPlan(docs, "doc_id", 8, 42L)
      .select("doc_id", "shard", "sort_key", "shard_pos")
      .as[(Long, Long, String, Long)].collect()
    assert(plan.length === 5000)
    assert(plan.map(_._1).toSet === (0L until 5000L).toSet) // a partition, no loss
    assert(plan.forall(r => r._2 >= 0 && r._2 < 8))
    // roughly balanced: each shard within ±20% of 625
    val sizes = plan.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.size === 8 && sizes.values.forall(n => n > 500 && n < 750), sizes)
    // shard_pos is 1..n per shard, ordered by sort_key
    sizes.foreach { case (sh, n) =>
      val rows = plan.filter(_._2 == sh).sortBy(_._4)
      assert(rows.map(_._4).toSeq === (1L to n.toLong))
      assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq)
    }
    // deterministic; a different seed is a different shuffle
    val again = Sampling.shardPlan(docs, "doc_id", 8, 42L)
      .select("doc_id", "shard", "sort_key", "shard_pos")
      .as[(Long, Long, String, Long)].collect()
    assert(again.sortBy(_._1).toSeq === plan.sortBy(_._1).toSeq)
    val other = Sampling.shardPlan(docs, "doc_id", 8, 7L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(plan.count(r => other(r._1) != r._2) > 1000, "reseed must reshuffle")
  }

  test("writeShards: one file per shard dir, rows inside in sort_key order") {
    val docs = spark.range(2000).selectExpr("id AS doc_id", "concat('t', id) AS text")
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Sampling.writeShards(docs, "doc_id", out, 4, 42L)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.map(_.getName).toSet === (0 until 4).map(i => s"shard=$i").toSet)
    val plan = Sampling.shardPlan(docs, "doc_id", 4, 42L)
      .select("doc_id", "shard", "sort_key")
      .as[(Long, Long, String)].collect()
    dirs.foreach { d =>
      val sh = d.getName.stripPrefix("shard=").toLong
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName}: one writer task per shard")
      val rows = spark.read.parquet(files.head.toString)
        .select("doc_id", "sort_key").as[(Long, String)].collect()
      val want = plan.filter(_._2 == sh).sortBy(_._3).map(r => (r._1, r._3))
      assert(rows.toSeq === want.toSeq, s"shard $sh out of order or incomplete")
    }
    // payload column survives the roundtrip
    val back = spark.read.parquet(out)
    assert(back.count() === 2000 &&
      back.columns.toSet === Set("doc_id", "text", "sort_key", "shard_pos", "shard"))
  }

  test("writeShards format=json emits JSONL shards with identical membership and order") {
    val docs = spark.range(300).selectExpr("id AS doc_id", "concat('t', id) AS text")
    val out = java.nio.file.Files.createTempDirectory("shards_json").toString
    Sampling.writeShards(docs, "doc_id", out, 4, 42L, format = "json")
    val d0 = new java.io.File(s"$out/shard=0").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(d0.length === 1, "one JSONL file per shard")
    // each line is a standalone JSON record, in sort_key order
    val lines = java.nio.file.Files.readAllLines(d0.head.toPath)
    val keys = new scala.collection.mutable.ArrayBuffer[String]
    lines.forEach { l =>
      assert(l.startsWith("{") && l.endsWith("}"), s"not JSONL: $l")
      keys += "\"sort_key\":\"(\\w+)\"".r.findFirstMatchIn(l).get.group(1)
    }
    assert(keys.toSeq === keys.sorted.toSeq, "shard file must be in shuffle order")
    val plan = Sampling.shardPlan(docs, "doc_id", 4, 42L)
      .filter(col("shard") === 0).count()
    assert(lines.size.toLong === plan)
  }

  test("shardManifest: counts cover the corpus; checksum detects a membership change") {
    val docs = spark.range(500).selectExpr("id AS doc_id")
    val m1 = Sampling.shardManifest(docs, "doc_id", 4, 42L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m1.values.map(_._1).sum === 500L)
    assert(m1.keySet === Set(0L, 1L, 2L, 3L))
    // same data, recomputed on a different layout → identical manifest
    val m2 = Sampling.shardManifest(docs.repartition(7), "doc_id", 4, 42L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m2 === m1)
    // drop one doc → exactly its shard's count and checksum change
    val m3 = Sampling.shardManifest(docs.filter(col("doc_id") =!= 123L),
        "doc_id", 4, 42L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val changed = m1.keySet.filter(k => m1(k) != m3(k))
    assert(changed.size === 1)
    assert(m1(changed.head)._1 - m3(changed.head)._1 === 1L)
  }

  test("epochUpsample: whole copies for all, fractional copy by exact hash threshold") {
    val docs = spark.range(400)
      .selectExpr("id AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS dom")
    // a = 2.5 epochs, b defaults to exactly 1
    val out = Sampling.epochUpsample(docs, "doc_id", "dom", Map("a" -> 25000L))
      .select("doc_id", "dom", "epoch").as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val aDocs = (0L until 400L by 2)
    // every a-doc gets epochs {0,1}; the fractional third copy is the
    // SAME exact-integer threshold the operator promises: hb < 16384
    val thr = (25000L % 10000L) * 65536L / 10000L
    aDocs.foreach { id =>
      val hb = Integer.parseInt(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).substring(0, 4), 16)
      val want = if (hb < thr) Seq(0L, 1L, 2L) else Seq(0L, 1L)
      assert(byDoc(id) === want, s"doc $id hb=$hb")
    }
    // b-docs pass through exactly once
    (1L until 400L by 2).foreach(id => assert(byDoc(id) === Seq(0L)))
    // and the fractional subset is a real subset, not empty or all
    val third = aDocs.count(id => byDoc(id).size == 3)
    assert(third > 0 && third < aDocs.size)
  }

  test("epochUpsample: bp below one epoch DOWN-samples; membership deterministic") {
    val docs = spark.range(1000).selectExpr("id AS doc_id", "'x' AS dom")
    val run1 = Sampling.epochUpsample(docs, "doc_id", "dom", Map("x" -> 5000L))
      .select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq
    val run2 = Sampling.epochUpsample(docs, "doc_id", "dom", Map("x" -> 5000L))
      .select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq
    assert(run1 === run2)
    assert(run1.forall(_._2 == 0L), "half an epoch means at most one copy")
    // ~half survive (consistent-hash thinning, exact threshold 32768)
    assert(run1.size > 400 && run1.size < 600, s"got ${run1.size}")
  }

  test("curriculumStages: exact-rank stages, balanced sizes, easy first") {
    // score = 10 - id: rank order is the REVERSE of id order
    val df = (0L until 10L).map(i => (i, 10L - i)).toDF("id", "score")
    val got = Sampling.curriculumStages(df, "id", "score", stages = 2,
        maxBlocks = 4L)
      .select("id", "rank", "stage").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // lowest scores (ids 9..5) fill stage 0; ids 4..0 stage 1
    assert(got.map(_._3) === Seq(1L, 1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L))
    assert(got.find(_._1 == 9L).get._2 === 0L, "easiest doc ranks first")
    assert(got.map(_._2).sorted === (0L until 10L))
  }

  test("curriculumStages: ids past 2^32 and negative scores rank fine " +
      "(tie-column form, no composed-key overflow); float scores rejected") {
    // the r11 sf1.0 lesson: a re-keyed corpus put doc ids at 5e9 and
    // the old score*2^32+id composition overflowed — the tie-column
    // rank has no id range constraint
    val big = Seq((5000001145L, 10L), (1L, 10L), (2L, -7L))
      .toDF("id", "score")
    val got = Sampling.curriculumStages(big, "id", "score", stages = 3,
        maxBlocks = 4L)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got(2L) === 0L, "negative score ranks first")
    assert(got(1L) === 1L, "score tie breaks on the smaller id")
    assert(got(5000001145L) === 2L)
    val dbl = Seq((1L, 0.5)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      Sampling.curriculumStages(dbl, "id", "score", 2)
    }
  }

  test("proportionalAllocate: Hamilton quotas sum exactly to k") {
    // strata 60/25/15 over k=10: quotas 6/2.5/1.5 -> base 6/2/1,
    // leftover 1 -> the larger remainder (b at .5 ties c at .5,
    // stratum-name tiebreak gives it to b)
    val df = ((1 to 60).map(i => ("a", i)) ++ (1 to 25).map(i => ("b", i))
      ++ (1 to 15).map(i => ("c", i))).toDF("g", "x")
    val a = Sampling.proportionalAllocate(df, "g", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a === Map("a" -> 6L, "b" -> 3L, "c" -> 1L))
    val ex = intercept[Exception] {
      Sampling.proportionalAllocate(df.limit(5), "g", 10L).collect()
    }
    assert(ex.getMessage.contains("exceeds corpus"))
    // NULL strata raise (a downstream equi-join would silently drop
    // their allocation); an EMPTY corpus is a documented empty frame
    val withNull = Seq((Option("a"), 1), (Option.empty[String], 2))
      .toDF("g", "x")
    val exN = intercept[Exception] {
      Sampling.proportionalAllocate(withNull, "g", 1L).collect()
    }
    assert(exN.getMessage.contains("NULL stratum"))
    assert(Sampling.proportionalAllocate(df.limit(0), "g", 10L)
      .collect().isEmpty)
  }

  test("proportionalSample: exactly k rows, deterministic membership") {
    val df = (1L to 200L).map(i => (if (i <= 120) "a" else "b", i))
      .toDF("g", "id")
    val s1 = Sampling.proportionalSample(df, "g", "id", 50L)
      .orderBy("id").collect()
    assert(s1.length === 50)
    val byG = s1.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byG === Map("a" -> 30, "b" -> 20))
    val s2 = Sampling.proportionalSample(df, "g", "id", 50L)
      .orderBy("id").collect()
    assert(s1.sameElements(s2))
  }

  test("splitBalance: exact shares, marginals from one cell frame; NULL raises") {
    val df = (1L to 400L).map(i => (i, if (i % 4 == 0) "de" else "en"))
      .toDF("id", "lang")
    val rows = Sampling.splitBalance(df, "id", "lang",
      Seq(("train", 0.5), ("test", 0.5))).collect()
    // per split, shares sum to 1; global shares are exactly 0.75/0.25
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-6)
    }
    rows.foreach { r =>
      val g = if (r.getString(1) == "en") 0.75 else 0.25
      assert(r.getDouble(4) === g)
      assert(math.abs(r.getDouble(5) -
        math.abs(r.getDouble(3) - g)) < 1e-6)
    }
    val ex = intercept[Exception] {
      Sampling.splitBalance(
        Seq((1L, Option.empty[String])).toDF("id", "lang"),
        "id", "lang", Seq(("a", 1.0))).collect()
    }
    assert(ex.getMessage.contains("NULL label"))
  }
}
