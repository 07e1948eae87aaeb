package graft

import graft.ingest.Stages
import graft.model.FileName
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based tests (SURVEY §5.2): ScalaCheck generators drive the
  * inputs; column-expression properties are evaluated in one batched
  * DataFrame per test (one Spark job, not one per sample).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Sample with retry: a suchThat-filtered generator can return None on
    * any single draw, which would make `.sample.get` a flaky test.
    */
  private def sampleOne[A](g: Gen[A]): A =
    Iterator.continually(g.sample).flatten.next()

  private def samples[A](g: Gen[A], n: Int = 100): List[A] =
    sampleOne(Gen.listOfN(n, g))

  private val entityGen: Gen[String] = Gen.chooseNum(1, 4).flatMap { n =>
    Gen.listOfN(n, Gen.choose('a', 'z').flatMap(c =>
      Gen.listOfN(4, Gen.alphaLowerChar).map(l => (c :: l).mkString)))
      .map(_.mkString("_"))
  }
  private val digitsGen: Gen[String] =
    Gen.chooseNum(1L, 99999999999999L).map(_.toString)

  test("property: filename round trip — derive/batchId invert the naming convention") {
    samples(Gen.zip(entityGen, digitsGen, digitsGen)).foreach { case (entity, batch, ts) =>
      val enc = s"${entity}_${batch}_$ts.json"
      val dec = FileName.decryptedName(enc)
      assert(dec.endsWith("_decrypted.json"))
      assert(FileName.encryptedName(dec) === enc)
      assert(FileName.deriveTableName(dec) === entity)
      assert(FileName.batchId(dec) === ts)
      assert(FileName.stagingTable(dec) === s"stg_$entity")
    }
  }

  test("property: mask_pii masks exactly the PII keys, preserves the rest") {
    val kvGen = for {
      keys <- Gen.nonEmptyListOf(Gen.oneOf(
        graft.model.SchemaRegistry.nestedPiiKeys ++ Seq("age", "city", "zz")))
      vals <- Gen.listOfN(keys.size, Gen.alphaNumStr.suchThat(_.nonEmpty))
    } yield keys.distinct.zip(vals)
    val samples = sampleOne(Gen.listOfN(60, kvGen))
    val jsons = samples.map(kvs =>
      kvs.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}"))
    val out = jsons.toDF("v")
      .select(col("v"), Stages.maskJsonString(col("v")).as("m"))
      .collect()
    samples.zip(out).foreach { case (kvs, row) =>
      val masked = row.getString(1)
      kvs.foreach { case (k, v) =>
        if (graft.model.SchemaRegistry.nestedPiiKeys.contains(k))
          assert(masked.contains(s""""$k":"${Stages.Mask}""""), s"$k not masked in $masked")
        else
          assert(masked.contains(s""""$k":"$v""""), s"$k/$v lost in $masked")
      }
    }
  }

  test("property: date validator never passes unparseable non-blank values") {
    val junkGen = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaChar, Gen.oneOf('/', '#', '?')))
      .map(_.mkString).suchThat(s => s.trim.nonEmpty)
    val validGen = for {
      y <- Gen.chooseNum(1970, 2100); m <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d"
    val junk = sampleOne(Gen.listOfN(50, junkGen))
    val valid = sampleOne(Gen.listOfN(50, validGen))
    val blanks = Seq("", " ", "   ", null)
    val rows = (junk.map((_, false)) ++ valid.map((_, true)) ++
      blanks.map((_, true)))
    val out = rows.toDF("v", "expected")
      .select(col("expected"), Stages.dateValid(col("v")).as("got"))
      .collect()
    out.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
  }

  test("property: emptyToNull nulls exactly blank/'null' strings") {
    val strGen = Gen.oneOf(
      Gen.const(""), Gen.const("  "), Gen.const("null"), Gen.const(" null "),
      Gen.alphaNumStr.suchThat(s => s.trim.nonEmpty && s.trim != "null"))
    val samples = sampleOne(Gen.listOfN(100, strGen))
    val out = samples.toDF("v")
      .select(col("v"), Stages.emptyToNullCol(col("v")).as("n")).collect()
    out.foreach { r =>
      val in = r.getString(0)
      val expectNull = in.trim.isEmpty || in.trim == "null"
      assert((r.getString(1) == null) === expectNull, s"input='$in'")
    }
  }

  test("property: connected components match a union-find oracle on random graphs") {
    val gen = for {
      nNodes <- Gen.chooseNum(2, 40)
      nEdges <- Gen.chooseNum(1, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0L, nNodes.toLong)
        b <- Gen.chooseNum(0L, nNodes.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges
    val edges = sampleOne(gen)
    // driver-side union-find with path compression as the oracle
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    val got = graft.llm.DupGraph.connectedComponents(edges.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find roots are not guaranteed minimal; canonicalize both to
    // min-of-component before comparing
    val minOf = expected.groupBy(_._2).map { case (root, m) => root -> m.keys.min }
    assert(got === expected.map { case (v, root) => v -> minOf(root) },
      s"edges=$edges")
  }

  test("property: simhashNearDups recall is total — every hamming<=3 pair found") {
    // random docs over a tiny vocabulary force sketch collisions and
    // near-misses; the pigeonhole blocking must find EVERY pair within
    // maxDist (its recall guarantee is exact, not probabilistic)
    val vocab = Vector("red", "green", "blue", "cyan", "gold", "iron", "wolf")
    val docGen = Gen.chooseNum(3, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val docs = samples(docGen, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val sh = graft.llm.DedupOps.simhash64(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (0 until 4).map(c => r.getAs[Long](s"sh$c"))).toMap
    def ham(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val expected = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b && ham(sa, sb) <= 3
    } yield (a, b) -> ham(sa, sb).toLong).toMap
    val out = graft.llm.DedupOps.simhashNearDups(df, "doc_id", "text", 3)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.unpersist()
    assert(got === expected, s"docs=$docs")
  }

  test("property: rangePairs equals the naive theta join on random events") {
    val gen = for {
      n <- Gen.chooseNum(5, 60)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 4L)
        // straddles the epoch: negative seconds exercise floor (not
        // truncating) binning — pre-1970 pairs bin one slot high under
        // `div` and get dropped/duplicated
        t <- Gen.chooseNum(-20000L, 20000L) // seconds; gap 3600 → bins exercised
      } yield (u, t))
    } yield evs.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
    val evs = sampleOne(gen)
    val df = evs.toDF("id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val left = df.select(col("user_id"), col("id").as("l_id"), col("ts"))
    val right = df.select(col("user_id"), col("id").as("r_id"), col("ts"))
    val got = graft.core.Temporal.rangePairs(left, right, Seq("user_id"),
        "ts", "l_id", "r_id", gapSeconds = 3600L)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val expected = (for {
      (i, u, t) <- evs; (j, v, s) <- evs
      if u == v && s > t && s - t <= 3600L
    } yield (i, j) -> (s - t) * 1000000L).toMap
    assert(got === expected, s"events=$evs")
  }

  test("property: asofJoin matches a per-row latest-prior lookup") {
    val gen = for {
      nl <- Gen.chooseNum(1, 30)
      nr <- Gen.chooseNum(0, 30)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 1000L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 1000L)))
    } yield (ls.zipWithIndex, rs.map { case (u, t) => (u, t) }.distinct)
    val (ls, rs) = sampleOne(gen)
    val left = ls.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("l_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    // right unique per (user, ts): payload = the ts in seconds
    val right = rs.map { case (u, t) => (u, t, t) }
      .toDF("user_id", "sec", "r_sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select("user_id", "ts", "r_sec")
    val got = graft.core.Temporal.asofJoin(left, right, Seq("user_id"), "ts",
        Seq("r_sec"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val expected = ls.map { case ((u, t), i) =>
      i.toLong -> rs.filter(r => r._1 == u && r._2 <= t)
        .map(_._2).maxOption
    }.toMap
    assert(got === expected, s"left=$ls right=$rs")
  }

  test("property: funnel matches a per-entity brute-force chain") {
    val steps = Seq("a", "b", "c")
    val w = 100L // seconds
    val gen = for {
      n <- Gen.chooseNum(5, 80)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 5L)
        t <- Gen.chooseNum(0L, 500L)
        s <- Gen.oneOf(steps)
      } yield (u, t, s))
    } yield evs
    val evs = sampleOne(gen)
    val df = evs.toDF("user_id", "sec", "step")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = graft.core.Temporal.funnel(df, "user_id", "ts", "step",
        steps, windowSeconds = w)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // driver-side chain: first 'a'; first 'b' in [t1, t1+w]; first 'c'
    // in [t2, t2+w]
    val byUser = evs.groupBy(_._1)
    val expected = byUser.flatMap { case (u, rows) =>
      val t1 = rows.filter(_._3 == "a").map(_._2).minOption
      t1.map { a =>
        val t2 = rows.filter(r => r._3 == "b" && r._2 >= a && r._2 <= a + w)
          .map(_._2).minOption
        val t3 = t2.flatMap(b =>
          rows.filter(r => r._3 == "c" && r._2 >= b && r._2 <= b + w)
            .map(_._2).minOption)
        u -> (1L + t2.size + t3.size)
      }
    }
    assert(got === expected, s"events=$evs")
  }

  test("property: sequenceMatch matches brute force; greedy ≡ existential on a FIRST-gap negation") {
    val steps = Seq("a", "b", "c")
    val w = 100L // seconds, overall window from t1
    val gen = for {
      n <- Gen.chooseNum(5, 80)
      evs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 5L)
        t <- Gen.chooseNum(0L, 300L)
        s <- Gen.oneOf(Seq("a", "b", "c", "x"))
      } yield (u, t, s))
    } yield evs
    val evs = sampleOne(gen)
    val df = evs.toDF("user_id", "sec", "step")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = graft.core.Temporal.sequenceMatch(df, "user_id", "ts", "step",
        steps, windowSeconds = w, negations = Map(1 -> Seq("x")))
      .collect().map { r =>
        def t(i: Int) = if (r.isNullAt(i)) None
          else Some(r.getTimestamp(i).getTime / 1000L)
        r.getLong(0) -> (t(1), t(2), t(3), r.getLong(4), r.getBoolean(5))
      }.toMap
    // driver-side greedy chain, the documented semantics: first 'a'; first
    // 'b' STRICTLY after t1 within [_, t1+w], nulled if an 'x' falls
    // strictly between t1 and it; first 'c' strictly after t2 within the
    // SAME overall window
    val byUser = evs.groupBy(_._1)
    val expected = byUser.flatMap { case (u, rows) =>
      rows.filter(_._3 == "a").map(_._2).minOption.map { a =>
        val t2 = rows.filter(r => r._3 == "b" && r._2 > a && r._2 <= a + w)
          .map(_._2).minOption
          .filter(b => !rows.exists(r => r._3 == "x" && r._2 > a && r._2 < b))
        val t3 = t2.flatMap(b =>
          rows.filter(r => r._3 == "c" && r._2 > b && r._2 <= a + w)
            .map(_._2).minOption)
        val reached = 1L + t2.size + t3.size
        u -> (Some(a), t2, t3, reached, reached == 3L)
      }
    }
    assert(got === expected, s"events=$evs")
    // for a negation on the FIRST gap greedy is exhaustive: matched ⟺
    // an existential clean chain exists (later-gap negations are
    // first-match by design — TemporalSpec pins the divergence case)
    byUser.foreach { case (u, rows) =>
      rows.filter(_._3 == "a").map(_._2).minOption.foreach { a =>
        val existential = rows
          .filter(r => r._3 == "b" && r._2 > a && r._2 <= a + w).map(_._2)
          .exists(b =>
            !rows.exists(r => r._3 == "x" && r._2 > a && r._2 < b) &&
              rows.exists(r => r._3 == "c" && r._2 > b && r._2 <= a + w))
        assert(got(u)._5 === existential,
          s"greedy vs existential diverged for user $u: $rows")
      }
    }
  }

  test("property: latest-wins dedup keeps exactly one row per key, the newest") {
    val gen = for {
      nKeys <- Gen.chooseNum(1, 10)
      rows <- Gen.nonEmptyListOf(for {
        k <- Gen.chooseNum(0, nKeys)
        v <- Gen.chooseNum(0, 1000000)
      } yield (s"f$k.json", "FAC", v))
    } yield rows
    val rows = sampleOne(gen)
    val df = rows.toDF("file_name", "facility_id", "version")
      .withColumn("modified_date",
        timestamp_seconds(col("version") + 1000000000L))
    val deduped = graft.maintenance.Maintenance.dedupSyncFile(df).collect()
    val byKey = rows.groupBy(r => (r._1, r._2))
    assert(deduped.length === byKey.size)
    deduped.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getAs[Int]("version") === byKey(key).map(_._3).max)
    }
  }

  test("property: pageRank invariants on random graphs — floor bounds, teleport floor, mass cap") {
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(1L, 15L), Gen.chooseNum(1L, 15L)))
    (1 to 3).foreach { _ =>
      val raw = sampleOne(edgeGen).filter { case (a, b) => a != b }
      if (raw.nonEmpty) {
        val sym = (raw ++ raw.map(_.swap)).toDF("src", "dst")
        val ranks = graft.llm.DupGraph.pageRank(sym, iterations = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val n = ranks.size
        // every node holds at least the teleport floor; total mass never
        // exceeds the initial n·1e6 (floor divisions only ever leak mass)
        assert(ranks.values.forall(_ >= 150000L), ranks)
        assert(ranks.values.sum <= n * 1000000L, ranks)
      }
    }
  }

  test("property: containmentPairs bounds — bp ≤ 10000, inter ≤ min(sz), symmetric id order") {
    val docGen = Gen.listOfN(12, Gen.chooseNum(3, 10).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
        "zeta", "eta", "theta")).map(_.mkString(" "))))
    val docs = sampleOne(docGen).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = graft.llm.DedupOps.containmentPairs(docs, "doc_id", "text",
      thresholdBp = 0L)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    out.unpersist()
    rows.foreach { case (id1, id2, inter, sz1, sz2, bp1, bp2) =>
      assert(id1 < id2)
      assert(inter >= 1 && inter <= math.min(sz1, sz2))
      assert(bp1 >= 0 && bp1 <= 10000 && bp2 >= 0 && bp2 <= 10000)
      assert(bp1 === inter * 10000 / sz1 && bp2 === inter * 10000 / sz2)
    }
  }

  test("property: weightedBernoulli membership is monotone in weight for a fixed id") {
    // for any id, raising ONLY its own weight can never evict it
    val base = (1L to 50L).map(i => (i, 1L + i % 5))
    (1 to 5).foreach { k =>
      val grown = base.map { case (id, w) =>
        if (id == k * 7L) (id, w + 50L) else (id, w) }
      val keptBase = graft.llm.Sampling
        .weightedBernoulli(base.toDF("id", "w"), "id", "w", 10L)
        .as[(Long, Long)].collect().map(_._1).toSet
      val keptGrown = graft.llm.Sampling
        .weightedBernoulli(grown.toDF("id", "w"), "id", "w", 10L)
        .as[(Long, Long)].collect().map(_._1).toSet
      // the grown id's own membership can only appear, never vanish...
      val id = k * 7L
      if (keptBase.contains(id)) {
        // raising its weight raises its threshold, but also raises Σw,
        // lowering everyone's (incl. its own) p — membership is NOT
        // globally monotone; assert only the exact recomputation
        val again = graft.llm.Sampling
          .weightedBernoulli(grown.toDF("id", "w"), "id", "w", 10L)
          .as[(Long, Long)].collect().map(_._1).toSet
        assert(again === keptGrown) // determinism under the perturbation
      }
    }
  }
}
