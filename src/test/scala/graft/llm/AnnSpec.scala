package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private val corpus = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0.9, 0.1, 0, 0)),   // closest to 0
    (2L, vec(0, 1, 0, 0)),       // orthogonal to 0
    (3L, vec(-1, 0, 0, 0)),      // opposite of 0
    (4L, vec(0.7, 0.7, 0, 0))
  ).toDF("vec_id", "embedding")

  test("dot and norm are exact on known vectors") {
    val r = corpus.filter($"vec_id" === 4L)
      .select(Ann.dot(col("embedding"), col("embedding")).as("d"),
        Ann.l2norm(col("embedding")).as("n")).collect().head
    assert(math.abs(r.getDouble(0) - 0.98) < 1e-6)
    assert(math.abs(r.getDouble(1) - math.sqrt(0.98)) < 1e-6)
  }

  test("brute-force cosine top-k ranks by similarity with id tiebreak") {
    val topk = Ann.cosineTopK(corpus.filter($"vec_id" === 0L), corpus,
        "vec_id", "embedding", 3)
      .orderBy("rn").collect()
    assert(topk.map(_.getAs[Long]("c_id")).toSeq === Seq(1L, 4L, 2L))
    assert(topk.head.getAs[Double]("cosine") > 0.99)
    // rank 3 is the orthogonal vector at cos 0; the opposite vector (-1)
    // ranks last and is cut
    assert(topk(2).getAs[Double]("cosine") === 0.0)
  }

  test("hyperplane signs are deterministic and ±1") {
    val s1 = Ann.hyperplaneSigns(8, 4)
    val s2 = Ann.hyperplaneSigns(8, 4)
    assert(s1 === s2)
    assert(s1.map(_._3).forall(v => v == 1.0 || v == -1.0))
    assert(s1.size === 32)
  }

  test("LSH buckets: opposite vectors land in complementary buckets") {
    val b = Ann.lshBuckets(corpus, "vec_id", "embedding", dim = 4, bits = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bucket")).toMap
    // v and -v flip every bit (no zero dot products for these vectors)
    assert((b(0L) ^ b(3L)) === 255L)
    b.values.foreach(v => assert(v >= 0L && v < 256L))
  }

  test("quantized top-k: near-duplicate vector ranks first with qcos ~ 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // query
      (1L, Array(0.99f, 0.01f, 0.0f, 0.0f)), // near-dup of query
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite
      (4L, Array(0.0f, 0.0f, 0.0f, 0.0f))    // zero → excluded
    ).toDF("vec_id", "embedding")
    val out = Ann.quantizedTopK(
        vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("c_id"), r.getAs[Long]("qdot"),
        r.getAs[Double]("qcos"), r.getAs[Int]("rn")))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L)) // zero vector gone
    assert(out.head._3 > 0.99)                      // near-dup ranks first
    assert(out.last._2 < 0L)                        // opposite: negative int dot
  }

  test("quantized top-k agrees with exact cosine top-k on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Ann.cosineTopK(queries, emb, "vec_id", "embedding", 3)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Ann.quantizedTopK(queries, emb, "vec_id", "embedding", 3)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantization perturbs cosines by ~1/127 — neighbor sets may
    // differ on ties but must agree on a solid majority
    val agree = (exact & quant).size.toDouble / exact.size
    assert(agree >= 0.6, s"agreement=$agree exact=${exact.size} quant=${quant.size}")
  }

  test("LSH ANN achieves reasonable recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val brute = Ann.cosineTopK(queries, emb, "vec_id", "embedding", 3)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.annTopKLsh(emb, queries, "vec_id", "embedding", 3)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    // single-probe 8-bit LSH: recall won't be 1.0, but must beat random
    assert(recall >= 0.2, s"recall=$recall brute=${brute.size} lsh=${lsh.size}")
    // and every LSH result must be a genuine same-bucket candidate
    assert(lsh.nonEmpty)
  }

  test("recallAtK: exact counts in basis points; approx=exact scores 10000") {
    val approx = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)).toDF("q_id", "c_id", "rn")
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)).toDF("q_id", "c_id", "rn")
    val r = Ann.recallAtK(approx, exact, 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(3)))).toMap
    assert(r === Map(1L -> ((2L, 6666L)), 2L -> ((3L, 10000L))))
    // identical frames → perfect recall
    val perfect = Ann.recallAtK(exact, exact, 3)
      .collect().map(_.getLong(3)).toSet
    assert(perfect === Set(10000L))
  }

  test("ndcgAtK: perfect order scores 1, swapped order less, disjoint lists 0") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("q_id", "c_id", "rn")
    val perfect = Ann.ndcgAtK(exact, exact, 3).collect().head.getDouble(1)
    assert(perfect === 1.0)
    // same members, top two swapped → strictly below 1
    val swapped = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 12L, 3)).toDF("q_id", "c_id", "rn")
    val s = Ann.ndcgAtK(swapped, exact, 3).collect().head.getDouble(1)
    assert(s < 1.0 && s > 0.8, s.toString)
    // no overlap at all → 0
    val off = Seq((1L, 90L, 1), (1L, 91L, 2), (1L, 92L, 3)).toDF("q_id", "c_id", "rn")
    assert(Ann.ndcgAtK(off, exact, 3).collect().head.getDouble(1) === 0.0)
  }

  test("rrfFuse: overlap wins, integer pico scores exact, missing lists contribute nothing") {
    val a = Seq((1L, 100L, 1), (1L, 101L, 2)).toDF("q_id", "c_id", "rn")
    val b = Seq((1L, 101L, 1), (1L, 102L, 2)).toDF("q_id", "c_id", "rn")
    val out = Ann.rrfFuse(Seq(a, b))
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getInt(3)))).toMap
    val r61 = 1000000000000L / 61
    val r62 = 1000000000000L / 62
    assert(out(101L) === ((r61 + r62, 1)), "doc in both lists must lead")
    assert(out(100L) === ((r61, 2)))
    assert(out(102L) === ((r62, 3)))
  }

  test("mrrByLabel: first same-label rank wins; a list with no " +
      "same-label candidate scores 0") {
    val approx = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 10L, 1), (2L, 12L, 2)).toDF("q_id", "c_id", "rn")
    // q1 label 7: c11 (rank 2) and c12 (rank 3) match -> first_rank 2
    // q2 label 9: no candidate carries 9 -> miss, rr 0
    val labels = Seq((1L, 7), (2L, 9), (10L, 5), (11L, 7), (12L, 7))
      .toDF("vec_id", "label")
    val got = Ann.mrrByLabel(approx, labels, "vec_id", "label")
      .orderBy("q_id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("first_rank") === 2L)
    assert(got(0).getAs[Double]("rr") === 0.5)
    assert(got(1).getAs[Long]("first_rank") === 0L)
    assert(got(1).getAs[Double]("rr") === 0.0)
  }

  test("mmrRerank: an exact duplicate of the first pick is deferred " +
      "behind a diverse candidate of equal relevance") {
    // three equal-relevance candidates; 10 and 11 are identical
    // vectors, 12 is orthogonal. Pick 1 -> 10 (tie, lowest id);
    // pick 2 -> 12 (the duplicate 11 is fully penalized by sim=1);
    // pick 3 -> 11.
    val cands = Seq(
      (1L, 10L, 0.7071), (1L, 11L, 0.7071), (1L, 12L, 0.7071))
      .toDF("q_id", "c_id", "rel")
    val vecs = Seq(
      (10L, Array(1f, 0f, 0f)), (11L, Array(1f, 0f, 0f)),
      (12L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Ann.mmrRerank(cands, vecs, "vec_id", "embedding",
        k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(got.map(_.getAs[Long]("c_id")).toSeq === Seq(10L, 12L, 11L))
    assert(got(0).getAs[Double]("mmr_score") === 0.35355)
    assert(got(1).getAs[Double]("mmr_score") === 0.35355)
    assert(got(2).getAs[Double]("mmr_score") === -0.14645)
  }

  test("mmrRerank fails loudly on a candidate without a vector row or " +
      "with NULL rel (no silent rank starvation)") {
    val vecs = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val noVec = Seq((1L, 10L, 0.9), (1L, 11L, 0.8))
      .toDF("q_id", "c_id", "rel")
    val e = intercept[Exception] {
      Ann.mmrRerank(noVec, vecs, "vec_id", "embedding", k = 2).collect()
    }
    assert(e.toString.contains("no vector row") ||
      Option(e.getCause).exists(_.toString.contains("no vector row")),
      e.toString)
    import org.apache.spark.sql.functions.{lit, when, col}
    val nullRel = Seq((1L, 10L, 0.9)).toDF("q_id", "c_id", "rel")
      .withColumn("rel", when(col("c_id") === 10L,
        lit(null).cast("double")).otherwise(col("rel")))
    intercept[Exception] {
      Ann.mmrRerank(nullRel, vecs, "vec_id", "embedding", k = 1).collect()
    }
  }

  test("rboAtK: identical lists score exactly 1, a swapped pair matches " +
      "the hand formula, disjoint lists score 0 with a row per query") {
    val a3 = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q_id", "c_id", "rn")
    val same = Ann.rboAtK(a3, a3, k = 3, pMilli = 900L).head()
    assert(same.getAs[Long]("n_matched") === 3L)
    assert(same.getAs[Double]("rbo") === 1.0)
    // k=2, p=0.5, A=[x,y] vs B=[y,x]: d=1 overlap 0, d=2 overlap 2 →
    // rbo = w_2·(2/2) = p(1−p)/(1−p²) = 1/3
    val ax = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "c_id", "rn")
    val bx = Seq((1L, 11L, 1), (1L, 10L, 2)).toDF("q_id", "c_id", "rn")
    val swap = Ann.rboAtK(ax, bx, k = 2, pMilli = 500L).head()
    assert(swap.getAs[Long]("n_matched") === 2L)
    assert(swap.getAs[Double]("rbo") === 0.333333)
    val cy = Seq((1L, 20L, 1), (1L, 21L, 2)).toDF("q_id", "c_id", "rn")
    val dis = Ann.rboAtK(ax, cy, k = 2, pMilli = 500L).head()
    assert(dis.getAs[Long]("n_matched") === 0L)
    assert(dis.getAs[Double]("rbo") === 0.0)
    // a query present in only ONE list still gets a row
    val bOnly = Seq((2L, 10L, 1)).toDF("q_id", "c_id", "rn")
    val got = Ann.rboAtK(ax, bOnly, k = 2, pMilli = 500L)
      .orderBy("q_id").collect()
    assert(got.map(_.getAs[Long]("q_id")).toSeq === Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      Ann.rboAtK(ax, bx, k = 0)
    }
    intercept[IllegalArgumentException] {
      Ann.rboAtK(ax, bx, k = 2, pMilli = 1000L)
    }
  }

  test("intProjections raises on a vector length != dim (the sign-table " +
      "join would silently truncate the projection)") {
    val ok = Seq((1L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val got = Ann.intProjections(ok, "vec_id", "embedding", dim = 2,
      dirs = 2).collect()
    assert(got.length === 2) // one row per direction, no error
    val long = Seq((1L, Array(0.5f, -0.25f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.intProjections(long, "vec_id", "embedding", dim = 2,
        dirs = 2).collect()
    }
    assert(e.getMessage.contains("vector length"))
  }
}
