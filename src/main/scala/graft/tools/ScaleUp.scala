package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor by union-multiplying a source SF
  * with re-keyed ids — the local stand-in for driver-generated sf1.0
  * (the harness ships sf0.001/0.01/0.1 only):
  *
  *   runMain graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/tmp/sf1.0 10
  *
  * Re-keying rules (copy c of N):
  *  - every id domain shifts by c·10⁹, applied consistently on both
  *    sides of each FK (orders.o_custkey moves with customer.c_custkey,
  *    lineitem's three FKs with their parents) so join selectivities
  *    and referential integrity match a true larger SF;
  *  - dimension tables (region, nation) stay fixed — as at any real SF;
  *  - document text gets a per-copy suffix on every 3rd word, so EVERY
  *    word 3-gram (the shingle unit of the dedup family) is
  *    copy-distinct: per-shingle document frequencies — which drive
  *    candidate-pair counts quadratically (Σdf²) — then scale like a
  *    genuine 10× corpus of distinct documents instead of 10-way
  *    duplicates. (A first attempt salted every 8th word; the ~60% of
  *    3-grams that stayed salt-free were shared by all copies, df grew
  *    10×, and containment candidate generation went ~20× super-linear
  *    — a synthesis artifact, not an operator property.) Planted
  *    near-dup pairs survive WITHIN each copy (both members get the
  *    same suffixes), so near-dup yield scales linearly; 2/3 of words
  *    are untouched, keeping stopword/quality gate statistics close to
  *    the base corpus. n_chars is recomputed;
  *  - customer names get a levenshtein-distance-2 suffix per copy so
  *    fuzzy-ER blocks grow 10× (the honest scale shape) without every
  *    cross-copy pair becoming an edit-distance-1 match;
  *  - embeddings perturb dimension 0 by c·10⁻⁴ so ANN/semantic-dedup
  *    see 10× distinct points rather than 10-way ties.
  *
  * Events keep their time range: 10× the volume in the same window is
  * how a bigger deployment actually looks (more users, same horizon).
  */
object ScaleUp {

  private val Off = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/tmp/sf1.0")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.quiet(
      GraftSession.builder("graft-scaleup", "local[32]", shufflePartitions = 32)
        .getOrCreate())
    try run(spark, src, dst, copies)
    finally spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")

    def shift(c: Int)(cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Off)))

    /** Union of `copies` transformed copies of a table. */
    def multiply(t: String, parts: Int)(xform: Int => DataFrame => DataFrame): Unit = {
      val base = rd(t)
      val out = (0 until copies).map(c => xform(c)(base)).reduce(_ unionAll _)
      wr(out, t, parts)
    }

    // dimensions: fixed at any SF
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    multiply("customer", 8) { c => df =>
      val salted =
        if (c == 0) df
        else df.withColumn("c_name", concat(col("c_name"), lit(f"-cp$c$c")))
      shift(c)("c_custkey")(salted)
    }
    multiply("supplier", 4)(c => shift(c)("s_suppkey"))
    multiply("part", 8)(c => shift(c)("p_partkey"))
    multiply("orders", 16)(c => shift(c)("o_orderkey", "o_custkey"))
    multiply("lineitem", 32)(c =>
      shift(c)("l_orderkey", "l_partkey", "l_suppkey"))
    multiply("events", 16)(c => shift(c)("event_id", "user_id"))

    multiply("documents", 16) { c => df =>
      val salted =
        if (c == 0) df
        else df.withColumn("text",
          array_join(
            transform(split(col("text"), " "),
              (w: Column, i: Column) =>
                when(i % 3 === 2, concat(w, lit(s"~$c"))).otherwise(w)),
            " "))
      shift(c)("doc_id")(salted.withColumn("n_chars", length(col("text"))))
    }

    multiply("embeddings", 8) { c => df =>
      val perturbed =
        if (c == 0) df
        else df.withColumn("embedding",
          transform(col("embedding"),
            (x: Column, i: Column) =>
              when(i === 0, x + lit(c * 1e-4f)).otherwise(x)))
      shift(c)("vec_id")(perturbed)
    }

    println(s"wrote ${copies}x of $src to $dst")
  }
}
