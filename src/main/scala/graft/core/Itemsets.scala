package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequent-pair mining over (basket, item) transactions: support-
  * counted co-occurrence pairs and the association-rule metrics
  * (confidence, lift) over them — the market-basket / co-click /
  * co-citation analysis family.
  *
  * Scale shape: the quadratic step is the within-basket pair explode,
  * bounded by capping each basket at `maxBasket` items (kept
  * deterministically: the lowest item ids — a stable prefix, so reruns
  * and engine/oracle agree). With the cap, pair volume is at most
  * `baskets · maxBasket·(maxBasket−1)/2` — linear in baskets — and the
  * pair count itself is one shuffle-aggregated groupBy with map-side
  * combine. No all-pairs join over items ever happens; the support
  * threshold then cuts the candidate set to the heavy tail. This is the
  * candidate-generation half of A-Priori with k=2 done as pure
  * aggregation; higher-k itemsets would iterate the same join-on-basket
  * shape over the surviving pairs.
  *
  * Distinct-ing (basket, item) first matters twice: duplicate lines in
  * a basket must not inflate support, and it halves the explode input
  * on multi-line baskets.
  */
object Itemsets {

  /** (basket, item) pairs — distinct, basket capped at `maxBasket`
    * lowest items. The cap window partitions by basket: per-basket
    * state only, no global sort.
    */
  private def baskets(df: DataFrame, basketCol: String, itemCol: String,
                      maxBasket: Int): DataFrame = {
    val w = Window.partitionBy("bk").orderBy("item")
    df.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .filter(col("item").isNotNull).distinct()
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxBasket).drop("_rk")
  }

  private def pairsFrom(it: DataFrame, minSupport: Long): DataFrame = {
    val a = it.as("a")
    val b = it.withColumnRenamed("item", "item_b").as("b")
    a.join(b, col("a.bk") === col("b.bk") && col("a.item") < col("item_b"))
      .groupBy(col("a.item").as("item_a"), col("item_b"))
      .agg(count(lit(1)).cast("long").as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Co-occurrence pairs with support >= `minSupport`, item_a < item_b
    * (each unordered pair once). Columns: item_a, item_b, support.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, maxBasket: Int = 64): DataFrame =
    pairsFrom(baskets(df, basketCol, itemCol, maxBasket), minSupport)

  /** Association-rule metrics over [[frequentPairs]], all integer-exact
    * (basis points via integral division — bit-identical in any engine):
    * per surviving pair, both directions' confidence and the symmetric
    * lift. Columns: item_a, item_b, support, support_a, support_b,
    * conf_ab_bp (= ⌊10000·s_ab/s_a⌋), conf_ba_bp, lift_bp
    * (= ⌊10000·n·s_ab/(s_a·s_b)⌋).
    *
    * Item supports are a second aggregate over the capped basket frame
    * (small: one row per item) and join back BROADCAST — the pair frame
    * never reshuffles. n (basket count) attaches as one broadcast row.
    * The basket frame is cached function-scoped and released before
    * returning; the RETURNED frame is a plain cached DataFrame —
    * `.unpersist()` it when done (the hammingNearDupsChunked contract).
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long, maxBasket: Int = 64): DataFrame = {
    val it = baskets(df, basketCol, itemCol, maxBasket).cache()
    val pairs = pairsFrom(it, minSupport)
    val sup = it.groupBy("item").agg(count(lit(1)).cast("long").as("s"))
    val n = it.select(countDistinct("bk").cast("long").as("n_baskets"))
    val out = pairs
      .join(broadcast(sup.select(col("item").as("item_a"), col("s").as("support_a"))), "item_a")
      .join(broadcast(sup.select(col("item").as("item_b"), col("s").as("support_b"))), "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("support"),
        col("support_a"), col("support_b"),
        expr("support * 10000L div support_a").as("conf_ab_bp"),
        expr("support * 10000L div support_b").as("conf_ba_bp"),
        // DECIMAL(38,0) product: support·n_baskets·10⁴ passes 2⁶³ at
        // ~10⁸ baskets with a hot pair (ANSI mode would throw, non-ANSI
        // would wrap) — decimal keeps the integral div exact to 38
        // digits and IntegralDivide still returns BIGINT
        expr("""(CAST(support AS DECIMAL(38,0)) * n_baskets * 10000)
                div (CAST(support_a AS DECIMAL(38,0)) * support_b)""")
          .as("lift_bp"))
      .cache()
    out.count() // materialize: all three consumers drained `it`
    it.unpersist() // release the basket cache — the session may be long-lived
    out
  }
}
