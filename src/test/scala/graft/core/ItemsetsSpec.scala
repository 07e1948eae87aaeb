package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  test("frequentPairs: duplicate basket lines don't inflate support; " +
    "threshold filters; each unordered pair once") {
    val tx = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L), // dup line: (10,20) counts once
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L),
      (4L, 20L), (4L, 30L))
      .toDF("bk", "item")
    val got = Itemsets.frequentPairs(tx, "bk", "item", minSupport = 2)
      .orderBy("item_a", "item_b").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((10L, 20L, 3L), (20L, 30L, 2L)))
  }

  test("basket cap keeps the lowest item ids deterministically") {
    val tx = (1L to 6L).map(i => (1L, i)).toDF("bk", "item")
    // cap 3 → items 1,2,3 survive → pairs (1,2),(1,3),(2,3)
    val got = Itemsets.frequentPairs(tx, "bk", "item", minSupport = 1, maxBasket = 3)
      .orderBy("item_a", "item_b").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("associationRules: integer-exact confidence and lift") {
    // 4 baskets; A in 3 (1,2,3), B in 2 (1,2), AB in 2 → conf(A→B)=2/3,
    // conf(B→A)=1, lift = 4·2/(3·2) = 4/3
    val tx = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L),
      (4L, 9L))
      .toDF("bk", "item")
    val r = Itemsets.associationRules(tx, "bk", "item", minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq((1L, 2L, 2L, 3L, 2L, 6666L, 10000L, 13333L)))
  }

  test("null items drop out instead of forming a null pair group") {
    val tx = Seq((1L, Some(1L)), (1L, None), (1L, Some(2L)))
      .toDF("bk", "item")
    val got = Itemsets.frequentPairs(tx, "bk", "item", minSupport = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L)))
  }
}
