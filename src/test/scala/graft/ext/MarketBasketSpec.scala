package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MarketBasketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def baskets(rows: (Long, Long)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("basket", "item")
  }

  test("counts, confidences and lift are exact on a hand-checked corpus") {
    // baskets: {1,2} {1,2} {1,3} {2} -> N=4
    // c(1)=3 c(2)=3 c(3)=1; pair(1,2)=2, pair(1,3)=1
    val out = MarketBasket.associationRules(
        baskets((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
          (12L, 1L), (12L, 3L), (13L, 2L)),
        "basket", "item", minPairCount = 2L)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 2L)))
    assert((r.getLong(3), r.getLong(4)) == ((3L, 3L)))
    assert(r.getDouble(5) == 0.5) // support 2/4
    assert(r.getDouble(6) == BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(8) == BigDecimal(2.0 * 4 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("duplicate item lines in a basket count once") {
    val out = MarketBasket.associationRules(
        baskets((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L)),
        "basket", "item", minPairCount = 2L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 2L) // pair counted once per basket
  }

  test("maxBasket excludes whale baskets from pairs AND the denominator") {
    // basket 1 has 5 items (over cap 4) -> fully excluded; baskets 2,3
    // carry the pair; N = 2
    val whale = (1L to 5L).map(i => (1L, i))
    val out = MarketBasket.associationRules(
        baskets(whale ++ Seq((2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L)): _*),
        "basket", "item", minPairCount = 2L, maxBasket = 4)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 2L && r.getDouble(5) == 1.0) // support 2/2
    val audit = MarketBasket.oversized(
        baskets(whale ++ Seq((2L, 1L), (2L, 2L)): _*),
        "basket", "item", maxBasket = 4)
      .collect()
    assert(audit.length == 1 && audit.head.getLong(1) == 5L)
  }

  test("minPairCount prunes singletons; empty result is fine") {
    val out = MarketBasket.associationRules(
        baskets((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)),
        "basket", "item", minPairCount = 2L)
      .count()
    assert(out == 0L)
  }
}
