package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Associations

/** Laws of the market-basket tier (q137): hand-computed lift on a
  * synthetic basket set, count consistency, and the whole-basket cap.
  */
class AssociationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frames(baskets: Seq[(Long, String)]) = {
    // one synthetic part per distinct item name; line items reference it
    val items = baskets.map(_._2).distinct.sorted.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }
    val part = items.toDF("p_partkey", "p_brand")
    val id = items.toMap.map(_.swap)
    val li = baskets.map { case (o, b) => (o, id(b)) }
      .toDF("l_orderkey", "l_partkey")
    (li, part)
  }

  test("brandLift matches the hand-computed contingency table") {
    // baskets: 1{A,B} 2{A,B} 3{A,C} 4{B,C} 5{A}
    val (li, part) = frames(Seq(
      1L -> "A", 1L -> "B", 2L -> "A", 2L -> "B",
      3L -> "A", 3L -> "C", 4L -> "B", 4L -> "C", 5L -> "A"))
    val rows = Associations.brandLift(li, part, minSupport = 1L, maxBasket = 16)
      .orderBy("item_a", "item_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))).toMap
    // n=5 baskets; n_A=4, n_B=3, n_C=2; AB=2, AC=1, BC=1
    assert(rows(("A", "B")) == ((2L, 4L, 3L, 5L, 400000L, 0.8333))) // 10/12 @ 4dp
    assert(rows(("A", "C")) == ((1L, 4L, 2L, 5L, 200000L, 0.625)))
    assert(rows(("B", "C")) == ((1L, 3L, 2L, 5L, 200000L, 0.8333))) // 5/6 @ 4dp
  }

  test("minSupport prunes pairs; counts stay consistent on real data") {
    val li = graft.sources.Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val part = graft.sources.Tables.load(spark, TestSpark.Sf0001, "part")
    val all = Associations.brandLift(li, part, minSupport = 1L).collect()
    val pruned = Associations.brandLift(li, part, minSupport = 10L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned.nonEmpty && pruned.size < all.length)
    all.foreach { r =>
      val (nAb, nA, nB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nAb <= math.min(nA, nB), s"support exceeds marginals: $r")
      assert(r.getDouble(7) > 0.0)
      if (nAb >= 10L)
        assert(pruned((r.getString(0), r.getString(1))), s"pruned a kept pair: $r")
    }
  }

  test("oversized baskets drop WHOLE: their items vanish from every count") {
    val base = Seq(1L -> "A", 1L -> "B", 2L -> "A", 2L -> "B")
    // basket 3 holds A,B,C — capping at 2 must erase it entirely,
    // leaving the same table as `base` alone (C disappears, A/B
    // marginals exclude basket 3)
    val big = base ++ Seq(3L -> "A", 3L -> "B", 3L -> "C")
    val (li1, p1) = frames(base)
    val (li2, p2) = frames(big)
    val want = Associations.brandLift(li1, p1, minSupport = 1L, maxBasket = 2)
      .orderBy("item_a", "item_b").collect().toSeq
    val got = Associations.brandLift(li2, p2, minSupport = 1L, maxBasket = 2)
      .orderBy("item_a", "item_b").collect().toSeq
    assert(got == want)
  }
}
