package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Linkage
import graft.sources.Tables

/** Laws of the record-linkage tier (q140): pair hygiene, carrier-count
  * consistency, brute-force agreement within blocks, block cap.
  */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nameMatches: ordered pairs, same block, dist bound, counts match the dimension") {
    val part = Tables.load(spark, TestSpark.Sf0001, "part")
    val rows = Linkage.nameMatches(part, "p_partkey", "p_name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val carriers = part.groupBy("p_name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def noun(s: String) = s.split(" ").last
    rows.foreach { case (a, b, d, na, nb) =>
      assert(a < b, "unordered pair emitted once, lexicographically")
      assert(noun(a) == noun(b), "pairs never cross blocks")
      assert(d >= 0 && d <= 3)
      assert(na == carriers(a) && nb == carriers(b), "carrier counts off")
    }
    // distinct-name grain: no pair appears twice
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
  }

  test("nameMatches == brute-force all-pairs restricted to the block (no missed match)") {
    val part = Tables.load(spark, TestSpark.Sf0001, "part")
    val names = part.select("p_name").distinct().as[String].collect()
    def noun(s: String) = s.split(" ").last
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names
      if a < b && noun(a) == noun(b) && lev(a, b) <= 3
    } yield (a, b)).toSet
    val got = Linkage.nameMatches(part, "p_partkey", "p_name", maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
  }

  test("oversized blocks drop WHOLE") {
    val df = Seq((1L, "red widget"), (2L, "new widget"), (3L, "old widget"),
      (4L, "big ring"), (5L, "wee ring")).toDF("id", "nm")
    val capped = Linkage.nameMatches(df, "id", "nm", maxDist = 5, maxBlock = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // widget block (3 names) exceeds the cap and vanishes; ring stays
    assert(capped.toSeq == Seq(("big ring", "wee ring")))
  }
}
