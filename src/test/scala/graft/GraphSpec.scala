package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Laws for the fixed-point PageRank tier (q125): structural ordering
  * on crafted graphs, near-conservation of rank mass under integer
  * floors, the dangling-node fail-loud contract, and bit-determinism
  * under repartitioning (the property the hash gate rests on).
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(pairs: (String, String)*) =
    pairs.toDF("src", "dst")
      .union(pairs.map(p => (p._2, p._1)).toDF("src", "dst"))

  test("star graph: the hub outranks every leaf, leaves tie exactly") {
    val edges = sym("hub" -> "a", "hub" -> "b", "hub" -> "c", "hub" -> "d")
    val r = PageRank.ranks(edges, iters = 5).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(Seq("a", "b", "c", "d").forall(l => r("hub") > r(l)))
    assert(Set("a", "b", "c", "d").map(r).size == 1,
      "symmetric leaves must carry identical integer ranks")
  }

  test("rank mass is conserved up to integer-floor loss") {
    val edges = sym("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c")
    val scale = 1000000000000L
    val r = PageRank.ranks(edges, iters = 5, scale = scale)
    val total = r.agg(sum("rank")).head.getLong(0)
    val n = r.count()
    // every floor division loses < 1 unit per node per round (init,
    // base, per-edge flow, damping) — generous linear bound
    assert(total <= scale, s"mass must never be created: $total > $scale")
    assert(total >= scale - 200L * n, s"floor loss too large: $total")
  }

  test("dangling dst fails loudly; empty input fails loudly") {
    val directed = Seq(("a", "b")).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      PageRank.ranks(directed, iters = 1)
    }
    assert(ex.getMessage.contains("no outgoing edge"))
    assertThrows[IllegalArgumentException] {
      PageRank.ranks(directed.filter(lit(false)), iters = 1)
    }
  }

  test("bit-determinism under repartitioning (integer arithmetic is order-free)") {
    val edges = sym("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
      "a" -> "c", "b" -> "d")
    def run(df: org.apache.spark.sql.DataFrame) =
      PageRank.ranks(df, iters = 5).orderBy("node").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(edges) == run(edges.repartition(7)))
  }
}
