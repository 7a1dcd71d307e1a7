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

  private def undirected(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("i", "j")
  }

  test("triangles: enumeration == brute force, each triple once, ordered a<b<c") {
    import graft.operators.Graphs
    // K4 on 1..4 (4 triangles) + a pendant + a disjoint open wedge
    val e = undirected(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L, 6L -> 7L, 7L -> 8L)
    val got = Graphs.triangles(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.length == got.distinct.length, "each triangle exactly once")
    assert(got.toSet == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    got.foreach { case (a, b, c) => assert(a < b && b < c) }
    // the real input shape: every triangle's three edges exist
    val docs = graft.sources.Tables.load(spark, TestSpark.Sf0001, "documents")
    val nd = graft.operators.Dedup.nearDupEdges(docs)
    val edgeSet = nd.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tri = Graphs.triangles(nd.select("i", "j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.nonEmpty, "planted clusters of >= 3 must close triangles")
    tri.foreach { case (a, b, c) =>
      assert(edgeSet((a, b)) && edgeSet((b, c)) && edgeSet((a, c)))
    }
  }

  test("link prediction: open wedges only, hub centers suppressed, score in (0,1]") {
    import graft.operators.Graphs
    // path 1-2-3 plus star center 9 over 4..8: wedge (1,3) via 2 is a
    // prediction; the star's C(5,2) wedges vanish once 9 is capped out
    val e = undirected(1L -> 2L, 2L -> 3L,
      9L -> 4L, 9L -> 5L, 9L -> 6L, 9L -> 7L, 9L -> 8L)
    val all = Graphs.commonNeighborPredictions(e, maxDegree = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.contains((1L, 3L)) && all.size == 1 + 10)
    val capped = Graphs.commonNeighborPredictions(e, maxDegree = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(capped.map(t => (t._1, t._2)).toSet == Set((1L, 3L)),
      s"hub wedges must vanish whole: $capped")
    val (_, _, common, di, dj, score) = capped.head
    assert(common == 1L && di == 1L && dj == 1L && score == 1.0)
  }

  test("kCorePeel: triangle survives, pendant chain peels one layer per round") {
    import graft.operators.Graphs
    // triangle {1,2,3} + chain 3-4-5: deg(5)=1 peels in r1, exposing
    // deg(4)=1 for r2; the triangle holds at core_deg 2 everywhere
    val e = undirected(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    val got = Graphs.kCorePeel(e, k = 2L, rounds = 5).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, -1L, 2L), (2L, -1L, 2L), (3L, -1L, 2L),
      (4L, 2L, -1L), (5L, 1L, -1L)))
  }

  test("kCorePeel bounded-round contract: a long chain is NOT fully peeled in few rounds") {
    import graft.operators.Graphs
    // path of 7 nodes: the true 2-core is empty, but 2 rounds peel only
    // the outermost two layers — exactly-R-rounds is the portable law
    val e = undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 6L -> 7L)
    val r2 = Graphs.kCorePeel(e, k = 2L, rounds = 2).collect()
    assert(r2.count(_.isNullAt(1)) == 3, "nodes 3,4,5 must still be alive after 2 rounds")
    val r5 = Graphs.kCorePeel(e, k = 2L, rounds = 5).collect()
    assert(r5.count(_.isNullAt(1)) == 0, "5 rounds fully peel a 7-path")
  }

  test("labelPropagate: bridged triangles split at the bridge, hand-traced labels") {
    import graft.operators.Graphs
    // two triangles joined by one bridge edge 3-4: a component-level
    // view glues all six nodes; LPA must keep the two communities apart
    // (the bridge endpoint's neighbor majority lives on its own side)
    val e = undirected(1L -> 2L, 1L -> 3L, 2L -> 3L,
      4L -> 5L, 4L -> 6L, 5L -> 6L, 3L -> 4L)
    val got = Graphs.labelPropagate(e, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced synchronous rounds with min-label ties: {1,2,3} -> 1
    // and {4,5,6} -> 3 is already stable after round 3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"$got")
    // single edge: the endpoints swap labels every synchronous round
    // (the classic LPA oscillation), so round parity decides the
    // output — exactly-R semantics made concrete, which is why the
    // contract pins rounds instead of running to a convergence that
    // never comes
    val swap = Graphs.labelPropagate(undirected(1L -> 2L), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(swap == Map(1L -> 2L, 2L -> 1L), s"$swap")
    val swap2 = Graphs.labelPropagate(undirected(1L -> 2L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(swap2 == Map(1L -> 1L, 2L -> 2L), s"$swap2")
  }
}
