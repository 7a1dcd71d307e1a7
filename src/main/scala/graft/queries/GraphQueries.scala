package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PageRank}
import graft.sources.Tables

/** Graph-analytics surface beyond connectivity (q47): q125 ranks the
  * customer↔supplier trading graph by fixed-point integer PageRank.
  *
  * The graph: one undirected edge per distinct (customer, supplier)
  * trading relationship — lineitem ⋈ orders projected to the two keys,
  * deduplicated, then symmetrized (prefix-tagged node ids keep the two
  * keyspaces disjoint). 5 iterations at scale 10¹² — every step integer
  * floor arithmetic, so the DuckDB oracle unrolls the same five rounds
  * and the hash gate checks rank values EXACTLY, not approximately.
  * Top-50 by (rank desc, node) keeps the output bounded at any sf — the
  * TakeOrderedAndProject shape.
  */
object GraphQueries {

  def queries: Map[String, Q] = Map(
    "q125_pagerank" -> ((spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      // narrower shuffle keys (r15, guide §2.3): the two keyspaces stay
      // disjoint as LONGS (customer → 2k, supplier → 2k+1) through the
      // distinct + 5 iteration joins/aggregations — 8-byte fixed keys
      // instead of "c…"/"s…" strings (measured: 103 MB shuffled per run
      // at sf0.1, mostly string node ids). The mapping is a bijection
      // and PageRank's integer arithmetic never reads the id value, so
      // ranks/degrees are identical; the display string is rendered
      // AFTER the loop and the final (rank desc, node) order compares
      // the same strings as before.
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(
          (col("o_custkey").cast("long") * 2L).as("src"),
          (col("l_suppkey").cast("long") * 2L + 1L).as("dst"))
        .distinct()
      val edges = pairs
        .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      PageRank.ranks(edges, iters = 5)
        .select(
          when(col("node") % 2 === 0,
            concat(lit("c"), expr("cast(node div 2 as string)")))
            .otherwise(
              concat(lit("s"), expr("cast((node - 1) div 2 as string)")))
            .as("node"),
          col("deg"), col("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(50)
    }),

    // TRIANGLES in the near-dup graph (degree-oriented node-iterator):
    // an edge inside a triangle is corroborated by a third witness —
    // the cohesion audit of the dedup clusters. The oracle is the
    // algorithm-independent 3-way join over canonical i<j edges, so
    // the gate checks enumeration COMPLETENESS, not a mirrored shadow.
    "q142_triangles" -> ((spark, dir) =>
      graft.operators.Graphs.triangles(
          Dedup.nearDupEdges(Tables.load(spark, dir, "documents")))
        .orderBy("a", "b", "c")),

    // COMMON-NEIGHBOR LINK PREDICTION over the SEMANTIC graph (q30's
    // exact cosine pairs at 0.4): cosine is not transitive, so open
    // wedges exist — the non-adjacent pairs sharing neighbors are the
    // semantic near-miss candidates worth re-verifying, ranked by
    // neighborhood Jaccard. (The lexical near-dup graph is a clique
    // union by construction — planted families are mutually similar —
    // and predicts nothing; the semantic graph is where this tier
    // earns its keep.)
    "q143_link_predict" -> ((spark, dir) =>
      graft.operators.Graphs.commonNeighborPredictions(
          graft.operators.Similarity.cosinePairs(
            Tables.load(spark, dir, "embeddings"), threshold = 0.4)
            .select(col("i"), col("j")),
          maxDegree = 1000L)
        .orderBy("i", "j")),

    // the SCALE PATH of the same prediction: identical wedge machinery
    // over q33's sign-LSH bucketed edge relation instead of q30's
    // exact all-pairs ground truth. Edge generation is ≤ tables·window·n
    // candidates end to end, so the whole chain stays near-linear in
    // corpus size — the variant a 100 TB run would actually execute
    // (measured: bench/scaling_r8.json, q143 exp ~1.3–1.6 from its
    // quadratic input vs q148 riding the bounded candidate join).
    "q148_link_predict_lsh" -> ((spark, dir) =>
      graft.operators.Graphs.commonNeighborPredictions(
          graft.operators.Similarity.lshCosinePairs(
            Tables.load(spark, dir, "embeddings"), threshold = 0.4,
            tables = 16, bits = 8, dim = 64)
            .select(col("i"), col("j")),
          maxDegree = 1000L)
        .orderBy("i", "j")),

    // 5-round 2-core peel of the near-dup graph: cohesion one level
    // past q142's triangles — members held by witnesses that are
    // themselves held; isolated pair-edges peel. Bounded-round contract
    // (the PageRank pattern): the oracle unrolls the SAME five rounds
    "q153_kcore" -> ((spark, dir) =>
      graft.operators.Graphs.kCorePeel(
          Dedup.nearDupEdges(Tables.load(spark, dir, "documents")),
          k = 2L, rounds = 5)
        .orderBy("node")),

    // 5-round deterministic label propagation over the near-dup graph:
    // the community face of q47's components — a chained component
    // splits at its thin bridges, which is the grouping a per-cluster
    // keeper policy wants when two families share one accidental edge.
    // Bounded-round + min-label ties (the q125/q153 contract): the
    // oracle unrolls the SAME five rounds, so assignments gate EXACTLY
    "q205_label_prop" -> ((spark, dir) =>
      graft.operators.Graphs.labelPropagate(
          Dedup.nearDupEdges(Tables.load(spark, dir, "documents")),
          rounds = 5)
        .orderBy("node")),

    // STORED-EDGE renderings of the near-dup graph tier (r13, the
    // q219/q220 protocol extended to graph analytics): at 100 TB a
    // graph report never re-runs the shingle → MinHash → verify chain —
    // it reads the dedup job's persisted edge relation (the SAME
    // per-JVM artifact q219/q220 read) and pays only its own graph
    // pass. Each is gated against its inline twin's from-scratch
    // oracle: stored ≡ recomputed, driver-enforced.
    "q225_triangles_stored" -> ((spark, dir) =>
      graft.operators.Graphs.triangles(
          spark.read.parquet(s"${corpusEdgesDir(spark, dir)}/edges")
            .select("i", "j"))
        .orderBy("a", "b", "c")),

    "q226_kcore_stored" -> ((spark, dir) =>
      graft.operators.Graphs.kCorePeel(
          spark.read.parquet(s"${corpusEdgesDir(spark, dir)}/edges")
            .select("i", "j"),
          k = 2L, rounds = 5)
        .orderBy("node")),

    "q227_label_prop_stored" -> ((spark, dir) =>
      graft.operators.Graphs.labelPropagate(
          spark.read.parquet(s"${corpusEdgesDir(spark, dir)}/edges")
            .select("i", "j"),
          rounds = 5)
        .orderBy("node")))

  /** The unrolled 5-round oracle: r0 = scale/n everywhere, each round
    * r_k = base + (85 · Σ in-flow(r_{k-1}/deg)) / 100 in BIGINT floor
    * division — generated by the same loop count the engine runs.
    */
  private val PageRankSql: String = {
    val rounds = (1 to 5).map { k =>
      s"""r$k AS (SELECT d.node, d.deg,
         |  CAST((SELECT b FROM bs) +
         |       (85 * coalesce(m.msum, 0)) // 100 AS BIGINT) AS rank
         |FROM deg d LEFT JOIN (
         |  SELECT e.dst AS node, CAST(sum(r.rank // r.deg) AS BIGINT) AS msum
         |  FROM e JOIN r${k - 1} r ON e.src = r.node GROUP BY 1) m
         |ON d.node = m.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT
       |              'c' || CAST(o.o_custkey AS VARCHAR) AS src,
       |              's' || CAST(l.l_suppkey AS VARCHAR) AS dst
       |            FROM lineitem l JOIN orders o
       |              ON l.l_orderkey = o.o_orderkey),
       |e AS (SELECT src, dst FROM e0
       |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |        FROM e GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS v FROM deg),
       |iv AS (SELECT 1000000000000 // v AS init FROM n),
       |bs AS (SELECT (init * 15) // 100 AS b FROM iv),
       |r0 AS (SELECT node, deg,
       |         CAST((SELECT init FROM iv) AS BIGINT) AS rank FROM deg),
       |$rounds
       |SELECT node, deg, rank FROM r5
       |ORDER BY rank DESC, node LIMIT 50""".stripMargin
  }

  /** The unrolled 5-round 2-core oracle: each round recomputes degrees
    * over the surviving edge relation, peels `coalesce(deg, 0) < k`
    * nodes from the alive set, and restricts edges to survivors —
    * generated by the same loop count the engine runs. Round CTEs are
    * MATERIALIZED: DuckDB inlines CTEs by default, and each round
    * references its predecessor ~3× (degree count, peel, restrict), so
    * an inlined unroll re-expands the shingle scan 3⁵ times.
    */
  private val KCoreSql: String = {
    val k = 2
    val rounds = (1 to 5).map { r =>
      s"""d$r AS MATERIALIZED (SELECT u AS node, count(*) AS d
         |        FROM s${r - 1} GROUP BY 1),
         |p$r AS MATERIALIZED (SELECT a.node, CAST($r AS BIGINT) AS removed_round
         |        FROM a${r - 1} a LEFT JOIN d$r d ON a.node = d.node
         |        WHERE coalesce(d.d, 0) < $k),
         |a$r AS MATERIALIZED (SELECT node FROM a${r - 1}
         |        WHERE node NOT IN (SELECT node FROM p$r)),
         |s$r AS MATERIALIZED (SELECT s.u, s.v FROM s${r - 1} s
         |        WHERE s.u NOT IN (SELECT node FROM p$r)
         |          AND s.v NOT IN (SELECT node FROM p$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${DedupQueries.ShinglesSql},
       |${DedupQueries.NearDupPairsSql},
       |s0 AS MATERIALIZED (SELECT i AS u, j AS v FROM pairs
       |       UNION ALL SELECT j, i FROM pairs),
       |a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM s0),
       |$rounds,
       |cd AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS cd
       |       FROM s5 GROUP BY 1)
       |SELECT node, removed_round, CAST(NULL AS BIGINT) AS core_deg
       |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
       |      UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
       |      UNION ALL SELECT * FROM p5)
       |UNION ALL
       |SELECT a.node, CAST(NULL AS BIGINT) AS removed_round,
       |       coalesce(cd.cd, 0) AS core_deg
       |FROM a5 a LEFT JOIN cd ON a.node = cd.node
       |ORDER BY node""".stripMargin
  }

  /** The unrolled 5-round LPA oracle: l0 labels every node with its own
    * id; each round picks the neighbor-label mode with ties to the
    * smallest label (row_number over (count desc, label asc)) — the
    * same loop count and tie rule the engine runs. MATERIALIZED for the
    * same reason as [[KCoreSql]]: each round references its predecessor
    * through the shingle-derived edge relation.
    */
  private val LabelPropSql: String = {
    val rounds = (1 to 5).map { r =>
      s"""l$r AS MATERIALIZED (SELECT node, lab FROM (
         |        SELECT s.u AS node, l.lab,
         |               row_number() OVER (PARTITION BY s.u
         |                 ORDER BY count(*) DESC, l.lab) AS rn
         |        FROM s JOIN l${r - 1} l ON s.v = l.node
         |        GROUP BY s.u, l.lab)
         |        WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${DedupQueries.ShinglesSql},
       |${DedupQueries.NearDupPairsSql},
       |s AS MATERIALIZED (SELECT i AS u, j AS v FROM pairs
       |       UNION ALL SELECT j, i FROM pairs),
       |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lab FROM s),
       |$rounds
       |SELECT node, lab AS community FROM l5 ORDER BY node""".stripMargin
  }

  /** q142/q225 ground truth: a triangle a<b<c exists iff edges (a,b),
    * (b,c),(a,c) all exist in the canonical i<j relation — pure 3-way
    * equi-join, no orientation, so enumeration completeness itself is
    * gated. ONE definition for the inline and stored-edge renderings.
    */
  private lazy val TrianglesSql: String =
    s"""WITH ${DedupQueries.ShinglesSql},
       |${DedupQueries.NearDupPairsSql},
       |e AS (SELECT i, j FROM pairs)
       |SELECT e1.i AS a, e1.j AS b, e2.j AS c
       |FROM e e1
       |JOIN e e2 ON e1.j = e2.i
       |JOIN e e3 ON e3.i = e1.i AND e3.j = e2.j
       |ORDER BY a, b, c""".stripMargin

  def oracles: Map[String, String] = Map(
    "q125_pagerank" -> PageRankSql,
    "q153_kcore" -> KCoreSql,
    "q205_label_prop" -> LabelPropSql,
    "q142_triangles" -> TrianglesSql,
    // the stored-edge renderings answer to the SAME from-scratch
    // oracles — stored ≡ recomputed at graph grain, driver-enforced
    "q225_triangles_stored" -> TrianglesSql,
    "q226_kcore_stored" -> KCoreSql,
    "q227_label_prop_stored" -> LabelPropSql,

    // same hub cap on the wedge CENTER (true degrees in the score),
    // same non-adjacency anti-join, same 4-dp neighborhood Jaccard —
    // over q30's exact cosine edge relation
    "q143_link_predict" ->
      s"""WITH ${SimilarityQueries.VecSql},
         |e AS (SELECT a.vec_id AS i, b.vec_id AS j
         |      FROM v a JOIN v b ON a.vec_id < b.vec_id
         |      WHERE ${SimilarityQueries.cosSql("a.e", "b.e")} >= 0.4),
         |$CnPredictSql""".stripMargin,

    // identical prediction tail over q33's LSH-bucketed edge relation
    // (shared CTE text with q143 — the two variants cannot drift)
    "q148_link_predict_lsh" ->
      s"""WITH ${SimilarityQueries.VecSql},
         |${SimilarityQueries.lshCandSql(16, 8)},
         |e AS (SELECT i, j FROM (
         |        SELECT i, j, ${SimilarityQueries.cosSql("a.e", "b.e")} AS cos
         |        FROM cand JOIN v a ON i = a.vec_id
         |                  JOIN v b ON j = b.vec_id) t
         |      WHERE cos >= 0.4),
         |$CnPredictSql""".stripMargin)

  /** The common-neighbor prediction tail over an already-defined
    * canonical edge CTE `e(i, j)` — hub cap 1000 on the wedge center,
    * true degrees in the 4-dp neighborhood-Jaccard score, non-adjacency
    * anti-join. One text shared by q143 (exact edges) and q148 (LSH
    * edges) so the scoring definition cannot drift between the
    * ground-truth and scale-path variants.
    */
  private val CnPredictSql: String =
    """sym AS (SELECT i AS u, j AS v FROM e
      |        UNION ALL SELECT j, i FROM e),
      |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
      |        FROM sym GROUP BY u),
      |thin AS (SELECT s.u, s.v FROM sym s JOIN deg ON s.u = deg.node
      |         WHERE deg.d <= 1000),
      |cn AS (SELECT x.v AS i, y.v AS j, CAST(count(*) AS BIGINT) AS common
      |       FROM thin x JOIN thin y ON x.u = y.u AND x.v < y.v
      |       GROUP BY 1, 2)
      |SELECT cn.i, cn.j, cn.common, di.d AS deg_i, dj.d AS deg_j,
      |       round(CAST(cn.common AS DOUBLE)
      |             / (di.d + dj.d - cn.common), 4) AS score
      |FROM cn
      |JOIN deg di ON cn.i = di.node
      |JOIN deg dj ON cn.j = dj.node
      |WHERE NOT EXISTS (SELECT 1 FROM e
      |                  WHERE e.i = cn.i AND e.j = cn.j)
      |ORDER BY cn.i, cn.j""".stripMargin
}
