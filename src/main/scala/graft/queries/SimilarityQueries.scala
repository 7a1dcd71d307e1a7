package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Oracle-gated similarity-search queries over `embeddings`.
  *
  * Data note (sf0.01): pairwise cosines top out ≈ 0.51 (no planted
  * embedding near-dups), so thresholds are sized to the data: 0.4 keeps
  * 59 pairs, 0.3 keeps a handful of neighbors per query vector. The LSH
  * variant is exercised by tests (recall vs brute force), not an oracle —
  * its output is a subset of the exact pairs by construction.
  */
object SimilarityQueries {

  /** DuckDB-side exact cosine between two list<double> columns (1-based
    * index). Spark computes the same fold via zip_with + aggregate.
    */
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)), k -> $a[k] * $b[k]))
       | / (sqrt(list_sum(list_transform($a, x -> x * x)))
       |    * sqrt(list_sum(list_transform($b, x -> x * x))))""".stripMargin

  private val VecSql =
    """v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |      FROM embeddings)""".stripMargin

  def queries: Map[String, Q] = Map(
    "q30_embedding_pairs" -> ((spark, dir) =>
      Similarity.cosinePairs(Tables.load(spark, dir, "embeddings"), threshold = 0.4)
        .orderBy("i", "j")),

    "q31_ann_neighbors" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.cosineNeighbors(emb, emb.filter(col("vec_id") < 10), threshold = 0.3)
        .orderBy("query_id", "neighbor_id")
    }),

    "q32_ann_topk" -> ((spark, dir) => {
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }))

  def oracles: Map[String, String] = Map(
    "q30_embedding_pairs" ->
      s"""WITH $VecSql
         |SELECT a.vec_id AS i, b.vec_id AS j,
         |       round(${cosSql("a.e", "b.e")}, 4) AS cos
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.e", "b.e")} >= 0.4
         |ORDER BY i, j""".stripMargin,

    "q31_ann_neighbors" ->
      s"""WITH $VecSql
         |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |       round(${cosSql("q.e", "c.e")}, 4) AS cos
         |FROM v q JOIN v c ON q.vec_id <> c.vec_id
         |WHERE q.vec_id < 10 AND ${cosSql("q.e", "c.e")} >= 0.3
         |ORDER BY query_id, neighbor_id""".stripMargin,

    "q32_ann_topk" ->
      s"""WITH $VecSql,
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |                  ${cosSql("q.e", "c.e")} AS cos
         |           FROM v q JOIN v c ON q.vec_id <> c.vec_id
         |           WHERE q.vec_id < 10),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |                  row_number() OVER (PARTITION BY query_id
         |                    ORDER BY round(cos, 6) DESC, neighbor_id) AS rank
         |           FROM scored)
         |SELECT query_id, neighbor_id, round(cos, 4) AS cos, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin)
}
