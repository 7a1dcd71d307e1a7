package graft.queries

import graft.operators.{Curation, Dedup}
import graft.sources.Tables

/** q48: the flagship end-to-end curation pass (quality gate → exact
  * dedup → near-dup clusters → verdict per document). The oracle rebuilds
  * the identical pipeline in DuckDB: the q38 quality formula, md5
  * fingerprint groups, the full q27 MinHash-LSH chain restricted to
  * quality-passing exact-keepers, and a recursive-closure rendering of
  * the component step.
  *
  * q64 runs the INCREMENTAL composition (stored corpus edges + delta-
  * touching near-dup work only, `Curation.curateIncremental`) over the
  * same corpus split at the q62 delta cut — and is gated against the
  * SAME from-scratch oracle SQL as q48: the hash match IS the
  * incremental-equals-full law, enforced by the driver.
  */
object CurationQueries {

  def queries: Map[String, Q] = Map(
    "q48_corpus_curation" -> ((spark, dir) =>
      Curation.curate(Tables.load(spark, dir, "documents"), minQuality = 0.15)
        .orderBy("doc_id")),

    "q64_incremental_curation" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{col, max}
      val docs = Tables.load(spark, dir, "documents")
      val nf = math.floor(0.8 * docs.agg(max("doc_id")).head.getLong(0)).toLong
      val corpus = docs.filter(col("doc_id") < nf)
      val delta = docs.filter(col("doc_id") >= nf)
      // what yesterday's run would have stored
      val corpusEdges = Dedup.nearDupEdges(Curation.exactKeepers(corpus))
      Curation.curateIncremental(corpus, delta, corpusEdges).orderBy("doc_id")
    }))

  def oracles: Map[String, String] = Map(
    "q48_corpus_curation" -> FullCurationSql,
    "q64_incremental_curation" -> FullCurationSql)

  private lazy val FullCurationSql: String =
      ("""WITH RECURSIVE
        |wsq AS (SELECT doc_id, text,
        |               list_filter(string_split_regex(trim(text), '\s+'),
        |                           x -> x != '') AS w
        |        FROM documents),
        |q AS (SELECT doc_id, text,
        |             round(least(1.0, len(w) / 100.0)
        |                   * (len(list_distinct(w)) * 1.0 / len(w)), 4) AS quality
        |      FROM wsq),
        |passed AS (SELECT doc_id, text, md5(text) AS fp, quality
        |           FROM q WHERE quality >= 0.15),
        |keep1 AS (SELECT fp, min(doc_id) AS exact_keep FROM passed GROUP BY fp),
        |exact_tag AS (SELECT p.doc_id, p.text, k.exact_keep
        |              FROM passed p JOIN keep1 k USING (fp)),
        |ek AS (SELECT doc_id, text FROM exact_tag WHERE doc_id = exact_keep),
        |""".stripMargin +
      DedupQueries.shinglesSql("ek") + ",\n" +
      DedupQueries.NearDupPairsSql + ",\n" +
      """e AS (SELECT i, j FROM pairs UNION SELECT j AS i, i AS j FROM pairs),
        |r AS (SELECT i AS nd, i AS m FROM e
        |      UNION
        |      SELECT r.nd, e.j AS m FROM r JOIN e ON r.m = e.i),
        |compo AS (SELECT nd AS doc_id, min(m) AS component FROM r GROUP BY nd)
        |SELECT d.doc_id, d.quality,
        |       CASE WHEN d.quality IS NULL OR d.quality < 0.15 THEN 'low_quality'
        |            WHEN et.exact_keep IS NOT NULL AND d.doc_id <> et.exact_keep
        |              THEN 'exact_dup'
        |            WHEN c.component IS NOT NULL AND c.component <> d.doc_id
        |              THEN 'near_dup'
        |            ELSE 'kept' END AS verdict,
        |       CASE WHEN d.quality IS NULL OR d.quality < 0.15 THEN NULL
        |            WHEN et.exact_keep IS NOT NULL AND d.doc_id <> et.exact_keep
        |              THEN et.exact_keep
        |            WHEN c.component IS NOT NULL AND c.component <> d.doc_id
        |              THEN c.component
        |            ELSE NULL END AS ref_id
        |FROM q d
        |LEFT JOIN exact_tag et ON d.doc_id = et.doc_id
        |LEFT JOIN compo c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin)
}
