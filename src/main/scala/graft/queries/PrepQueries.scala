package graft.queries

import graft.operators.Prep
import graft.sources.Tables

/** Oracle-gated training-set preparation queries over `documents`:
  * deterministic hash-bucket splits and fixed-token-budget sequence
  * packing (see [[graft.operators.Prep]] for the scale contracts).
  */
object PrepQueries {

  def queries: Map[String, Q] = Map(
    "q56_split_assign" -> ((spark, dir) =>
      Prep.split(Tables.load(spark, dir, "documents"), valPct = 10, testPct = 10)
        .orderBy("doc_id")),

    "q57_seq_pack" -> ((spark, dir) =>
      Prep.pack(Tables.load(spark, dir, "documents"), budget = 512L)
        .orderBy("doc_id")))

  def oracles: Map[String, String] = Map(
    "q56_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < 10 THEN 'test'
        |            WHEN bucket < 20 THEN 'val'
        |            ELSE 'train' END AS split
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    "q57_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |           AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |       CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |       CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
        |FROM c
        |ORDER BY doc_id""".stripMargin)
}
