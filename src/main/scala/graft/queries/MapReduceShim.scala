package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.MR
import graft.sources.Tables

/** The reference's own job, expressed through the MR facade: word count
  * over a text corpus (reference `src/main.c:10-40`) + the search-term
  * lookup (reference `src/main.c:50-61`). Oracle-gated against the same
  * SQL as the native Q01 — proving the shim's shuffle/group/reduce path
  * agrees with the declarative one.
  */
object MapReduceShim {

  def queries: Map[String, Q] = Map(
    "q00_mr_word_count" -> ((spark, dir) => {
      import spark.implicits._
      val lines = Tables.load(spark, dir, "documents").select("text").as[String]
      MR.runOnDataset[String, Int, (String, Long)](
          lines,
          line => line.split("\\s+").toIndexedSeq.filter(_.nonEmpty).map(w => (w, 1)),
          (k, vs) => (k, vs.size.toLong),
          numPartitions = 32)
        .toDF("word", "cnt")
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(100)
    }))

  def oracles: Map[String, String] = Map(
    "q00_mr_word_count" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt DESC, word ASC
        |LIMIT 100""".stripMargin)
}
