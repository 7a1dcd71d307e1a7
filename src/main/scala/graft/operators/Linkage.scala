package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage: approximate string matching between entity names —
  * the Fellegi-Sunter blocking + comparison shape, with edit distance
  * as the comparator (Spark's codegen'd `levenshtein`, an exact
  * integer both engines compute identically).
  *
  * Not in the reference (SURVEY.md §2.5); the relational sibling of the
  * document near-dup tiers: where MinHash matches *content*, linkage
  * matches *entity names* whose variation is typographic (adjective
  * swaps, typos, transliteration drift) — the master-data step before
  * any key-join against a dirty dimension.
  */
object Linkage {

  /** Fuzzy match table over DISTINCT entity names, blocked to avoid the
    * all-pairs comparison: names are compared only within a block (the
    * last name token — the "entity type" heuristic; a real deployment
    * composes several blocking passes, the SNM multi-pass argument in
    * [[Dedup]]). Output is one row per matched unordered name pair with
    * the edit distance and each name's carrier count — the match table
    * a linker persists, at NAME grain (bounded by the vocabulary, not
    * the table).
    *
    * Scale posture (100 TB): the distinct-name projection collapses the
    * table to its name vocabulary FIRST (one map-side-combined
    * groupBy); pairing is an equi-join on the block key over that
    * bounded frame; `maxBlock` drops degenerate blocks WHOLE (the
    * NearDupMaxBucket argument — a block that big means the blocking
    * key failed, not that the pairs are wanted). Edit distance runs
    * once per candidate pair, never per row pair.
    */
  def nameMatches(df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int = 3, maxBlock: Int = 10000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val names = df
      .filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", element_at(split(col("name"), " "), -1))
    val sized = names.groupBy("blk").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBlock).select("blk")
    val kept = names.join(sized, Seq("blk"), "left_semi")
    kept.as("a")
      .join(kept.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"),
        col("a.n_rows").as("n_a"), col("b.n_rows").as("n_b"))
      .filter(col("dist") <= maxDist)
  }
}
