package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is deterministic (total ORDER BY, rounded
  * doubles, ms-or-coarser timestamps) and, where expressible, has a
  * DuckDB-equivalent in [[oracleSql]] with IDENTICAL column names — the
  * driver's compare sorts columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multiway broadcast-chain join + aggregation (SURVEY.md §2.4 Q05).
    */
  def entry(spark: SparkSession): DataFrame =
    Joins.queries("q05_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MapReduceShim.queries ++ Relational.queries ++ Joins.queries ++
      Analytics.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      SketchQueries.queries ++ TextQueries.queries ++ TemporalQueries.queries ++
      CurationQueries.queries ++ PrepQueries.queries ++
      ProfileQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    MapReduceShim.oracles ++ Relational.oracles ++ Joins.oracles ++
      Analytics.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      SketchQueries.oracles ++ TextQueries.oracles ++ TemporalQueries.oracles ++
      CurationQueries.oracles ++ PrepQueries.oracles ++
      ProfileQueries.oracles ++ GraphQueries.oracles
}
