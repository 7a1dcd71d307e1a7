package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Aggregators
import graft.operators.Sketches
import graft.sources.Tables

/** Approx-sketch + custom-aggregation queries (SURVEY.md §2.5 approx row
  * and UDF/UDAF row).
  *
  * q34 exercises the HLL++ sketch (`approx_count_distinct`): mergeable
  * fixed-size state, the scale replacement for exact COUNT DISTINCT's
  * expand-shuffle — no DuckDB oracle (different engines run different
  * HLL variants), so the driver records the weaker rows-only check and
  * the accuracy bound is property-tested in SketchSpec against the exact
  * count. q35 gates the typed Aggregator UDAF through the full DuckDB
  * oracle (its algebraic form sum(v*w)/sum(w) is SQL-expressible).
  */
object SketchQueries {

  def queries: Map[String, Q] = Map(
    "q34_hll_distinct" -> ((spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("approx_supps"))
        .orderBy("l_returnflag")),

    "q35_udaf_wavg" -> ((spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(Aggregators.wavg(col("l_extendedprice"), col("l_quantity")), 4)
            .as("qty_weighted_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // GK-summary quantiles: mergeable bounded state (the scale shape for
    // "p99 latency over 100 TB"), vs exact percentile's full sort. Like
    // q34, no cross-engine oracle — rows-only check here, rank-error
    // bound property-tested in SketchSpec.
    "q49_approx_percentile" -> ((spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // count-min heavy-hitter audit: d×w counter matrix on the portable
    // md5 hash, so — unlike the HLL/GK tiers — the whole estimate
    // surface is engine-reproducible and hash-GATED, not rows-only;
    // probes include an absent word to prove the est ≥ exact = 0 arm
    "q98_cms_counts" -> ((spark, dir) =>
      Sketches.cmsEstimates(Tables.load(spark, dir, "documents"),
          CmsProbes, d = 4, w = 1024)
        .orderBy("word")))

  /** q98's probe words: heavy corpus terms + one absent word. */
  private val CmsProbes =
    Seq("join", "customer", "vector", "the", "zzzmissing")

  def oracles: Map[String, String] = Map(
    // q34 intentionally absent: HLL sketches are engine-specific.
    "q35_udaf_wavg" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
        |         AS qty_weighted_price,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // the md5-bucketed CMS renders exactly in DuckDB: same bucket
    // strings, same counter adds, same min — a hash-gated sketch
    "q98_cms_counts" ->
      s"""WITH ws AS (SELECT string_split_regex(trim(text), '\\s+') AS w
         |            FROM documents),
         |tok AS (SELECT word FROM (SELECT unnest(w) AS word FROM ws)
         |        WHERE word != ''),
         |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
         |mat AS (SELECT r, CAST('0x' || substr(md5('cms_' || CAST(r AS VARCHAR)
         |                   || '_' || word), 1, 15) AS BIGINT) % 1024 AS bucket,
         |               CAST(count(*) AS BIGINT) AS c
         |        FROM tok CROSS JOIN rs GROUP BY 1, 2),
         |probes AS (SELECT unnest(['join', 'customer', 'vector', 'the',
         |                          'zzzmissing']) AS word),
         |pb AS (SELECT word, r, CAST('0x' || substr(md5('cms_' || CAST(r AS VARCHAR)
         |                  || '_' || word), 1, 15) AS BIGINT) % 1024 AS bucket
         |       FROM probes CROSS JOIN rs),
         |est AS (SELECT word, min(coalesce(c, 0)) AS est
         |        FROM pb LEFT JOIN mat USING (r, bucket) GROUP BY word),
         |ex AS (SELECT word, CAST(count(*) AS BIGINT) AS exact FROM tok
         |       WHERE word IN ('join', 'customer', 'vector', 'the', 'zzzmissing')
         |       GROUP BY word)
         |SELECT e.word, e.est, coalesce(x.exact, 0) AS exact,
         |       e.est - coalesce(x.exact, 0) AS overestimate
         |FROM est e LEFT JOIN ex x USING (word)
         |ORDER BY e.word""".stripMargin)
}
