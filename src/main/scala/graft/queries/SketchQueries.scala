package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Aggregators
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
        .orderBy("l_returnflag")))

  def oracles: Map[String, String] = Map(
    // q34 intentionally absent: HLL sketches are engine-specific.
    "q35_udaf_wavg" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
        |         AS qty_weighted_price,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
}
