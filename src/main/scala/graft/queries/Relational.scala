package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Single-table relational surface: scan/filter/project, aggregation,
  * sort/limit/top-k, distinct, scalar functions (string/date/math).
  *
  * Reference grounding: the reference's entire single-table surface is
  * tokenize + count (reference `src/main.c:10-40`) and a point lookup
  * (`src/main.c:50-61`); Q01/Q02 reproduce it, the rest is the declared
  * extension (SURVEY.md §2.4). Everything here is built-in Catalyst
  * expressions — filters and projections reach the parquet scan
  * (PushedFilters/ReadSchema), aggregation is partial+final hash agg,
  * top-k is TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  /** The fixed lookup term for Q02 — reference `src/main.c:55-61` looks up
    * one search term in the word-count result.
    */
  val SearchTerm = "data"

  def queries: Map[String, Q] = Map(
    "q01_word_count" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      docs
        .select(explode(split(col("text"), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(100)
    }),

    "q02_term_lookup" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      docs
        .select(explode(split(col("text"), "\\s+")).as("word"))
        .filter(col("word") === SearchTerm)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
    }),

    "q03_filter_project" -> ((spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_quantity") > 30 &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q10_agg_tpch_q1" -> ((spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(min("l_quantity"), 2).as("min_qty"),
          round(max("l_quantity"), 2).as("max_qty"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q16_topk_global" -> ((spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(50)
    }),

    "q17_distinct" -> ((spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q19_string_fns" -> ((spark, dir) => {
      Tables.load(spark, dir, "part")
        .filter(col("p_name").like("%gear%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("upper_name"),
          lower(col("p_type")).as("lower_type"),
          substring(col("p_name"), 1, 5).as("prefix5"),
          // derived ints are cast to long: DuckDB's equivalents are BIGINT
          length(col("p_name")).cast("long").as("name_len"),
          trim(col("p_name")).as("trimmed"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake_name"))
        .orderBy("p_partkey")
    }),

    "q20_date_fns" -> ((spark, dir) => {
      Tables.load(spark, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .agg(
          count(lit(1)).as("n"),
          min(datediff(col("o_orderdate"), lit("1995-01-01"))).cast("long").as("min_dd"),
          max(datediff(col("o_orderdate"), lit("1995-01-01"))).cast("long").as("max_dd"))
        .orderBy("y", "m")
    }),

    "q21_math_fns" -> ((spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("charge"),
          round(sum(abs(col("l_discount") - lit(0.05))), 4).as("sum_absdev"),
          floor(avg(col("l_quantity"))).cast("long").as("floor_avg_qty"),
          ceil(avg(col("l_quantity"))).cast("long").as("ceil_avg_qty"),
          round(sqrt(avg(col("l_extendedprice"))), 4).as("sqrt_avg_price"))
        .orderBy("l_returnflag")
    }))

  def oracles: Map[String, String] = Map(
    "q01_word_count" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt DESC, word ASC
        |LIMIT 100""".stripMargin,

    "q02_term_lookup" ->
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents) t
         |WHERE word = '$SearchTerm'
         |GROUP BY word""".stripMargin,

    "q03_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_shipdate < TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q10_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(min(l_quantity), 2) AS min_qty,
        |       round(max(l_quantity), 2) AS max_qty,
        |       count(*) AS count_order,
        |       count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q16_topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 50""".stripMargin,

    "q17_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q19_string_fns" ->
      """SELECT p_partkey,
        |       upper(p_name) AS upper_name,
        |       lower(p_type) AS lower_type,
        |       substring(p_name, 1, 5) AS prefix5,
        |       length(p_name) AS name_len,
        |       trim(p_name) AS trimmed,
        |       p_brand || '-' || p_type AS brand_type,
        |       replace(p_name, ' ', '_') AS snake_name
        |FROM part
        |WHERE p_name LIKE '%gear%'
        |ORDER BY p_partkey""".stripMargin,

    "q20_date_fns" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       count(*) AS n,
        |       min(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS min_dd,
        |       max(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS max_dd
        |FROM orders
        |GROUP BY 1, 2, 3
        |ORDER BY y, m""".stripMargin,

    "q21_math_fns" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charge,
        |       round(sum(abs(l_discount - 0.05)), 4) AS sum_absdev,
        |       CAST(floor(avg(l_quantity)) AS BIGINT) AS floor_avg_qty,
        |       CAST(ceil(avg(l_quantity)) AS BIGINT) AS ceil_avg_qty,
        |       round(sqrt(avg(l_extendedprice)), 4) AS sqrt_avg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
}
