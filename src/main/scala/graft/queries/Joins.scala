package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Join surface: inner, multiway, broadcast, left-outer, full-outer,
  * cross (bounded dims only), semi, anti, top-k per group, set ops.
  *
  * The reference has no joins at all (SURVEY.md §2.5) — this is the
  * declared capability extension. Scale posture: explicit `broadcast()`
  * hints ONLY on tables whose size is bounded by the schema itself
  * (region = 5 rows, nation = 25 — and anything derived by joining down
  * to them). Everything that grows with the data — customer, part,
  * orders and any frame derived from them — is left unhinted: a forced
  * broadcast of a linearly-scaling table is an executor OOM at 100×,
  * while AQE picks broadcast at runtime whenever the side is actually
  * under the threshold, and falls back to shuffle joins (with skew
  * splitting) when it isn't. Join order for the multiway query starts
  * from the most selective dimension (region filter) so the bounded dim
  * chain reduces before touching the fact table.
  */
object Joins {

  def queries: Map[String, Q] = Map(
    // FUZZY LINKAGE JOIN: edit-distance matches between distinct part
    // names, blocked on the trailing "entity type" token — the
    // similarity join at NAME grain (bounded by the vocabulary);
    // levenshtein is exact-integer in both engines
    "q140_fuzzy_linkage" -> ((spark, dir) =>
      graft.operators.Linkage.nameMatches(
          Tables.load(spark, dir, "part"), "p_partkey", "p_name",
          maxDist = 3, maxBlock = 10000)
        .orderBy("name_a", "name_b")),

    // TPC-H Q3 (shipping priority), adapted to this schema: top-10
    // unshipped BUILDING-segment orders by exact-cents revenue at the
    // 1998-03-15 cutoff. The optimizer showcase: both date filters
    // push into the scans, the segment dim broadcasts, and the top-10
    // is TakeOrderedAndProject — never a global sort (CI-gated).
    "q185_tpch_q3" -> ((spark, dir) => {
      val cutoff = lit("1998-03-15").cast("timestamp")
      val cust = Tables.load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"),
          expr("unix_micros(o_orderdate) div 1000000").as("orderdate_s"),
          col("o_orderpriority"))
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "orderdate_s", "o_orderpriority")
        .agg(sum(col("cents")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 (local supplier volume), adapted: per ASIA nation, the
    // 1996 revenue where the supplier and the customer share the
    // nation — the classic 6-way star join; region/nation broadcast,
    // the big tables meet on their keys, the LOCAL constraint is one
    // extra equi-condition (never a post-join filter of a wider join)
    "q186_tpch_q5" -> ((spark, dir) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val nat = Tables.load(spark, dir, "nation")
        .join(broadcast(Tables.load(spark, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum(col("cents")).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue_cents").desc, col("nation"))
    }),

    // TPC-H Q10 (returned-item reporting), adapted: top-20 customers
    // by returned revenue in 1996-Q4 orders — the churn-risk report;
    // exact cents, TakeOrderedAndProject top-k
    "q187_tpch_q10" -> ((spark, dir) => {
      val lo = lit("1996-10-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"))
      val nat = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("acctbal"),
          col("n_name").as("nation"))
        .agg(sum(col("cents")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q4 (order-priority checking), adapted: this schema has no
    // commit/receipt dates, so "late" = a line shipped > 90 days after
    // the order date. Per-priority count of 1996-Q3 orders with at
    // least one late line — an EXISTS, rendered as a left-semi join
    // whose condition mixes the equi key with the lateness predicate
    // (SMJ on the key; never a per-order subquery loop)
    "q189_tpch_q4" -> ((spark, dir) => {
      val lo = lit("1996-07-01").cast("timestamp")
      val hi = lit("1996-10-01").cast("timestamp")
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q12 (shipmode priority classes), adapted: no l_shipmode in
    // this schema, so the category axis is l_returnflag; per flag, the
    // 1997-shipped LATE lines (> 90 days after order date) split into
    // critical-priority (1-URGENT/2-HIGH) vs other orders — Q12's
    // conditional two-way count, one equi-join + one agg pass
    "q190_tpch_q12" -> ((spark, dir) => {
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(sum(when(crit, 1L).otherwise(0L)).as("high_lines"),
          sum(when(crit, 0L).otherwise(1L)).as("low_lines"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q14 (promo revenue share), adapted: p_type here is the
    // bare class word, so promo = p_type = 'PROMO'. March-1997 promo
    // vs total revenue in exact cents, share in integer ppm — the
    // ratio never touches a float. (promo_cents·10⁶ must fit a
    // BIGINT: at ~10¹⁵ cents/month switch the product to DECIMAL.)
    "q191_tpch_q14" -> ((spark, dir) => {
      val lo = lit("1997-03-01").cast("timestamp")
      val hi = lit("1997-04-01").cast("timestamp")
      val part = Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_type"))
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(col("l_partkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", col("cents"))
            .otherwise(0L)).as("promo_cents"),
          sum(col("cents")).as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          expr("promo_cents * 1000000L div total_cents").as("promo_ppm"))
    }),

    // TPC-H Q18 (large-volume orders): top-100 orders whose line
    // quantities sum past 300, with their customer — the whale-order
    // report. Quantity sums in exact BIGINT (quantities are integral),
    // order value in cents, top-k as TakeOrderedAndProject; the
    // having-filter runs on the partial-agged order grain before any
    // join, so only qualifying orders reach the customer join
    "q192_tpch_q18" -> ((spark, dir) => {
      val big = Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 300)
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("unix_micros(o_orderdate) div 1000000").as("orderdate_s"),
          expr("cast(round(o_totalprice * 100) as bigint)")
            .as("totalprice_cents"))
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("orderdate_s"), col("totalprice_cents"), col("total_qty"))
        .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q22 (global sales opportunity), adapted: no phone country
    // codes, so the grouping axis is the customer's nation; "dormant"
    // = no order since 2000-01-01 (every sf0.01 customer has SOME
    // order, so never-ordered would be vacuous). Above-average test in
    // exact integers: acctbal·n_pos > Σpos avoids the division whose
    // float rounding differs across engines. The threshold frame is a
    // broadcast 1-row cross (sanctioned, like q181's), dormancy is a
    // left-anti equi-join
    "q193_tpch_q22" -> ((spark, dir) => {
      val cutoff = lit("2000-01-01").cast("timestamp")
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          expr("cast(round(c_acctbal * 100) as bigint)").as("acctbal_cents"))
      val thresh = cust.filter(col("acctbal_cents") > 0)
        .agg(sum(col("acctbal_cents")).as("sum_pos_cents"),
          count(lit(1)).as("n_pos"))
      val recent = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= cutoff)
        .select(col("o_custkey"))
      val nat = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      cust.crossJoin(broadcast(thresh))
        .filter(col("acctbal_cents") * col("n_pos") > col("sum_pos_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("acctbal_cents")).as("acctbal_cents_sum"))
        .orderBy("nation")
    }),

    // TPC-H Q6 (forecasting revenue change): one-scan filter-and-sum —
    // 1997 lines with discount in [0.05, 0.07] and quantity < 24, the
    // would-have-been revenue = Σ extendedprice·discount in exact
    // cents. Every predicate pushes into the parquet scan; the IEEE
    // double literals parse identically in both engines so the band
    // compare is portable
    "q194_tpch_q6" -> ((spark, dir) => {
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(expr(
          "cast(round(l_extendedprice * l_discount * 100) as bigint)"))
          .as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q7 (volume shipping), adapted to the synthetic nation
    // names: revenue shipped between NATION_1 and NATION_2 in either
    // direction, per (supplier nation, customer nation, ship year).
    // The nation filter reduces supplier/customer BEFORE the fact
    // joins (most-selective-first, like q05); year stays BIGINT
    "q195_tpch_q7" -> ((spark, dir) => {
      val natPair = Tables.load(spark, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.load(spark, dir, "supplier")
        .join(broadcast(natPair), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.load(spark, dir, "customer")
        .join(broadcast(natPair), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(col("cents")).as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 (national market share), adapted: per order year, the
    // share of NATION_1-supplier revenue within all PROMO-part revenue
    // sold to AMERICA-region customers — in exact integer ppm, the
    // q191 promo-share pattern at year grain. The supplier-nation flag
    // rides a broadcast bounded dim; nothing divides a float
    "q196_tpch_q8" -> ((spark, dir) => {
      val amNations = Tables.load(spark, dir, "nation")
        .join(broadcast(Tables.load(spark, dir, "region")
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables.load(spark, dir, "customer")
        .join(broadcast(amNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val supN1 = Tables.load(spark, dir, "nation")
        .filter(col("n_name") === "NATION_1").select(col("n_nationkey"))
      val sup = Tables.load(spark, dir, "supplier")
        .join(broadcast(supN1), col("s_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("s_suppkey"), lit(1L).as("is_n1"))
      val promo = Tables.load(spark, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
      li.join(promo, col("l_partkey") === col("p_partkey"), "left_semi")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(sup, col("l_suppkey") === col("s_suppkey"), "left")
        .groupBy("o_year")
        .agg(sum(when(col("is_n1") === 1L, col("cents")).otherwise(0L))
            .as("n1_cents"),
          sum(col("cents")).as("total_cents"))
        .select(col("o_year"), col("n1_cents"), col("total_cents"),
          expr("n1_cents * 1000000L div total_cents").as("share_ppm"))
        .orderBy("o_year")
    }),

    // TPC-H Q15 (top supplier): suppliers whose 1997-Q1 shipped
    // revenue equals the quarter's maximum — revenue in exact cents
    // makes the = max tie test portable (the classic's float view
    // would not be); the max is a broadcast 1-row cross (sanctioned)
    "q197_tpch_q15" -> ((spark, dir) => {
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-04-01").cast("timestamp")
      val rev = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy(col("l_suppkey"))
        .agg(sum(expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
          .as("revenue_cents"))
      val top = rev.agg(max(col("revenue_cents")).as("max_cents"))
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      rev.crossJoin(broadcast(top))
        .filter(col("revenue_cents") === col("max_cents"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (small-quantity-order revenue): lines whose quantity
    // sits under 20% of their part's average — the correlated-average
    // kept exact by multiplying through (5·qty·n < Σqty, all BIGINT:
    // quantities are integral), so no engine divides; part-grain
    // partial agg + one equi-join back, avg_yearly in floor-div cents
    "q198_tpch_q17" -> ((spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"), expr(
          "cast(round(l_extendedprice * 100) as bigint)").as("price_cents"))
      val pa = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_lines_pt"))
      li.join(pa, col("l_partkey") === col("pk"))
        .filter(col("qty") * 5L * col("n_lines_pt") < col("sum_qty"))
        .agg(sum(col("price_cents")).as("total_cents"),
          count(lit(1)).as("n_lines"))
        .select(col("total_cents"), col("n_lines"),
          expr("total_cents div 7").as("avg_yearly_cents"))
    }),

    // TPC-H Q13 (customer order-count distribution): how many
    // customers placed k orders, INCLUDING k = 0 — the left join whose
    // unmatched side is the point (an inner join would silently drop
    // the zero bucket); two agg passes, the second over the bounded
    // count domain
    "q199_tpch_q13" -> ((spark, dir) => {
      val cust = Tables.load(spark, dir, "customer").select(col("c_custkey"))
      val ord = Tables.load(spark, dir, "orders").select(col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q19 (discounted revenue): the OR-of-ANDs predicate — three
    // (brand, size band, quantity band) arms — over the li ⋈ part
    // equi-join; the disjunction can't push below the join as a whole,
    // but each side's common bounds do, and the join stays the one
    // equi-shuffle
    "q200_tpch_q19" -> ((spark, dir) => {
      val part = Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
      val arm1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 11)
      val arm2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(10, 20) && col("l_quantity").between(10, 20)
      val arm3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(20, 35) && col("l_quantity").between(20, 30)
      li.join(part, col("l_partkey") === col("p_partkey"))
        .filter(arm1 || arm2 || arm3)
        .agg(sum(col("cents")).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q9 (product-type profit), adapted: no partsupp, so cost =
    // p_retailprice·quantity (the schema's only unit-cost column);
    // profit per (supplier nation, order year) on PROMO parts (the
    // classic's '%green%' name filter, rendered on this schema's
    // bounded p_type) — profit stays a BIGINT cents difference, never
    // a float subtraction
    "q201_tpch_q9" -> ((spark, dir) => {
      val promo = Tables.load(spark, dir, "part")
        .filter(col("p_type") === "PROMO")
        .select(col("p_partkey"),
          expr("cast(round(p_retailprice * 100) as bigint)").as("cost_cents"))
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("rev_cents"))
      li.join(promo, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum(col("rev_cents") - col("cost_cents") * col("qty"))
          .as("profit_cents"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    "q04_join_inner" -> ((spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      val customer = Tables.load(spark, dir, "customer")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum("o_totalprice"), 2).as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    "q05_join_multiway" -> ((spark, dir) => {
      val region = Tables.load(spark, dir, "region")
      val nation = Tables.load(spark, dir, "nation")
      val customer = Tables.load(spark, dir, "customer")
      val orders = Tables.load(spark, dir, "orders")
      val lineitem = Tables.load(spark, dir, "lineitem")
      // Most-selective-first: filter the 5-row region and hint only the
      // bounded dims (region, and nations-joined-to-region ≤ 25 rows).
      // custs/ords scale with the data — AQE chooses their join strategy.
      val asiaNations = nation
        .join(broadcast(region.filter(col("r_name") === "ASIA")),
          nation("n_regionkey") === region("r_regionkey"))
        .select("n_nationkey", "n_name")
      val custs = customer
        .join(broadcast(asiaNations), customer("c_nationkey") === asiaNations("n_nationkey"))
        .select("c_custkey", "n_name")
      val ords = orders
        .join(custs, orders("o_custkey") === custs("c_custkey"))
        .select("o_orderkey", "n_name")
      lineitem
        .join(ords, lineitem("l_orderkey") === ords("o_orderkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("n_name")
    }),

    "q06_join_broadcast" -> ((spark, dir) => {
      val lineitem = Tables.load(spark, dir, "lineitem")
      val part = Tables.load(spark, dir, "part")
      // part grows ~linearly with sf: no hint — AQE broadcasts it while
      // it fits and shuffles when it doesn't (the plan, not the query,
      // decides "broadcast join").
      lineitem
        .join(part, lineitem("l_partkey") === part("p_partkey"))
        .groupBy("p_brand")
        .agg(
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    "q07_join_left_outer" -> ((spark, dir) => {
      val customer = Tables.load(spark, dir, "customer")
      val orders = Tables.load(spark, dir, "orders")
      customer
        .join(orders, customer("c_custkey") === orders("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    "q08_join_semi" -> ((spark, dir) => {
      val customer = Tables.load(spark, dir, "customer")
      val bigOrders = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 450000)
      customer
        .join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q09_join_anti" -> ((spark, dir) => {
      val customer = Tables.load(spark, dir, "customer")
      val bigOrders = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 450000)
      customer
        .join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q15_topk_per_group" -> ((spark, dir) => {
      val orders = Tables.load(spark, dir, "orders")
      val customer = Tables.load(spark, dir, "customer")
      val oc = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      oc.select(
          col("c_mktsegment"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    }),

    "q36_supplier_stats" -> ((spark, dir) => {
      val supplier = Tables.load(spark, dir, "supplier")
      val nation = Tables.load(spark, dir, "nation")
      supplier
        .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_suppliers"),
          round(avg("s_acctbal"), 2).as("avg_acctbal"))
        .orderBy("n_name")
    }),

    "q18_set_ops" -> ((spark, dir) => {
      val customer = Tables.load(spark, dir, "customer")
      val orders = Tables.load(spark, dir, "orders")
      val a = customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = orders.filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("c_custkey")).distinct()
      val u = a.union(b).distinct().withColumn("op", lit("union"))
      val i = a.intersect(b).withColumn("op", lit("intersect"))
      val e = a.except(b).withColumn("op", lit("except"))
      u.unionByName(i).unionByName(e)
        .select("op", "c_custkey")
        .orderBy("op", "c_custkey")
    }),

    "q50_join_full_outer" -> ((spark, dir) => {
      // both sides have unmatched rows: machinery-segment customers vs
      // high-value orders. Sort keys coalesce to non-null so row order
      // is engine-independent (Spark sorts NULLS FIRST, DuckDB LAST).
      val cust = Tables.load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "MACHINERY")
        .select("c_custkey", "c_acctbal")
      val ords = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 150000)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      cust.join(ords, cust("c_custkey") === ords("o_custkey"), "full_outer")
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
          col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy(coalesce(col("c_custkey"), col("o_orderkey") * -1),
          coalesce(col("o_orderkey"), lit(-1L)))
    }),

    "q51_join_cross" -> ((spark, dir) => {
      // cartesian flavor on the bounded dims (5 × 25 rows) — the ONLY
      // place a cross product is sanctioned: both sides fixed by schema.
      val region = Tables.load(spark, dir, "region").select("r_regionkey", "r_name")
      val nation = Tables.load(spark, dir, "nation").select("n_nationkey", "n_name")
      region.crossJoin(nation)
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy("r_regionkey", "n_nationkey")
    }),

    // salted hot-key join, oracle-gated (the differential SkewJoin spec
    // made semantic): events concentrate on ~15 user_ids — each key's
    // fan-out over 8 salt buckets splits its rows across reducers, and
    // the per-segment rollup proves the salted plan loses/duplicates
    // nothing vs DuckDB's plain join
    "q82_skew_join" -> ((spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.SkewJoin
        .salted(ev, cust, key = "user_id", disambig = "event_id", buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy("c_mktsegment")
    }),

    // the PLANNER-DRIVEN rendering of q82: `SkewJoin.autoJoin` measures
    // both sides (rows, hottest-key ppm — the q128 scan) plus the CMS
    // join-size estimate (q126) and picks broadcast/salted/plain ITSELF;
    // whichever branch runs, the output is contract-identical to the
    // plain join, so the one oracle gates every strategy — the executable
    // proof that the strategy decision is semantics-free. Thresholds sit
    // where the sf-dir's own statistics drive the choice (customer is
    // bounded → broadcast at test scale; at 100 TB the same call salts
    // the hot user_ids instead — no code change)
    "q204_auto_join" -> ((spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val (joined, _) = graft.operators.SkewJoin.autoJoin(ev, cust, "user_id")
      joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("total_cents"))
        .orderBy("c_mktsegment")
    }))

  def oracles: Map[String, String] = Map(
    "q185_tpch_q3" ->
      """SELECT l.l_orderkey AS o_orderkey,
        |       epoch_us(o.o_orderdate) // 1000000 AS orderdate_s,
        |       o.o_orderpriority,
        |       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                           * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q186_tpch_q5" ->
      """SELECT n.n_name AS nation,
        |       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                           * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |               AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1
        |ORDER BY revenue_cents DESC, nation""".stripMargin,

    "q187_tpch_q10" ->
      """SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal,
        |       n.n_name AS nation,
        |       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                           * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_cents DESC, c.c_custkey
        |LIMIT 20""".stripMargin,

    "q189_tpch_q4" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q190_tpch_q12" ->
      """SELECT l.l_returnflag,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q191_tpch_q14" ->
      """WITH rev AS (
        |  SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |                       THEN CAST(round(l.l_extendedprice
        |                              * (1 - l.l_discount) * 100) AS BIGINT)
        |                       ELSE 0 END) AS BIGINT) AS promo_cents,
        |         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                             * 100) AS BIGINT)) AS BIGINT)
        |           AS total_cents
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        |    AND l.l_shipdate < TIMESTAMP '1997-04-01')
        |SELECT promo_cents, total_cents,
        |       CAST(promo_cents * 1000000 // total_cents AS BIGINT)
        |         AS promo_ppm
        |FROM rev""".stripMargin,

    "q192_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING total_qty > 300)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |       epoch_us(o.o_orderdate) // 1000000 AS orderdate_s,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |       b.total_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY totalprice_cents DESC, o.o_orderkey
        |LIMIT 100""".stripMargin,

    "q193_tpch_q22" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        |  FROM customer),
        |t AS (
        |  SELECT CAST(sum(acctbal_cents) AS BIGINT) AS sum_pos_cents,
        |         CAST(count(*) AS BIGINT) AS n_pos
        |  FROM cust WHERE acctbal_cents > 0)
        |SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_custs,
        |       CAST(sum(c.acctbal_cents) AS BIGINT) AS acctbal_cents_sum
        |FROM cust c CROSS JOIN t
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.acctbal_cents * t.n_pos > t.sum_pos_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q194_tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
        |                    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q195_tpch_q7" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                           * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |WHERE ns.n_name IN ('NATION_1', 'NATION_2')
        |  AND nc.n_name IN ('NATION_1', 'NATION_2')
        |  AND ns.n_name <> nc.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q196_tpch_q8" ->
      """WITH yr AS (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |         CAST(sum(CASE WHEN ns.n_name = 'NATION_1'
        |                       THEN CAST(round(l.l_extendedprice
        |                              * (1 - l.l_discount) * 100) AS BIGINT)
        |                       ELSE 0 END) AS BIGINT) AS n1_cents,
        |         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                             * 100) AS BIGINT)) AS BIGINT)
        |           AS total_cents
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |  JOIN region r ON nc.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        |  WHERE p.p_type = 'PROMO' AND r.r_name = 'AMERICA'
        |  GROUP BY 1)
        |SELECT o_year, n1_cents, total_cents,
        |       CAST(n1_cents * 1000000 // total_cents AS BIGINT) AS share_ppm
        |FROM yr
        |ORDER BY o_year""".stripMargin,

    "q197_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                             * 100) AS BIGINT)) AS BIGINT)
        |           AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, r.revenue_cents
        |FROM rev r
        |JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.revenue_cents = (SELECT max(revenue_cents) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,

    "q198_tpch_q17" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem),
        |pa AS (
        |  SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS sum_qty,
        |         CAST(count(*) AS BIGINT) AS n_lines_pt
        |  FROM li GROUP BY 1),
        |small AS (
        |  SELECT li.price_cents
        |  FROM li JOIN pa ON li.l_partkey = pa.pk
        |  WHERE li.qty * 5 * pa.n_lines_pt < pa.sum_qty)
        |SELECT CAST(sum(price_cents) AS BIGINT) AS total_cents,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(price_cents) // 7 AS BIGINT) AS avg_yearly_cents
        |FROM small""".stripMargin,

    "q199_tpch_q13" ->
      """WITH per_cust AS (
        |  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM per_cust
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q200_tpch_q19" ->
      """SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                           * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 20
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 35
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q201_tpch_q9" ->
      """SELECT n.n_name AS nation,
        |       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |                           * 100) AS BIGINT)
        |                - CAST(round(p.p_retailprice * 100) AS BIGINT)
        |                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
        |         AS profit_cents
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_type = 'PROMO'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    // same block key (last space-token), same whole-block cap, same
    // exact-integer levenshtein
    "q140_fuzzy_linkage" ->
      """WITH names AS (
        |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_rows,
        |         string_split(p_name, ' ')[-1] AS blk
        |  FROM part WHERE p_name IS NOT NULL GROUP BY p_name),
        |kept AS (
        |  SELECT * FROM names
        |  WHERE blk IN (SELECT blk FROM names
        |                GROUP BY blk HAVING count(*) <= 10000))
        |SELECT a.name AS name_a, b.name AS name_b,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |       a.n_rows AS n_a, b.n_rows AS n_b
        |FROM kept a JOIN kept b ON a.blk = b.blk AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,

    "q04_join_inner" ->
      """SELECT c_mktsegment,
        |       round(sum(o_totalprice), 2) AS total_price,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q05_join_multiway" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q06_join_broadcast" ->
      """SELECT p_brand,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q07_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q08_join_semi" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q09_join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q15_topk_per_group" ->
      """SELECT c_mktsegment, o_orderkey, price, rn FROM (
        |  SELECT c_mktsegment, o_orderkey,
        |         round(o_totalprice, 2) AS price,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q36_supplier_stats" ->
      """SELECT n_name,
        |       count(*) AS n_suppliers,
        |       round(avg(s_acctbal), 2) AS avg_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q18_set_ops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000)
        |SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
        |ORDER BY op, c_custkey""".stripMargin,

    "q50_join_full_outer" ->
      """SELECT c.c_custkey, round(c.c_acctbal, 2) AS acctbal,
        |       o.o_orderkey, round(o.o_totalprice, 2) AS totalprice
        |FROM (SELECT c_custkey, c_acctbal FROM customer
        |      WHERE c_mktsegment = 'MACHINERY') c
        |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |                 WHERE o_totalprice > 150000) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY coalesce(c.c_custkey, o.o_orderkey * -1),
        |         coalesce(o.o_orderkey, -1)""".stripMargin,

    "q51_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    // the plain (unsalted) join — the salted plan must be
    // indistinguishable at the result level
    "q82_skew_join" ->
      """SELECT c.c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(e.value), 2) AS total_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin,

    // the same plain join in exact cents — whichever strategy autoJoin
    // picked from the data's statistics must land here bit-for-bit
    "q204_auto_join" ->
      """SELECT c.c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |         AS total_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin)
}
