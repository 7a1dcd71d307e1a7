package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Analytic surface: rollup/cube grouping sets, ranking and analytic
  * window functions, JSON/array scalar functions, exact dedup, and batch
  * time-bucketing (the batch rendering of the streaming tumbling window —
  * see graft.streaming for the readStream form).
  *
  * None of this exists in the reference (SURVEY.md §2.5); all of it is
  * built-in Catalyst. Window functions shuffle once on their partition
  * key; rollup/cube use Expand (one pass, no re-shuffle per grouping set).
  */
object Analytics {

  def queries: Map[String, Q] = Map(
    "q11_rollup" -> ((spark, dir) => {
      Tables.load(spark, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          col("g_rf"), col("g_ls"),
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("g_rf", "g_ls", "rf", "ls")
    }),

    "q12_cube" -> ((spark, dir) => {
      Tables.load(spark, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          grouping(col("o_orderpriority")).cast("int").as("g_pr"),
          round(sum("o_totalprice"), 2).as("total_price"),
          count(lit(1)).as("n"))
        .select(
          col("g_st"), col("g_pr"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("total_price"), col("n"))
        .orderBy("g_st", "g_pr", "status", "priority")
    }),

    "q13_window_ranking" -> ((spark, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.load(spark, dir, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("acctbal"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"))
        .orderBy("c_mktsegment", "rn")
    }),

    "q14_window_analytic" -> ((spark, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(spark, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)), 2).as("prev_price"),
          round(coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)), 2).as("next_price"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q22_json_fns" -> ((spark, dir) => {
      Tables.load(spark, dir, "events")
        .select(
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .withColumn("bucket", col("k") % 10)
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
        // nulls LAST explicitly: a row whose props lacks "$.k" yields a
        // NULL bucket, which Spark sorts first and DuckDB last by
        // default — pin the engine-independent order (same reasoning as
        // q50's coalesced sort keys)
        .orderBy(col("event_type"), col("bucket").asc_nulls_last)
    }),

    "q23_array_fns" -> ((spark, dir) => {
      Tables.load(spark, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(sqrt(aggregate(
            transform(col("embedding"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)), 4).as("l2_norm"),
          // + 0.0 normalizes IEEE negative zero (round(-1e-18, 4) is -0.0
          // in DuckDB, 0.0 in Spark; -0.0 + 0.0 == +0.0 in both)
          (round(aggregate(
            transform(col("embedding"), x => x.cast("double")),
            lit(0.0), (acc, x) => acc + x) / size(col("embedding")), 4) + lit(0.0)).as("mean_val"))
        .orderBy("vec_id")
    }),

    "q24_exact_dedup" -> ((spark, dir) => {
      // Exact-dedup tier: fingerprint every doc, keeper = min doc_id per
      // group (north-star dedup; at this sf each group has size 1, the
      // planted near-dups are caught by the MinHash/shingle tier).
      Tables.load(spark, dir, "documents")
        .groupBy(md5(col("text")).as("fingerprint"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))
        .orderBy("fingerprint")
    }),

    "q25_time_buckets" -> ((spark, dir) => {
      Tables.load(spark, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour_bucket", "event_type")
    }),

    "q53_window_distribution" -> ((spark, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.load(spark, dir, "customer")
        .select(
          col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "q52_pivot" -> ((spark, dir) => {
      // pivot with EXPLICIT values: one aggregation pass (no extra
      // distinct-values job) and a schema that cannot drift with data —
      // the only form that is deterministic at 100 TB
      Tables.load(spark, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // MARKET-BASKET LIFT: brand pairs co-ordered more (or less) than
    // independence predicts — the relational sibling of q84's token
    // collocations; the pair explosion is bounded by the basket cap
    // (oracle-mirrored) and everything else is counts
    "q137_basket_lift" -> ((spark, dir) =>
      graft.operators.Associations.brandLift(
          Tables.load(spark, dir, "lineitem"), Tables.load(spark, dir, "part"),
          minSupport = 20L, maxBasket = 16)
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))),

    // MARKET CONCENTRATION: per-nation Herfindahl-Hirschman index over
    // supplier revenue shares, exact ppm arithmetic end to end — the
    // antitrust/vendor-risk reading of the trading graph (a nation at
    // hhi_ppm > 250000 is the classic "highly concentrated" market).
    // The big table collapses to supplier grain FIRST (map-side
    // combine), so the share/HHI math runs at dimension grain; revenue
    // is per-LINE cents fixing then exact BIGINT (the q144 contract).
    // Envelope: share_ppm needs sup_cents·10⁶ < 2⁶³ — holds through
    // ~9·10¹² cents (~$92B) per supplier.
    "q155_market_concentration" -> ((spark, dir) => {
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val sn = Tables.load(spark, dir, "lineitem")
        .select(col("l_suppkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
        .groupBy("l_suppkey").agg(sum(col("cents")).as("sup_cents"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("sup_cents"))
      val totals = sn.groupBy("nation")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("sup_cents")).as("total_cents"))
      sn.join(totals, Seq("nation"))
        .select(col("nation"), col("n_suppliers"), col("total_cents"),
          expr("sup_cents * 1000000 div total_cents").as("share_ppm"))
        .groupBy("nation", "n_suppliers", "total_cents")
        .agg(max(col("share_ppm")).as("top_share_ppm"),
          expr("sum(share_ppm * share_ppm) div 1000000").as("hhi_ppm"))
        .orderBy("nation")
    }),

    // GINI coefficient of the same supplier-revenue distribution —
    // q155's inequality sibling (HHI weighs the top, Gini the whole
    // curve): G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over ascending
    // (revenue, suppkey) ranks. The rank window partitions by NATION
    // over supplier-grain rows (dimension grain, parallel across
    // markets — never a global sort); exact ppm with one floor
    // division at the end. Ties don't matter: equal xᵢ make Σi·xᵢ
    // order-invariant. Envelope: 2·10⁶·Σi·xᵢ < 2⁶³.
    "q162_gini" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sup = Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val ranked = Tables.load(spark, dir, "lineitem")
        .select(col("l_suppkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
        .groupBy("l_suppkey").agg(sum(col("cents")).as("x"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("x"), col("l_suppkey"))
        .withColumn("i", row_number().over(Window.partitionBy("nation")
          .orderBy(col("x"), col("l_suppkey"))).cast("long"))
      ranked.groupBy("nation")
        .agg(count(lit(1)).as("n_suppliers"), sum(col("x")).as("total_cents"),
          sum(col("i") * col("x")).as("s1"))
        .select(col("nation"), col("n_suppliers"), col("total_cents"),
          expr("""(1000000 * (2 * s1 - (n_suppliers + 1) * total_cents))
                  div (n_suppliers * total_cents)""").as("gini_ppm"))
        .orderBy("nation")
    }),

    // CONTINGENCY LIFT: market-segment × order-priority independence
    // screen — per cell, observed orders vs the expected count under
    // independence (row_total·col_total/N), as an exact-ppm lift. The
    // χ²-free rendering of the independence test: squares of O·N−R·C
    // overflow BIGINT at corpus scale, lift doesn't (R·C < N² needs
    // N < 3·10⁹; the two floors compound < 1 expected-row of slack,
    // visible in the emitted exact operands). Cells are bounded
    // (segments × priorities); the only row-grain work is one
    // customer-dimension equi-join and a map-side-combined cell count.
    "q167_contingency_lift" -> ((spark, dir) => {
      val cells = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
      val rows = cells.groupBy("segment").agg(sum("n").as("row_total"))
      val cols = cells.groupBy("priority").agg(sum("n").as("col_total"))
      val tot = cells.agg(sum("n").as("grand_total"))
      cells.join(rows, Seq("segment")).join(cols, Seq("priority"))
        .crossJoin(broadcast(tot)) // 1-row grand total — bounded
        .select(col("segment"), col("priority"), col("n"),
          col("row_total"), col("col_total"), col("grand_total"),
          expr("(row_total * col_total) div grand_total")
            .as("expected_rows"))
        .withColumn("lift_ppm", when(col("expected_rows") > 0,
          expr("(n * 1000000) div expected_rows")))
        .orderBy("segment", "priority")
    }),

    // ABC CLASSIFICATION: per part-type, parts ranked by revenue and
    // split at 80% / 95% cumulative share — the inventory-policy
    // reading of the revenue curve (A = the heads that deserve
    // per-part attention, C = the long tail to automate). Class
    // boundaries are EXACT integer cross-multiplications (cum·5 ≤
    // tot·4 ⟺ share ≤ 0.8 — no ppm rounding at the boundary); the
    // rank/cumsum window partitions by TYPE over part-grain collapsed
    // revenue (dimension grain, parallel across types — the q162
    // posture, never a global sort). Envelope: cum·20 < 2⁶³.
    "q168_abc_classes" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val partRev = Tables.load(spark, dir, "lineitem")
        .select(col("l_partkey"), expr(
          "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("cents"))
        .groupBy("l_partkey").agg(sum(col("cents")).as("rev"))
        .join(Tables.load(spark, dir, "part")
          .select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
      val w = Window.partitionBy("p_type")
        .orderBy(col("rev").desc, col("p_partkey"))
      partRev
        .withColumn("cum", sum(col("rev")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum(col("rev")).over(Window.partitionBy("p_type")))
        .select(col("p_type"), col("rev"),
          when(col("cum") * 5 <= col("tot") * 4, "A")
            .when(col("cum") * 20 <= col("tot") * 19, "B")
            .otherwise("C").as("abc"), col("tot"))
        .groupBy("p_type", "abc")
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("class_cents"),
          expr("(sum(rev) * 1000000) div max(tot)").as("share_ppm"))
        .orderBy("p_type", "abc")
    }),

    // RFM SEGMENTATION: recency / frequency / monetary terciles per
    // customer, rolled to the 27-cell segment grid — the classic CRM
    // cut, built scale-safe: each tercile threshold comes from the
    // BOUNDED measure histogram (recency at day grain, frequency at
    // order-count grain, monetary at whole-dollar grain — the q130
    // ceil-rank pattern at 3 buckets), so no window ever runs over
    // customer rows; scores are 1 + |{t : t < v}| against a broadcast
    // 2-threshold array per measure. Score 3 = top tercile on every
    // axis (most recent / most orders / most dollars — recency is
    // days-since-last NEGATED so bigger stays better). Exact integer
    // end to end; the one row-grain pass is the customer-grain agg.
    "q178_rfm_segments" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daySec = 86400L
      val sec = "((unix_micros(o_orderdate) - " +
        "pmod(unix_micros(o_orderdate), 1000000)) div 1000000)"
      val orders = Tables.load(spark, dir, "orders")
        .select(col("o_custkey"),
          expr(s"($sec - pmod($sec, $daySec)) div $daySec").as("day"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      val horizon = orders.agg(max("day").as("hmax"))
      val cust = orders.groupBy("o_custkey")
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
          expr("sum(cents) div 100").as("m"))
        .crossJoin(broadcast(horizon)) // 1-row horizon — bounded
        .select(col("o_custkey"), (col("last_day") - col("hmax")).as("r"),
          col("f"), col("m"))
      // ceil-rank tercile thresholds over each measure's bounded
      // histogram, folded to ONE broadcast row of three 2-arrays
      def thresholds(c: String) = {
        val hist = cust.groupBy(col(c).as("v")).agg(count(lit(1)).as("n"))
        hist
          .withColumn("cum", sum(col("n")).over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(hist.agg(sum(col("n")).as("nn"))))
          .agg(array(
            min(when(col("cum") >= expr("(nn + 2) div 3"), col("v"))),
            min(when(col("cum") >= expr("(2 * nn + 2) div 3"), col("v"))))
            .as(s"t_$c"))
      }
      val th = thresholds("r").crossJoin(thresholds("f"))
        .crossJoin(thresholds("m")) // 1-row × 1-row × 1-row — bounded
      cust.crossJoin(broadcast(th))
        .select(
          (lit(1L) + expr("size(filter(t_r, t -> t < r))")).as("r_score"),
          (lit(1L) + expr("size(filter(t_f, t -> t < f))")).as("f_score"),
          (lit(1L) + expr("size(filter(t_m, t -> t < m))")).as("m_score"),
          col("m"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("m")).as("total_dollars"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    // WHALE CONCENTRATION: what share of total event value the
    // top-decile-by-value users carry — the revenue-risk one-liner
    // beside q162's full Gini curve. The decile threshold comes from
    // the BOUNDED whole-dollar histogram of per-user value (the q130
    // ceil-rank pattern), ties at the threshold INCLUDED (documented:
    // whale_users may exceed 10% exactly when the boundary is tied);
    // shares stay in exact CENTS (the dollar floor sets only the
    // threshold, never the money). One user-grain agg, histogram-grain
    // windows, one broadcast threshold row.
    "q181_whale_share" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val users = Tables.load(spark, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy("user_id")
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
        .withColumn("v", expr("cents div 100"))
      val hist = users.groupBy("v").agg(count(lit(1)).as("n"))
      val thr = hist
        .withColumn("cum", sum(col("n")).over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(hist.agg(sum(col("n")).as("nn"))))
        .agg(min(when(col("cum") >= expr("(nn * 90 + 99) div 100"),
          col("v"))).as("t90"))
      users.crossJoin(broadcast(thr)) // 1-row threshold — bounded
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("v") >= col("t90"), 1L).otherwise(0L))
            .as("whale_users"),
          sum(col("cents")).as("total_cents"),
          sum(when(col("v") >= col("t90"), col("cents")).otherwise(0L))
            .as("whale_cents"))
        .select(col("n_users"), col("whale_users"), col("total_cents"),
          col("whale_cents"),
          expr("(whale_users * 1000000) div n_users").as("whale_user_ppm"),
          expr("(whale_cents * 1000000) div total_cents")
            .as("whale_share_ppm"))
    }),

    // EVENT-TYPE DIVERSITY: per-user Gini–Simpson index over the event
    // mix in exact ppm — 10⁶·(n² − Σc²)/n², the probability two of the
    // user's events differ in type (0 = single-type bot signature,
    // → 10⁶·(k−1)/k = uniform over k types). The entropy-free diversity
    // reading: Shannon needs libm logs, Gini–Simpson is pure integer.
    // One (user, type)-grain map-side-combined count, one user-grain
    // fold. Envelope: n²·10⁶ < 2⁶³ — holds through ~3·10⁶ events/user.
    "q169_event_diversity" -> ((spark, dir) =>
      Tables.load(spark, dir, "events")
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("sum_c2"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          expr("((n_events * n_events - sum_c2) * 1000000)" +
            " div (n_events * n_events)").as("simpson_ppm"))
        .orderBy("user_id")))

  def oracles: Map[String, String] = Map(
    "q11_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |       coalesce(l_returnflag, '(all)') AS rf,
        |       coalesce(l_linestatus, '(all)') AS ls,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin,

    "q12_cube" ->
      """SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
        |       coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       round(sum(o_totalprice), 2) AS total_price,
        |       count(*) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_st, g_pr, status, priority""".stripMargin,

    "q13_window_ranking" ->
      """SELECT c_mktsegment, c_custkey,
        |       round(c_acctbal, 2) AS acctbal,
        |       row_number() OVER w AS rn,
        |       rank() OVER w AS rk,
        |       dense_rank() OVER w AS drk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q14_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |       round(o_totalprice, 2) AS price,
        |       round(coalesce(lag(o_totalprice, 1) OVER w, -1.0), 2) AS prev_price,
        |       round(coalesce(lead(o_totalprice, 1) OVER w, -1.0), 2) AS next_price,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q22_json_fns" ->
      """SELECT event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS bucket,
        |       count(*) AS n,
        |       round(avg(value), 4) AS avg_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, bucket""".stripMargin,

    "q23_array_fns" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(sqrt(list_sum(list_transform(embedding,
        |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
        |       round(list_sum(list_transform(embedding,
        |             x -> CAST(x AS DOUBLE))) / len(embedding), 4) + 0.0 AS mean_val
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "q24_exact_dedup" ->
      """SELECT md5(text) AS fingerprint,
        |       count(*) AS n_dups,
        |       min(doc_id) AS keeper
        |FROM documents
        |GROUP BY 1
        |ORDER BY fingerprint""".stripMargin,

    "q25_time_buckets" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
        |       event_type,
        |       count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_bucket, event_type""".stripMargin,

    "q53_window_distribution" ->
      """SELECT c_mktsegment, c_custkey,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    // conditional-sum rendering == Spark's pivot-with-explicit-values
    "q52_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'view') AS view,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'error') AS error
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q162_gini" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                             * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |ranked AS (SELECT n.n_name AS nation, r.x,
        |             CAST(row_number() OVER (PARTITION BY n.n_name
        |               ORDER BY r.x, r.l_suppkey) AS BIGINT) AS i
        |           FROM rev r
        |           JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |           JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |agg AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
        |          CAST(sum(x) AS BIGINT) AS total_cents,
        |          CAST(sum(i * x) AS BIGINT) AS s1
        |        FROM ranked GROUP BY 1)
        |SELECT nation, n_suppliers, total_cents,
        |       (1000000 * (2 * s1 - (n_suppliers + 1) * total_cents))
        |         // (n_suppliers * total_cents) AS gini_ppm
        |FROM agg ORDER BY nation""".stripMargin,

    "q155_market_concentration" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                             * 100) AS BIGINT)) AS BIGINT)
        |           AS sup_cents
        |  FROM lineitem GROUP BY 1),
        |sn AS (SELECT n.n_name AS nation, r.sup_cents
        |       FROM rev r
        |       JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |       JOIN nation n ON s.s_nationkey = n.n_nationkey),
        |t AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
        |        CAST(sum(sup_cents) AS BIGINT) AS total_cents
        |      FROM sn GROUP BY 1),
        |sh AS (SELECT sn.nation,
        |         (sn.sup_cents * 1000000) // t.total_cents AS share_ppm
        |       FROM sn JOIN t ON sn.nation = t.nation)
        |SELECT t.nation, t.n_suppliers, t.total_cents,
        |       CAST(max(sh.share_ppm) AS BIGINT) AS top_share_ppm,
        |       CAST(sum(sh.share_ppm * sh.share_ppm) AS BIGINT) // 1000000
        |         AS hhi_ppm
        |FROM sh JOIN t ON sh.nation = t.nation
        |GROUP BY 1, 2, 3
        |ORDER BY 1""".stripMargin,

    // the two floors (expected_rows, then lift) mirror the engine side
    // exactly; both operands are emitted so the slack is auditable
    "q167_contingency_lift" ->
      """WITH cells AS (
        |  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT segment, CAST(sum(n) AS BIGINT) AS row_total
        |      FROM cells GROUP BY 1),
        |c2 AS (SELECT priority, CAST(sum(n) AS BIGINT) AS col_total
        |       FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS grand_total FROM cells),
        |e AS (SELECT cells.segment, cells.priority, cells.n,
        |        r.row_total, c2.col_total, t.grand_total,
        |        (r.row_total * c2.col_total) // t.grand_total
        |          AS expected_rows
        |      FROM cells JOIN r USING (segment)
        |                 JOIN c2 USING (priority) CROSS JOIN t)
        |SELECT segment, priority, n, row_total, col_total, grand_total,
        |       expected_rows,
        |       CASE WHEN expected_rows > 0
        |            THEN (n * 1000000) // expected_rows END AS lift_ppm
        |FROM e ORDER BY segment, priority""".stripMargin,

    // unique (rev DESC, partkey) sort keys make DuckDB's default RANGE
    // frame equal the engine's explicit ROWS frame
    "q168_abc_classes" ->
      """WITH pr AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |                             * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT p.p_type, pr.rev, pr.l_partkey
        |      FROM pr JOIN part p ON pr.l_partkey = p.p_partkey),
        |wn AS (SELECT p_type, rev,
        |         CAST(sum(rev) OVER (PARTITION BY p_type
        |           ORDER BY rev DESC, l_partkey) AS BIGINT) AS cum,
        |         CAST(sum(rev) OVER (PARTITION BY p_type) AS BIGINT) AS tot
        |       FROM j),
        |cls AS (SELECT p_type, rev, tot,
        |          CASE WHEN cum * 5 <= tot * 4 THEN 'A'
        |               WHEN cum * 20 <= tot * 19 THEN 'B'
        |               ELSE 'C' END AS abc
        |        FROM wn)
        |SELECT p_type, abc, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(rev) AS BIGINT) AS class_cents,
        |       (CAST(sum(rev) AS BIGINT) * 1000000) // max(tot) AS share_ppm
        |FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // three ceil-rank tercile CTE triples (hist/cum/thresholds), scores
    // as 1 + (v > t1) + (v > t2) — mirrors the broadcast-array plan
    "q178_rfm_segments" ->
      """WITH o AS (SELECT o_custkey,
        |             ((epoch_us(o_orderdate) // 1000000)
        |              - ((epoch_us(o_orderdate) // 1000000) % 86400))
        |               // 86400 AS day,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |h AS (SELECT max(day) AS hmax FROM o),
        |cust AS (SELECT o_custkey,
        |           CAST(max(day) - (SELECT hmax FROM h) AS BIGINT) AS r,
        |           CAST(count(*) AS BIGINT) AS f,
        |           CAST(sum(cents) // 100 AS BIGINT) AS m
        |         FROM o GROUP BY 1),
        |hr AS (SELECT r AS v, CAST(count(*) AS BIGINT) AS n FROM cust
        |       GROUP BY 1),
        |cr AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum,
        |              (SELECT CAST(sum(n) AS BIGINT) FROM hr) AS nn
        |       FROM hr),
        |tr AS (SELECT min(CASE WHEN cum >= (nn + 2) // 3 THEN v END) AS t1,
        |              min(CASE WHEN cum >= (2 * nn + 2) // 3 THEN v END)
        |                AS t2
        |       FROM cr),
        |hf AS (SELECT f AS v, CAST(count(*) AS BIGINT) AS n FROM cust
        |       GROUP BY 1),
        |cf AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum,
        |              (SELECT CAST(sum(n) AS BIGINT) FROM hf) AS nn
        |       FROM hf),
        |tf AS (SELECT min(CASE WHEN cum >= (nn + 2) // 3 THEN v END) AS t1,
        |              min(CASE WHEN cum >= (2 * nn + 2) // 3 THEN v END)
        |                AS t2
        |       FROM cf),
        |hm AS (SELECT m AS v, CAST(count(*) AS BIGINT) AS n FROM cust
        |       GROUP BY 1),
        |cm AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum,
        |              (SELECT CAST(sum(n) AS BIGINT) FROM hm) AS nn
        |       FROM hm),
        |tm AS (SELECT min(CASE WHEN cum >= (nn + 2) // 3 THEN v END) AS t1,
        |              min(CASE WHEN cum >= (2 * nn + 2) // 3 THEN v END)
        |                AS t2
        |       FROM cm),
        |sc AS (SELECT
        |         CAST(1 + CASE WHEN r > (SELECT t1 FROM tr) THEN 1 ELSE 0 END
        |                + CASE WHEN r > (SELECT t2 FROM tr) THEN 1 ELSE 0 END
        |              AS BIGINT) AS r_score,
        |         CAST(1 + CASE WHEN f > (SELECT t1 FROM tf) THEN 1 ELSE 0 END
        |                + CASE WHEN f > (SELECT t2 FROM tf) THEN 1 ELSE 0 END
        |              AS BIGINT) AS f_score,
        |         CAST(1 + CASE WHEN m > (SELECT t1 FROM tm) THEN 1 ELSE 0 END
        |                + CASE WHEN m > (SELECT t2 FROM tm) THEN 1 ELSE 0 END
        |              AS BIGINT) AS m_score,
        |         m
        |       FROM cust)
        |SELECT r_score, f_score, m_score,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(m) AS BIGINT) AS total_dollars
        |FROM sc GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    // dollar-grain ceil-rank decile threshold, shares in exact cents;
    // negative value sums floor consistently (cents stay the money)
    "q181_whale_share" ->
      """WITH u AS (SELECT user_id,
        |             CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                  AS BIGINT) AS cents
        |           FROM events
        |           WHERE user_id IS NOT NULL AND value IS NOT NULL
        |           GROUP BY 1),
        |uv AS (SELECT user_id, cents,
        |         CAST(cents - ((cents % 100) + 100) % 100 AS BIGINT) / 100
        |           AS v0
        |       FROM u),
        |uw AS (SELECT user_id, cents, CAST(v0 AS BIGINT) AS v FROM uv),
        |hd AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM uw GROUP BY 1),
        |cw AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum,
        |              (SELECT CAST(sum(n) AS BIGINT) FROM hd) AS nn
        |       FROM hd),
        |t AS (SELECT min(CASE WHEN cum >= (nn * 90 + 99) // 100
        |          THEN v END) AS t90
        |      FROM cw)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(CASE WHEN v >= (SELECT t90 FROM t)
        |                THEN 1 ELSE 0 END) AS BIGINT) AS whale_users,
        |       CAST(sum(cents) AS BIGINT) AS total_cents,
        |       CAST(sum(CASE WHEN v >= (SELECT t90 FROM t)
        |                THEN cents ELSE 0 END) AS BIGINT) AS whale_cents,
        |       (CAST(sum(CASE WHEN v >= (SELECT t90 FROM t)
        |                 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |         // count(*) AS whale_user_ppm,
        |       (CAST(sum(CASE WHEN v >= (SELECT t90 FROM t)
        |                 THEN cents ELSE 0 END) AS BIGINT) * 1000000)
        |         // CAST(sum(cents) AS BIGINT) AS whale_share_ppm
        |FROM uw""".stripMargin,

    "q169_event_diversity" ->
      """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |           GROUP BY 1, 2),
        |u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |        CAST(count(*) AS BIGINT) AS n_types,
        |        CAST(sum(c * c) AS BIGINT) AS sum_c2
        |      FROM c GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |       ((n_events * n_events - sum_c2) * 1000000)
        |         // (n_events * n_events) AS simpson_ppm
        |FROM u ORDER BY user_id""".stripMargin,

    // identical basket population on every branch: items -> capped
    // baskets -> pairs/singles/total all read the `kept` CTE; lift is
    // one double division of exact-in-double BIGINTs rounded at 4 dp
    "q137_basket_lift" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |kept AS (
        |  SELECT * FROM items
        |  WHERE basket IN (SELECT basket FROM items
        |                   GROUP BY basket HAVING count(*) <= 16)),
        |tot AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
        |        FROM kept),
        |singles AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item
        |            FROM kept GROUP BY item),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b,
        |         CAST(count(*) AS BIGINT) AS n_ab
        |  FROM kept a JOIN kept b
        |    ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT p.item_a, p.item_b, p.n_ab,
        |       sa.n_item AS n_a, sb.n_item AS n_b, t.n_baskets,
        |       (p.n_ab * 1000000) // t.n_baskets AS support_ppm,
        |       round(CAST(p.n_ab AS DOUBLE) * t.n_baskets
        |             / (sa.n_item * sb.n_item), 4) AS lift
        |FROM pairs p
        |JOIN singles sa ON p.item_a = sa.item
        |JOIN singles sb ON p.item_b = sb.item
        |CROSS JOIN tot t
        |ORDER BY lift DESC, item_a, item_b""".stripMargin)
}
