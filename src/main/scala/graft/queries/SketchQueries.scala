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

  /** q119's "yesterday's filter" cache — one stored artifact per
    * sf-dir per JVM (the shared cachedIndexDir protocol).
    */
  private val bloomIdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

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
        .orderBy("word")),

    // KMV bottom-k distinct sketch — q34's hash-gated sibling: the same
    // distinct-count question answered with ≤ k-long mergeable state per
    // group, but on the portable md5 hash with exact-integer minima
    // selection, so DuckDB reproduces the full estimate bit-for-bit
    // (q34's HLL stays for the Spark-native engine surface). The audit
    // carries the exact counts, so the error is measured, not assumed;
    // the rsd ≈ 1/√(k−2) bound is property-tested in SketchSpec.
    "q106_kmv_distinct" -> ((spark, dir) => {
      import graft.operators.Dedup.h60
      val kmv = graft.functions.Aggregators.kmv64
      val li = Tables.load(spark, dir, "lineitem")
      // the sketch pass and the exact audit are SEPARATE aggregations
      // joined on the 3-row group frame: two countDistinct column sets
      // inside the sketch agg would plan an Expand (3 branches of the
      // full table) feeding the UDAF's ObjectHashAggregate — measured
      // 4.7s → 1.5s at sf0.1 from this split alone. The sketch agg is
      // the 100 TB path (64-value mergeable partials); the exact
      // distinct audit exists only to measure the sketch's error and
      // runs as plain codegen aggs.
      val approx = li.groupBy("l_returnflag")
        .agg(
          kmv(expr(h60("concat('kmvp_', cast(l_partkey as string))")))
            .as("pk_arr"),
          kmv(expr(h60("concat('kmvs_', cast(l_suppkey as string))")))
            .as("sk_arr"))
      val exactP = li.select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
      val exactS = li.select(col("l_returnflag"), col("l_suppkey")).distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("exact_supps"))
      approx.join(exactP, "l_returnflag").join(exactS, "l_returnflag")
        .select(col("l_returnflag"),
          kmvEstimate("pk_arr").as("approx_parts"), col("exact_parts"),
          kmvEstimate("sk_arr").as("approx_supps"), col("exact_supps"))
        .orderBy("l_returnflag")
    }),

    // JOIN-SIZE ESTIMATION from two single-scan sketches (the CMS
    // inner product): per hash row, Σ_bucket cA·cB over-counts |A ⋈ B|
    // only by hash collisions; min over rows is the estimate, never
    // below the truth. The 100 TB use: choose broadcast / shuffle /
    // salt BEFORE paying the join from d·w-cell sketches. Exact counts
    // ride along to measure the error (the q98 audit contract).
    "q126_join_size" -> ((spark, dir) => {
      val li = Tables.load(spark, dir, "lineitem")
      val ord = Tables.load(spark, dir, "orders")
      val cust = Tables.load(spark, dir, "customer")
      def audit(name: String, a: org.apache.spark.sql.DataFrame, ak: String,
          b: org.apache.spark.sql.DataFrame, bk: String) = {
        val est = Sketches.cmsJoinSize(a, ak, b, bk)
        val exact = a.select(col(ak).as("__k"))
          .join(b.select(col(bk).as("__k")), "__k")
          .agg(count(lit(1)).as("exact_join_rows"))
        est.crossJoin(exact) // two 1-row aggregates — bounded by construction
          .select(lit(name).as("pair"), col("est_join_rows"),
            col("exact_join_rows"),
            (col("est_join_rows") - col("exact_join_rows")).as("overestimate"))
      }
      audit("lineitem_orders", li, "l_orderkey", ord, "o_orderkey")
        .unionByName(
          audit("orders_customer", ord, "o_custkey", cust, "c_custkey"))
        .orderBy("pair")
    }),

    // KMV SET OPERATIONS — the sketch-tier answer to "how much do two
    // cohorts overlap": per-event-type bottom-64 sketches of the user
    // set, pairwise-merged (bottom-k of two bottom-k unions IS the
    // union's bottom-k), intersection estimated from the merged
    // sketch's coincidence count c via est_inter = c·est_union/k. All
    // arithmetic integer-or-guarded-double on the portable md5 hash,
    // so the whole estimate surface hash-gates like q106; exact
    // counts ride along so the error is measured, not assumed. The
    // pairwise combine runs on the AGGREGATED type-grain frame (≤
    // #event_types rows — bounded by construction); the only
    // row-grain work is one distinct + one KMV aggregation.
    "q122_kmv_overlap" -> ((spark, dir) => {
      import graft.operators.Dedup.h60
      val kmv = graft.functions.Aggregators.kmv64
      val ev = Tables.load(spark, dir, "events")
      val sk = ev.select(col("event_type"),
          expr(h60("concat('kmvu_', cast(user_id as string))")).as("h"))
        .groupBy("event_type").agg(kmv(col("h")).as("arr"))
      val du = ev.select("event_type", "user_id").distinct()
      val cnt = du.groupBy("event_type").agg(count(lit(1)).as("n"))
      val exactInter = du.as("a").join(du.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("exact_inter"))
      sk.as("x").join(sk.as("y"), col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"),
          col("x.arr").as("arr_a"), col("y.arr").as("arr_b"))
        .withColumn("merged",
          expr("slice(array_sort(array_union(arr_a, arr_b)), 1, 64)"))
        .withColumn("k_used", size(col("merged")).cast("long"))
        .withColumn("c", size(expr(
          "array_intersect(array_intersect(merged, arr_a), arr_b)"))
          .cast("long"))
        .withColumn("est_union", kmvEstimate("merged"))
        .withColumn("est_inter", expr("(c * est_union) div k_used"))
        .join(cnt.select(col("event_type").as("type_a"), col("n").as("n_a")),
          "type_a")
        .join(cnt.select(col("event_type").as("type_b"), col("n").as("n_b")),
          "type_b")
        .join(exactInter, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("k_used"),
          col("est_union"),
          (col("n_a") + col("n_b") -
            coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
          col("est_inter"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
        .orderBy("type_a", "type_b")
    }),

    // Bloom membership front door: the delta slice (q62's cut) probed
    // against an m = 4096-bit / k = 4 filter over the below-cut corpus
    // fingerprints. m chosen so the false-positive band is OBSERVABLE
    // at the gated scale (load ~0.3, fp ~1%) — a filter with fp = 0
    // would gate nothing but the hash plumbing. Audit rows carry both
    // the Bloom verdict and ground truth; no-false-negative is a per-
    // row invariant (present = 1 ⇒ maybe_present = 1)
    "q118_bloom_membership" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val cut = deltaCut(docs)
      graft.operators.Sketches.bloomMembership(
          docs.filter(col("doc_id") < cut),
          docs.filter(col("doc_id") >= cut), k = 4, m = 4096)
        .orderBy("doc_id")
    }),

    // q118's stored twin: the filter persisted by "yesterday's job"
    // (cachedIndexDir protocol), probed with (k, m) read from the
    // artifact's meta — the realistic front door has no corpus at
    // hand, so the output is the Bloom verdict alone; the oracle
    // recomputes the same filter from the corpus (stored ≡ rebuilt is
    // the hash law, as q70/q72/q96 establish for the other indexes)
    "q119_bloom_stored" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val cut = deltaCut(docs)
      val idx = cachedIndexDir(bloomIdxCache, dir, "graft_bloom_idx_") { d =>
        graft.operators.Sketches.writeBloom(
          docs.filter(col("doc_id") < cut), d, k = 4, m = 4096)
      }
      graft.operators.Sketches.bloomMembershipStored(spark, idx,
          docs.filter(col("doc_id") >= cut))
        .orderBy("doc_id")
    }),

    // fixed-bucket histogram percentile — q49's hash-gated sibling: the
    // same tail-quantile question answered with bounded mergeable state
    // (one counter per $100 price bucket per group), pure-BIGINT
    // arithmetic end to end (prices to cents once, ceil-rank by integer
    // division), so DuckDB reproduces the estimate exactly (q49's GK
    // stays for the Spark-native surface). The estimate is the
    // containing bucket's upper bound — within one bucket width of the
    // exact percentile, the bound SketchSpec asserts.
    "q107_hist_percentile" -> ((spark, dir) => {
      val hist = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("cast(round(l_extendedprice * 100) as bigint) div 10000").as("b"))
        .groupBy("l_returnflag", "b").agg(count(lit(1)).as("c"))
      // windows over the HISTOGRAM only — ≤ ~1.1k buckets per group at
      // any corpus size, never over rows
      import org.apache.spark.sql.expressions.Window
      val cum = hist
        .withColumn("cum", sum("c").over(
          Window.partitionBy("l_returnflag").orderBy("b")))
        .withColumn("n", sum("c").over(Window.partitionBy("l_returnflag")))
      def pHi(pct: Int) = min(when(
        col("cum") >= expr(s"(n * $pct + 99) div 100"),
        (col("b") + 1L) * 10000L))
      cum.groupBy("l_returnflag")
        .agg(max("n").as("n"),
          pHi(50).as("p50_hi_cents"),
          pHi(95).as("p95_hi_cents"),
          pHi(99).as("p99_hi_cents"))
        .orderBy("l_returnflag")
    }))

  /** q106's estimator over a finished [[graft.functions.Aggregators.KMinValues]]
    * array: exact below saturation, (k−1)·2⁶⁰/h_k at it. The one
    * non-integer step (the division) is a single IEEE binary64 op on
    * exactly-representable inputs-as-doubles, identical in any engine.
    */
  private def kmvEstimate(arr: String) = expr(
    s"case when size($arr) < 64 then cast(size($arr) as bigint) " +
      s"else cast(floor((63.0 * cast(1152921504606846976 as double)) / " +
      s"cast(element_at($arr, 64) as double)) as bigint) end")

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
         |ORDER BY e.word""".stripMargin,

    // same md5 bucket positions, same distinct occupied set, same
    // all-k-hit verdict — the filter in relational form reproduces
    // bit-for-bit
    "q118_bloom_membership" ->
      """WITH cut AS (SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT) AS v
        |             FROM documents),
        |cfp AS (SELECT md5(text) AS fp FROM documents
        |        WHERE doc_id < (SELECT v FROM cut)),
        |ks AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |occ AS (SELECT DISTINCT
        |          CAST('0x' || substr(md5('bloom_' || i || '_' || fp), 1, 15)
        |            AS BIGINT) % 4096 AS bucket
        |        FROM cfp CROSS JOIN ks),
        |pb AS (SELECT doc_id, md5(text) AS fp FROM documents
        |       WHERE doc_id >= (SELECT v FROM cut)),
        |ph AS (SELECT doc_id,
        |         CAST('0x' || substr(md5('bloom_' || i || '_' || fp), 1, 15)
        |           AS BIGINT) % 4096 AS bucket
        |       FROM pb CROSS JOIN ks),
        |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
        |         FROM ph JOIN occ USING (bucket) GROUP BY doc_id),
        |truth AS (SELECT DISTINCT p.doc_id FROM pb p JOIN cfp c ON p.fp = c.fp)
        |SELECT p.doc_id,
        |       CAST(CASE WHEN coalesce(h.c, 0) = 4 THEN 1 ELSE 0 END AS BIGINT)
        |         AS maybe_present,
        |       CAST(CASE WHEN t.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS present
        |FROM pb p
        |LEFT JOIN hits h USING (doc_id)
        |LEFT JOIN truth t USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,

    // stored ≡ rebuilt: the oracle recomputes the filter from the
    // corpus itself; a stale or differently-hashed artifact mismatches
    "q119_bloom_stored" ->
      """WITH cut AS (SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT) AS v
        |             FROM documents),
        |cfp AS (SELECT md5(text) AS fp FROM documents
        |        WHERE doc_id < (SELECT v FROM cut)),
        |ks AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |occ AS (SELECT DISTINCT
        |          CAST('0x' || substr(md5('bloom_' || i || '_' || fp), 1, 15)
        |            AS BIGINT) % 4096 AS bucket
        |        FROM cfp CROSS JOIN ks),
        |pb AS (SELECT doc_id, md5(text) AS fp FROM documents
        |       WHERE doc_id >= (SELECT v FROM cut)),
        |ph AS (SELECT doc_id,
        |         CAST('0x' || substr(md5('bloom_' || i || '_' || fp), 1, 15)
        |           AS BIGINT) % 4096 AS bucket
        |       FROM pb CROSS JOIN ks),
        |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
        |         FROM ph JOIN occ USING (bucket) GROUP BY doc_id)
        |SELECT p.doc_id,
        |       CAST(CASE WHEN coalesce(h.c, 0) = 4 THEN 1 ELSE 0 END AS BIGINT)
        |         AS maybe_present
        |FROM pb p
        |LEFT JOIN hits h USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,

    // the md5-hashed KMV renders exactly in DuckDB: same 60-bit hashes,
    // same distinct bottom-64 selection, same single-division estimator
    // same md5 bucket family as q98 ('cms_R_' || key-as-string), same
    // integer inner product, same min-over-rows — the estimate
    // reproduces bit-for-bit
    "q126_join_size" ->
      """WITH rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |la AS (SELECT r, CAST('0x' || substr(md5('cms_' || CAST(r AS VARCHAR)
        |           || '_' || CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 4096 AS bucket,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM lineitem CROSS JOIN rs
        |       WHERE l_orderkey IS NOT NULL GROUP BY 1, 2),
        |ob AS (SELECT r, CAST('0x' || substr(md5('cms_' || CAST(r AS VARCHAR)
        |           || '_' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 4096 AS bucket,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM orders CROSS JOIN rs
        |       WHERE o_orderkey IS NOT NULL GROUP BY 1, 2),
        |oc AS (SELECT r, CAST('0x' || substr(md5('cms_' || CAST(r AS VARCHAR)
        |           || '_' || CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 4096 AS bucket,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM orders CROSS JOIN rs
        |       WHERE o_custkey IS NOT NULL GROUP BY 1, 2),
        |cc AS (SELECT r, CAST('0x' || substr(md5('cms_' || CAST(r AS VARCHAR)
        |           || '_' || CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 4096 AS bucket,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM customer CROSS JOIN rs
        |       WHERE c_custkey IS NOT NULL GROUP BY 1, 2),
        |e1 AS (SELECT min(COALESCE(d.dot, 0)) AS est FROM rs
        |       LEFT JOIN (
        |         SELECT a.r, CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |         FROM la a JOIN ob b USING (r, bucket) GROUP BY 1) d
        |       USING (r)),
        |x1 AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM lineitem l
        |       JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e2 AS (SELECT min(COALESCE(d.dot, 0)) AS est FROM rs
        |       LEFT JOIN (
        |         SELECT a.r, CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |         FROM oc a JOIN cc b USING (r, bucket) GROUP BY 1) d
        |       USING (r)),
        |x2 AS (SELECT CAST(count(*) AS BIGINT) AS exact FROM orders o
        |       JOIN customer c ON o.o_custkey = c.c_custkey)
        |SELECT 'lineitem_orders' AS pair, e1.est AS est_join_rows,
        |       x1.exact AS exact_join_rows, e1.est - x1.exact AS overestimate
        |FROM e1, x1
        |UNION ALL
        |SELECT 'orders_customer', e2.est, x2.exact, e2.est - x2.exact
        |FROM e2, x2
        |ORDER BY pair""".stripMargin,

    // merged bottom-64 computed directly over the pair's user-hash
    // union (bottom-k of capped-sketch unions equals the union's
    // bottom-k — the mergeability law), coincidence flags at user
    // grain; the estimator expression is q106's, verbatim
    "q122_kmv_overlap" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id,
        |              CAST('0x' || substr(md5('kmvu_' || CAST(user_id AS VARCHAR)), 1, 15)
        |                AS BIGINT) AS h
        |            FROM events),
        |tp AS (SELECT DISTINCT event_type FROM events),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |          FROM tp a JOIN tp b ON a.event_type < b.event_type),
        |uh AS (SELECT p.type_a, p.type_b, d.h,
        |         max(CASE WHEN d.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
        |         max(CASE WHEN d.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
        |       FROM pairs p JOIN du d
        |         ON d.event_type IN (p.type_a, p.type_b)
        |       GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY type_a, type_b
        |                                    ORDER BY h) AS rn
        |       FROM uh),
        |m AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS k_used,
        |        max(CASE WHEN rn = 64 THEN h END) AS hk,
        |        CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS c
        |      FROM rk WHERE rn <= 64 GROUP BY 1, 2),
        |ex AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS exact_union,
        |         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS exact_inter
        |       FROM uh GROUP BY 1, 2),
        |est AS (SELECT type_a, type_b, k_used, c,
        |          CASE WHEN k_used < 64 THEN k_used
        |               ELSE CAST(floor((63.0 * CAST(1152921504606846976 AS DOUBLE))
        |                      / CAST(hk AS DOUBLE)) AS BIGINT) END AS est_union
        |        FROM m)
        |SELECT e.type_a, e.type_b, e.k_used, e.est_union, x.exact_union,
        |       (e.c * e.est_union) // e.k_used AS est_inter, x.exact_inter
        |FROM est e JOIN ex x USING (type_a, type_b)
        |ORDER BY e.type_a, e.type_b""".stripMargin,

    "q106_kmv_distinct" ->
      """WITH hp AS (SELECT DISTINCT l_returnflag,
        |              CAST('0x' || substr(md5('kmvp_' || CAST(l_partkey AS VARCHAR)), 1, 15)
        |                AS BIGINT) AS h
        |            FROM lineitem),
        |hs AS (SELECT DISTINCT l_returnflag,
        |         CAST('0x' || substr(md5('kmvs_' || CAST(l_suppkey AS VARCHAR)), 1, 15)
        |           AS BIGINT) AS h
        |       FROM lineitem),
        |rp AS (SELECT l_returnflag, h,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
        |       FROM hp),
        |rs AS (SELECT l_returnflag, h,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
        |       FROM hs),
        |ap AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS sz,
        |              max(CASE WHEN rk = 64 THEN h END) AS hk
        |       FROM rp WHERE rk <= 64 GROUP BY 1),
        |asups AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS sz,
        |                 max(CASE WHEN rk = 64 THEN h END) AS hk
        |          FROM rs WHERE rk <= 64 GROUP BY 1),
        |ex AS (SELECT l_returnflag,
        |         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps
        |       FROM lineitem GROUP BY 1)
        |SELECT ex.l_returnflag,
        |       CASE WHEN ap.sz < 64 THEN ap.sz
        |            ELSE CAST(floor((63.0 * CAST(1152921504606846976 AS DOUBLE))
        |                   / CAST(ap.hk AS DOUBLE)) AS BIGINT) END AS approx_parts,
        |       ex.exact_parts,
        |       CASE WHEN asups.sz < 64 THEN asups.sz
        |            ELSE CAST(floor((63.0 * CAST(1152921504606846976 AS DOUBLE))
        |                   / CAST(asups.hk AS DOUBLE)) AS BIGINT) END AS approx_supps,
        |       ex.exact_supps
        |FROM ex JOIN ap USING (l_returnflag) JOIN asups USING (l_returnflag)
        |ORDER BY ex.l_returnflag""".stripMargin,

    // pure-BIGINT histogram percentile: cents once, $100 buckets,
    // ceil-rank by integer division — every step exact in both engines
    "q107_hist_percentile" ->
      """WITH hist AS (SELECT l_returnflag,
        |                CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS b,
        |                CAST(count(*) AS BIGINT) AS c
        |              FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT l_returnflag, b, c,
        |               sum(c) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum,
        |               sum(c) OVER (PARTITION BY l_returnflag) AS n
        |        FROM hist)
        |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |       min(CASE WHEN cum >= (n * 50 + 99) // 100
        |                THEN (b + 1) * 10000 END) AS p50_hi_cents,
        |       min(CASE WHEN cum >= (n * 95 + 99) // 100
        |                THEN (b + 1) * 10000 END) AS p95_hi_cents,
        |       min(CASE WHEN cum >= (n * 99 + 99) // 100
        |                THEN (b + 1) * 10000 END) AS p99_hi_cents
        |FROM cum GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
}
