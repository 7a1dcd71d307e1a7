package graft.queries

import org.apache.spark.sql.functions.{broadcast, col, count, expr, greatest, least, lit, sum, when}
import graft.operators.Prep
import graft.sources.Tables

/** Oracle-gated training-set preparation queries over `documents`:
  * deterministic hash-bucket splits, per-source mixture-weight
  * sampling, and fixed-token-budget sequence packing (see
  * [[graft.operators.Prep]] for the scale contracts).
  */
object PrepQueries {

  /** q214: the context-length waste curve over the whitespace token
    * counts — one doc scan crossed with a 4-row length grid. Two
    * packing regimes side by side per candidate seq_len:
    *   - pad-per-doc (one doc per sequence, pad to L, overflow
    *     truncated): kept/truncated token mass and the padded-slot
    *     share of all slots — the regime that isolates documents but
    *     pays padding on short docs and loses tails of long ones;
    *   - concat-per-source (the q57 packing contract): only each
    *     source's LAST partial sequence pads, so waste is
    *     (L − total mod L) mod L per source over ceil-rounded slots.
    * The table a context-length decision reads: at which L does
    * pad-per-doc waste cross the truncation loss, and how close to
    * zero the q57 regime stays. All integer arithmetic (ceil via
    * (a + L − 1) / L), ppm by integer division.
    */
  private def paddingCurve(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val tok = graft.operators.TextAnalysis
      .tokenCounts(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"), col("ws_tokens"))
    val grid = spark.sql(
      "SELECT explode(array(128L, 256L, 512L, 1024L)) AS seq_len")
    val perDoc = tok.crossJoin(broadcast(grid))
      .groupBy("seq_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("ws_tokens"), col("seq_len"))).as("kept_tokens"),
        sum(when(col("ws_tokens") > col("seq_len"), 1L).otherwise(0L))
          .as("truncated_docs"),
        sum(greatest(col("ws_tokens") - col("seq_len"), lit(0L)))
          .as("truncated_tokens"),
        sum(col("seq_len") - least(col("ws_tokens"), col("seq_len")))
          .as("pad_slots"))
    val perSource = tok.groupBy("source")
      .agg(sum(col("ws_tokens")).as("src_tokens"))
      .crossJoin(broadcast(grid))
      .groupBy("seq_len")
      .agg(sum(expr("(seq_len - src_tokens % seq_len) % seq_len"))
          .as("concat_pad_slots"),
        sum(expr("((src_tokens + seq_len - 1) div seq_len) * seq_len"))
          .as("concat_slots"))
    perDoc.join(perSource, "seq_len")
      .select(col("seq_len"), col("n_docs"), col("kept_tokens"),
        col("truncated_docs"), col("truncated_tokens"), col("pad_slots"),
        when(col("n_docs") > 0,
          expr("pad_slots * 1000000 div (n_docs * seq_len)")).as("pad_ppm"),
        col("concat_pad_slots"),
        when(col("concat_slots") > 0,
          expr("concat_pad_slots * 1000000 div concat_slots"))
          .as("concat_pad_ppm"))
      .orderBy("seq_len")
  }

  /** The q56 split derivation as a reusable (doc_id, split) CTE —
    * shared by the q66 and q69 oracles so the salt/percentage constants
    * cannot drift from `Prep.split`'s defaults in one oracle only.
    */
  private[queries] val SplitCteSql: String =
    """spl AS (SELECT doc_id,
      |               CASE WHEN bkt < 10 THEN 'test'
      |                    WHEN bkt < 20 THEN 'val'
      |                    ELSE 'train' END AS split
      |        FROM (SELECT doc_id,
      |                     CAST('0x' || substr(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 15)
      |                          AS BIGINT) % 100 AS bkt
      |              FROM documents))""".stripMargin

  def queries: Map[String, Q] = Map(
    "q214_padding_curve" -> ((spark, dir) => paddingCurve(spark, dir)),

    "q56_split_assign" -> ((spark, dir) =>
      Prep.split(Tables.load(spark, dir, "documents"), valPct = 10, testPct = 10)
        .orderBy("doc_id")),

    "q57_seq_pack" -> ((spark, dir) =>
      Prep.pack(Tables.load(spark, dir, "documents"), budget = 512L)
        .orderBy("doc_id")),

    "q58_mix" -> ((spark, dir) =>
      Prep.mix(Tables.load(spark, dir, "documents"),
          ratesPct = Map("src0" -> 25, "src1" -> 50), defaultPct = 100)
        .orderBy("doc_id")),

    // rebalance the lang-skewed corpus (en ≈ 2.9× any other language in
    // the testdata) to ≤~100 docs per language
    "q73_sample_quota" -> ((spark, dir) =>
      Prep.sampleToQuota(Tables.load(spark, dir, "documents"),
          stratum = "lang", quota = 100L)
        .orderBy("doc_id")),

    // up-sample src1 to 2.5 epochs, down-sample src0 to 0.25, everything
    // else one pass — the above-1.0 half of the q58 mixing story
    "q76_epoch_upsample" -> ((spark, dir) =>
      Prep.epochs(Tables.load(spark, dir, "documents"),
          epochsBySource = Map("src0" -> 0.25, "src1" -> 2.5),
          defaultEpochs = 1.0)
        .orderBy("doc_id")),

    // Morton (Z-order) layout audit: events keyed by the bit-interleave
    // of (user bucket, value bucket), 64 contiguous key ranges, per-range
    // min/max of BOTH dims — tight ranges prove the 2-D pruning property
    // a single-column sort cannot give
    "q115_zorder" -> ((spark, dir) =>
      Prep.zorderLayout(Tables.load(spark, dir, "events"),
          bits = 8, buckets = 64)
        .orderBy("z_bucket")),

    // the leakage-free rendering of q56: near-dup clusters (q47's
    // components over the canonical q42 edges) split as a unit, so the
    // cross-split contamination q69 audits is zero by construction
    "q75_split_leakage_free" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val comp = graft.operators.Components
        .connected(graft.operators.Dedup.nearDupEdges(docs))
        .select(col("node").as("doc_id"), col("component").as("group_id"))
      Prep.splitByGroup(docs, comp).orderBy("doc_id")
    }),

    // α=1/2 temperature rebalancing over the skewed lang distribution —
    // where q73 caps strata at a flat quota, this bends shares toward
    // equal with the standard multilingual temperature curve
    "q90_temperature_mix" -> ((spark, dir) =>
      Prep.temperatureMix(Tables.load(spark, dir, "documents"),
          stratum = "lang")
        .orderBy("doc_id")),

    // deterministic corpus shuffle: the reproducible training order a
    // rerun/backfill/other engine reads identically (vs orderBy(rand()))
    "q102_shuffle_order" -> ((spark, dir) =>
      Prep.shuffleOrder(Tables.load(spark, dir, "documents"), shards = 64)
        .orderBy("shard", "pos")),

    // deterministic weighted (priority) sample: 100 docs preferred ∝
    // length — bottom-k of integer hash-div-weight priorities, a pure
    // function of (salt, doc_id, n_chars); one scan + top-k heap
    "q129_weighted_sample" -> ((spark, dir) =>
      Prep.weightedSample(Tables.load(spark, dir, "documents"), k = 100)
        .orderBy("priority", "doc_id")))

  /** q115's oracle is BUILT from the engine's own expression strings
    * ([[Prep.zorderExpr]]/[[Prep.zorderX]]/[[Prep.zorderY]] — pure
    * div/mod arithmetic that parses identically in both engines, with
    * the single substitution `div` → `//`), so key derivation cannot
    * drift between gate and engine.
    */
  private def zorderOracle: String = {
    val bits = 8; val buckets = 64
    val z = Prep.zorderExpr(Prep.zorderX(bits), Prep.zorderY(bits), bits)
      .replace(" div ", " // ")
    val per = (1L << (2 * bits)) / buckets
    s"""SELECT (($z) // $per) AS z_bucket,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       min(${Prep.zorderX(bits)}) AS x_min,
       |       max(${Prep.zorderX(bits)}) AS x_max,
       |       min(${Prep.zorderY(bits)}) AS y_min,
       |       max(${Prep.zorderY(bits)}) AS y_max
       |FROM events
       |GROUP BY 1
       |ORDER BY z_bucket""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // same whitespace counter, same integer ceil/mod arithmetic, ppm by
    // integer division — the two regimes' waste per grid length
    "q214_padding_curve" ->
      """WITH tok AS (SELECT d.doc_id, d.source,
        |               CAST(len(list_filter(string_split_regex(trim(d.text), '\s+'),
        |                                    x -> x <> '')) AS BIGINT) AS ws_tokens
        |             FROM documents d),
        |grid AS (SELECT CAST(unnest([128, 256, 512, 1024]) AS BIGINT) AS seq_len),
        |pd AS (SELECT g.seq_len, count(*) AS n_docs,
        |              CAST(sum(LEAST(t.ws_tokens, g.seq_len)) AS BIGINT) AS kept_tokens,
        |              CAST(sum(CASE WHEN t.ws_tokens > g.seq_len THEN 1 ELSE 0 END)
        |                   AS BIGINT) AS truncated_docs,
        |              CAST(sum(GREATEST(t.ws_tokens - g.seq_len, 0)) AS BIGINT)
        |                AS truncated_tokens,
        |              CAST(sum(g.seq_len - LEAST(t.ws_tokens, g.seq_len)) AS BIGINT)
        |                AS pad_slots
        |       FROM tok t CROSS JOIN grid g GROUP BY 1),
        |srct AS (SELECT source, CAST(sum(ws_tokens) AS BIGINT) AS src_tokens
        |         FROM tok GROUP BY 1),
        |ps AS (SELECT g.seq_len,
        |              CAST(sum((g.seq_len - s.src_tokens % g.seq_len) % g.seq_len)
        |                   AS BIGINT) AS concat_pad_slots,
        |              CAST(sum(((s.src_tokens + g.seq_len - 1) // g.seq_len) * g.seq_len)
        |                   AS BIGINT) AS concat_slots
        |       FROM srct s CROSS JOIN grid g GROUP BY 1)
        |SELECT pd.seq_len, pd.n_docs, pd.kept_tokens, pd.truncated_docs,
        |       pd.truncated_tokens, pd.pad_slots,
        |       CASE WHEN pd.n_docs > 0
        |            THEN pd.pad_slots * 1000000 // (pd.n_docs * pd.seq_len)
        |       END AS pad_ppm,
        |       ps.concat_pad_slots,
        |       CASE WHEN ps.concat_slots > 0
        |            THEN ps.concat_pad_slots * 1000000 // ps.concat_slots
        |       END AS concat_pad_ppm
        |FROM pd JOIN ps USING (seq_len)
        |ORDER BY seq_len""".stripMargin,
    // same salted 60-bit hash, same integer floor division, same
    // (priority, doc_id) bottom-100
    "q129_weighted_sample" ->
      """SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |       (CAST('0x' || substr(md5('ws_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |          AS BIGINT) // CAST(n_chars AS BIGINT)) AS priority
        |FROM documents
        |WHERE n_chars IS NOT NULL AND n_chars > 0
        |ORDER BY priority, doc_id
        |LIMIT 100""".stripMargin,

    "q115_zorder" -> zorderOracle,

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

    // sequence scope is per (source, shard): shard = portable md5 bucket
    // of doc_id (salt 'pack', 64 shards), same derivation as q56/q58
    "q57_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST('0x' || substr(md5('pack_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 64 AS shard,
        |         CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |           AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, shard, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, source, shard, n_tokens,
        |       CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |       CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    "q58_mix" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |         CAST('0x' || substr(md5('mix_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 100 AS bucket,
        |         CAST(CASE WHEN source = 'src1' THEN 50
        |                   WHEN source = 'src0' THEN 25
        |                   ELSE 100 END AS BIGINT) AS rate_pct
        |  FROM documents)
        |SELECT doc_id, source, bucket, rate_pct,
        |       CAST(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    // rate_ppm = min(1e6, floor(1e6 * quota / n_stratum)) — all-integer,
    // so both engines derive the identical per-language rate
    "q73_sample_quota" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_stratum,
        |         CAST(least(1000000, (1000000 * 100) // count(*)) AS BIGINT) AS rate_ppm
        |  FROM documents GROUP BY lang),
        |b AS (
        |  SELECT doc_id, lang,
        |         CAST('0x' || substr(md5('quota_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 1000000 AS bucket
        |  FROM documents)
        |SELECT b.doc_id, b.lang, c.n_stratum, c.rate_ppm, b.bucket,
        |       CAST(CASE WHEN b.bucket < c.rate_ppm THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM b JOIN c USING (lang)
        |ORDER BY doc_id""".stripMargin,

    // whole/frac parts are the driver-side ppm fixing of 0.25/2.5/1.0:
    // src0 → (0, 250000), src1 → (2, 500000), default → (1, 0)
    "q76_epoch_upsample" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |         CAST('0x' || substr(md5('epoch_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) % 1000000 AS bucket,
        |         CAST(CASE WHEN source = 'src0' THEN 0
        |                   WHEN source = 'src1' THEN 2
        |                   ELSE 1 END AS BIGINT) AS w,
        |         CAST(CASE WHEN source = 'src0' THEN 250000
        |                   WHEN source = 'src1' THEN 500000
        |                   ELSE 0 END AS BIGINT) AS f
        |  FROM documents)
        |SELECT doc_id, source, bucket,
        |       CAST(w + CASE WHEN bucket < f THEN 1 ELSE 0 END AS BIGINT) AS epochs
        |FROM b
        |ORDER BY doc_id""".stripMargin,

    // split by md5 of the near-dup COMPONENT id (falling back to the
    // doc's own id), so both endpoints of any verified edge share a
    // bucket — same canonical edge + closure chains as q47/q69
    "q75_split_leakage_free" ->
      (s"""WITH RECURSIVE
         |${DedupQueries.ShinglesSql},
         |${DedupQueries.NearDupPairsSql},
         |${DedupQueries.closureSql("pairs")},
         |k AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         |b AS (
         |  SELECT doc_id, split_key,
         |         CAST('0x' || substr(md5('split_' || CAST(split_key AS VARCHAR)), 1, 15)
         |              AS BIGINT) % 100 AS bucket
         |  FROM k)
         |SELECT doc_id, split_key, bucket,
         |       CASE WHEN bucket < 10 THEN 'test'
         |            WHEN bucket < 20 THEN 'val'
         |            ELSE 'train' END AS split
         |FROM b
         |ORDER BY doc_id""".stripMargin),

    // rate_ppm = floor(1e6 · sqrt(n_min/n_i)) — sqrt is IEEE-correct in
    // both engines (the reason α is pinned to 1/2), floored once to an
    // integer so every verdict comparison is exact
    "q90_temperature_mix" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_stratum
        |           FROM documents GROUP BY lang),
        |m AS (SELECT min(n_stratum) AS n_min FROM c),
        |r AS (SELECT lang, n_stratum,
        |             CAST(floor(sqrt(CAST(m.n_min AS DOUBLE) / n_stratum)
        |                        * 1000000.0) AS BIGINT) AS rate_ppm
        |      FROM c CROSS JOIN m),
        |b AS (SELECT doc_id, lang,
        |             CAST('0x' || substr(md5('temp_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |                  AS BIGINT) % 1000000 AS bucket
        |      FROM documents)
        |SELECT b.doc_id, b.lang, r.n_stratum, r.rate_ppm, b.bucket,
        |       CAST(CASE WHEN b.bucket < r.rate_ppm THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM b JOIN r USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "q102_shuffle_order" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5('shuffle_' || CAST(doc_id AS VARCHAR)), 1, 15)
        |              AS BIGINT) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key % 64 AS shard,
        |       CAST(row_number() OVER (PARTITION BY shuffle_key % 64
        |              ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos,
        |       shuffle_key
        |FROM k
        |ORDER BY shard, pos""".stripMargin)
}
