package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{array, broadcast, coalesce, col, count, countDistinct, explode, expr, lit, round, sum, when}
import graft.operators.{Components, Dedup}
import graft.sources.Tables

/** Oracle-gated dedup queries over `documents` (SURVEY.md §2.5
  * approx/sketches row + the north-star dedup extension).
  *
  * Data note (sf0.01): the corpus has 25 planted near-dup pairs at
  * shingle-Jaccard ≈ 0.9–0.99 and nothing between ~0.3 and 0.9, so the
  * 0.7/0.8 thresholds sit in a wide margin; SimHash Hamming distances
  * (bits sourced from the 60-bit shingle hash) are ≤ 7 for the planted
  * pairs and ≥ 15 for noise, so 10 is stable.
  *
  * The SQL CTE blocks below are THE rendering of the engine's dedup
  * chain and are shared by every oracle that embeds it (q26–q29, q47
  * here; q42 in [[TextQueries]]; q48 in [[CurationQueries]]) — one
  * definition on the Scala side ([[Dedup.nearDupEdges]]), one here.
  */
object DedupQueries {

  /** Whitespace 3-gram shingles hashed to 60-bit longs (1-based list
    * indexing vs Spark's 0-based), over the given source relation.
    */
  /** The word-3-gram shingle chain over `src`, emitting `${p}ws` /
    * `${p}sh` — prefix the names when one statement shingles two
    * relations (q77 shingles the eval and train slices side by side).
    */
  private[queries] def shinglesSql(src: String, p: String = ""): String =
    s"""${p}ws AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w FROM $src),
       |${p}sh AS (SELECT DISTINCT doc_id,
       |              CAST('0x' || substr(md5(concat_ws(' ', w[i], w[i+1], w[i+2])), 1, 15) AS BIGINT) AS gh
       |       FROM ${p}ws, UNNEST(generate_series(1, len(w)-2)) AS t(i) WHERE len(w) >= 3)""".stripMargin

  private[queries] val ShinglesSql: String = shinglesSql("documents")

  /** Positional word-3-gram chain → maximal shared diagonal runs — the
    * SQL twin of [[Dedup.sharedRuns]] (0-based pos = i−1 to match the
    * engine's `positionalShingles`; stop-gram guard caps OCCURRENCES,
    * not doc count, mirroring the engine; run_tokens = grams + n − 1).
    * Emits `ws` (tokens) and `runs` (un-thresholded maximal runs) for
    * q108/q109 to consume.
    */
  private[queries] val SharedRunsSql: String =
    """ws AS (SELECT doc_id,
      |              list_filter(string_split_regex(trim(text), '\s+'),
      |                          x -> x <> '') AS w
      |       FROM documents),
      |psh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |               CAST('0x' || substr(md5(concat_ws(' ', w[i], w[i+1], w[i+2])), 1, 15) AS BIGINT) AS gh
      |        FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
      |        WHERE len(w) >= 3),
      |rare AS (SELECT gh FROM psh GROUP BY gh HAVING count(*) <= 1000),
      |keptg AS (SELECT p.doc_id, p.pos, p.gh FROM psh p JOIN rare USING (gh)),
      |m AS (SELECT a.doc_id AS i, b.doc_id AS j, a.pos AS pi, b.pos AS pj,
      |             a.pos - b.pos AS diag
      |      FROM keptg a JOIN keptg b
      |        ON a.gh = b.gh AND a.doc_id < b.doc_id),
      |isl AS (SELECT i, j, diag, pi, pj,
      |               pi - row_number() OVER (PARTITION BY i, j, diag
      |                                       ORDER BY pi) AS island
      |        FROM m),
      |runs AS (SELECT i, j, min(pi) AS start_i, min(pj) AS start_j,
      |                CAST(count(*) + 2 AS BIGINT) AS run_tokens
      |         FROM isl GROUP BY i, j, diag, island)""".stripMargin

  /** One FULL scrub round over relation `in` (doc_id, text), emitting
    * `${p}out` (doc_id, n_tokens, n_dropped, text_clean) — the SQL twin
    * of one [[Dedup.scrubRunsFixed]] iteration: positional 3-grams with
    * the occurrence-capped stop-gram guard, then all three span
    * families over the SAME gram state (cross-doc diagonal runs cut on
    * the later doc, within-doc runs cut at the later occurrence,
    * hot-segment fingerprint groups cut everywhere but the minimal
    * (doc_id, start) PLUS fragment blocks — distinct stretches properly
    * contained in a longer distinct stretch — cut at every occurrence),
    * interval-merged and rewritten exactly as q109.
    * Parameterized by prefix so q111b unrolls two rounds in one
    * statement; constants fixed at the canonical n=3 / minRun=15 /
    * maxPostings=1000.
    */
  private[queries] def scrubRoundSql(in: String, p: String): String =
    s"""${p}ws AS (SELECT doc_id,
       |             list_filter(string_split_regex(trim(text), '\\s+'),
       |                         x -> x <> '') AS w
       |           FROM $in),
       |${p}psh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |              CAST('0x' || substr(md5(concat_ws(' ', w[i], w[i+1], w[i+2])), 1, 15) AS BIGINT) AS gh
       |            FROM ${p}ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
       |            WHERE len(w) >= 3),
       |${p}occ AS (SELECT gh, count(*) AS oc FROM ${p}psh GROUP BY gh),
       |${p}kg AS (SELECT s.doc_id, s.pos, s.gh
       |           FROM ${p}psh s JOIN ${p}occ o USING (gh) WHERE o.oc <= 1000),
       |${p}hg AS (SELECT s.doc_id, s.pos, s.gh
       |           FROM ${p}psh s JOIN ${p}occ o USING (gh) WHERE o.oc > 1000),
       |${p}m AS (SELECT a.doc_id AS i, b.doc_id AS j, a.pos AS pi, b.pos AS pj,
       |                 a.pos - b.pos AS diag
       |          FROM ${p}kg a JOIN ${p}kg b
       |            ON a.gh = b.gh AND a.doc_id < b.doc_id),
       |${p}isl AS (SELECT i, j, diag, pi, pj,
       |                   pi - row_number() OVER (PARTITION BY i, j, diag ORDER BY pi) AS island
       |            FROM ${p}m),
       |${p}runs AS (SELECT j, min(pj) AS start_j,
       |                    CAST(count(*) + 2 AS BIGINT) AS run_tokens
       |             FROM ${p}isl GROUP BY i, j, diag, island),
       |${p}sm AS (SELECT a.doc_id, a.pos AS pi, b.pos AS pj, a.pos - b.pos AS diag
       |           FROM ${p}kg a JOIN ${p}kg b
       |             ON a.gh = b.gh AND a.doc_id = b.doc_id AND a.pos < b.pos),
       |${p}sisl AS (SELECT doc_id, diag, pi, pj,
       |                    pi - row_number() OVER (PARTITION BY doc_id, diag ORDER BY pi) AS island
       |             FROM ${p}sm),
       |${p}sruns AS (SELECT doc_id, min(pj) AS start_j,
       |                     CAST(count(*) + 2 AS BIGINT) AS run_tokens
       |              FROM ${p}sisl GROUP BY doc_id, diag, island),
       |${p}hseg AS (SELECT doc_id, min(pos) AS s,
       |                    CAST(count(*) + 2 AS BIGINT) AS run_tokens,
       |                    md5(string_agg(CAST(gh AS VARCHAR), ',' ORDER BY pos)) AS fp,
       |                    list(gh ORDER BY pos) AS ghs
       |             FROM (SELECT doc_id, pos, gh,
       |                          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |                   FROM ${p}hg) t
       |             GROUP BY doc_id, island
       |             HAVING count(*) + 2 >= 15),
       |${p}hblk AS (SELECT DISTINCT fp, ghs FROM ${p}hseg),
       |${p}hfrag AS (SELECT DISTINCT f.fp
       |              FROM ${p}hblk f JOIN ${p}hblk d ON len(d.ghs) > len(f.ghs)
       |              WHERE EXISTS (SELECT 1
       |                            FROM unnest(generate_series(1, len(d.ghs) - len(f.ghs) + 1)) AS t(o)
       |                            WHERE d.ghs[o:o+len(f.ghs)-1] = f.ghs)),
       |${p}hcut AS (SELECT doc_id, s, s + run_tokens AS e
       |             FROM (SELECT doc_id, s, run_tokens, fp,
       |                          row_number() OVER (PARTITION BY fp ORDER BY doc_id, s) AS rk
       |                   FROM ${p}hseg) t
       |             WHERE rk > 1 OR fp IN (SELECT fp FROM ${p}hfrag)),
       |${p}spans AS (SELECT j AS doc_id, start_j AS s, start_j + run_tokens AS e
       |              FROM ${p}runs WHERE run_tokens >= 15
       |              UNION ALL
       |              SELECT doc_id, start_j AS s, start_j + run_tokens AS e
       |              FROM ${p}sruns WHERE run_tokens >= 15
       |              UNION ALL
       |              SELECT doc_id, s, e FROM ${p}hcut),
       |${p}mrg0 AS (SELECT doc_id, s, e,
       |                    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |             FROM ${p}spans),
       |${p}mrg1 AS (SELECT doc_id, s, e,
       |                    sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
       |                      OVER (PARTITION BY doc_id ORDER BY s, e
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl2
       |             FROM ${p}mrg0),
       |${p}mrg AS (SELECT doc_id, min(s) AS s, max(e) AS e
       |            FROM ${p}mrg1 GROUP BY doc_id, isl2),
       |${p}toks AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
       |             FROM ${p}ws, UNNEST(generate_series(1, len(w))) AS t(i)),
       |${p}drp AS (SELECT doc_id, unnest(generate_series(s, e - 1)) AS pos FROM ${p}mrg),
       |${p}keptt AS (SELECT t.doc_id, t.pos, t.word
       |              FROM ${p}toks t LEFT JOIN ${p}drp d
       |                ON t.doc_id = d.doc_id AND t.pos = d.pos
       |              WHERE d.pos IS NULL),
       |${p}agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nk,
       |                   string_agg(word, ' ' ORDER BY pos) AS kept
       |            FROM ${p}keptt GROUP BY doc_id),
       |${p}nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM ${p}ws),
       |${p}out AS (SELECT n.doc_id, n.n_tokens,
       |                   n.n_tokens - coalesce(a.nk, 0) AS n_dropped,
       |                   coalesce(a.kept, '') AS text_clean
       |            FROM ${p}nt n LEFT JOIN ${p}agg a USING (doc_id))""".stripMargin

  /** Exact Jaccard over the hashed shingle sets. */
  private[queries] val JaccardSql: String =
    """sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
      |          FROM sh a JOIN sh b ON a.gh = b.gh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |jac AS (SELECT i, j, ix.c * 1.0 / (s1.n + s2.n - ix.c) AS jaccard
      |        FROM inter ix JOIN sz s1 ON ix.i = s1.doc_id JOIN sz s2 ON ix.j = s2.doc_id)""".stripMargin

  /** MinHash-LSH candidate pairs: `nSeeds` arithmetic permutations of
    * the shingle hash mod P = 2^31−1 (multipliers/offsets md5-derived,
    * same constants as `Dedup.minhashA/B`), `rowsPerBand`-row bands over
    * the FIRST ≤16 permutations (the house candidate scheme — the band
    * pool is the largest rowsPerBand multiple ≤ 16, as the engine's
    * `bandPool`), keyed by md5 of the ordered minima, same-bucket pairs.
    * The `fbands` QUALIFY mirrors the engine's canonical skew guard
    * (`Dedup.NearDupMaxBucket` — buckets above the cap are dropped
    * before the self-join), so the oracle gates the capped path the
    * engine actually runs, not an uncapped shadow. `p` prefixes every
    * CTE name (NOT `sh`, which is shared) so q210 can band the same
    * signatures three ways in one statement.
    */
  private[graft] def minhashCandSql(nSeeds: Int = 16, rowsPerBand: Int = 4,
      p: String = ""): String = {
    // the band pool is the FIRST 16 permutations (the engine's
    // `bandPool = 16 / rowsPerBand * rowsPerBand`); with nSeeds < 16 the
    // bands CTE would group incomplete bands built from missing
    // permutations and silently diverge from `Dedup.bandsOfWide`
    require(nSeeds >= 16,
      s"minhashCandSql: the house band pool takes the first 16 of nSeeds ($nSeeds) permutations")
    s"""${p}seeds AS (SELECT s,
       |                 CAST('0x' || substr(md5('mh_a_' || s), 1, 15) AS BIGINT) % 2147483646 + 1 AS pa,
       |                 CAST('0x' || substr(md5('mh_b_' || s), 1, 15) AS BIGINT) % 2147483647 AS pb
       |          FROM (SELECT unnest(generate_series(0, ${nSeeds - 1})) AS s)),
       |${p}sig AS (SELECT doc_id, s, min((pa * (gh % 2147483647) + pb) % 2147483647) AS minh
       |        FROM sh CROSS JOIN ${p}seeds GROUP BY doc_id, s),
       |${p}bands AS (SELECT doc_id, s // $rowsPerBand AS b,
       |                 md5(string_agg(minh::VARCHAR, ',' ORDER BY s)) AS band_key
       |          FROM ${p}sig WHERE s < ${16 / rowsPerBand * rowsPerBand}
       |          GROUP BY doc_id, s // $rowsPerBand),
       |${p}fbands AS (SELECT doc_id, b, band_key FROM ${p}bands
       |           QUALIFY count(*) OVER (PARTITION BY b, band_key)
       |                   <= ${Dedup.NearDupMaxBucket}),
       |${p}cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |         FROM ${p}fbands a JOIN ${p}fbands b
       |           ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin
  }

  private[queries] val MinhashCandSql: String = minhashCandSql(16)

  /** Verified near-dup edges at the canonical 0.7 threshold — the SQL
    * twin of `Dedup.nearDupEdges`.
    */
  private[queries] val NearDupPairsSql: String =
    s"""$MinhashCandSql,
       |$JaccardSql,
       |pairs AS (SELECT jac.i, jac.j FROM jac
       |          JOIN cand ON jac.i = cand.i AND jac.j = cand.j
       |          WHERE jac.jaccard >= 0.7)""".stripMargin

  /** Recursive min-label closure over an (i, j) pair relation — the
    * single oracle rendering of `Components.connected`, shared by q47,
    * q54, q59, the q48/q64 curation chain, and q66's prefixed semantic
    * chain so the closure/tie-break rule cannot drift between them.
    * Emits `${p}e`, `${p}r`, `${p}comp(node, component)`; the statement
    * must be WITH RECURSIVE.
    */
  private[queries] def closureSql(pairsRel: String, p: String = ""): String =
    s"""${p}e AS (SELECT i, j FROM $pairsRel UNION SELECT j AS i, i AS j FROM $pairsRel),
       |${p}r AS (SELECT i AS n, i AS m FROM ${p}e
       |      UNION
       |      SELECT ${p}r.n, ${p}e.j AS m FROM ${p}r JOIN ${p}e ON ${p}r.m = ${p}e.i),
       |${p}comp AS (SELECT n AS node, min(m) AS component FROM ${p}r GROUP BY n)""".stripMargin

  /** SimHash signatures from the shingle-hash bit columns. */
  private[queries] val SimhashSql: String =
    """bits AS (SELECT doc_id, b,
      |                CASE WHEN sum(CASE WHEN ((gh >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
      |                     THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |         FROM sh, UNNEST(generate_series(0, 59)) AS t(b) GROUP BY doc_id, b),
      |sims AS (SELECT doc_id, CAST(sum(bit << b) AS BIGINT) AS simhash
      |         FROM bits GROUP BY doc_id)""".stripMargin

  /** q62/q70: canonical edges restricted to delta-touching pairs. */
  private[queries] lazy val IncrementalEdgesSql: String =
    s"""WITH $ShinglesSql,
       |$MinhashCandSql,
       |$JaccardSql
       |SELECT jac.i, jac.j, round(jac.jaccard, 4) AS jaccard
       |FROM jac JOIN cand ON jac.i = cand.i AND jac.j = cand.j
       |WHERE jac.jaccard >= 0.7
       |  AND jac.j >= (SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT)
       |                FROM documents)
       |ORDER BY jac.i, jac.j""".stripMargin

  /** SimHash pigeonhole-blocked candidate pairs for the canonical
    * maxHamming = 10 — the SQL twin of `Dedup.simhashCandidates`' loose
    * scheme (block width 60/11 < 8 bits, so 12 blocks and C(12,2)
    * block-PAIR keys; within distance 10 at most 10 blocks differ, so
    * two must agree). Block offsets/masks are computed HERE from the
    * same integer formula as the engine's `blockVal`, and the `fblk`
    * QUALIFY mirrors the default `maxKeySize` skew guard
    * (`Dedup.NearDupMaxBucket`) — the oracle gates the capped path the
    * engine ships, not an uncapped shadow.
    */
  private[queries] val SimhashCandSql: String = {
    val m = 12 // maxHamming 10 + 2 (loose-bound scheme)
    def lo(k: Int) = k * 60 / m
    def mask(k: Int) = (1L << ((k + 1) * 60 / m - lo(k))) - 1
    val rows = (for { k1 <- 0 until m; k2 <- k1 + 1 until m } yield
      s"($k1, $k2, ${lo(k1)}, ${mask(k1)}, ${lo(k2)}, ${mask(k2)})").mkString(",\n|          ")
    s"""ks(k1, k2, lo1, m1, lo2, m2) AS (VALUES
       |          $rows),
       |blk AS (SELECT s.doc_id, s.simhash, ks.k1, ks.k2,
       |               (s.simhash >> ks.lo1) & ks.m1 AS v1,
       |               (s.simhash >> ks.lo2) & ks.m2 AS v2
       |        FROM sims s CROSS JOIN ks),
       |fblk AS (SELECT doc_id, simhash, k1, k2, v1, v2 FROM blk
       |         QUALIFY count(*) OVER (PARTITION BY k1, k2, v1, v2)
       |                 <= ${Dedup.NearDupMaxBucket}),
       |scand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
       |                 a.simhash AS si, b.simhash AS sj
       |          FROM fblk a JOIN fblk b
       |            ON a.k1 = b.k1 AND a.k2 = b.k2 AND a.v1 = b.v1 AND a.v2 = b.v2
       |               AND a.doc_id < b.doc_id)""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    "q26_dedup_ngram" -> ((spark, dir) =>
      Dedup.ngramJaccardPairs(Tables.load(spark, dir, "documents"), n = 3, threshold = 0.8)
        .orderBy("i", "j")),

    "q27_dedup_minhash" -> ((spark, dir) =>
      Dedup.minhashPairs(Tables.load(spark, dir, "documents"),
          n = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.7)
        .orderBy("i", "j")),

    // THRESHOLD SENSITIVITY curve — the tuning table an operator reads
    // BEFORE committing the canonical 0.7: one LSH+verify pass scored
    // down to Jaccard 0.5, then per grid threshold (50..90 in tenths)
    // the surviving pair count and the distinct docs those pairs touch.
    // Comparisons run on the basis-point integer round(round(j,4)·10⁴)
    // so no engine compares raw doubles against a grid literal. One
    // bounded pair frame × a 5-row broadcast grid — the curve costs one
    // dedup pass however large the corpus
    "q207_threshold_curve" -> ((spark, dir) => {
      val pairs = Dedup.minhashPairs(Tables.load(spark, dir, "documents"),
          n = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
        .select(col("i"), col("j"),
          round(col("jaccard") * 10000).cast("long").as("jb"))
      val grid = spark.range(5, 10).select((col("id") * 1000L).as("t_bp"))
      val np = broadcast(grid)
        .join(pairs, col("jb") >= col("t_bp"))
        .groupBy("t_bp").agg(count(lit(1)).as("n_pairs"))
      val ends = pairs.select(
        explode(array(col("i"), col("j"))).as("d"), col("jb"))
      val nd = broadcast(grid)
        .join(ends, col("jb") >= col("t_bp"))
        .groupBy("t_bp").agg(countDistinct(col("d")).as("n_docs"))
      grid.join(np, Seq("t_bp"), "left").join(nd, Seq("t_bp"), "left")
        .select(col("t_bp"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"))
        .orderBy("t_bp")
    }),

    // posting-list histogram — the stop-gram cap's planner evidence:
    // per integer-log2 bucket of 3-gram occurrence counts, how many
    // distinct grams and how much posting MASS sit there, plus the
    // above-cap (maxPostings = 1000) share. This is the number that
    // justifies (or re-tunes) the dedup tiers' occurrence guard on a
    // NEW corpus before any pair join runs: the over-cap mass is
    // exactly what sharedRuns is blind to and hotSegmentCuts covers.
    // Bucketing is length(bin(occ)) - 1 — pure integer floor(log2),
    // immune to the exact-power-of-two float-log2 rounding trap
    "q209_posting_histogram" -> ((spark, dir) =>
      Dedup.positionalShingles(Tables.load(spark, dir, "documents"), 3)
        .groupBy("gh").agg(count(lit(1)).as("occ"))
        .groupBy(expr("cast(length(bin(occ)) - 1 as bigint)").as("bucket"))
        .agg(count(lit(1)).as("n_grams"), sum("occ").as("n_postings"),
          sum(when(col("occ") > 1000L, 1L).otherwise(0L)).as("n_hot_grams"),
          sum(when(col("occ") > 1000L, col("occ")).otherwise(0L))
            .as("hot_postings"))
        .orderBy("bucket")),

    // LSH band-shape sensitivity curve — the q207 companion on the
    // OTHER dedup knob (see Dedup.bandCurve for the shape and the
    // scale caveat on its r=2 arm: full-corpus rendering is a
    // DIAGNOSTIC; production tuning runs the sampled q217)
    "q210_band_curve" -> ((spark, dir) =>
      Dedup.bandCurve(Tables.load(spark, dir, "documents"))),

    // the scale-safe band-shape curve: same statement over the
    // deterministic hash-bucket sample targeting 250 docs (derived ppm
    // = min(10^6, 250*10^6 / count) — at sf0.01's 500 docs the oracle
    // and engine both sample ~half; at a 100x corpus the curve sees
    // ~250 docs and the r=2 collision arm stays constant-cost)
    "q217_band_curve_sampled" -> ((spark, dir) =>
      Dedup.bandCurveSampled(Tables.load(spark, dir, "documents"))),

    // minRun sensitivity curve — the third dedup-knob curve beside
    // q207 (jaccard threshold) and q210 (band shape): ONE guarded
    // sharedRuns pass at the finest grain (maximal runs are maximal
    // whatever the threshold, so runs >= t is a FILTER of runs >= 10,
    // never a re-scan) rolled up per candidate minRun: how many shared
    // runs, how much run-token mass (pre-merge, so an upper bound on
    // cut tokens), and how many docs would take a cut — the evidence
    // for picking the scrub threshold on a new corpus
    "q211_minrun_curve" -> ((spark, dir) => {
      val runs = Dedup.sharedRuns(Tables.load(spark, dir, "documents"),
        n = 3, minRun = 10L, maxPostings = 1000L)
      val grid = spark.sql("SELECT explode(array(10L, 15L, 20L, 30L)) AS min_run")
      broadcast(grid).join(runs, col("run_tokens") >= col("min_run"), "left")
        .groupBy("min_run")
        .agg(count(col("run_tokens")).as("n_runs"),
          coalesce(sum(col("run_tokens")), lit(0L)).as("affected_tokens"),
          countDistinct(col("j")).as("n_cut_docs"))
        .orderBy("min_run")
    }),

    // SORTED-NEIGHBORHOOD near-dups (Hernández-Stolfo SNM): two
    // blocked sort passes (leading / reversed-trailing words), each
    // record compared only to its 4 sort successors, candidates
    // verified by exact Jaccard — the linear-candidate-volume
    // alternative to hash blocking
    "q141_sorted_neighborhood" -> ((spark, dir) =>
      Dedup.sortedNeighborhoodPairs(Tables.load(spark, dir, "documents"),
          n = 3, windowSize = 5, threshold = 0.7)
        .orderBy("i", "j")),

    "q28_dedup_simhash_sig" -> ((spark, dir) =>
      Dedup.simhashSignatures(Tables.load(spark, dir, "documents"), n = 3)
        .orderBy("doc_id")),

    "q29_dedup_simhash_pairs" -> ((spark, dir) =>
      Dedup.simhashPairs(Tables.load(spark, dir, "documents"), maxHamming = 10, n = 3)
        .orderBy("i", "j")),

    "q47_dedup_components" -> ((spark, dir) =>
      Components.connected(
          Dedup.nearDupEdges(Tables.load(spark, dir, "documents")))
        .orderBy("node")),

    // the dedup BUSINESS CASE in one table: per near-dup cluster size,
    // how many clusters, how many docs they hold, how many a min-keeper
    // policy drops, and the bytes those drops free — the report that
    // justifies (or kills) paying for the near-dup tier at 100 TB.
    // Rollup grain is cluster size (bounded), never docs.
    "q135_dedup_savings" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      dedupSavingsOf(docs, Components.connected(Dedup.nearDupEdges(docs)))
    }),

    // the STORED-COMPONENT rendering of q135 (r13): the savings report
    // reads the dedup job's persisted component map — the rollup a
    // storage owner refreshes per ingest without re-paying the chain
    // OR the closure; gated against q135's from-scratch oracle
    "q228_dedup_savings_stored" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      dedupSavingsOf(docs,
        spark.read.parquet(s"${corpusEdgesDir(spark, dir)}/components"))
    }),

    "q55_dedup_minhash_estimate" -> ((spark, dir) =>
      Dedup.minhashEstimatePairs(Tables.load(spark, dir, "documents"),
          n = 3, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
        .orderBy("i", "j")),

    // the decontamination audit every eval pipeline runs: near-dup pairs
    // whose endpoints landed in DIFFERENT splits (a test doc that is a
    // near-duplicate of a train doc contaminates the eval) — the
    // canonical edges joined with q56's deterministic split assignment
    "q69_contamination" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.load(spark, dir, "documents")
      val edges = Dedup.nearDupEdges(docs)
      val spl = graft.operators.Prep.split(docs).select(
        col("doc_id"), col("split"))
      edges
        .join(spl.select(col("doc_id").as("i"), col("split").as("split_i")), "i")
        .join(spl.select(col("doc_id").as("j"), col("split").as("split_j")), "j")
        .filter(col("split_i") =!= col("split_j"))
        .select("i", "j", "split_i", "split_j", "jaccard")
        .orderBy("i", "j")
    }),

    // external-eval decontamination: a deterministic 5% slice stands in
    // for a held-out benchmark; every remaining doc is screened for raw
    // word-3-gram collision with it (the published overlap procedure —
    // complements q69, which audits INTERNAL split leakage via edges)
    "q77_eval_decontam" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{col, expr}
      val withB = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"),
          (expr(Dedup.h60("concat('eval_', cast(doc_id as string))")) % 100)
            .cast("long").as("_b"))
      val eval = withB.filter(col("_b") < 5).select("doc_id", "text")
      val corpus = withB.filter(col("_b") >= 5).select("doc_id", "text")
      Dedup.evalOverlap(corpus, eval).orderBy("doc_id")
    }),

    // sub-document exact dedup: first occurrence of every distinct
    // 200-char chunk wins, later occurrences drop, docs reassemble from
    // kept chunks — the line-dedup pass at chunk grain
    "q80_chunk_dedup" -> ((spark, dir) =>
      Dedup.chunkDedup(Tables.load(spark, dir, "documents"), size = 200)
        .orderBy("doc_id")),

    // daily-ingest rendering: the newest ~20% of docs arrive as a delta
    // against the rest; result == the canonical edges that touch the
    // delta (the oracle recomputes the same cut from its own max(doc_id))
    "q62_incremental_dedup" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val nf = deltaCut(docs)
      Dedup.incrementalNearDupEdges(
        docs.filter(col("doc_id") < nf),
        docs.filter(col("doc_id") >= nf))
        .orderBy("i", "j")
    }),

    // the STORED-INDEX rendering of q62: yesterday's job persisted the
    // corpus' shingle+band frames (built once per sf-dir and reused
    // across reruns — artifact content is a pure function of the input,
    // so reuse can't change the result); the timed query is the ingest
    // pass itself, which shingles ONLY the delta. q62 vs q70 in the
    // bench record is exactly what the persisted index buys.
    "q70_incremental_dedup_indexed" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val nf = deltaCut(docs)
      val idx = Dedup.loadIndex(spark, corpusIndexDir(spark, dir))
      Dedup.incrementalNearDupEdgesIndexed(idx, docs.filter(col("doc_id") >= nf))
        .orderBy("i", "j")
    }),

    // asymmetric containment — a short doc quoted wholesale inside a
    // long one scores |A∩B|/min(|A|,|B|) ≈ 1 where symmetric Jaccard
    // stays low; the ground-truth tier for a containment-biased LSH
    "q92_containment" -> ((spark, dir) =>
      Dedup.containmentPairs(Tables.load(spark, dir, "documents"),
          n = 3, threshold = 0.9)
        .orderBy("i", "j")),

    "q93_winnow_pairs" -> ((spark, dir) =>
      Dedup.winnowingPairs(Tables.load(spark, dir, "documents"),
          n = 3, w = 4, minShared = 3L, maxPostings = 1000L)
        .orderBy("doc_a", "doc_b")),

    // exact substring-dedup grain: one row per MAXIMAL shared verbatim
    // token run >= 15 tokens between any doc pair — the repeated-SPAN
    // report doc-level tiers (q26/q27) structurally cannot produce
    "q108_shared_runs" -> ((spark, dir) =>
      Dedup.sharedRuns(Tables.load(spark, dir, "documents"),
          n = 3, minRun = 15L, maxPostings = 1000L)
        .orderBy(col("run_tokens").desc, col("i"), col("j"),
          col("start_i"), col("start_j"))),

    // the remediation over q108: later occurrence of every detected
    // shared run cut, overlapping cuts interval-merged, corpus
    // rewritten — single-pass (the corpus-level invariant is q111's)
    "q109_span_scrub" -> ((spark, dir) =>
      Dedup.scrubSharedRuns(Tables.load(spark, dir, "documents"),
          n = 3, minRun = 15L, maxPostings = 1000L)
        .orderBy("doc_id")),

    // q108's self-diagonal: maximal verbatim runs repeated WITHIN one
    // doc — the grain cross-doc pairing structurally misses. minRun 3
    // (the floor: minRun >= n) because the synthetic corpus's internal
    // repeats top out at 4 tokens and a gate over an empty result gates
    // nothing; long-run semantics are property-tested in DedupSpec
    "q110_self_runs" -> ((spark, dir) =>
      Dedup.selfRuns(Tables.load(spark, dir, "documents"),
          n = 3, minRun = 3L, maxPostings = 1000L)
        .orderBy(col("run_tokens").desc, col("doc_id"),
          col("start_i"), col("start_j"))),

    // 1-bit minhash estimate tier: 8-byte packed signatures (vs 240 for
    // the classic minima), candidates from the house 16-hash bands,
    // estimate = one XOR + popcount per pair
    "q116_bbit_minhash" -> ((spark, dir) =>
      Dedup.bbitMinhashPairs(Tables.load(spark, dir, "documents"),
          n = 3, numHashes = 60, rowsPerBand = 4, threshold = 0.5)
        .orderBy("i", "j")),

    // frequency-capped exact dedup: keep up to 2 copies per distinct
    // text — the natural-distribution middle ground between no dedup
    // and the single-keeper q24
    "q117_capped_dedup" -> ((spark, dir) =>
      Dedup.cappedDedup(Tables.load(spark, dir, "documents"), maxCopies = 2L)
        .orderBy("doc_id")),

    // EXACT similarity join via prefix filtering (AllPairs/PPJoin
    // family): complete by theorem, not probability — the oracle is
    // therefore the algorithm-independent ground truth (all pairs at
    // J >= 3/4 computed the brute-force way), gating completeness
    // itself, not a mirrored shadow of the pruning
    "q112_prefix_join" -> ((spark, dir) =>
      Dedup.prefixJaccardPairs(Tables.load(spark, dir, "documents"),
          n = 3, tNum = 3L, tDen = 4L)
        .orderBy("i", "j")),

    // per-doc shingle novelty at ingest order — the marginal-value
    // curve of a corpus (novelty_ppm -> 0 across a snapshot is the
    // saturation signal to drop a source before paying dedup cost)
    "q113_novelty" -> ((spark, dir) =>
      Dedup.noveltyProfile(Tables.load(spark, dir, "documents"), n = 3)
        .orderBy("doc_id")),

    // fixpoint scrub: cut-and-rescan (cross-doc + within-doc + hot-
    // segment families) until no duplicated run >= minRun remains
    // detectable — the corpus-level invariant q109's single pass
    // cannot claim. Driver-loop iteration count is data-dependent, so
    // no single-statement oracle exists: rows-only here; the invariant
    // and the adversarial corpora (flank fusion, within-doc repeats,
    // guarded hot boilerplate) are property-tested in DedupSpec.
    "q111_scrub_fixpoint" -> ((spark, dir) =>
      Dedup.scrubRunsFixpoint(Tables.load(spark, dir, "documents"),
          n = 3, minRun = 15L, maxPostings = 1000L)
        .orderBy("doc_id")),

    // q111's GATED twin: exactly 2 scrub rounds instead of run-to-
    // convergence — the round count is a constant of the query, so the
    // whole tier unrolls into one SQL statement and hash-gates
    // end-to-end (the fixpoint face stays the production entry; the
    // agreement law fixed ≡ fixpoint when convergence ≤ rounds is in
    // DedupSpec)
    "q111b_scrub_fixed2" -> ((spark, dir) =>
      Dedup.scrubRunsFixed(Tables.load(spark, dir, "documents"),
          n = 3, minRun = 15L, maxPostings = 1000L, rounds = 2)
        .orderBy("doc_id")),

    // syndication audit: canonical near-dup pairs whose endpoints come
    // from DIFFERENT sources — the same content crawled twice under two
    // domains, the cross-SOURCE reading of q69's cross-split audit (a
    // mix that counts both copies as distinct sources double-weights
    // the text); edges ⋈ a narrow (doc_id, source) projection twice
    "q104_syndication" -> ((spark, dir) => {
      val docs = Tables.load(spark, dir, "documents")
      val src = docs.select(col("doc_id"), col("source"))
      Dedup.nearDupEdges(docs)
        .join(src.select(col("doc_id").as("i"), col("source").as("src_i")), "i")
        .join(src.select(col("doc_id").as("j"), col("source").as("src_j")), "j")
        .filter(col("src_i") =!= col("src_j"))
        .select("i", "j", "jaccard", "src_i", "src_j")
        .orderBy("i", "j")
    }),

    // agreement audit between the two dedup FAMILIES: the lexical
    // near-dup clusters (q47's components over the canonical MinHash
    // edges) vs the strict semantic clusters (q59's SemDeDup regime) —
    // the contingency table a pipeline owner reads before deciding which
    // tier to pay for at full scale. Docs without an embedding count as
    // sem_dup = 0 (nothing to semantically dedup).
    "q86_dedup_agreement" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{coalesce, count, lit}
      val docs = Tables.load(spark, dir, "documents")
      // the lexical and semantic chains are independent until the final
      // join — build them concurrently so their iterative convergence
      // loops' jobs back-fill each other (guide §2.6; r15)
      val (lex, sem) = graft.operators.Par.both(
        Components
          .connected(Dedup.nearDupEdges(docs))
          .withColumnRenamed("node", "doc_id"),
        graft.operators.Similarity
          .semanticDedup(Tables.load(spark, dir, "embeddings"),
            threshold = 0.4, tables = 16, bits = 8, dim = 64)
          .select(col("vec_id").as("doc_id"), col("kept")))
      docs.select("doc_id")
        .join(lex, Seq("doc_id"), "left")
        .join(sem, Seq("doc_id"), "left")
        .select(
          (coalesce(col("component"), col("doc_id")) =!= col("doc_id"))
            .cast("bigint").as("lex_dup"),
          (coalesce(col("kept"), lit(1L)) === 0).cast("bigint").as("sem_dup"))
        .groupBy("lex_dup", "sem_dup").agg(count(lit(1)).as("n_docs"))
        .orderBy("lex_dup", "sem_dup")
    }),

    // the STORED-ARTIFACT rendering of q86 (VERDICT r11 ask #4): the
    // agreement table READS yesterday's persisted COMPONENT assignment
    // (the dedup job runs the iterative closure once and stores it —
    // VERDICT r12 ask #2; re-deriving it per read paid O(|E|) every
    // dashboard refresh, measured 9.7 s at 100× vs q218's flat 0.5 s)
    // and semantic keeper assignment instead of re-running either chain
    // inline — the contingency report is a join + rollup over two
    // narrow artifacts, which is how it runs at 100 TB. Gated against
    // q86's from-scratch oracle: stored ≡ recomputed, driver-enforced.
    "q219_dedup_agreement_stored" -> ((spark, dir) => {
      import org.apache.spark.sql.functions.{coalesce, count, lit}
      val docs = Tables.load(spark, dir, "documents")
      val lex = spark.read
        .parquet(s"${corpusEdgesDir(spark, dir)}/components")
        .withColumnRenamed("node", "doc_id")
      val sem = spark.read.parquet(s"${semAssignDir(spark, dir)}/semantic04")
      docs.select("doc_id")
        .join(lex, Seq("doc_id"), "left")
        .join(sem, Seq("doc_id"), "left")
        .select(
          (coalesce(col("component"), col("doc_id")) =!= col("doc_id"))
            .cast("bigint").as("lex_dup"),
          (coalesce(col("kept"), lit(1L)) === 0).cast("bigint").as("sem_dup"))
        .groupBy("lex_dup", "sem_dup").agg(count(lit(1)).as("n_docs"))
        .orderBy("lex_dup", "sem_dup")
    }))

  /** q135/q228 rollup over a (node, component) assignment: per cluster
    * size, cluster count and the doc/byte mass a min-keeper policy
    * frees. ONE definition so the inline and stored renderings cannot
    * drift. Component label IS the min-id keeper, so non-keepers are
    * the nodes that differ from their label.
    */
  private def dedupSavingsOf(
      docs: org.apache.spark.sql.DataFrame,
      comp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sized = comp.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    val dropped = comp.filter(col("node") =!= col("component"))
      .join(docs.select(col("doc_id").as("node"), col("n_chars")), "node")
      .groupBy("component").agg(sum(col("n_chars")).as("b"))
    sized.join(dropped, Seq("component"), "left")
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        sum(coalesce(col("b"), lit(0L))).cast("long").as("bytes_dropped"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1L) * col("n_clusters")).as("n_dropped"),
        col("bytes_dropped"))
      .orderBy("cluster_size")
  }

  /** "Yesterday's semantic job" for q219: persist the q86-config
    * SemDeDup keeper assignment once per sf-dir per JVM.
    */
  private val semCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def semAssignDir(spark: SparkSession, dir: String): String =
    cachedIndexDir(semCache, dir, "graft_sem04_") { d =>
      graft.operators.Similarity
        .semanticDedup(Tables.load(spark, dir, "embeddings"),
          threshold = 0.4, tables = 16, bits = 8, dim = 64)
        .select(col("vec_id").as("doc_id"), col("kept"))
        .write.mode("overwrite").parquet(s"$d/semantic04")
    }

  /** "Yesterday's job" for q70: write the below-the-cut corpus' near-dup
    * index to a temp dir, once per sf-dir per JVM.
    */
  private val ndIdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def corpusIndexDir(spark: SparkSession, dir: String): String =
    cachedIndexDir(ndIdxCache, dir, "graft_nd_idx_") { d =>
      val docs = Tables.load(spark, dir, "documents")
      Dedup.writeIndex(docs.filter(col("doc_id") < deltaCut(docs)), d)
    }

  def oracles: Map[String, String] = Map(
    "q26_dedup_ngram" ->
      s"""WITH $ShinglesSql,
         |$JaccardSql
         |SELECT i, j, round(jaccard, 4) AS jaccard
         |FROM jac WHERE jaccard >= 0.8
         |ORDER BY i, j""".stripMargin,

    // same two SNM passes: row_number within the block sorted by the
    // derived key, neighbors at rank distance 1..4, least/greatest
    // normalization, union-distinct, exact-Jaccard verify
    "q141_sorted_neighborhood" ->
      s"""WITH $ShinglesSql,
         |r0 AS (SELECT doc_id,
         |              row_number() OVER (PARTITION BY w[1]
         |                ORDER BY array_to_string(w[1:4], ' '), doc_id) AS rn,
         |              w[1] AS blk
         |       FROM ws WHERE len(w) >= 1),
         |r1 AS (SELECT doc_id,
         |              row_number() OVER (PARTITION BY w[-1]
         |                ORDER BY array_to_string(list_reverse(w)[1:4], ' '),
         |                         doc_id) AS rn,
         |              w[-1] AS blk
         |       FROM ws WHERE len(w) >= 1),
         |c0 AS (SELECT least(a.doc_id, b.doc_id) AS i,
         |              greatest(a.doc_id, b.doc_id) AS j
         |       FROM r0 a JOIN r0 b
         |         ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 4),
         |c1 AS (SELECT least(a.doc_id, b.doc_id) AS i,
         |              greatest(a.doc_id, b.doc_id) AS j
         |       FROM r1 a JOIN r1 b
         |         ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 4),
         |cand AS (SELECT DISTINCT i, j FROM
         |         (SELECT * FROM c0 UNION ALL SELECT * FROM c1)),
         |$JaccardSql
         |SELECT jac.i, jac.j, round(jac.jaccard, 4) AS jaccard
         |FROM jac JOIN cand ON jac.i = cand.i AND jac.j = cand.j
         |WHERE jac.jaccard >= 0.7
         |ORDER BY jac.i, jac.j""".stripMargin,

    "q27_dedup_minhash" ->
      s"""WITH $ShinglesSql,
         |$MinhashCandSql,
         |$JaccardSql
         |SELECT jac.i, jac.j, round(jac.jaccard, 4) AS jaccard
         |FROM jac JOIN cand ON jac.i = cand.i AND jac.j = cand.j
         |WHERE jac.jaccard >= 0.7
         |ORDER BY jac.i, jac.j""".stripMargin,

    // q27's chain opened down to 0.5 and rolled up per grid threshold:
    // the unrounded-jaccard admission filter and the basis-point round
    // mirror the engine exactly (round to 4 dp FIRST, then scale)
    "q207_threshold_curve" ->
      s"""WITH $ShinglesSql,
         |$MinhashCandSql,
         |$JaccardSql,
         |vp AS (SELECT jac.i, jac.j,
         |         CAST(round(round(jac.jaccard, 4) * 10000) AS BIGINT) AS jb
         |       FROM jac JOIN cand ON jac.i = cand.i AND jac.j = cand.j
         |       WHERE jac.jaccard >= 0.5),
         |grid AS (SELECT CAST(unnest([5000, 6000, 7000, 8000, 9000]) AS BIGINT)
         |           AS t_bp),
         |np AS (SELECT g.t_bp, count(*) AS n_pairs
         |       FROM grid g JOIN vp ON vp.jb >= g.t_bp GROUP BY 1),
         |ends AS (SELECT i AS d, jb FROM vp UNION ALL SELECT j, jb FROM vp),
         |nd AS (SELECT g.t_bp, count(DISTINCT d) AS n_docs
         |       FROM grid g JOIN ends e ON e.jb >= g.t_bp GROUP BY 1)
         |SELECT g.t_bp,
         |       CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
         |       CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs
         |FROM grid g LEFT JOIN np USING (t_bp) LEFT JOIN nd USING (t_bp)
         |ORDER BY g.t_bp""".stripMargin,

    // occurrence counts over the POSITIONAL gram stream (duplicates
    // kept — the sharedRuns guard's own grain), integer-log2 bucketed
    // via the binary-string length (no float log2 at powers of two)
    "q209_posting_histogram" ->
      s"""WITH $ShinglesSql,
         |pocc AS (SELECT gh, count(*) AS occ FROM (
         |    SELECT CAST('0x' || substr(md5(concat_ws(' ', w[i], w[i+1], w[i+2])), 1, 15)
         |           AS BIGINT) AS gh
         |    FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
         |    WHERE len(w) >= 3) GROUP BY gh)
         |SELECT CAST(length(bin(occ)) - 1 AS BIGINT) AS bucket,
         |       count(*) AS n_grams, CAST(sum(occ) AS BIGINT) AS n_postings,
         |       CAST(sum(CASE WHEN occ > 1000 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_hot_grams,
         |       CAST(sum(CASE WHEN occ > 1000 THEN occ ELSE 0 END) AS BIGINT)
         |         AS hot_postings
         |FROM pocc GROUP BY 1 ORDER BY bucket""".stripMargin,

    // one shared signature family banded three ways (prefixed CTEs),
    // the shared verify tail counted per config — band shape is the
    // only variable, exactly as the engine's bandPool scheme
    "q210_band_curve" ->
      s"""WITH $ShinglesSql,
         |${minhashCandSql(16, 2, "r2")},
         |${minhashCandSql(16, 4, "r4")},
         |${minhashCandSql(16, 8, "r8")},
         |$JaccardSql,
         |curve AS (
         |  SELECT CAST(2 AS BIGINT) AS rows_per_band, CAST(8 AS BIGINT) AS bands,
         |         (SELECT count(*) FROM r2cand) AS n_candidates,
         |         (SELECT count(*) FROM r2cand JOIN jac USING (i, j)
         |          WHERE jaccard >= 0.7) AS n_verified
         |  UNION ALL
         |  SELECT CAST(4 AS BIGINT), CAST(4 AS BIGINT),
         |         (SELECT count(*) FROM r4cand),
         |         (SELECT count(*) FROM r4cand JOIN jac USING (i, j)
         |          WHERE jaccard >= 0.7)
         |  UNION ALL
         |  SELECT CAST(8 AS BIGINT), CAST(2 AS BIGINT),
         |         (SELECT count(*) FROM r8cand),
         |         (SELECT count(*) FROM r8cand JOIN jac USING (i, j)
         |          WHERE jaccard >= 0.7))
         |SELECT rows_per_band, bands, n_candidates, n_verified,
         |       CASE WHEN n_candidates > 0
         |            THEN n_verified * 1000000 // n_candidates END AS precision_ppm
         |FROM curve ORDER BY rows_per_band""".stripMargin,

    // q210's statement over the hash-bucket sample: the salted md5 mod
    // 10^6 membership with ppm DERIVED from count(*) (min(10^6,
    // target*10^6 // n) — integer floor both sides) is the engine's
    // exact filter, so the oracle reproduces the sample bit-for-bit
    // before the identical banded curve. Target and salt interpolate
    // from the Dedup constants the engine defaults to — one definition,
    // no silent drift.
    "q217_band_curve_sampled" ->
      s"""WITH sdocs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE CAST('0x' || substr(md5('${Dedup.BandCurveSalt}_' || CAST(doc_id AS VARCHAR)), 1, 15)
         |             AS BIGINT) % 1000000
         |        < least(1000000, ${Dedup.BandCurveTargetDocs} * 1000000 // (SELECT count(*) FROM documents))),
         |${shinglesSql("sdocs")},
         |${minhashCandSql(16, 2, "r2")},
         |${minhashCandSql(16, 4, "r4")},
         |${minhashCandSql(16, 8, "r8")},
         |$JaccardSql,
         |curve AS (
         |  SELECT CAST(2 AS BIGINT) AS rows_per_band, CAST(8 AS BIGINT) AS bands,
         |         (SELECT count(*) FROM r2cand) AS n_candidates,
         |         (SELECT count(*) FROM r2cand JOIN jac USING (i, j)
         |          WHERE jaccard >= 0.7) AS n_verified
         |  UNION ALL
         |  SELECT CAST(4 AS BIGINT), CAST(4 AS BIGINT),
         |         (SELECT count(*) FROM r4cand),
         |         (SELECT count(*) FROM r4cand JOIN jac USING (i, j)
         |          WHERE jaccard >= 0.7)
         |  UNION ALL
         |  SELECT CAST(8 AS BIGINT), CAST(2 AS BIGINT),
         |         (SELECT count(*) FROM r8cand),
         |         (SELECT count(*) FROM r8cand JOIN jac USING (i, j)
         |          WHERE jaccard >= 0.7))
         |SELECT rows_per_band, bands, n_candidates, n_verified,
         |       CASE WHEN n_candidates > 0
         |            THEN n_verified * 1000000 // n_candidates END AS precision_ppm
         |FROM curve ORDER BY rows_per_band""".stripMargin,

    // the un-thresholded maximal-run relation rolled up per grid
    // threshold; LEFT JOIN keeps zero-count thresholds visible
    "q211_minrun_curve" ->
      s"""WITH $SharedRunsSql,
         |grid AS (SELECT CAST(unnest([10, 15, 20, 30]) AS BIGINT) AS min_run),
         |agg AS (SELECT g.min_run, count(*) AS n_runs,
         |               CAST(sum(r.run_tokens) AS BIGINT) AS affected_tokens,
         |               CAST(count(DISTINCT r.j) AS BIGINT) AS n_cut_docs
         |        FROM grid g JOIN runs r ON r.run_tokens >= g.min_run
         |        GROUP BY 1)
         |SELECT g.min_run, CAST(coalesce(a.n_runs, 0) AS BIGINT) AS n_runs,
         |       CAST(coalesce(a.affected_tokens, 0) AS BIGINT) AS affected_tokens,
         |       CAST(coalesce(a.n_cut_docs, 0) AS BIGINT) AS n_cut_docs
         |FROM grid g LEFT JOIN agg a USING (min_run)
         |ORDER BY min_run""".stripMargin,

    // q27's canonical edges with the endpoint sources joined on and
    // same-source pairs dropped
    "q104_syndication" ->
      s"""WITH $ShinglesSql,
         |$MinhashCandSql,
         |$JaccardSql
         |SELECT jac.i, jac.j, round(jac.jaccard, 4) AS jaccard,
         |       da.source AS src_i, db.source AS src_j
         |FROM jac JOIN cand ON jac.i = cand.i AND jac.j = cand.j
         |JOIN documents da ON jac.i = da.doc_id
         |JOIN documents db ON jac.j = db.doc_id
         |WHERE jac.jaccard >= 0.7 AND da.source != db.source
         |ORDER BY jac.i, jac.j""".stripMargin,

    "q28_dedup_simhash_sig" ->
      s"""WITH $ShinglesSql,
         |$SimhashSql
         |SELECT doc_id, simhash FROM sims
         |ORDER BY doc_id""".stripMargin,

    // blocked + capped candidates, then exact Hamming — the same shape
    // the engine's default simhashPairs runs (the brute-force scan this
    // oracle replaced survives as DedupSpec's no-false-negatives law)
    "q29_dedup_simhash_pairs" ->
      s"""WITH $ShinglesSql,
         |$SimhashSql,
         |$SimhashCandSql
         |SELECT i, j, CAST(bit_count(xor(si, sj)) AS BIGINT) AS hamming
         |FROM scand
         |WHERE bit_count(xor(si, sj)) <= 10
         |ORDER BY i, j""".stripMargin,

    // q27's pipeline produces the edges; min-reachable-id per node via a
    // recursive closure (oracle scale) == the engine's iterative
    // min-label propagation.
    "q47_dedup_components" ->
      s"""WITH RECURSIVE $ShinglesSql,
         |$NearDupPairsSql,
         |${closureSql("pairs")}
         |SELECT node, component
         |FROM comp
         |ORDER BY node""".stripMargin,

    // q47's closure rolled up to cluster-size grain with the
    // non-keeper byte totals
    "q135_dedup_savings" -> DedupSavingsSql,
    // the stored-component rendering answers to the same from-scratch
    // oracle — stored ≡ recomputed at savings grain, driver-enforced
    "q228_dedup_savings_stored" -> DedupSavingsSql,

    // Exact verified Jaccard on the canonical edges, joined with the
    // SHARED q56 split CTE (PrepQueries.SplitCteSql) — only pairs whose
    // endpoints landed in different splits survive.
    "q77_eval_decontam" ->
      s"""WITH b AS (
         |  SELECT doc_id, text,
         |         CAST('0x' || substr(md5('eval_' || CAST(doc_id AS VARCHAR)), 1, 15)
         |              AS BIGINT) % 100 AS bkt
         |  FROM documents),
         |ev AS (SELECT doc_id, text FROM b WHERE bkt < 5),
         |tr AS (SELECT doc_id, text FROM b WHERE bkt >= 5),
         |${shinglesSql("ev", "ev")},
         |${shinglesSql("tr", "tr")},
         |eg AS (SELECT DISTINCT gh FROM evsh),
         |c AS (SELECT t.doc_id, count(*) AS n FROM trsh t JOIN eg USING (gh)
         |      GROUP BY t.doc_id)
         |SELECT tr.doc_id,
         |       CAST(coalesce(c.n, 0) AS BIGINT) AS shared_grams,
         |       CAST(CASE WHEN coalesce(c.n, 0) >= 1 THEN 1 ELSE 0 END AS BIGINT)
         |         AS contaminated
         |FROM tr LEFT JOIN c ON tr.doc_id = c.doc_id
         |ORDER BY tr.doc_id""".stripMargin,

    // mirrors chunkDedup: non-overlapping 200-char chunks (the q67
    // chunker at overlap 0), first (doc_id, chunk_id) per distinct
    // chunk wins, kept chunks reassemble in chunk order
    "q80_chunk_dedup" ->
      """WITH starts AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, greatest(1, len(text)), 200)) AS start
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, CAST((start - 1) // 200 AS BIGINT) AS chunk_id,
        |         substr(text, CAST(start AS INTEGER), 200) AS chunk
        |  FROM starts),
        |k AS (
        |  SELECT doc_id, chunk_id, chunk,
        |         row_number() OVER (PARTITION BY chunk
        |           ORDER BY doc_id, chunk_id) AS rn
        |  FROM ch)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ''
        |                           ORDER BY chunk_id), '') AS text_clean
        |FROM k
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q69_contamination" ->
      s"""WITH $ShinglesSql,
         |$NearDupPairsSql,
         |jp AS (SELECT p.i, p.j, round(jac.jaccard, 4) AS jaccard
         |       FROM pairs p JOIN jac ON p.i = jac.i AND p.j = jac.j),
         |${PrepQueries.SplitCteSql}
         |SELECT jp.i, jp.j, si.split AS split_i, sj.split AS split_j, jp.jaccard
         |FROM jp
         |JOIN spl si ON jp.i = si.doc_id
         |JOIN spl sj ON jp.j = sj.doc_id
         |WHERE si.split <> sj.split
         |ORDER BY jp.i, jp.j""".stripMargin,

    // Same CTE chain as q27; the delta cut (floor of 0.8 · max id) makes
    // "pair touches the delta" equivalent to j >= nf because pairs are
    // (min, max)-normalized and delta ids are the high range.
    "q62_incremental_dedup" -> IncrementalEdgesSql,

    // the stored-index rendering is output-identical by contract — the
    // SAME oracle gates it, enforcing stored ≡ recomputed at hash level
    "q70_incremental_dedup_indexed" -> IncrementalEdgesSql,

    // Sketch-only verification: same banded candidates as q27, but the
    // "Jaccard" is the signature agreement fraction — the sig CTE is the
    // only thing rejoined, never the shingle sets.
    "q55_dedup_minhash_estimate" ->
      s"""WITH $ShinglesSql,
         |$MinhashCandSql,
         |est AS (SELECT c.i, c.j,
         |               CAST(sum(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END) AS DOUBLE)
         |                 / 16 AS est
         |        FROM cand c
         |        JOIN sig sa ON c.i = sa.doc_id
         |        JOIN sig sb ON c.j = sb.doc_id AND sa.s = sb.s
         |        GROUP BY c.i, c.j)
         |SELECT i, j, round(est, 4) AS est_jaccard
         |FROM est WHERE est >= 0.5
         |ORDER BY i, j""".stripMargin,

    // the shingle + posting-list chain shared with q26; containment
    // divides the intersection by the SMALLER set size
    "q92_containment" ->
      s"""WITH $ShinglesSql,
         |$JaccardSql
         |SELECT ix.i, ix.j, s1.n AS n_i, s2.n AS n_j, ix.c AS inter,
         |       round(CAST(ix.c AS DOUBLE) / least(s1.n, s2.n), 4) AS containment
         |FROM inter ix
         |JOIN sz s1 ON ix.i = s1.doc_id
         |JOIN sz s2 ON ix.j = s2.doc_id
         |WHERE CAST(ix.c AS DOUBLE) / least(s1.n, s2.n) >= 0.9
         |ORDER BY i, j""".stripMargin,

    // winnowing (robust rule: per-window min hash, ties to the RIGHTMOST
    // position) rendered 1-based: np = gram count, window starts s in
    // [1, max(np-w+1, 1)], each gram fans to the w windows it falls in;
    // fingerprints in > maxPostings docs are dropped before the pair
    // join, denominators stay the FULL fingerprint sets — both mirroring
    // Dedup.winnowingPairs exactly
    "q93_winnow_pairs" ->
      s"""WITH pws AS (SELECT doc_id,
         |                     list_filter(string_split_regex(trim(text), '\\s+'),
         |                                 x -> x <> '') AS w
         |             FROM documents),
         |pos AS (SELECT doc_id, i,
         |          CAST('0x' || substr(md5(concat_ws(' ', w[i], w[i+1], w[i+2])), 1, 15) AS BIGINT) AS gh,
         |          len(w) - 2 AS np
         |        FROM pws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
         |        WHERE len(w) >= 3),
         |sel AS (SELECT doc_id, gh
         |        FROM (SELECT p.doc_id, p.gh, p.i, p.i - o.off AS s, p.np
         |              FROM pos p, UNNEST(generate_series(0, 3)) AS o(off)) x
         |        WHERE s >= 1 AND s <= greatest(np - 3, 1)
         |        QUALIFY row_number() OVER (PARTITION BY doc_id, s
         |                                   ORDER BY gh ASC, i DESC) = 1),
         |fp AS (SELECT DISTINCT doc_id, gh FROM sel),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp FROM fp GROUP BY doc_id),
         |rare AS (SELECT gh FROM fp GROUP BY gh HAVING count(*) <= 1000),
         |kept AS (SELECT fp.doc_id, fp.gh FROM fp JOIN rare USING (gh)),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                 CAST(count(*) AS BIGINT) AS shared
         |          FROM kept a JOIN kept b
         |            ON a.gh = b.gh AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2 HAVING count(*) >= 3)
         |SELECT p.doc_a, p.doc_b, p.shared, s1.nfp AS nfp_a, s2.nfp AS nfp_b,
         |       round(CAST(p.shared AS DOUBLE) / least(s1.nfp, s2.nfp), 4) AS overlap
         |FROM pairs p
         |JOIN sz s1 ON p.doc_a = s1.doc_id
         |JOIN sz s2 ON p.doc_b = s2.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // positional 3-gram shingles (0-based pos = i-1, mirroring the
    // engine's positionalShingles), occurrence-capped stop-gram guard,
    // gram matches grouped into maximal diagonal runs — the shared CTE
    // chain of q108/q109
    "q108_shared_runs" ->
      s"""WITH $SharedRunsSql
         |SELECT i, j, start_i, start_j, run_tokens
         |FROM runs WHERE run_tokens >= 15
         |ORDER BY run_tokens DESC, i, j, start_i, start_j""".stripMargin,

    // q108's remediation: cut spans on the later (j) side, interval-
    // merged per doc (running-max islands), tokens outside every merged
    // span rejoined in order; token-free docs carry 0/'' via the outer
    // join (ws already filters empty tokens — exact engine parity)
    "q109_span_scrub" ->
      s"""WITH $SharedRunsSql,
         |spans AS (SELECT j AS doc_id, start_j AS s,
         |                 start_j + run_tokens AS e
         |          FROM runs WHERE run_tokens >= 15),
         |mrg0 AS (SELECT doc_id, s, e,
         |                max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |                  AS pmax
         |         FROM spans),
         |mrg1 AS (SELECT doc_id, s, e,
         |                sum(CASE WHEN pmax IS NULL OR s > pmax
         |                         THEN 1 ELSE 0 END)
         |                  OVER (PARTITION BY doc_id ORDER BY s, e
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                  AS isl2
         |         FROM mrg0),
         |mrg AS (SELECT doc_id, min(s) AS s, max(e) AS e
         |        FROM mrg1 GROUP BY doc_id, isl2),
         |toks AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
         |         FROM ws, UNNEST(generate_series(1, len(w))) AS t(i)),
         |dropped AS (SELECT doc_id, unnest(generate_series(s, e - 1)) AS pos
         |            FROM mrg),
         |keptt AS (SELECT t.doc_id, t.pos, t.word
         |          FROM toks t LEFT JOIN dropped d
         |            ON t.doc_id = d.doc_id AND t.pos = d.pos
         |          WHERE d.pos IS NULL),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nk,
         |               string_agg(word, ' ' ORDER BY pos) AS kept
         |        FROM keptt GROUP BY doc_id),
         |nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM ws)
         |SELECT n.doc_id, n.n_tokens,
         |       n.n_tokens - coalesce(a.nk, 0) AS n_dropped,
         |       coalesce(a.kept, '') AS text_clean
         |FROM nt n LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // the SAME parameterized candidate chain as q27's oracles (one
    // definition — minhashCandSql — so the house LSH scheme cannot
    // drift between the q27 family and this gate), extended to 60
    // seeds; packed bit signature and popcount agreement rendered in
    // DuckDB's own operators — the whole estimate surface is hash-gated
    "q116_bbit_minhash" ->
      s"""WITH $ShinglesSql,
         |${minhashCandSql(60)},
         |bb AS (SELECT doc_id,
         |              CAST(sum((minh % 2) * (CAST(1 AS BIGINT) << s)) AS BIGINT) AS bsig
         |       FROM sig GROUP BY doc_id)
         |SELECT c.i, c.j,
         |       round(greatest(0.0,
         |         (2.0 * (60 - bit_count(xor(x.bsig, y.bsig))) - 60) / 60), 4)
         |         AS est_jaccard
         |FROM cand c
         |JOIN bb x ON c.i = x.doc_id
         |JOIN bb y ON c.j = y.doc_id
         |WHERE round(greatest(0.0,
         |        (2.0 * (60 - bit_count(xor(x.bsig, y.bsig))) - 60) / 60), 4) >= 0.5
         |ORDER BY i, j""".stripMargin,

    // one hash + one window: rank copies of each distinct text by
    // doc_id, keep bit at rank <= 2
    "q117_capped_dedup" ->
      """SELECT doc_id, md5(text) AS fingerprint,
        |       CAST(row_number() OVER (PARTITION BY md5(text)
        |                               ORDER BY doc_id) AS BIGINT) AS copy_rank,
        |       CAST(CASE WHEN row_number() OVER (PARTITION BY md5(text)
        |                                         ORDER BY doc_id) <= 2
        |                 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // q112's gate is deliberately NOT a mirror of prefix filtering:
    // exact pairwise Jaccard at the same rational threshold — if the
    // prefix scheme ever drops a qualifying pair, the hash mismatches
    "q112_prefix_join" ->
      s"""WITH $ShinglesSql,
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
         |          FROM sh a JOIN sh b
         |            ON a.gh = b.gh AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT ix.i, ix.j,
         |       round(ix.c * 1.0 / (s1.n + s2.n - ix.c), 4) AS jaccard
         |FROM inter ix
         |JOIN sz s1 ON ix.i = s1.doc_id
         |JOIN sz s2 ON ix.j = s2.doc_id
         |WHERE ix.c * 4 >= 3 * (s1.n + s2.n - ix.c)
         |ORDER BY i, j""".stripMargin,

    // linear first-occurrence profile: one min per shingle, one join
    // back, integer-div ppm (both engines' BIGINT division)
    "q113_novelty" ->
      s"""WITH $ShinglesSql,
         |fst AS (SELECT gh, min(doc_id) AS fd FROM sh GROUP BY gh),
         |per AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS ns,
         |               CAST(sum(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END)
         |                    AS BIGINT) AS nn
         |        FROM sh s JOIN fst f USING (gh) GROUP BY s.doc_id)
         |SELECT d.doc_id, coalesce(p.ns, 0) AS n_shingles,
         |       coalesce(p.nn, 0) AS n_novel,
         |       CASE WHEN p.ns > 0 THEN (p.nn * 1000000) // p.ns END
         |         AS novelty_ppm
         |FROM documents d LEFT JOIN per p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // two full scrub rounds unrolled: round `a` over documents, round
    // `b` over round a's rewritten text; cumulative drops summed, final
    // text from round b. Each round is ONE shared scrubRoundSql chain —
    // all three span families (cross-doc, self-diagonal, hot-segment)
    // over one positional-gram state, exactly the engine's round.
    "q111b_scrub_fixed2" ->
      (s"WITH ${scrubRoundSql("documents", "a")},\n" +
        "bin AS (SELECT doc_id, text_clean AS text FROM aout),\n" +
        s"${scrubRoundSql("bin", "b")}\n" +
        """SELECT a.doc_id, a.n_tokens,
          |       a.n_dropped + b.n_dropped AS n_dropped,
          |       b.text_clean
          |FROM aout a JOIN bout b USING (doc_id)
          |ORDER BY a.doc_id""".stripMargin),

    // the self-diagonal twin of q108: same positional-gram chain, the
    // pair join restricted to one doc matched against itself at
    // pos_i < pos_j (within a (doc, diag) partition pi determines pj,
    // so the islands row_number is deterministic)
    "q110_self_runs" ->
      s"""WITH $SharedRunsSql,
         |sm AS (SELECT a.doc_id, a.pos AS pi, b.pos AS pj,
         |              a.pos - b.pos AS diag
         |       FROM keptg a JOIN keptg b
         |         ON a.gh = b.gh AND a.doc_id = b.doc_id AND a.pos < b.pos),
         |sisl AS (SELECT doc_id, diag, pi, pj,
         |                pi - row_number() OVER (PARTITION BY doc_id, diag
         |                                        ORDER BY pi) AS island
         |         FROM sm),
         |sruns AS (SELECT doc_id, min(pi) AS start_i, min(pj) AS start_j,
         |                 CAST(count(*) + 2 AS BIGINT) AS run_tokens
         |          FROM sisl GROUP BY doc_id, diag, island)
         |SELECT doc_id, start_i, start_j, run_tokens
         |FROM sruns WHERE run_tokens >= 3
         |ORDER BY run_tokens DESC, doc_id, start_i, start_j""".stripMargin,

    // both family chains verbatim (q47's lexical closure, q54's weak
    // semantic chain prefixed `s`), joined into the contingency table
    "q86_dedup_agreement" -> DedupAgreementSql,
    // the stored-artifact agreement answers to the same from-scratch
    // oracle — stored ≡ recomputed, driver-enforced
    "q219_dedup_agreement_stored" -> DedupAgreementSql)

  /** q86/q219: both dedup families from scratch, contingency-rolled —
    * one oracle rendering for the inline and stored gates.
    */
  /** q135/q228: the canonical chain + recursive closure, rolled up per
    * cluster size with min-keeper savings — ONE oracle rendering for
    * the inline and stored-component gates.
    */
  private lazy val DedupSavingsSql: String =
    s"""WITH RECURSIVE $ShinglesSql,
       |$NearDupPairsSql,
       |${closureSql("pairs")},
       |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM comp GROUP BY component),
       |bd AS (SELECT c.component, CAST(sum(d.n_chars) AS BIGINT) AS b
       |       FROM comp c JOIN documents d ON c.node = d.doc_id
       |       WHERE c.node != c.component GROUP BY c.component)
       |SELECT cs.cluster_size,
       |       CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(cs.cluster_size * count(*) AS BIGINT) AS n_docs,
       |       CAST((cs.cluster_size - 1) * count(*) AS BIGINT) AS n_dropped,
       |       CAST(coalesce(sum(bd.b), 0) AS BIGINT) AS bytes_dropped
       |FROM cs LEFT JOIN bd USING (component)
       |GROUP BY cs.cluster_size
       |ORDER BY cs.cluster_size""".stripMargin

  private lazy val DedupAgreementSql: String =
      s"""WITH RECURSIVE $ShinglesSql,
         |$NearDupPairsSql,
         |${closureSql("pairs")},
         |${SimilarityQueries.VecSql},
         |${SimilarityQueries.lshCandSql(16, 8, "s")},
         |spairs AS (
         |  SELECT i, j FROM (
         |    SELECT i, j, ${SimilarityQueries.cosSql("a.e", "b.e")} AS cos
         |    FROM scand JOIN v a ON i = a.vec_id JOIN v b ON j = b.vec_id) t
         |  WHERE cos >= 0.4),
         |${closureSql("spairs", "s")},
         |verdicts AS (
         |  SELECT d.doc_id,
         |         CASE WHEN c.component IS NOT NULL AND c.component <> d.doc_id
         |              THEN 1 ELSE 0 END AS lex_dup,
         |         CASE WHEN sc.component IS NOT NULL AND sc.component <> e.vec_id
         |              THEN 1 ELSE 0 END AS sem_dup
         |  FROM documents d
         |  LEFT JOIN comp c ON d.doc_id = c.node
         |  LEFT JOIN embeddings e ON d.doc_id = e.vec_id
         |  LEFT JOIN scomp sc ON e.vec_id = sc.node)
         |SELECT CAST(lex_dup AS BIGINT) AS lex_dup,
         |       CAST(sem_dup AS BIGINT) AS sem_dup,
         |       count(*) AS n_docs
         |FROM verdicts
         |GROUP BY lex_dup, sem_dup
         |ORDER BY lex_dup, sem_dup""".stripMargin
}
