package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, RangeJoin, Sessions}
import graft.sources.Tables

/** Temporal operators over `events`: point-in-time (as-of) join and batch
  * sessionization — the event-time surface a training-data pipeline needs
  * beyond plain time bucketing (q25).
  *
  * q43 is click→purchase attribution: each purchase matched to the same
  * user's latest prior-or-same click (left-outer; purchases before any
  * click keep NULLs). The DuckDB oracle is the independent formulation —
  * a native `ASOF LEFT JOIN` — against our union+window plan.
  * Deterministic: (user_id, ts) is unique in the corpus at every sf
  * (verified), so "latest" is unambiguous.
  *
  * q44 is 30-minute gap-and-island sessionization; the oracle formulates
  * the same islands with lag/running-sum windows. All timestamps cross
  * the oracle boundary as exact epoch microseconds.
  */
object TemporalQueries {

  def queries: Map[String, Q] = Map(
    "q43_asof_join" -> ((spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsOf.join(purchases, clicks, key = "user_id",
          leftTs = "ts", rightTs = "ts",
          payload = Seq("click_id"), tiebreak = "click_id")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_ts_us"),
          col("click_id"),
          unix_micros(col("asof_ts")).as("click_ts_us"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy("event_id")
    }),

    "q44_sessionize" -> ((spark, dir) =>
      Sessions.sessionize(Tables.load(spark, dir, "events"), gapSeconds = 1800L)
        .orderBy("user_id", "session_start_us")),

    // interval concurrency at hour grain: live/started sessions per
    // bucket + the peak marker — per-session bucket explode, one
    // bucket-grain agg, never a single-total-order boundary sweep
    "q149_concurrency" -> ((spark, dir) =>
      Sessions.concurrency(Tables.load(spark, dir, "events"),
          bucketSeconds = 3600L, gapSeconds = 1800L)
        .orderBy("bucket_s")),

    // first-order Markov next-event matrix: within-session consecutive
    // pairs, row-normalized to exact ppm — one per-user lead window,
    // then state×state grain
    "q151_transitions" -> ((spark, dir) =>
      Sessions.transitionMatrix(Tables.load(spark, dir, "events"),
          gapSeconds = 1800L)
        .orderBy("from_type", "to_type")),

    // per-type exact-integer OLS slope over the dense zero-filled daily
    // cents series — cross-multiplied rational, abs-then-floor division
    "q152_daily_trend" -> ((spark, dir) =>
      Sessions.dailyTrend(Tables.load(spark, dir, "events"))
        .orderBy("grp")),

    // weekly growth accounting: active = new + retained + resurrected,
    // churned = last week's actives who went silent — week-grain output
    "q154_growth_accounting" -> ((spark, dir) =>
      Sessions.growthAccounting(Tables.load(spark, dir, "events"))
        .orderBy("week")),

    // rolling DAU/WAU + stickiness: presence explodes into the 7
    // report-days it covers — exact trailing distinct, no sliding
    // window over user rows
    "q156_rolling_active" -> ((spark, dir) =>
      Sessions.rollingActive(Tables.load(spark, dir, "events"),
          windowDays = 7)
        .orderBy("day")),

    // 90-day rolling active (DAU/MAU-at-90): the merged-interval scale
    // path — per-user coverage intervals + a ±1 diff array over the day
    // axis, so work carries NO windowDays multiplier (the explode
    // rendering q156 uses would pay 90 × presence rows here); gated
    // against the naive coverage-explode oracle, and the merged ≡
    // exploded hash law is pinned in TemporalSpec
    "q202_rolling_active_90" -> ((spark, dir) =>
      Sessions.rollingActiveMerged(Tables.load(spark, dir, "events"),
          windowDays = 90)
        .orderBy("day")),

    // cohort LTV triangle: first-week cohorts × dense week offsets,
    // exact cents, cumulative + per-user floor — q114's money twin
    "q158_cohort_ltv" -> ((spark, dir) =>
      Sessions.cohortLtv(Tables.load(spark, dir, "events"))
        .orderBy("cohort", "offset")),

    // day-of-week seasonality: rates normalized by how many of each
    // weekday the ragged span actually contains — pure integer dow
    "q159_dow_profile" -> ((spark, dir) =>
      Sessions.dowProfile(Tables.load(spark, dir, "events"))
        .orderBy("grp", "dow")),

    // CUSUM change-point screen: extremal excursions of the cumulative
    // deviation from each type's own floor-mean daily cents
    "q160_cusum" -> ((spark, dir) =>
      Sessions.cusumDrift(Tables.load(spark, dir, "events"))
        .orderBy("grp")),

    // Nelson–Aalen cumulative repurchase hazard at week grain: exact
    // ppm, right-censored one-purchase users, dense week axis
    "q165_repurchase_hazard" -> ((spark, dir) =>
      Sessions.repurchaseHazard(Tables.load(spark, dir, "events"))
        .orderBy("week")),

    // Fano-factor burstiness: variance-to-mean of the dense zero-filled
    // daily counts per type, exact ppm — Poisson ⇒ ~10⁶
    "q166_burstiness" -> ((spark, dir) =>
      Sessions.fanoFactor(Tables.load(spark, dir, "events"))
        .orderBy("grp")),

    // AR(1) of the dense daily counts: exact-integer OLS of x_{t+1} on
    // x_t — the mean-reversion/momentum screen beside q152's drift
    "q172_ar1" -> ((spark, dir) =>
      Sessions.ar1Daily(Tables.load(spark, dir, "events"))
        .orderBy("grp")),

    // longest consecutive-active-day streak per user, rolled to
    // (streak_days, n_users) — gaps-and-islands at presence grain
    "q183_streaks" -> ((spark, dir) =>
      Sessions.activeStreaks(Tables.load(spark, dir, "events"))
        .orderBy("streak_days")),

    // session-depth distribution: events-per-session percentiles via
    // the q161 bounded-histogram machinery over q44's session relation
    // — every window runs at depth-histogram grain, never session rows
    "q179_session_depth" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Sessions
        .sessionize(Tables.load(spark, dir, "events"), gapSeconds = 1800L)
        .groupBy(col("n_events").cast("long").as("depth"))
        .agg(count(lit(1)).as("c"))
      hist
        .withColumn("cum", sum(col("c")).over(Window.orderBy("depth")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
        .agg(max(col("n")).as("n_sessions"),
          min(when(col("cum") >= expr("(n * 50 + 99) div 100"),
            col("depth"))).as("p50_depth"),
          min(when(col("cum") >= expr("(n * 90 + 99) div 100"),
            col("depth"))).as("p90_depth"),
          min(when(col("cum") >= expr("(n * 99 + 99) div 100"),
            col("depth"))).as("p99_depth"),
          max(col("depth")).as("max_depth"))
    }),

    // consecutive event-type trigrams with distinct-user support >= 3 —
    // the sequential-pattern tier one order past q151. Gap = 1 day (the
    // corpus' median inter-event gap is ~7 h, so 30-min session trigrams
    // barely exist; day-bounded consecutive behavior is the pattern
    // grain here, and the sf0.001 run exercises the min-support cut)
    "q176_event_trigrams" -> ((spark, dir) =>
      Sessions.eventTrigrams(Tables.load(spark, dir, "events"),
          gapSeconds = 86400L, minUsers = 3L)
        .orderBy(col("n_users").desc, col("t1"), col("t2"), col("t3"))),

    // windowed ingest dedup, batch face: earliest event per (user, type)
    // survives each 10-min bucket; min-struct partial agg, so the
    // exchange carries groups, never events
    "q103_event_dedup" -> ((spark, dir) =>
      Sessions.dedupPerWindow(Tables.load(spark, dir, "events"),
          windowSeconds = 600L)
        .orderBy("bucket_start_s", "user_id", "event_type")),

    "q46_range_band" -> ((spark, dir) =>
      RangeJoin.timeBandPairs(
          Tables.load(spark, dir, "events").filter(col("event_type") === "purchase"),
          idCol = "event_id", tsCol = "ts", windowSeconds = 5L)
        .orderBy("i", "j")),

    // retention triangle: users cohorted by first-event week, distinct
    // active users per (cohort, week offset) — source-freshness decay
    // read off the events stream
    "q114_retention" -> ((spark, dir) =>
      Sessions.retentionCohorts(Tables.load(spark, dir, "events"),
          bucketSeconds = 604800L)
        .orderBy("cohort_bucket", "bucket_offset")),

    // gap-filled hourly resample: the DENSE per-type series — every
    // hour between the corpus' first and last bucket present, empty
    // hours zero-filled, with a running total. Output is bounded by
    // the time axis × key count, never by event count.
    "q123_event_resample" -> ((spark, dir) =>
      Sessions.gapFill(Tables.load(spark, dir, "events"),
          bucketSeconds = 3600L, keyCol = "event_type")
        .orderBy("event_type", "bucket_s")),

    // SCD2 state history: each user's event-type change log replayed
    // into [valid_from, valid_to) validity intervals with a version
    // number and current flag — the CDC→dimension build feeding as-of
    // lookups
    "q124_scd2_history" -> ((spark, dir) =>
      Sessions.changeHistory(Tables.load(spark, dir, "events"),
          keyCol = "user_id", attrCol = "event_type")
        .orderBy("user_id", "version")),

    // the SCD2 dimension CONSUMED: each purchase enriched with the
    // user's state interval valid at its instant — q124's history fed
    // through the as-of operator (composition, not new machinery);
    // every purchase matches by construction (its own event bounds the
    // first interval), so the output is total. Determinism rests on
    // the corpus invariant the q43 oracle already relies on — (user,
    // ts) unique, so no two change intervals share a valid_from_us and
    // DuckDB's tie-rule-free ASOF JOIN cannot diverge from the
    // engine's version tiebreak
    "q133_scd2_enrich" -> ((spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      val hist = Sessions.changeHistory(ev)
        .select(col("user_id"), col("state"), col("valid_from_us"),
          col("version"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      AsOf.join(purchases, hist, key = "user_id",
          leftTs = "ts_us", rightTs = "valid_from_us",
          payload = Seq("state", "version"), tiebreak = "version")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("state").as("state_at_event"), col("version"))
        .orderBy("event_id")
    }),

    // fulfillment-lag tail percentiles per order month — the q107
    // bounded-histogram percentile machinery at a SECOND grain: windows
    // run over (month, lag-day) buckets (≤ a few thousand rows at any
    // corpus size), never over line items; lag uses the posmod FLOOR
    // (negative lags exist in this corpus, where `div` truncation and
    // an oracle's floor division would land one day apart)
    "q136_ship_lag" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val d = "(unix_micros(l_shipdate) - unix_micros(o_orderdate))"
      val lag = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(
          (year(col("o_orderdate")).cast("long") * 100L +
            month(col("o_orderdate")).cast("long")).as("order_month"),
          expr(s"($d - pmod($d, 86400000000)) div 86400000000")
            .as("lag_days"))
      val cum = lag.groupBy("order_month", "lag_days")
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy("order_month").orderBy("lag_days")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("order_month")))
      def pHi(p: Int) = min(when(
        col("cum") >= expr(s"(n * $p + 99) div 100"), col("lag_days")))
      cum.groupBy("order_month")
        .agg(max(col("n")).as("n_lines"),
          pHi(50).as("p50_days"), pHi(95).as("p95_days"),
          max(col("lag_days")).as("max_days"))
        .orderBy("order_month")
    }),

    // inter-event gap tail percentiles per type (the wait AFTER an
    // event of that type, per user): q136's bounded-histogram
    // percentile machinery over (type, minute-gap) buckets — the
    // per-user lead window is the only row-grain pass, every
    // percentile window runs at histogram grain
    "q161_interevent" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("dt_us",
          lead(unix_micros(col("ts")), 1).over(byUser)
            - unix_micros(col("ts")))
        .filter(col("dt_us").isNotNull)
        .select(col("event_type"), expr("dt_us div 60000000").as("gap_min"))
      val cum = gaps.groupBy("event_type", "gap_min")
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy("event_type").orderBy("gap_min")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(
          Window.partitionBy("event_type")))
      def pHi(p: Int) = min(when(
        col("cum") >= expr(s"(n * $p + 99) div 100"), col("gap_min")))
      cum.groupBy("event_type")
        .agg(max(col("n")).as("n_gaps"),
          pHi(50).as("p50_min"), pHi(90).as("p90_min"),
          pHi(99).as("p99_min"), max(col("gap_min")).as("max_min"))
        .orderBy("event_type")
    }),

    // ordered conversion funnel view → click → purchase with
    // earliest-reach semantics: each step one type-filtered scan
    // joined on the previous step's reach frame
    "q127_funnel" -> ((spark, dir) =>
      Sessions.funnel(Tables.load(spark, dir, "events"),
          steps = Seq("view", "click", "purchase"))
        .orderBy("step_idx")),

    // TIME-WEIGHTED AVERAGE per user: each observation weighted by its
    // hold time (step-function semantics) — the mean for irregular
    // samples; exact cents·seconds BIGINT with floor division, the
    // per-event mean beside it for the burstiness contrast
    "q145_twap" -> ((spark, dir) =>
      Sessions.timeWeightedAvg(Tables.load(spark, dir, "events"),
          keyCol = "user_id", valueCol = "value")
        .orderBy("key")),

    // ROLLING SPIKE DETECTION on the gap-filled per-type event-rate
    // series: trailing-24-bucket z-test cross-multiplied into exact
    // BIGINT (dev² · den² > num² · (W·Q − S²)) — the monitoring
    // anomaly pass, judged at axis grain, zero-count outage buckets
    // included by construction
    "q146_spike_detect" -> ((spark, dir) =>
      Sessions.spikeDetection(Tables.load(spark, dir, "events"),
          bucketSeconds = 3600L, keyCol = "event_type",
          windowBuckets = 24, kNum = 3L, kDen = 1L)
        .orderBy("event_type", "bucket_s")),

    // LINEAR MULTI-TOUCH ATTRIBUTION: every purchase credits ALL the
    // user's clicks in the 7-day lookback equally (exact ppm floor
    // division); the lookback pairing is one (user, time-bin)
    // equi-join, never a nested-loop range join; organic conversions
    // stay visible with n_touches = 0
    "q147_attribution" -> ((spark, dir) =>
      Sessions.linearAttribution(Tables.load(spark, dir, "events"),
          convType = "purchase", touchType = "click",
          windowSeconds = 7L * 86400L)
        .orderBy("event_id")),

    // q43's attribution with the HOT-KEY TWO-PASS engaged (hourly
    // slices): the events corpus has ~15 user_ids, so each key's whole
    // history is genuinely hot — the sliced path sorts each (key, hour)
    // in its own task and resolves cross-slice matches through one
    // boundary row per slice. Gated against the SAME DuckDB ASOF oracle
    // as q43: sliced ≡ plain is the hash-checked law, not just a spec
    // differential.
    "q81_asof_sliced" -> ((spark, dir) => {
      val ev = Tables.load(spark, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsOf.join(purchases, clicks, key = "user_id",
          leftTs = "ts", rightTs = "ts",
          payload = Seq("click_id"), tiebreak = "click_id",
          sliceOf = Some(ts => floor(unix_micros(ts) / 3600000000L)))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_ts_us"),
          col("click_id"),
          unix_micros(col("asof_ts")).as("click_ts_us"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy("event_id")
    }))

  /** The native ASOF LEFT JOIN rendering — shared verbatim by q43
    * (plain path) and q81 (hot-key two-pass), so sliced ≡ plain is a
    * driver-enforced hash law against one oracle definition.
    */
  private val AsOfOracleSql: String =
    """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_ts_us,
      |       c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  /** The 30-minute gap-and-island session relation `sess(user_id,
    * session_start_us, session_end_us, n_events, sum_value)` — shared
    * by q44 (the session rollup itself) and q149 (its concurrency
    * reading) so the interval definition cannot drift between them.
    */
  private val SessionCte: String =
    """o AS (SELECT user_id, ts, value, event_id,
      |             lag(ts) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS pts
      |           FROM events),
      |f AS (SELECT *, CASE WHEN pts IS NULL
      |                       OR epoch_us(ts) - epoch_us(pts) > 1800000000
      |                     THEN 1 ELSE 0 END AS ns
      |      FROM o),
      |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) AS sess
      |      FROM f),
      |sess AS (SELECT user_id,
      |           min(epoch_us(ts)) AS session_start_us,
      |           max(epoch_us(ts)) AS session_end_us,
      |           count(*) AS n_events,
      |           round(sum(value), 2) AS sum_value
      |         FROM s GROUP BY user_id, sess)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q43_asof_join" -> AsOfOracleSql,
    "q81_asof_sliced" -> AsOfOracleSql,

    // week index = floor(epoch_us / 604800e6) via the same
    // non-negative-mod identity as q103's floor buckets
    "q114_retention" ->
      """WITH wk AS (
        |  SELECT user_id,
        |         ((epoch_us(ts) - ((epoch_us(ts) % 604800000000) + 604800000000)
        |             % 604800000000) // 604800000000) AS w
        |  FROM events),
        |fw AS (SELECT user_id, min(w) AS cohort FROM wk GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, w FROM wk)
        |SELECT f.cohort AS cohort_bucket, a.w - f.cohort AS bucket_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM act a JOIN fw f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // dense axis via unnest(generate_series) over the global bounds,
    // same posmod floor buckets as q103; zero-fill and running sum at
    // axis grain
    "q123_event_resample" ->
      """WITH b AS (
        |  SELECT event_type,
        |         (fs - ((fs % 3600) + 3600) % 3600) AS bucket_s, value
        |  FROM (SELECT event_type,
        |          ((epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000)
        |              % 1000000) // 1000000) AS fs,
        |          value
        |        FROM events)),
        |obs AS (SELECT event_type, bucket_s, CAST(count(*) AS BIGINT) AS n_events,
        |               round(sum(value), 2) AS sum_value
        |        FROM b GROUP BY 1, 2),
        |bounds AS (SELECT min(bucket_s) AS lo, max(bucket_s) AS hi FROM b),
        |axis AS (SELECT k.event_type, g.bucket_s
        |         FROM (SELECT DISTINCT event_type FROM b) k
        |         CROSS JOIN (SELECT unnest(generate_series(lo, hi, 3600))
        |                       AS bucket_s FROM bounds) g)
        |SELECT a.event_type, a.bucket_s,
        |       CAST(coalesce(o.n_events, 0) AS BIGINT) AS n_events,
        |       coalesce(o.sum_value, 0.0) AS sum_value,
        |       CAST(sum(coalesce(o.n_events, 0)) OVER (
        |         PARTITION BY a.event_type ORDER BY a.bucket_s) AS BIGINT)
        |         AS cum_events
        |FROM axis a LEFT JOIN obs o USING (event_type, bucket_s)
        |ORDER BY event_type, bucket_s""".stripMargin,

    // same posmod floor lag, same ceil-rank threshold arithmetic as
    // the engine (and q107); year()/month() are BIGINT in DuckDB, the
    // engine casts to match
    "q136_ship_lag" ->
      """WITH lag AS (
        |  SELECT year(o.o_orderdate) * 100 + month(o.o_orderdate) AS order_month,
        |         ((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
        |             - (((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
        |                  % 86400000000) + 86400000000) % 86400000000)
        |            // 86400000000) AS lag_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |h AS (SELECT order_month, lag_days, CAST(count(*) AS BIGINT) AS c
        |      FROM lag GROUP BY 1, 2),
        |cw AS (SELECT order_month, lag_days, c,
        |              CAST(sum(c) OVER (PARTITION BY order_month
        |                                ORDER BY lag_days) AS BIGINT) AS cum,
        |              CAST(sum(c) OVER (PARTITION BY order_month) AS BIGINT) AS n
        |       FROM h)
        |SELECT order_month, max(n) AS n_lines,
        |       min(CASE WHEN cum >= (n * 50 + 99) // 100
        |           THEN lag_days END) AS p50_days,
        |       min(CASE WHEN cum >= (n * 95 + 99) // 100
        |           THEN lag_days END) AS p95_days,
        |       max(lag_days) AS max_days
        |FROM cw GROUP BY order_month
        |ORDER BY order_month""".stripMargin,

    // q124's change chain as a CTE, consumed by a native ASOF JOIN —
    // the independent formulation of "state valid at the instant"
    "q133_scd2_enrich" ->
      """WITH o AS (
        |  SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM o WHERE prev IS NULL OR prev != state),
        |v AS (SELECT user_id, state, ts_us AS valid_from_us,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts_us, event_id) AS BIGINT)
        |          AS version
        |      FROM c)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |       v.state AS state_at_event, v.version
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN v ON p.user_id = v.user_id
        |           AND v.valid_from_us <= epoch_us(p.ts)
        |ORDER BY p.event_id""".stripMargin,

    // step chains as min-reach CTEs with inclusive >= joins — the
    // identical earliest-reach semantics
    "q127_funnel" ->
      """WITH ev AS (SELECT user_id AS k, event_type AS t, epoch_us(ts) AS us
        |            FROM events),
        |s1 AS (SELECT k, min(us) AS r FROM ev WHERE t = 'view' GROUP BY k),
        |s2 AS (SELECT e.k, min(e.us) AS r FROM ev e JOIN s1 ON e.k = s1.k
        |       WHERE e.t = 'click' AND e.us >= s1.r GROUP BY e.k),
        |s3 AS (SELECT e.k, min(e.us) AS r FROM ev e JOIN s2 ON e.k = s2.k
        |       WHERE e.t = 'purchase' AND e.us >= s2.r GROUP BY e.k),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
        |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
        |n3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s3)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, n1.n AS n_users,
        |         CASE WHEN n1.n = 0 THEN 0
        |              ELSE (n1.n * 1000000) // n1.n END AS conv_ppm
        |  FROM n1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click', n2.n,
        |         CASE WHEN n1.n = 0 THEN 0
        |              ELSE (n2.n * 1000000) // n1.n END
        |  FROM n2, n1
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase', n3.n,
        |         CASE WHEN n1.n = 0 THEN 0
        |              ELSE (n3.n * 1000000) // n1.n END
        |  FROM n3, n1)
        |ORDER BY step_idx""".stripMargin,

    // change rows by lag != state, then lead/row_number over the
    // FILTERED change set — identical window keys and tiebreak as the
    // engine
    "q124_scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM o WHERE prev IS NULL OR prev != state)
        |SELECT user_id, state, ts_us AS valid_from_us,
        |       lead(ts_us) OVER (PARTITION BY user_id
        |                         ORDER BY ts_us, event_id) AS valid_to_us,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts_us, event_id) AS BIGINT)
        |         AS version,
        |       CAST(CASE WHEN lead(ts_us) OVER (PARTITION BY user_id
        |                    ORDER BY ts_us, event_id) IS NULL
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM c
        |ORDER BY user_id, version""".stripMargin,

    "q44_sessionize" ->
      s"""WITH $SessionCte
         |SELECT user_id, session_start_us, session_end_us,
         |       n_events, sum_value
         |FROM sess
         |ORDER BY user_id, session_start_us""".stripMargin,

    // same session islands (shared CTE text with q44 — the interval
    // definition cannot drift), each exploded into its covered hour
    // buckets, counted at bucket grain
    "q149_concurrency" ->
      s"""WITH $SessionCte,
         |cov AS (SELECT
         |          (session_start_us // 1000000)
         |            - ((session_start_us // 1000000) % 3600) AS sb,
         |          unnest(generate_series(
         |            (session_start_us // 1000000)
         |              - ((session_start_us // 1000000) % 3600),
         |            (session_end_us // 1000000)
         |              - ((session_end_us // 1000000) % 3600),
         |            3600)) AS bucket_s
         |        FROM sess),
         |c AS (SELECT bucket_s, count(*) AS concurrent,
         |        CAST(sum(CASE WHEN sb = bucket_s THEN 1 ELSE 0 END)
         |             AS BIGINT) AS started
         |      FROM cov GROUP BY 1),
         |m AS (SELECT max(concurrent) AS mx FROM c)
         |SELECT bucket_s, concurrent, started,
         |       CAST(CASE WHEN concurrent = (SELECT mx FROM m)
         |            THEN 1 ELSE 0 END AS BIGINT) AS is_peak
         |FROM c ORDER BY bucket_s""".stripMargin,

    "q151_transitions" ->
      """WITH t AS (SELECT event_type AS from_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |                                    ORDER BY ts, event_id) AS to_type,
        |             lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                      ORDER BY ts, event_id)
        |               - epoch_us(ts) AS dt_us
        |           FROM events),
        |tr AS (SELECT from_type, to_type, count(*) AS n
        |       FROM t
        |       WHERE to_type IS NOT NULL AND dt_us <= 1800000000
        |       GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |        FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.n, tot.n_from,
        |       (tr.n * 1000000) // tot.n_from AS p_ppm
        |FROM tr JOIN tot ON tr.from_type = tot.from_type
        |ORDER BY tr.from_type, tr.to_type""".stripMargin,

    "q152_daily_trend" ->
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |         ((epoch_us(ts) // 1000000)
        |           - ((epoch_us(ts) // 1000000) % 86400)) // 86400 AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |axis AS (SELECT g.grp, b.lo,
        |           unnest(generate_series(b.lo, b.hi)) AS day
        |         FROM (SELECT DISTINCT grp FROM daily) g CROSS JOIN b),
        |f AS (SELECT a.grp, a.day - a.lo AS x, coalesce(d.y, 0) AS y
        |      FROM axis a LEFT JOIN daily d
        |        ON a.grp = d.grp AND a.day = d.day),
        |agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_days,
        |          CAST(sum(y) AS BIGINT) AS sum_y_cents,
        |          CAST(sum(x * y) AS BIGINT) AS sxy,
        |          CAST(sum(x) AS BIGINT) AS sx,
        |          CAST(sum(x * x) AS BIGINT) AS sxx
        |        FROM f GROUP BY 1)
        |SELECT grp, n_days, sum_y_cents,
        |       n_days * sxy - sx * sum_y_cents AS num,
        |       n_days * sxx - sx * sx AS den,
        |       CAST(CASE WHEN n_days * sxy - sx * sum_y_cents > 0 THEN 1
        |                 WHEN n_days * sxy - sx * sum_y_cents < 0 THEN -1
        |                 ELSE 0 END AS BIGINT) AS slope_sign,
        |       CASE WHEN n_days * sxx - sx * sx > 0
        |            THEN (abs(n_days * sxy - sx * sum_y_cents) * 1000000)
        |                 // (n_days * sxx - sx * sx)
        |       END AS slope_abs_microcents
        |FROM agg ORDER BY grp""".stripMargin,

    "q154_growth_accounting" ->
      """WITH pres AS (SELECT DISTINCT user_id AS u,
        |                (epoch_us(ts) // 1000000) // 604800 AS week
        |              FROM events
        |              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT week,
        |        lag(week) OVER (PARTITION BY u ORDER BY week) AS prev
        |      FROM pres),
        |bw AS (SELECT week, count(*) AS active,
        |         CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS new_users,
        |         CAST(sum(CASE WHEN prev = week - 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS retained,
        |         CAST(sum(CASE WHEN prev IS NOT NULL AND prev < week - 1
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        |       FROM m GROUP BY 1),
        |b AS (SELECT min(week) AS lo, max(week) AS hi FROM bw),
        |axis AS (SELECT unnest(generate_series(b.lo, b.hi)) AS week FROM b),
        |dense AS (SELECT a.week,
        |            coalesce(bw.active, 0) AS active,
        |            coalesce(bw.new_users, 0) AS new_users,
        |            coalesce(bw.retained, 0) AS retained,
        |            coalesce(bw.resurrected, 0) AS resurrected
        |          FROM axis a LEFT JOIN bw ON a.week = bw.week)
        |SELECT week, active, new_users, retained, resurrected,
        |       coalesce(lag(active) OVER (ORDER BY week), 0) - retained
        |         AS churned
        |FROM dense ORDER BY week""".stripMargin,

    "q156_rolling_active" ->
      """WITH pres AS (SELECT DISTINCT user_id AS u,
        |                (epoch_us(ts) // 1000000) // 86400 AS day
        |              FROM events
        |              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM pres),
        |dau AS (SELECT day, count(*) AS dau FROM pres GROUP BY 1),
        |cov AS (SELECT DISTINCT p.u,
        |          unnest(generate_series(p.day,
        |            least(p.day + 6, (SELECT hi FROM b)))) AS day
        |        FROM pres p),
        |wau AS (SELECT day, count(*) AS wau FROM cov GROUP BY 1),
        |axis AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b)
        |SELECT a.day, coalesce(d.dau, 0) AS dau, coalesce(w.wau, 0) AS wau,
        |       CASE WHEN coalesce(w.wau, 0) > 0
        |            THEN (coalesce(d.dau, 0) * 1000000) // w.wau END
        |         AS stickiness_ppm
        |FROM axis a LEFT JOIN dau d ON a.day = d.day
        |            LEFT JOIN wau w ON a.day = w.day
        |ORDER BY a.day""".stripMargin,

    // the ORACLE is the naive rendering — every presence day fans out
    // to the 90 report days it covers; the engine's merged-interval
    // diff array must reproduce it bit-for-bit
    "q202_rolling_active_90" ->
      """WITH pres AS (SELECT DISTINCT user_id AS u,
        |                (epoch_us(ts) // 1000000) // 86400 AS day
        |              FROM events
        |              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM pres),
        |dau AS (SELECT day, count(*) AS dau FROM pres GROUP BY 1),
        |cov AS (SELECT DISTINCT p.u,
        |          unnest(generate_series(p.day,
        |            least(p.day + 89, (SELECT hi FROM b)))) AS day
        |        FROM pres p),
        |wau AS (SELECT day, count(*) AS wau FROM cov GROUP BY 1),
        |axis AS (SELECT unnest(generate_series(b.lo, b.hi)) AS day FROM b)
        |SELECT a.day, coalesce(d.dau, 0) AS dau, coalesce(w.wau, 0) AS wau,
        |       CASE WHEN coalesce(w.wau, 0) > 0
        |            THEN (coalesce(d.dau, 0) * 1000000) // w.wau END
        |         AS stickiness_ppm
        |FROM axis a LEFT JOIN dau d ON a.day = d.day
        |            LEFT JOIN wau w ON a.day = w.day
        |ORDER BY a.day""".stripMargin,

    "q158_cohort_ltv" ->
      """WITH ev AS (SELECT user_id AS u,
        |              (epoch_us(ts) // 1000000) // 604800 AS week,
        |              CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events
        |            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |              AND value IS NOT NULL),
        |fw AS (SELECT u, min(week) AS cohort FROM ev GROUP BY 1),
        |sz AS (SELECT cohort, count(*) AS cohort_size FROM fw GROUP BY 1),
        |uw AS (SELECT u, week, CAST(sum(cents) AS BIGINT) AS cents
        |       FROM ev GROUP BY 1, 2),
        |rev AS (SELECT f.cohort, uw.week - f.cohort AS off,
        |          CAST(sum(uw.cents) AS BIGINT) AS revenue_cents
        |        FROM uw JOIN fw f ON uw.u = f.u GROUP BY 1, 2),
        |hi AS (SELECT max(week) AS hi FROM ev),
        |axis AS (SELECT sz.cohort, sz.cohort_size,
        |           unnest(generate_series(0, (SELECT hi FROM hi)
        |                                     - sz.cohort)) AS off
        |         FROM sz),
        |dense AS (SELECT a.cohort, a.off, a.cohort_size,
        |            coalesce(r.revenue_cents, 0) AS revenue_cents
        |          FROM axis a LEFT JOIN rev r
        |            ON a.cohort = r.cohort AND a.off = r.off),
        |cum AS (SELECT cohort, off AS "offset", cohort_size, revenue_cents,
        |          CAST(sum(revenue_cents) OVER (PARTITION BY cohort
        |            ORDER BY off) AS BIGINT) AS cum_revenue_cents
        |        FROM dense)
        |SELECT cohort, "offset", cohort_size, revenue_cents,
        |       cum_revenue_cents,
        |       cum_revenue_cents // cohort_size AS cum_per_user_cents
        |FROM cum ORDER BY cohort, "offset"""".stripMargin,

    "q161_interevent" ->
      """WITH g AS (SELECT event_type,
        |             (lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id) - epoch_us(ts))
        |               // 60000000 AS gap_min
        |           FROM events),
        |h AS (SELECT event_type, gap_min, count(*) AS c
        |      FROM g WHERE gap_min IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT event_type, gap_min, c,
        |          CAST(sum(c) OVER (PARTITION BY event_type
        |            ORDER BY gap_min) AS BIGINT) AS cum,
        |          CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
        |            AS n
        |        FROM h)
        |SELECT event_type, max(n) AS n_gaps,
        |       min(CASE WHEN cum >= (n * 50 + 99) // 100
        |           THEN gap_min END) AS p50_min,
        |       min(CASE WHEN cum >= (n * 90 + 99) // 100
        |           THEN gap_min END) AS p90_min,
        |       min(CASE WHEN cum >= (n * 99 + 99) // 100
        |           THEN gap_min END) AS p99_min,
        |       max(gap_min) AS max_min
        |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin,

    "q159_dow_profile" ->
      """WITH obs AS (SELECT event_type AS grp,
        |               (epoch_us(ts) // 1000000) // 86400 AS day
        |             FROM events
        |             WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT grp, (day + 3) % 7 AS dow, count(*) AS n_events
        |      FROM obs GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM obs),
        |dd AS (SELECT (day + 3) % 7 AS dow, count(*) AS n_days
        |       FROM (SELECT unnest(generate_series(b.lo, b.hi)) AS day
        |             FROM b) GROUP BY 1)
        |SELECT c.grp, c.dow, c.n_events, dd.n_days,
        |       (c.n_events * 1000) // dd.n_days AS rate_milli
        |FROM c JOIN dd ON c.dow = dd.dow
        |ORDER BY c.grp, c.dow""".stripMargin,

    "q160_cusum" ->
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |         (epoch_us(ts) // 1000000) // 86400 AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS y
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |axis AS (SELECT g.grp, unnest(generate_series(b.lo, b.hi)) AS day
        |         FROM (SELECT DISTINCT grp FROM daily) g CROSS JOIN b),
        |dense AS (SELECT a.grp, a.day, coalesce(d.y, 0) AS y
        |          FROM axis a LEFT JOIN daily d
        |            ON a.grp = d.grp AND a.day = d.day),
        |t AS (SELECT grp,
        |        CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT)
        |          AS target_cents
        |      FROM dense GROUP BY 1),
        |cs AS (SELECT dense.grp, dense.day,
        |         CAST(sum(dense.y - t.target_cents) OVER (
        |           PARTITION BY dense.grp ORDER BY dense.day) AS BIGINT)
        |           AS cusum
        |       FROM dense JOIN t ON dense.grp = t.grp),
        |ext AS (SELECT grp, max(cusum) AS max_cusum_cents,
        |          min(cusum) AS min_cusum_cents
        |        FROM cs GROUP BY 1)
        |SELECT cs.grp, t.target_cents,
        |       e.max_cusum_cents,
        |       min(CASE WHEN cs.cusum = e.max_cusum_cents
        |           THEN cs.day END) AS max_day,
        |       e.min_cusum_cents,
        |       min(CASE WHEN cs.cusum = e.min_cusum_cents
        |           THEN cs.day END) AS min_day
        |FROM cs JOIN ext e ON cs.grp = e.grp
        |        JOIN t ON cs.grp = t.grp
        |GROUP BY 1, 2, 3, 5
        |ORDER BY cs.grp""".stripMargin,

    // Mirrors Sessions.repurchaseHazard exactly: study population =
    // users with >= 1 purchase, duration = weeks first->second purchase,
    // censored at the corpus' last purchase second; per-week ppm floored
    // FIRST, then summed, so the cumulative hazard is bit-identical.
    "q165_repurchase_hazard" ->
      """WITH p AS (SELECT user_id, event_id,
        |             epoch_us(ts) // 1000000 AS s
        |           FROM events
        |           WHERE event_type = 'purchase'
        |             AND user_id IS NOT NULL AND ts IS NOT NULL),
        |h AS (SELECT max(s) AS tmax FROM p),
        |r AS (SELECT user_id, s,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY s, event_id) AS rn
        |      FROM p),
        |u AS (SELECT user_id,
        |        min(CASE WHEN rn = 1 THEN s END) AS t1,
        |        min(CASE WHEN rn = 2 THEN s END) AS t2
        |      FROM r WHERE rn <= 2 GROUP BY 1),
        |dur AS (SELECT CASE WHEN t2 IS NOT NULL
        |                    THEN (t2 - t1) // 604800
        |                    ELSE ((SELECT tmax FROM h) - t1) // 604800
        |               END AS week,
        |               CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        |                 AS observed
        |        FROM u),
        |wk AS (SELECT week, CAST(sum(observed) AS BIGINT) AS d,
        |         CAST(sum(1 - observed) AS BIGINT) AS c
        |       FROM dur GROUP BY 1),
        |b AS (SELECT max(week) AS hi,
        |        CAST(sum(d + c) AS BIGINT) AS n_users
        |      FROM wk),
        |axis AS (SELECT b.n_users,
        |           unnest(generate_series(0, b.hi)) AS week FROM b),
        |dense AS (SELECT a.week, a.n_users,
        |            coalesce(wk.d, 0) AS n_events,
        |            coalesce(wk.c, 0) AS n_censored
        |          FROM axis a LEFT JOIN wk ON a.week = wk.week),
        |risk AS (SELECT week, n_events, n_censored,
        |           n_users - coalesce(CAST(sum(n_events + n_censored)
        |             OVER (ORDER BY week
        |                   ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND 1 PRECEDING) AS BIGINT), 0) AS n_at_risk
        |         FROM dense),
        |hz AS (SELECT week, n_at_risk, n_events, n_censored,
        |         CASE WHEN n_at_risk > 0
        |              THEN (n_events * 1000000) // n_at_risk
        |              ELSE 0 END AS hazard_ppm
        |       FROM risk)
        |SELECT week, n_at_risk, n_events, n_censored, hazard_ppm,
        |       CAST(sum(hazard_ppm) OVER (ORDER BY week) AS BIGINT)
        |         AS cumhaz_ppm
        |FROM hz ORDER BY week""".stripMargin,

    // island key = day - row_number over each user's distinct days
    "q183_streaks" ->
      """WITH pres AS (SELECT DISTINCT user_id,
        |                (epoch_us(ts) // 1000000) // 86400 AS day
        |              FROM events
        |              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |isl AS (SELECT user_id,
        |          day - row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY day) AS island
        |        FROM pres),
        |runs AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
        |         FROM isl GROUP BY user_id, island),
        |lg AS (SELECT user_id, max(len) AS streak_days FROM runs
        |       GROUP BY 1)
        |SELECT streak_days, CAST(count(*) AS BIGINT) AS n_users
        |FROM lg GROUP BY 1 ORDER BY 1""".stripMargin,

    // q44's shared session relation + the q161 ceil-rank histogram
    // percentiles at depth grain
    "q179_session_depth" ->
      s"""WITH $SessionCte,
         |hd AS (SELECT CAST(n_events AS BIGINT) AS depth,
         |         CAST(count(*) AS BIGINT) AS c
         |       FROM sess GROUP BY 1),
         |cw AS (SELECT depth, CAST(sum(c) OVER (ORDER BY depth) AS BIGINT)
         |         AS cum,
         |         (SELECT CAST(sum(c) AS BIGINT) FROM hd) AS n
         |       FROM hd)
         |SELECT max(n) AS n_sessions,
         |       min(CASE WHEN cum >= (n * 50 + 99) // 100
         |           THEN depth END) AS p50_depth,
         |       min(CASE WHEN cum >= (n * 90 + 99) // 100
         |           THEN depth END) AS p90_depth,
         |       min(CASE WHEN cum >= (n * 99 + 99) // 100
         |           THEN depth END) AS p99_depth,
         |       max(depth) AS max_depth
         |FROM cw""".stripMargin,

    // Both gaps close within the session threshold (the q151 posture);
    // support counts distinct USERS so loops can't mint patterns
    "q176_event_trigrams" ->
      """WITH g AS (SELECT user_id, event_type AS t1,
        |             lead(event_type, 1) OVER w AS t2,
        |             lead(event_type, 2) OVER w AS t3,
        |             lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS d1,
        |             lead(epoch_us(ts), 2) OVER w
        |               - lead(epoch_us(ts), 1) OVER w AS d2
        |           FROM events
        |           WINDOW w AS (PARTITION BY user_id
        |                        ORDER BY ts, event_id))
        |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_occurrences,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM g
        |WHERE t3 IS NOT NULL
        |  AND d1 <= 86400000000 AND d2 <= 86400000000
        |GROUP BY 1, 2, 3
        |HAVING count(DISTINCT user_id) >= 3
        |ORDER BY n_users DESC, t1, t2, t3""".stripMargin,

    // Same dense daily axis; lead pairs at axis grain; the rational's
    // one division is abs-then-floor (the q152 negatives pattern)
    "q172_ar1" ->
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |         (epoch_us(ts) // 1000000) // 86400 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |axis AS (SELECT g.grp, unnest(generate_series(b.lo, b.hi)) AS day
        |         FROM (SELECT DISTINCT grp FROM daily) g CROSS JOIN b),
        |dense AS (SELECT a.grp, a.day, coalesce(d.c, 0) AS x
        |          FROM axis a LEFT JOIN daily d
        |            ON a.grp = d.grp AND a.day = d.day),
        |pairs AS (SELECT grp, x,
        |            lead(x) OVER (PARTITION BY grp ORDER BY day) AS y
        |          FROM dense),
        |agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_pairs,
        |          CAST(sum(x) AS BIGINT) AS sx,
        |          CAST(sum(y) AS BIGINT) AS sy,
        |          CAST(sum(x * y) AS BIGINT) AS sxy,
        |          CAST(sum(x * x) AS BIGINT) AS sxx
        |        FROM pairs WHERE y IS NOT NULL GROUP BY 1)
        |SELECT grp, n_pairs,
        |       n_pairs * sxy - sx * sy AS num,
        |       n_pairs * sxx - sx * sx AS den,
        |       CAST(CASE WHEN n_pairs * sxy - sx * sy > 0 THEN 1
        |                 WHEN n_pairs * sxy - sx * sy < 0 THEN -1
        |                 ELSE 0 END AS BIGINT) AS ar1_sign,
        |       CASE WHEN n_pairs * sxx - sx * sx > 0
        |            THEN (abs(n_pairs * sxy - sx * sy) * 1000000)
        |                 // (n_pairs * sxx - sx * sx)
        |       END AS ar1_abs_micro
        |FROM agg ORDER BY grp""".stripMargin,

    // Same dense daily axis; the Fano numerator is >= 0 by
    // Cauchy–Schwarz, so // (trunc) and div (floor) agree.
    "q166_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type AS grp,
        |         (epoch_us(ts) // 1000000) // 86400 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |axis AS (SELECT g.grp, unnest(generate_series(b.lo, b.hi)) AS day
        |         FROM (SELECT DISTINCT grp FROM daily) g CROSS JOIN b),
        |dense AS (SELECT a.grp, coalesce(d.c, 0) AS c
        |          FROM axis a LEFT JOIN daily d
        |            ON a.grp = d.grp AND a.day = d.day),
        |agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_days,
        |          CAST(sum(c) AS BIGINT) AS n_events,
        |          CAST(sum(c * c) AS BIGINT) AS sum_c2
        |        FROM dense GROUP BY 1)
        |SELECT grp, n_days, n_events,
        |       (n_events * 1000) // n_days AS mean_milli,
        |       CASE WHEN n_events > 0
        |            THEN ((n_days * sum_c2 - n_events * n_events)
        |                  * 1000000) // (n_days * n_events)
        |       END AS fano_ppm
        |FROM agg ORDER BY grp""".stripMargin,

    // Naive inequality formulation — correct at oracle scale; the engine
    // side runs the bucketed band join (equi-shuffle + verify) instead.
    "q46_range_band" ->
      """SELECT a.event_id AS i, b.event_id AS j,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 5000000
        |ORDER BY i, j""".stripMargin,

    // epoch-second floor buckets both sides; keeper = min (ts, event_id).
    // FLOOR bucketing over epoch_us via the non-negative-mod identity
    // (x - ((x % b) + b) % b), NOT floor(epoch(ts)) or x // b: epoch()'s
    // return type varies across DuckDB versions (fractional DOUBLE vs
    // truncated BIGINT), and DuckDB's integer // TRUNCATES toward zero
    // (-7 // 2 = -3, measured) while the engine floors via pmod
    // (Sessions.dedupPerWindow) — so only the posmod form keeps the
    // pre-epoch arm bit-identical, purely in BIGINTs, on every version
    "q103_event_dedup" ->
      """WITH b AS (
        |  SELECT ((epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000)
        |            // 1000000) AS floor_s,
        |         user_id, event_type, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |b2 AS (
        |  SELECT (floor_s - ((floor_s % 600) + 600) % 600) AS bucket_start_s,
        |         user_id, event_type, event_id, ts_us
        |  FROM b),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY bucket_start_s, user_id, event_type
        |        ORDER BY ts_us, event_id) AS rk,
        |        CAST(count(*) OVER (
        |          PARTITION BY bucket_start_s, user_id, event_type) AS BIGINT)
        |          AS n_events
        |      FROM b2)
        |SELECT bucket_start_s, user_id, event_type,
        |       event_id AS keep_event_id, ts_us AS keep_ts_us,
        |       n_events, n_events - 1 AS n_dupes
        |FROM r WHERE rk = 1
        |ORDER BY bucket_start_s, user_id, event_type""".stripMargin,

    // same step-function hold: lead over (key, ts), whole-second
    // floors, cents·dt BIGINT sums, floor-division twap, NULL for
    // single-observation keys
    "q145_twap" ->
      """WITH s AS (
        |  SELECT user_id AS key, epoch_us(ts) AS ts_us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL),
        |d AS (
        |  SELECT key, cents,
        |         (lead(ts_us) OVER (PARTITION BY key ORDER BY ts_us)
        |          - ts_us) // 1000000 AS dt_s
        |  FROM s),
        |a AS (
        |  SELECT key, CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(dt_s) AS BIGINT) AS span_raw,
        |         CAST(sum(cents * dt_s) AS BIGINT) AS wsum,
        |         CAST(sum(cents) AS BIGINT) AS csum
        |  FROM d GROUP BY key)
        |SELECT key, n_events, COALESCE(span_raw, 0) AS span_s,
        |       CASE WHEN span_raw > 0 THEN wsum // span_raw END AS twap_cents,
        |       csum // n_events AS mean_cents
        |FROM a ORDER BY key""".stripMargin,

    // q123's dense axis, then the trailing-24 rows window and the same
    // cross-multiplied integer z-test; buckets without 24 full history
    // rows are not judged
    "q146_spike_detect" ->
      """WITH b AS (
        |  SELECT event_type,
        |         (fs - ((fs % 3600) + 3600) % 3600) AS bucket_s
        |  FROM (SELECT event_type,
        |          ((epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000)
        |              % 1000000) // 1000000) AS fs
        |        FROM events)),
        |obs AS (SELECT event_type, bucket_s, CAST(count(*) AS BIGINT) AS n_events
        |        FROM b GROUP BY 1, 2),
        |bounds AS (SELECT min(bucket_s) AS lo, max(bucket_s) AS hi FROM b),
        |axis AS (SELECT k.event_type, g.bucket_s
        |         FROM (SELECT DISTINCT event_type FROM b) k
        |         CROSS JOIN (SELECT unnest(generate_series(lo, hi, 3600))
        |                       AS bucket_s FROM bounds) g),
        |dense AS (SELECT a.event_type, a.bucket_s,
        |                 CAST(coalesce(o.n_events, 0) AS BIGINT) AS n_events
        |          FROM axis a LEFT JOIN obs o USING (event_type, bucket_s)),
        |r AS (SELECT event_type, bucket_s, n_events,
        |             CAST(count(*) OVER w AS BIGINT) AS hist_n,
        |             CAST(sum(n_events) OVER w AS BIGINT) AS s,
        |             CAST(sum(n_events * n_events) OVER w AS BIGINT) AS q
        |      FROM dense
        |      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_s
        |                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, bucket_s, n_events, s, q,
        |       24 * n_events - s AS dev_w,
        |       24 * q - s * s AS var_w2,
        |       CAST(CASE WHEN (24 * n_events - s) * (24 * n_events - s)
        |                      > 9 * (24 * q - s * s)
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_spike
        |FROM r WHERE hist_n = 24
        |ORDER BY event_type, bucket_s""".stripMargin,

    // naive BETWEEN range join as the independent formulation; list
    // max/min give the (gap, id)-lexicographic first/last touch picks
    "q147_attribution" ->
      """WITH conv AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |              FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |        FROM events WHERE event_type = 'click'),
        |m AS (SELECT c.event_id, t.event_id AS rid,
        |             c.ts_us - t.ts_us AS gap_us
        |      FROM conv c JOIN tch t ON c.user_id = t.user_id
        |      WHERE c.ts_us - t.ts_us BETWEEN 0 AND 604800000000),
        |a AS (SELECT event_id, CAST(count(*) AS BIGINT) AS n_touches,
        |             max([gap_us, rid])[2] AS first_touch_id,
        |             min([gap_us, rid])[2] AS last_touch_id
        |      FROM m GROUP BY event_id)
        |SELECT c.event_id, c.user_id, c.ts_us,
        |       COALESCE(a.n_touches, 0) AS n_touches,
        |       CASE WHEN a.n_touches > 0 THEN 1000000 // a.n_touches END
        |         AS credit_ppm,
        |       a.first_touch_id, a.last_touch_id
        |FROM conv c LEFT JOIN a USING (event_id)
        |ORDER BY c.event_id""".stripMargin)
}
