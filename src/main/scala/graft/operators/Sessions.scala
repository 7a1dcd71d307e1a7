package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gap-and-island): consecutive events of a key
  * belong to one session while the gap between neighbors stays ≤ `gap`;
  * a larger gap opens a new session. The batch twin of
  * [[graft.streaming.Streams.sessionCounts]]'s `session_window` — the
  * differential test asserts the two renderings agree.
  *
  * Plan shape: ONE shuffle. Both window passes (lag, running sum) and the
  * final group-by are keyed by `user_id` — Spark's `HashPartitioning`
  * on `user_id` satisfies the grouping distribution for
  * `(user_id, session)`, so the sort-based windows and the aggregation
  * all run inside the same exchange. Per-partition state is a sort, no
  * buffering beyond the aggregation — survives arbitrarily long streams
  * of sessions per key.
  */
object Sessions {

  /** Per-session rollup: (user_id, session_start_us, session_end_us,
    * n_events, sum_value). Timestamps emitted as epoch microseconds
    * (exact integers — engine-portable, no format ambiguity).
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .drop("sess")
  }

  /** Windowed event dedup — the batch, oracle-gateable face of the
    * streaming ingest-dedup contract ([[graft.streaming.Streams
    * .dedupWithinWatermark]] bounds state by TIME; this is the same
    * policy expressed as tumbling buckets): within each
    * `windowSeconds` bucket, one event survives per (user_id,
    * event_type) — the earliest, ties by event_id — and the audit
    * reports how many duplicates it absorbed. Bucket arithmetic is
    * exact integer floor on epoch seconds (engine-portable; no
    * timezone/format ambiguity), kept timestamps are epoch µs.
    *
    * Plan shape: one shuffle on the group key with a min-struct
    * partial aggregate — the keeper resolves map-side, so the exchange
    * carries one row per (bucket, user, type), never per event (vs a
    * row_number window, which would shuffle every event to sort).
    * Struct-min lowers to SortAggregate (a per-partition sort feeds the
    * partial phase — no shuffle); the partial/final split is CI-gated
    * in PlanSpec.
    */
  def dedupPerWindow(events: DataFrame,
      windowSeconds: Long = 600L): DataFrame = {
    require(windowSeconds > 0,
      s"windowSeconds must be positive, got $windowSeconds")
    // FLOOR bucketing via pmod, not `unix_timestamp … div` — both
    // truncate toward zero, which for pre-epoch instants would land one
    // bucket late and diverge from an oracle engine's floor division
    // (the Tables.load ns→µs conversion documents the same trap)
    val sec = s"((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    events
      .select(
        expr(s"$sec - pmod($sec, $windowSeconds)").as("bucket_start_s"),
        col("user_id"), col("event_type"),
        struct(unix_micros(col("ts")).as("ts_us"),
          col("event_id")).as("k"))
      .groupBy("bucket_start_s", "user_id", "event_type")
      .agg(min(col("k")).as("keep"), count(lit(1)).as("n_events"))
      .select(col("bucket_start_s"), col("user_id"), col("event_type"),
        col("keep.event_id").as("keep_event_id"),
        col("keep.ts_us").as("keep_ts_us"),
        col("n_events"), (col("n_events") - 1L).as("n_dupes"))
  }

  /** Retention cohort table: users grouped by the time bucket of their
    * FIRST event (cohort), activity counted per (cohort, bucket-offset)
    * as distinct active users — the classic engagement triangle, here
    * because a training-data pipeline reads it as source-freshness
    * decay (how long a crawl cohort keeps contributing new events).
    * Buckets are floor(epoch_us / bucket) via the same pmod floor as
    * [[dedupPerWindow]] (truncation-toward-zero would misplace
    * pre-epoch instants by one bucket against an oracle's floor).
    *
    * Scale shape: one distinct on (user, bucket) — map-side partial —
    * one min-agg per user, one equi-join user→cohort (broadcastable
    * while the user dimension is small, plain hash join at scale), and
    * a final agg bounded by cohorts × offsets, never by event count.
    */
  def retentionCohorts(events: DataFrame,
      bucketSeconds: Long = 604800L): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be positive, got $bucketSeconds")
    val w = bucketSeconds * 1000000L
    val bucket = expr(
      s"(unix_micros(ts) - pmod(unix_micros(ts), $w)) div $w")
    val wk = events.select(col("user_id"), bucket.as("w"))
    val cohort = wk.groupBy("user_id").agg(min(col("w")).as("cohort"))
    wk.distinct()
      .join(cohort, "user_id")
      .groupBy(col("cohort").as("cohort_bucket"),
        (col("w") - col("cohort")).as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gap-filled resample: per `keyCol`, a COMPLETE `bucketSeconds` time
    * axis from the corpus' first to last bucket, observed buckets
    * carrying (count, rounded value sum), missing buckets zero-filled,
    * plus a running event total. The dense series downstream consumers
    * (charting, anomaly detection, rate limiting) need — a plain
    * group-by silently drops empty buckets.
    *
    * Scale shape: the raw-event work is ONE map-side-partial
    * aggregation to bucket grain; everything after (axis generation,
    * zero-fill join, running-sum window) runs at AXIS grain — rows
    * bounded by keys × time-span/bucket, independent of event count.
    * The bounds frame is a 1-row aggregate broadcast under the keys
    * (bounded crossJoin by construction); the axis itself is
    * `sequence` + `explode`, never a driver loop. Bucket arithmetic is
    * the same pmod floor as [[dedupPerWindow]] (pre-epoch safe,
    * engine-portable). Empty input yields an empty frame (sequence of
    * NULL bounds explodes to nothing), not an error.
    */
  def gapFill(events: DataFrame, bucketSeconds: Long = 3600L,
      keyCol: String = "event_type"): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be positive, got $bucketSeconds")
    val sec = "((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    val b = events.select(col(keyCol),
      expr(s"$sec - pmod($sec, $bucketSeconds)").as("bucket_s"), col("value"))
    // ONE row-grain pass: bounds and the key axis both read the
    // bucket-grain aggregate, not the raw events (three raw scans
    // otherwise — review finding); the cut makes the reuse real
    val observed = Ckpt.narrowLazy(b.groupBy(keyCol, "bucket_s")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value")))
    val bounds = observed.agg(min("bucket_s").as("lo"), max("bucket_s").as("hi"))
    val axis = observed.select(keyCol).distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds frame — bounded by construction
      .select(col(keyCol),
        explode(expr(s"sequence(lo, hi, $bucketSeconds)")).as("bucket_s"))
    axis.join(observed, Seq(keyCol, "bucket_s"), "left")
      .select(col(keyCol), col("bucket_s"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .withColumn("cum_events", sum(col("n_events")).over(
        Window.partitionBy(keyCol).orderBy("bucket_s")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered funnel: how many keys reach each step of `steps` IN ORDER —
    * step k counts keys with an event of type k at-or-after their
    * earliest step-(k−1) reach time (the classic conversion funnel,
    * earliest-reach semantics: ties at the same instant count as
    * reached, matching the inclusive as-of convention). Output one row
    * per step with the key count and parts-per-million conversion
    * against step 1.
    *
    * Scale shape: each step is one type-filtered scan equi-joined to
    * the previous step's (key, reach) frame — O(steps) passes, no
    * windows over the event stream, no per-key event buffering. Step
    * frames are lineage-cut ([[Ckpt]]) because each feeds both the
    * next step and its own count.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val ev = events.select(col(keyCol).as("k"), col(typeCol).as("t"),
      unix_micros(col("ts")).as("us"))
    var frames = Vector(Ckpt.narrowLazy(
      ev.filter(col("t") === steps.head)
        .groupBy("k").agg(min(col("us")).as("reach_us"))))
    for (s <- steps.tail) {
      frames :+= Ckpt.narrowLazy(
        ev.filter(col("t") === s)
          .join(frames.last.select(col("k"), col("reach_us").as("prev_us")),
            "k")
          .filter(col("us") >= col("prev_us"))
          .groupBy("k").agg(min(col("us")).as("reach_us")))
    }
    val counts = frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"),
          lit(steps(i)).as("step"), col("n_users"))
    }.reduce(_ unionByName _)
    counts
      .crossJoin(broadcast( // 1-row step-1 count — bounded by construction
        frames.head.agg(count(lit(1)).as("n_first"))))
      .select(col("step_idx"), col("step"), col("n_users"),
        when(col("n_first") === 0L, 0L)
          .otherwise(expr("(n_users * 1000000) div n_first")).as("conv_ppm"))
  }

  /** SCD2 change history: collapse each key's event stream into validity
    * intervals of its `attrCol` state — a row per state CHANGE with
    * [valid_from, valid_to) epoch-µs bounds, a per-key version number,
    * and the open-interval current flag. The CDC→dimension shape: replay
    * a change log into the as-of-queryable history an [[AsOf.join]]
    * probes.
    *
    * Plan shape: one exchange on `keyCol` serves all three window passes
    * (change detection lag, interval lead, version row_number — all
    * share the (key, ts, event_id) sort), and the lead/row_number run on
    * the FILTERED change rows, not every event. Determinism: (ts,
    * event_id) is a total order within every key.
    */
  def changeHistory(events: DataFrame, keyCol: String = "user_id",
      attrCol: String = "event_type"): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(col("ts"), col("event_id"))
    val changes = events
      .select(col(keyCol), col(attrCol).as("state"), col("ts"), col("event_id"))
      .withColumn("prev_state", lag(col("state"), 1).over(order))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
    changes
      .select(col(keyCol), col("state"),
        unix_micros(col("ts")).as("valid_from_us"),
        lead(unix_micros(col("ts")), 1).over(order).as("valid_to_us"),
        row_number().over(order).cast("long").as("version"))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1L).otherwise(0L))
  }

  /** Rolling spike detection over the gap-filled event-rate series: a
    * bucket's event count is a spike when it sits more than
    * `kNum/kDen` trailing standard deviations above (or below) the
    * previous `windowBuckets` buckets' mean — the monitoring-tier
    * anomaly pass, run on the DENSE series ([[gapFill]]) because a
    * plain group-by would hide exactly the zero-count outage buckets
    * this exists to catch.
    *
    * The z-test is cross-multiplied into exact BIGINT so it hash-gates:
    * with trailing sum S and sum-of-squares Q over W buckets,
    * z² > k² ⟺ dev² · den² > num² · (W·Q − S²) where
    * dev = W·x − S (both sides exact; W·Q − S² = W²·σ² ≥ 0). A
    * zero-variance history flags any deviation (the MAD-tier caveat,
    * deterministic). The first `windowBuckets` buckets of each key
    * have no full history and are not judged.
    *
    * Scale shape: everything beyond [[gapFill]]'s one raw-event
    * aggregation runs at AXIS grain (keys × span/bucket) — the rolling
    * window is rows-framed over that bounded series, never the events.
    */
  def spikeDetection(events: DataFrame, bucketSeconds: Long = 3600L,
      keyCol: String = "event_type", windowBuckets: Int = 24,
      kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    require(windowBuckets >= 2, s"windowBuckets must be >= 2, got $windowBuckets")
    require(kNum >= 1 && kDen >= 1, s"threshold must be positive: $kNum/$kDen")
    val w = Window.partitionBy(keyCol).orderBy("bucket_s")
      .rowsBetween(-windowBuckets, -1)
    val W = windowBuckets.toLong
    gapFill(events, bucketSeconds, keyCol)
      .select(col(keyCol), col("bucket_s"), col("n_events"))
      .withColumn("hist_n", count(lit(1)).over(w))
      .withColumn("s", sum("n_events").over(w))
      .withColumn("q", sum(expr("n_events * n_events")).over(w))
      .filter(col("hist_n") === W)
      .select(col(keyCol), col("bucket_s"), col("n_events"),
        col("s"), col("q"),
        (lit(W) * col("n_events") - col("s")).as("dev_w"),
        (lit(W) * col("q") - col("s") * col("s")).as("var_w2"))
      .withColumn("is_spike",
        (col("dev_w") * col("dev_w") * lit(kDen * kDen) >
          lit(kNum * kNum) * col("var_w2")).cast("bigint"))
  }

  /** Linear multi-touch attribution: every conversion credits ALL of
    * the same user's touch events inside the lookback window EQUALLY —
    * the multi-touch generalization of q43's last-touch as-of join
    * (last-touch over-credits whatever happened to land final; linear
    * is the standard first-order correction).
    *
    * Per conversion: the touch count, the equal per-touch credit in ppm
    * (exact floor division — total credited ppm differs from 10⁶ only
    * by the floor remainder, deterministically), and the first/last
    * touch ids (min/max over (ts, id) structs — deterministic because
    * (user, ts) is unique in this corpus, and the id tiebreak makes it
    * deterministic even when it is not). Conversions with NO in-window
    * touch emit with n_touches = 0 and NULL credit/ids — the organic
    * segment a marketing reader explicitly wants visible.
    *
    * Scale shape: the lookback pairing is [[RangeJoin.lookbackJoin]] —
    * one hash equi-join on (user, time-bin) with 2× right-side
    * amplification, never a nested-loop range join; everything after
    * is one map-side-combinable groupBy at conversion grain plus the
    * left join restoring organics.
    */
  def linearAttribution(events: DataFrame, convType: String = "purchase",
      touchType: String = "click",
      windowSeconds: Long = 7L * 86400L): DataFrame = {
    val conv = events.filter(col("event_type") === convType)
      .select(col("event_id"), col("user_id"), col("ts"))
    val touch = events.filter(col("event_type") === touchType)
      .select(col("event_id"), col("user_id"), col("ts"))
    val per = RangeJoin.lookbackJoin(conv, touch, key = "user_id",
        leftId = "event_id", leftTs = "ts",
        rightId = "event_id", rightTs = "ts",
        windowSeconds = windowSeconds)
      .groupBy(col("lid").as("event_id"))
      .agg(count(lit(1)).as("n_touches"),
        // first touch = largest gap (earliest); struct max/min break
        // gap ties on the touch id, so the pick is total-ordered
        max(struct(col("gap_us"), col("rid"))).as("ft"),
        min(struct(col("gap_us"), col("rid"))).as("lt"))
    conv
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .join(per, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        when(col("n_touches") > 0,
          expr("1000000 div n_touches")).as("credit_ppm"),
        col("ft.rid").as("first_touch_id"),
        col("lt.rid").as("last_touch_id"))
  }

  /** Time-weighted average (the TWAP/metrics-rollup shape): per key,
    * each observation weighted by how long it was the CURRENT value —
    * the mean a monitoring/pricing consumer wants when samples arrive
    * irregularly (a plain mean over-weights bursts; the q123 resample
    * shows the same pathology at bucket grain).
    *
    * Semantics: step-function hold — observation i holds from its ts
    * until the next observation's ts; the LAST observation has no
    * successor and carries zero weight (the standard left-closed
    * convention; callers wanting a horizon pass a sentinel row).
    * Single-observation keys have an empty weighted span → NULL twap.
    *
    * Determinism: values fixed-pointed to cents, hold times floored to
    * whole seconds — `twap_cents = Σ cents·dt div Σ dt` is exact
    * BIGINT floor division (per-row cents ≤ ~10⁶ × dt ≤ ~10⁸ s keeps
    * the sum far inside BIGINT), `mean_cents` rides along for the
    * burstiness contrast. Scale shape: one `lead` window partitioned
    * by the key (per-key data, not global), one groupBy — nothing
    * crosses an exchange but (key, cents, dt) longs.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String = "user_id",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("ts_us")
    events
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull
        && col("ts").isNotNull)
      .select(col(keyCol).as("key"),
        unix_micros(col("ts")).as("ts_us"),
        expr(s"cast(round($valueCol * 100) as bigint)").as("cents"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .withColumn("dt_s", expr("(next_us - ts_us) div 1000000"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum(col("dt_s")).as("span_s"),
        sum(col("cents") * col("dt_s")).as("wsum"),
        sum(col("cents")).as("csum"))
      .select(col("key"), col("n_events"),
        coalesce(col("span_s"), lit(0L)).as("span_s"),
        when(col("span_s") > 0, expr("wsum div span_s")).as("twap_cents"),
        expr("csum div n_events").as("mean_cents"))
  }

  /** Day-of-week seasonality profile per event type: event count, the
    * number of CALENDAR days of that weekday inside the corpus span
    * (a ragged span gives some weekdays one more day than others —
    * dividing by it is what makes rates comparable; a naive share
    * against 1/7 would bake that bias in), and the exact per-day rate
    * in milli-events. dow 0 = Monday via `pmod(epoch_day + 3, 7)` —
    * pure integer arithmetic, no calendar/locale functions (DATE_PART
    * weekday numbering differs between engines).
    */
  def dowProfile(events: DataFrame,
      keyCol: String = "event_type"): DataFrame = {
    val obs = events
      .filter(col(keyCol).isNotNull && col("ts").isNotNull)
      .select(col(keyCol).as("grp"),
        expr("unix_micros(ts) div 1000000 div 86400").as("day"))
    val counts = Ckpt.narrowLazy(obs
      .select(col("grp"), expr("pmod(day + 3, 7)").as("dow"))
      .groupBy("grp", "dow").agg(count(lit(1)).as("n_events")))
    val bounds = obs.agg(min("day").as("lo"), max("day").as("hi"))
    val dowDays = broadcast(bounds)
      .select(explode(expr("sequence(lo, hi)")).as("day"))
      .select(expr("pmod(day + 3, 7)").as("dow"))
      .groupBy("dow").agg(count(lit(1)).as("n_days"))
    counts.join(dowDays, Seq("dow"))
      .select(col("grp"), col("dow"), col("n_events"), col("n_days"),
        expr("n_events * 1000 div n_days").as("rate_milli"))
  }

  /** CUSUM drift audit per event type over the dense daily cents
    * series: cumulative sum of (day's cents − target) with target =
    * the type's floor-mean daily cents, reporting the maximum positive
    * and negative excursions and the first day each was reached — the
    * classic change-point screen ("when did this type's volume
    * structurally depart from its own average"). Exact BIGINT: the
    * target is one floor division, every excursion an integer; first-
    * reach ties resolve by day (min-struct, deterministic).
    *
    * Scale shape: one row-grain groupBy to (type, day); the CUSUM
    * windows run over the dense TIME axis (the q130/q123 bounded-axis
    * posture), never over events.
    */
  def cusumDrift(events: DataFrame, keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daySec = 86400L
    val daily = Ckpt.narrowLazy(events
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull
        && col("ts").isNotNull)
      .groupBy(col(keyCol).as("grp"),
        expr(s"unix_micros(ts) div 1000000 div $daySec").as("day"))
      .agg(sum(expr(s"cast(round($valueCol * 100) as bigint)")).as("y")))
    val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
    val axis = daily.select("grp").distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds frame — bounded
      .select(col("grp"), explode(expr("sequence(lo, hi)")).as("day"))
    val dense = axis.join(daily, Seq("grp", "day"), "left")
      .select(col("grp"), col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val targets = dense.groupBy("grp")
      .agg(expr("sum(y) div count(1)").as("target_cents"))
    val w = Window.partitionBy("grp").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = Ckpt.narrowLazy(dense.join(targets, Seq("grp"))
      .withColumn("cusum", sum(col("y") - col("target_cents")).over(w)))
    val ext = cs.groupBy("grp")
      .agg(max(col("cusum")).as("max_cusum_cents"),
        min(col("cusum")).as("min_cusum_cents"))
    cs.join(ext, Seq("grp"))
      .groupBy("grp")
      .agg(max(col("target_cents")).as("target_cents"),
        max(col("max_cusum_cents")).as("max_cusum_cents"),
        min(when(col("cusum") === col("max_cusum_cents"), col("day")))
          .as("max_day"),
        min(col("min_cusum_cents")).as("min_cusum_cents"),
        min(when(col("cusum") === col("min_cusum_cents"), col("day")))
          .as("min_day"))
  }

  /** Cohort LTV triangle: users cohorted by first-event week, and per
    * (cohort, week offset) the cohort's revenue cents, the running
    * cumulative, and the per-user cumulative floor — the lifetime-value
    * table a growth team reads next to [[retentionCohorts]]' activity
    * triangle (this one sums money where that one counts heads).
    *
    * Offsets are DENSE per cohort through the corpus' last week
    * (zero-revenue weeks are rows — flat stretches of the LTV curve
    * are the finding), so the triangle is bounded by weeks², never by
    * event count; the raw table is touched by exactly two user-grain
    * map-side aggs (first week, weekly cents). Exact BIGINT cents end
    * to end; the per-user average is floor division.
    */
  def cohortLtv(events: DataFrame, keyCol: String = "user_id",
      valueCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Ckpt.narrowLazy(events
      .filter(col(keyCol).isNotNull && col("ts").isNotNull
        && col(valueCol).isNotNull)
      .select(col(keyCol).as("u"),
        expr("unix_micros(ts) div 1000000 div 604800").as("week"),
        expr(s"cast(round($valueCol * 100) as bigint)").as("cents")))
    val firstWeek = Ckpt.narrowLazy(
      ev.groupBy("u").agg(min(col("week")).as("cohort")))
    val sizes = firstWeek.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    val rev = ev.groupBy("u", "week").agg(sum(col("cents")).as("cents"))
      .join(firstWeek, Seq("u"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset"))
      .agg(sum(col("cents")).as("revenue_cents"))
    val hi = ev.agg(max(col("week")).as("hi"))
    val axis = sizes.crossJoin(broadcast(hi)) // 1-row frame — bounded
      .select(col("cohort"), col("cohort_size"),
        explode(expr("sequence(0L, hi - cohort)")).as("offset"))
    axis.join(rev, Seq("cohort", "offset"), "left")
      .select(col("cohort"), col("offset"), col("cohort_size"),
        coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"))
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(
        Window.partitionBy("cohort").orderBy("offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_per_user_cents",
        expr("cum_revenue_cents div cohort_size"))
  }

  /** Rolling active users: per day of the dense span, the exact
    * distinct-user counts for the day itself (DAU) and the trailing
    * `windowDays` window (WAU at 7), plus the DAU/WAU stickiness ratio
    * in exact ppm — the engagement headline metric.
    *
    * Exactness without a sliding distinct: presence collapses to
    * (user, day) grain map-side, then each presence row EXPLODES into
    * the `windowDays` report-days it makes the user active in —
    * total work is windowDays × |presence|, and the count per report
    * day is a plain distinct at (reportDay, user) grain. No window
    * function ever sees a user row; the only per-day state is the
    * count. Days with zero actives appear (dense axis; DAU = 0,
    * stickiness NULL when WAU = 0) — the outage reading. Leading days
    * whose trailing window starts before the span are reported as-is
    * (partial window, the standard convention).
    */
  def rollingActive(events: DataFrame, windowDays: Int = 7,
      keyCol: String = "user_id"): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val pres = Ckpt.narrowLazy(events
      .filter(col(keyCol).isNotNull && col("ts").isNotNull)
      .select(col(keyCol).as("u"),
        expr("unix_micros(ts) div 1000000 div 86400").as("day"))
      .distinct())
    val bounds = pres.agg(min("day").as("lo"), max("day").as("hi"))
    val dau = pres.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = pres
      .crossJoin(broadcast(bounds)) // 1-row bounds frame — bounded
      .select(col("u"), explode(expr(
        s"sequence(day, least(day + ${windowDays - 1}L, hi))")).as("day"))
      .distinct() // a user active twice inside one window counts once
      .groupBy("day").agg(count(lit(1)).as("wau"))
    val axis = broadcast(bounds)
      .select(explode(expr("sequence(lo, hi)")).as("day"))
    axis.join(dau, Seq("day"), "left").join(wau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
      .withColumn("stickiness_ppm",
        when(col("wau") > 0, expr("dau * 1000000 div wau")))
  }

  /** [[rollingActive]]'s LARGE-WINDOW scale path — output-identical
    * (same columns, same exact counts; SessionsSpec pins the hash law
    * merged ≡ exploded at several windows), but work does NOT carry the
    * `windowDays` multiplier: the presence-explode rendering costs
    * windowDays × |presence| rows, fine at 7 but 13× more at the 90-day
    * DAU/MAU a dashboard actually wants. Here each presence day covers
    * the interval [day, day + windowDays − 1] of report days; per user
    * the coverage intervals are MERGED (running-max islands — the
    * [[graft.operators.Dedup.applyCutSpans]] pattern; strictly
    * overlapping only, adjacency needs no merge under a ±1 diff array),
    * and each merged interval contributes one +1 at its start and one
    * −1 past its end. The trailing-window distinct count is then the
    * prefix sum of those deltas over the dense day axis.
    *
    * Work: one presence distinct, one per-user window over the user's
    * own presence rows (user-partitioned — never a global sort), one
    * day-grain aggregation, one prefix-sum window over the BOUNDED day
    * axis (hundreds of rows for years of data — the q123/q130 posture).
    * Interval rows never exceed presence rows, whatever `windowDays`;
    * at 100 TB the window size stops being a cost knob entirely.
    */
  def rollingActiveMerged(events: DataFrame, windowDays: Int = 90,
      keyCol: String = "user_id"): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val pres = Ckpt.narrowLazy(events
      .filter(col(keyCol).isNotNull && col("ts").isNotNull)
      .select(col(keyCol).as("u"),
        expr("unix_micros(ts) div 1000000 div 86400").as("day"))
      .distinct())
    val bounds = pres.agg(min("day").as("lo"), max("day").as("hi"))
    val dau = pres.groupBy("day").agg(count(lit(1)).as("dau"))
    // coverage interval per presence day, clamped to the span end
    val iv = pres.crossJoin(broadcast(bounds)) // 1-row bounds — bounded
      .select(col("u"), col("day").as("s"),
        least(col("day") + lit(windowDays - 1).cast("long"), col("hi")).as("e"))
    // per-user interval merge: a row opens a new island iff it starts
    // past the running max of earlier ends (adjacent intervals may stay
    // split — their +1/−1 deltas cancel at the shared boundary)
    val byU = Window.partitionBy("u").orderBy(col("s"), col("e"))
    val merged = iv
      .withColumn("pmax",
        max(col("e")).over(byU.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("news",
        (col("pmax").isNull || col("s") > col("pmax")).cast("bigint"))
      .withColumn("isl",
        sum(col("news")).over(byU.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("u", "isl")
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    // ±1 deltas at day grain; the −1 lands one past the interval end
    // and is dropped when it falls off the axis (prefix sum never
    // reaches it)
    val deltas = merged.select(col("s").as("day"), lit(1L).as("d"))
      .unionByName(merged.select((col("e") + 1L).as("day"), lit(-1L).as("d")))
      .groupBy("day").agg(sum(col("d")).as("net"))
    val axis = broadcast(bounds)
      .select(explode(expr("sequence(lo, hi)")).as("day"))
    axis.join(deltas, Seq("day"), "left")
      .withColumn("wau", sum(coalesce(col("net"), lit(0L))).over(
        Window.orderBy("day") // bounded day axis — q123/q130 posture
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
      .withColumn("stickiness_ppm",
        when(col("wau") > 0, expr("dau * 1000000 div wau")))
  }

  /** Weekly growth accounting: per week, the active-user count split
    * into NEW (first-ever week), RETAINED (also active the week
    * before), and RESURRECTED (active before, skipped ≥ 1 week), plus
    * CHURNED = last week's actives who went silent (the identity
    * churned_w = active_{w−1} − retained_w) — the standard
    * startup-metrics decomposition, and the engagement complement of
    * [[retentionCohorts]]' fixed-cohort triangle.
    *
    * Scale shape: presence collapses to (user, week) grain map-side
    * (one distinct), per-user lag runs in the user partition (never a
    * global sort), and everything after is WEEK grain. The one global
    * window (the churn lag over the week axis) runs on the
    * time-bounded axis — hundreds of rows for years of data — the
    * q130/q123 bounded-axis posture. Weeks are exact integer floors of
    * epoch seconds / 604800 (engine-portable; no calendar ambiguity).
    */
  def growthAccounting(events: DataFrame,
      keyCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pres = events
      .filter(col(keyCol).isNotNull && col("ts").isNotNull)
      .select(col(keyCol).as("u"),
        expr("unix_micros(ts) div 1000000 div 604800").as("week"))
      .distinct()
    val byUser = Window.partitionBy("u").orderBy("week")
    val marked = pres
      .withColumn("prev", lag(col("week"), 1).over(byUser))
      .select(col("week"),
        when(col("prev").isNull, 1L).otherwise(0L).as("is_new"),
        when(col("prev") === col("week") - 1, 1L).otherwise(0L)
          .as("is_retained"),
        when(col("prev").isNotNull && col("prev") < col("week") - 1, 1L)
          .otherwise(0L).as("is_resurrected"))
    val byWeek = Ckpt.narrowLazy(marked.groupBy("week")
      .agg(count(lit(1)).as("active"), sum(col("is_new")).as("new_users"),
        sum(col("is_retained")).as("retained"),
        sum(col("is_resurrected")).as("resurrected")))
    val bounds = byWeek.agg(min("week").as("lo"), max("week").as("hi"))
    val axis = broadcast(bounds) // 1-row frame — bounded
      .select(explode(expr("sequence(lo, hi)")).as("week"))
    val dense = axis.join(byWeek, Seq("week"), "left")
      .select(col("week"), coalesce(col("active"), lit(0L)).as("active"),
        coalesce(col("new_users"), lit(0L)).as("new_users"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        coalesce(col("resurrected"), lit(0L)).as("resurrected"))
    dense
      .withColumn("churned",
        coalesce(lag(col("active"), 1).over(Window.orderBy("week")), lit(0L))
          - col("retained"))
  }

  /** Per-group exact-integer OLS trend over the DENSE daily series:
    * slope of each group's daily cents total against the day index,
    * with zero-filled gap days (a quiet day is evidence of decline,
    * not a missing sample — the q123/q146 dense-axis posture). The
    * trend detector behind "is this error type growing".
    *
    * Arithmetic is the cross-multiplied OLS rational, exact BIGINT end
    * to end: num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)², emitted as the
    * exact pair plus a sign and `(10⁶·|num|) div den` (abs-then-floor,
    * because trunc-vs-floor division of NEGATIVES differs between
    * engines — the q136 lesson). x is the day index SHIFTED to the
    * global span start: slope is shift-invariant, and small x keeps
    * the Σxy products inside BIGINT (envelope: |num|·10⁶ < 2⁶³ —
    * holds through ~10¹² daily cents at year spans).
    *
    * Scale shape: one row-grain groupBy to (group, day) grain, a
    * broadcast 1-row bounds frame, a dense axis of groups × span days
    * (bounded by time, never row count), one group-grain agg.
    */
  def dailyTrend(events: DataFrame, keyCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val daySec = 86400L
    val sec = "((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    val daily = Ckpt.narrowLazy(events
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("grp"),
        expr(s"($sec - pmod($sec, $daySec)) div $daySec").as("day"))
      .agg(sum(expr(s"cast(round($valueCol * 100) as bigint)")).as("y")))
    val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
    val axis = daily.select("grp").distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds frame — bounded
      .select(col("grp"), col("lo"),
        explode(expr("sequence(lo, hi)")).as("day"))
    axis.join(daily, Seq("grp", "day"), "left")
      .select(col("grp"), (col("day") - col("lo")).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("sum_y_cents"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("grp"), col("n_days"), col("sum_y_cents"),
        (col("n_days") * col("sxy") - col("sx") * col("sum_y_cents")).as("num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("den"))
      .withColumn("slope_sign", signum(col("num")).cast("bigint"))
      .withColumn("slope_abs_microcents",
        when(col("den") > 0, expr("(abs(num) * 1000000) div den")))
  }

  /** First-order Markov transition matrix over per-key event streams:
    * for every ordered pair of consecutive events of the same key
    * closer than `gapSeconds` (the [[sessionize]] gap — a transition
    * across a session boundary is not behavior, it's absence), the
    * transition count, the from-state row total, and the row-normalized
    * probability in exact ppm floor division — the next-event model
    * behind sequence features, anomaly scoring ("this transition has
    * p < 1e-4"), and funnel hypothesis generation.
    *
    * Scale shape: one (key)-partitioned lead window (the stream never
    * globally sorts), then everything downstream at state×state grain —
    * bounded by the type vocabulary squared, never the event count.
    * Tie order within a key is (ts, event_id), the corpus-wide
    * deterministic order every temporal operator here uses.
    */
  def transitionMatrix(events: DataFrame, gapSeconds: Long = 1800L,
      keyCol: String = "user_id", typeCol: String = "event_type"): DataFrame =
    normalizeTransitions(
      transitionCounts(events, gapSeconds, keyCol, typeCol))

  /** The raw (from_type, to_type, n) transition counts behind
    * [[transitionMatrix]] — exposed because counts from batches that
    * PARTITION a key's ordered stream (each boundary pair counted by
    * the batch holding its later member) fold by summing `n`, which is
    * what the streaming ingest tier persists per micro-batch
    * ([[graft.streaming.Streams.ingestTransitions]]) and folds on read.
    */
  def transitionCounts(events: DataFrame, gapSeconds: Long = 1800L,
      keyCol: String = "user_id", typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    events
      .select(col(keyCol), col("ts"), col("event_id"),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .withColumn("dt_us",
        lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
      .filter(col("to_type").isNotNull && col("dt_us") <= gapUs)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
  }

  /** Longest-active-streak distribution: per user, the longest run of
    * CONSECUTIVE active days (gaps-and-islands over distinct presence
    * days — the engagement metric behind "7-day streak" product
    * mechanics and habit-formation cohorts), rolled up to
    * (streak_days → n_users). Exact integer throughout: island key =
    * day − row_number (consecutive days share it), streak = island
    * size, per-user longest = max.
    *
    * Shape: presence collapses to (user, day) grain map-side (the
    * [[rollingActive]] posture), one per-user day window, then
    * everything at (user, island) and user grain — never event rows;
    * the output is bounded by the corpus span in days.
    */
  def activeStreaks(events: DataFrame): DataFrame = {
    val daySec = 86400L
    val sec = "((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    val pres = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        expr(s"($sec - pmod($sec, $daySec)) div $daySec").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    pres
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max(col("len")).as("streak_days"))
      .groupBy("streak_days").agg(count(lit(1)).as("n_users"))
  }

  /** Sequential-pattern support: every within-session consecutive
    * event-type TRIGRAM with its occurrence count and distinct-user
    * support — one order past [[transitionCounts]]' bigrams, the
    * shortest pattern that distinguishes "browse → buy" from
    * "browse → buy → refund". Both gaps must close within
    * `gapSeconds` (a trigram spanning a session boundary is absence,
    * not behavior — the q151 posture); support counts USERS, not
    * occurrences, so one looping bot cannot mint a popular pattern;
    * patterns under `minUsers` are cut (the classic min-support).
    *
    * Shape: one per-user (ts, event_id) window carries both leads,
    * then everything at type³ grain — bounded by the vocabulary cubed,
    * never event count; the distinct-user support is a (trigram, user)
    * two-level aggregate, map-side combinable.
    */
  def eventTrigrams(events: DataFrame, gapSeconds: Long = 1800L,
      minUsers: Long = 5L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .withColumn("d1",
        lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
      .withColumn("d2",
        lead(unix_micros(col("ts")), 2).over(w)
          - lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("t3").isNotNull
        && col("d1") <= gapUs && col("d2") <= gapUs)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user_id")).as("n_users"))
      .filter(col("n_users") >= minUsers)
  }

  /** Row-normalization tail shared by the batch and streamed faces (so
    * the two cannot drift): from-state totals and exact-ppm
    * probabilities over a (from_type, to_type, n) counts frame.
    */
  def normalizeTransitions(trans: DataFrame): DataFrame = {
    val totals = trans.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    trans.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("n * 1000000 div n_from").as("p_ppm"))
  }

  /** Interval-concurrency audit over the sessionized stream: for every
    * `bucketSeconds` bucket a session touches, how many sessions were
    * LIVE there (bucket overlap of the closed session interval), how
    * many STARTED there, and a peak marker — the capacity-planning
    * reading of [[sessionize]]'s output (what the peak simultaneous
    * load was, and when). Buckets no session touches do not appear
    * (concurrent ≥ 1 on every output row by construction).
    *
    * Scale shape: the textbook +1/−1 event sweep needs a SINGLE total
    * order over all boundaries — a one-partition sort that cannot
    * scale. Instead each session explodes into only the buckets it
    * covers (fan-out = duration/bucket + 1, so total work is
    * session-time/bucket — linear in the corpus while sessions stay
    * gap-bounded), and the count is ONE bucket-grain aggregation with
    * map-side partial combine. The peak marker reads a 1-row max frame
    * back over the bucket axis (broadcast, bounded by construction).
    * Bucket arithmetic is exact integer floor on epoch seconds —
    * engine-portable, no timezone/format ambiguity.
    */
  def concurrency(events: DataFrame, bucketSeconds: Long = 3600L,
      gapSeconds: Long = 1800L): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be positive, got $bucketSeconds")
    val floorB = (c: String) =>
      expr(s"($c div 1000000) - pmod($c div 1000000, $bucketSeconds)")
    val cov = sessionize(events, gapSeconds)
      .select(floorB("session_start_us").as("sb"),
        floorB("session_end_us").as("eb"))
      .select(col("sb"),
        explode(expr(s"sequence(sb, eb, ${bucketSeconds}L)")).as("bucket_s"))
    val counts = cov.groupBy("bucket_s")
      .agg(count(lit(1)).as("concurrent"),
        sum(when(col("sb") === col("bucket_s"), 1L).otherwise(0L))
          .as("started"))
    val peak = counts.agg(max(col("concurrent")).as("mx"))
    counts.crossJoin(broadcast(peak)) // 1-row max frame — bounded
      .select(col("bucket_s"), col("concurrent"), col("started"),
        when(col("concurrent") === col("mx"), 1L).otherwise(0L)
          .as("is_peak"))
  }

  /** Fano-factor burstiness per group: variance-to-mean ratio of the
    * DENSE zero-filled daily event counts (Poisson arrivals sit at
    * fano ≈ 1; sessions/campaigns/incidents push it up; a rate limiter
    * or scheduler pins it below 1 — the dispersion reading that tells
    * a capacity planner whether [[dowProfile]]'s averages are safe to
    * provision against). Exact integer end to end: with n days and
    * daily counts c, fano_ppm = 10⁶·(n·Σc² − (Σc)²) div (n·Σc) — the
    * population variance/mean cross-multiplied so the one floor
    * division happens last; the numerator is ≥ 0 by Cauchy-Schwarz,
    * so floor-vs-trunc never disagrees across engines.
    *
    * Shape: the [[dailyTrend]] skeleton — row-grain groupBy to
    * (group, day), a broadcast 1-row bounds frame, the dense
    * groups × span-days axis, one group-grain fold. Envelope:
    * 10⁶·n·Σc² < 2⁶³ — holds through ~5·10⁶ events/day at year spans.
    */
  def fanoFactor(events: DataFrame, keyCol: String = "event_type"): DataFrame = {
    val daySec = 86400L
    val sec = "((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    val daily = events.filter(col(keyCol).isNotNull && col("ts").isNotNull)
      .groupBy(col(keyCol).as("grp"),
        expr(s"($sec - pmod($sec, $daySec)) div $daySec").as("day"))
      .agg(count(lit(1)).as("c"))
    val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
    val axis = daily.select("grp").distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds frame — bounded
      .select(col("grp"), explode(expr("sequence(lo, hi)")).as("day"))
    axis.join(daily, Seq("grp", "day"), "left")
      .select(col("grp"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("grp"), col("n_days"), col("n_events"),
        expr("(n_events * 1000) div n_days").as("mean_milli"),
        when(col("n_events") > 0, expr(
          "((n_days * sum_c2 - n_events * n_events) * 1000000)" +
            " div (n_days * n_events)")).as("fano_ppm"))
  }

  /** AR(1) autoregression of the dense zero-filled daily counts per
    * group: the exact-integer OLS slope of x_{t+1} on x_t — the
    * mean-reversion/momentum screen beside [[dailyTrend]]'s drift and
    * [[fanoFactor]]'s dispersion (slope ≈ 0: memoryless Poisson days;
    * → 1: persistent regimes — campaigns, incidents; < 0: alternating
    * load). Same cross-multiplied rational as [[dailyTrend]] over the
    * m = n−1 consecutive day pairs: num = m·Σxy − Σx·Σy, den = m·Σx² −
    * (Σx)², emitted exact plus sign and abs-then-floor micro units
    * (floor-vs-trunc of negatives differs across engines — the q152
    * pattern throughout).
    *
    * Shape: the [[fanoFactor]] dense-axis skeleton, one lead window AT
    * AXIS GRAIN (groups × span days — time-bounded, never row count),
    * one group-grain fold.
    */
  def ar1Daily(events: DataFrame, keyCol: String = "event_type"): DataFrame = {
    val daySec = 86400L
    val sec = "((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    val daily = events.filter(col(keyCol).isNotNull && col("ts").isNotNull)
      .groupBy(col(keyCol).as("grp"),
        expr(s"($sec - pmod($sec, $daySec)) div $daySec").as("day"))
      .agg(count(lit(1)).as("c"))
    val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
    val axis = daily.select("grp").distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds frame — bounded
      .select(col("grp"), explode(expr("sequence(lo, hi)")).as("day"))
    val wLead = Window.partitionBy("grp").orderBy("day")
    axis.join(daily, Seq("grp", "day"), "left")
      .select(col("grp"), col("day"), coalesce(col("c"), lit(0L)).as("x"))
      .withColumn("y", lead(col("x"), 1).over(wLead))
      .filter(col("y").isNotNull)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("grp"), col("n_pairs"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("den"))
      .withColumn("ar1_sign", signum(col("num")).cast("bigint"))
      .withColumn("ar1_abs_micro",
        when(col("den") > 0, expr("(abs(num) * 1000000) div den")))
  }

  /** Nelson–Aalen cumulative hazard of the SECOND event of `eventType`
    * per user — time-to-repurchase survival analysis at week grain.
    * Study population = users with ≥ 1 such event; the duration is
    * weeks from first to second event, right-censored at the corpus'
    * last event timestamp for one-event users (the honest treatment a
    * naive "average days between purchases" gets wrong: silent users
    * are evidence, not missing data). Per week w: d_w = repurchases
    * landing at week w, c_w = censoring there, risk set n_w = users
    * whose duration ≥ w (the standard convention: a user censored AT
    * w is still at risk at w), hazard h_w = d_w/n_w and the cumulative
    * hazard H_w = Σ_{v≤w} h_v — all in exact ppm floor division, the
    * per-week ppm summed AFTER flooring so both engines agree
    * bit-for-bit (Nelson–Aalen needs only sums, never the products a
    * Kaplan–Meier curve would force through libm).
    *
    * Shape: one user-partitioned (ts, event_id) rank window picks each
    * user's first/second event, user-grain duration rows, then
    * everything at dense WEEK grain (bounded by the corpus span, never
    * user count): one running-sum window orders the week axis.
    */
  def repurchaseHazard(events: DataFrame,
      eventType: String = "purchase"): DataFrame = {
    val sec = "((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    val purchases = events.filter(col("event_type") === eventType
        && col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), expr(sec).as("s"))
    hazardFromPurchases(purchases, purchases.agg(max(col("s")).as("tmax")))
  }

  /** The Nelson–Aalen tail behind [[repurchaseHazard]], from raw
    * (user_id, event_id, s) candidate rows + a 1-row `tmax` horizon —
    * exposed because any SUPERSET of each user's two earliest purchase
    * rows yields the identical frame (the global two earliest are
    * inside the union of per-batch two-earliest), which is what the
    * streaming ingest tier persists per micro-batch
    * ([[graft.streaming.Streams.ingestHazard]]) and folds on read: a
    * pure order-independent mergeable, so streamed ≡ batch is a hash
    * law, not an approximation.
    */
  def hazardFromPurchases(purchases: DataFrame,
      horizon: DataFrame): DataFrame = {
    val weekSec = 7L * 86400L
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("s"), col("event_id"))
    val perUser = purchases
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= 2)
      .groupBy("user_id")
      .agg(min(when(col("rn") === 1, col("s"))).as("t1"),
        min(when(col("rn") === 2, col("s"))).as("t2"))
    val durations = perUser
      .crossJoin(broadcast(horizon)) // 1-row study horizon — bounded
      .select(
        expr(s"if(t2 IS NOT NULL, (t2 - t1) div $weekSec," +
          s" (tmax - t1) div $weekSec)").as("week"),
        col("t2").isNotNull.cast("long").as("observed"))
    val weekly = durations.groupBy("week")
      .agg(sum(col("observed")).as("d"),
        sum(lit(1L) - col("observed")).as("c"))
    val bounds = weekly.agg(max("week").as("hi"),
      sum(col("d") + col("c")).as("n_users"))
    val axis = bounds.select(col("n_users"),
      explode(expr("sequence(0L, hi)")).as("week"))
    val wOrd = Window.orderBy("week") // dense week axis — bounded by span
    axis.join(weekly, Seq("week"), "left")
      .select(col("week"), col("n_users"),
        coalesce(col("d"), lit(0L)).as("n_events"),
        coalesce(col("c"), lit(0L)).as("n_censored"))
      .withColumn("n_at_risk", col("n_users")
        - coalesce(sum(col("n_events") + col("n_censored"))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("hazard_ppm", when(col("n_at_risk") > 0,
        expr("(n_events * 1000000) div n_at_risk")).otherwise(lit(0L)))
      .withColumn("cumhaz_ppm", sum(col("hazard_ppm"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("week", "n_at_risk", "n_events", "n_censored",
        "hazard_ppm", "cumhaz_ppm")
  }
}
