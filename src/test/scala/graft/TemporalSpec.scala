package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Sessions}
import graft.sources.Tables

/** Temporal-operator laws: as-of join semantics on crafted rows plus an
  * argmax law over the real corpus; sessionization gap/island laws plus a
  * differential check against the streaming `session_window` rendering.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val crafted = {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 9.0),
      (1L, ts("2024-01-01 10:05:00"), 101L, 9.5),
      (1L, ts("2024-01-01 10:05:00"), 102L, 9.7), // same-ts tie: larger id wins
      (2L, ts("2024-01-01 11:00:00"), 200L, 5.0)
    ).toDF("key", "qts", "qid", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1000L), // == quote ts: inclusive sees it
      (1L, ts("2024-01-01 10:07:00"), 1001L),
      (1L, ts("2024-01-01 09:00:00"), 1002L), // before any quote → NULL
      (2L, ts("2024-01-01 12:00:00"), 1003L),
      (3L, ts("2024-01-01 12:00:00"), 1004L)  // key with no quotes → NULL
    ).toDF("key", "tts", "tid")
    (quotes, trades)
  }

  test("as-of join: inclusive mode matches latest right with rightTs <= leftTs") {
    val (quotes, trades) = crafted
    val got = AsOf.join(trades, quotes, key = "key", leftTs = "tts",
        rightTs = "qts", payload = Seq("qid", "px"), tiebreak = "qid")
      .orderBy("tid")
      .select("tid", "qid", "px")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq(
      (1000L, Some(102L), Some(9.7)), // equal-ts visible, tie → larger qid
      (1001L, Some(102L), Some(9.7)),
      (1002L, None, None),            // trade precedes every quote
      (1003L, Some(200L), Some(5.0)),
      (1004L, None, None)))           // key absent on right
  }

  test("as-of two-pass (sliceOf) == plain path, hot key owning half the input") {
    import spark.implicits._
    val base = 1704100000000000L // µs
    // key 1 owns 50% of both sides; ts scatter creates equal-ts ties,
    // right-empty slices (cross-slice carry), and before-first-right rows
    val left = (0 until 2000).map { i =>
      val k = if (i % 2 == 0) 1L else (i % 20).toLong + 2
      (i.toLong, k, base + (i * 7919L % 200L) * 1000000L)
    }
    val right = (0 until 600).map { i =>
      val k = if (i % 2 == 0) 1L else (i % 20).toLong + 2
      (i.toLong, k, base + (i * 104729L % 97L) * 3000000L, i * 1.5)
    }
    val l = left.toDF("id", "k", "us")
      .select(col("id"), col("k"), timestamp_micros(col("us")).as("lts"))
    val r = right.toDF("rid", "k", "rus", "px")
      .select(col("rid"), col("k"), timestamp_micros(col("rus")).as("rts"), col("px"))
    // 10-second slices over a ~300-second span → ~30 slices per key
    val slice: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => floor(unix_micros(t) / 10000000L)
    def run(strict: Boolean, s: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]) =
      AsOf.join(l, r, key = "k", leftTs = "lts", rightTs = "rts",
          payload = Seq("rid", "px"), tiebreak = "rid", strict = strict, sliceOf = s)
        .orderBy("id").select("id", "rid", "px")
        .collect().map(_.toSeq).toSeq
    assert(run(strict = false, Some(slice)) == run(strict = false, None))
    assert(run(strict = true, Some(slice)) == run(strict = true, None))
  }

  test("as-of join: strict mode excludes equal-timestamp right rows") {
    val (quotes, trades) = crafted
    val got = AsOf.join(trades, quotes, key = "key", leftTs = "tts",
        rightTs = "qts", payload = Seq("qid"), tiebreak = "qid", strict = true)
      .orderBy("tid").select("tid", "qid")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    // trade 1000 at 10:05 must now see only the 10:00 quote (qid 100)
    assert(got.toSeq.take(2) == Seq((1000L, Some(100L)), (1001L, Some(102L))))
  }

  test("as-of join: NULL right timestamps never match (they are not <= anything)") {
    import spark.implicits._
    val right = Seq(
      (1L, Option.empty[java.sql.Timestamp], 900L, 1.1),
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), 100L, 2.2)
    ).toDF("key", "qts", "qid", "px")
    val left = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 10L), // before any real quote
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 11L)
    ).toDF("key", "tts", "tid")
    val got = AsOf.join(left, right, key = "key", leftTs = "tts",
        rightTs = "qts", payload = Seq("qid", "px"), tiebreak = "qid")
      .orderBy("tid").select("tid", "qid")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    // the NULL-ts right row must not become tid 10's "earliest" match
    assert(got.toSeq == Seq((10L, None), (11L, Some(100L))))
  }

  test("as-of join: caller columns named like old internals survive untouched") {
    import spark.implicits._
    // left frame carries the exact names the implementation once used
    // internally — they must pass through unharmed, not be clobbered
    val left = Seq((1L, ts("2024-01-01 10:06:00"), "keepA", "keepB", 7L))
      .toDF("key", "tts", "_ats", "_best", "_side")
    val (quotes, _) = crafted
    val got = AsOf.join(left, quotes, key = "key", leftTs = "tts",
        rightTs = "qts", payload = Seq("qid"), tiebreak = "qid")
      .select("_ats", "_best", "_side", "qid")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("keepA", "keepB", 7L, 102L)))
    // the output column name itself is the one reserved name — fail fast
    val clash = left.withColumnRenamed("_ats", "asof_qts")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(clash, quotes, key = "key", leftTs = "tts",
        rightTs = "qts", payload = Seq("qid"), tiebreak = "qid")
    }
    assert(e.getMessage.contains("asof_qts"))
  }

  test("as-of join law on corpus: match is the argmax prior click, row count preserved") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val joined = AsOf.join(purchases, clicks, key = "user_id",
      leftTs = "ts", rightTs = "ts", payload = Seq("click_id"), tiebreak = "click_id")

    assert(joined.count() == purchases.count()) // left-outer: no row loss/dup

    // every match must be the max click ts <= purchase ts: no qualifying
    // click may exist strictly later than the one the join picked
    val viol = joined.alias("j")
      .join(clicks.alias("c"), col("j.user_id") === col("c.user_id") &&
        col("c.ts") <= col("j.ts") &&
        (col("j.asof_ts").isNull || col("c.ts") > col("j.asof_ts")), "inner")
    assert(viol.count() == 0, "found a later qualifying click than the as-of match")
  }

  test("sessionize: islands split exactly at gaps > threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, "a", 2.0),
      (3L, ts("2024-01-01 10:40:00"), 7L, "a", 3.0),  // gap 30m == threshold: same session
      (4L, ts("2024-01-01 11:10:01"), 7L, "a", 4.0),  // gap 30m1s: new session
      (5L, ts("2024-01-01 10:00:00"), 8L, "b", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.sessionize(df, gapSeconds = 1800L)
      .orderBy("user_id", "session_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq((7L, 3L, 6.0), (7L, 1L, 4.0), (8L, 1L, 5.0)))
  }

  test("sessionize conservation laws on corpus") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val sess = Sessions.sessionize(ev, gapSeconds = 1800L).cache()
    try {
      // every event lands in exactly one session
      assert(sess.agg(sum("n_events")).head.getLong(0) == ev.count())
      // sessions of one user never overlap (start > previous end by > gap)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("session_start_us")
      val bad = sess
        .withColumn("prev_end", lag(col("session_end_us"), 1).over(w))
        .filter(col("prev_end").isNotNull &&
          col("session_start_us") - col("prev_end") <= 1800L * 1000000L)
      assert(bad.count() == 0, "adjacent sessions within the gap must have merged")
    } finally sess.unpersist()
  }

  test("sessionize differential: batch islands == streaming session_window rollup") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val batch = Sessions.sessionize(ev, gapSeconds = 1800L)
      .select("user_id", "session_start_us", "n_events")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq)
    // session_window end = last event + gap; start/count must agree
    val sw = ev.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq)
    assert(batch.toSeq == sw.toSeq)
  }

  test("q161 interevent laws on corpus: monotone percentiles, gap count = events - users") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val r = SparkEntry.queries("q161_interevent")(spark, TestSpark.Sf0001)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.nonEmpty)
    r.foreach { case (_, p50, p90, p99, mx) =>
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx,
        s"percentiles must be monotone: $p50/$p90/$p99/$mx")
    }
    // every user with k events contributes exactly k-1 gaps
    assert(r.map(_._1).sum ==
      ev.count() - ev.select("user_id").distinct().count())
  }

  test("cohortLtv: hand-checked triangle, dense offsets, revenue conservation") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),  // u1 cohort w0
      (2L, ts("2024-01-08 10:00:00"), 1L, "a", 2.0),  // u1 at offset 1
      (3L, ts("2024-01-08 11:00:00"), 2L, "a", 4.0)   // u2 cohort w1
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.cohortLtv(df).orderBy("cohort", "offset")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // (offset, size, revenue, cum, per-user) — cohorts in week order
    assert(got == Seq((0L, 1L, 100L, 100L, 100L), (1L, 1L, 200L, 300L, 300L),
      (0L, 1L, 400L, 400L, 400L)))
    assert(got.map(_._3).sum == 700L, "triangle must conserve total cents")
  }

  test("dowProfile: Monday mapping, ragged-span day counts") {
    import spark.implicits._
    // 2024-01-01 is a Monday; span Mon..Wed has one day of each dow 0..2
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "a", 0.0),
      (3L, ts("2024-01-03 10:00:00"), 1L, "a", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.dowProfile(df).orderBy("dow")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((0L, 2L, 1L, 2000L), (2L, 1L, 1L, 1000L)),
      s"expected Monday=0 with 2 events and Wednesday=2 with 1: $got")
  }

  test("repurchaseHazard: hand-checked risk sets, censoring, cumulative sum") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0),
      (2L, ts("2024-01-09 10:00:00"), 1L, "purchase", 1.0), // 8d -> week 1
      (3L, ts("2024-01-01 10:00:00"), 2L, "purchase", 1.0), // censored at e2
      (4L, ts("2024-01-02 10:00:00"), 2L, "view", 1.0)      // wrong type: ignored
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.repurchaseHazard(df).orderBy("week")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // week 0: both at risk, nothing happens; week 1: u1 repurchases,
    // u2 censors at the horizon (the corpus' last purchase)
    assert(got == Seq((0L, 2L, 0L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 500000L, 500000L)))
  }

  test("repurchaseHazard conservation on corpus: exits partition the population, cumhaz monotone") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val rows = Sessions.repurchaseHazard(ev).orderBy("week").collect()
    assert(rows.nonEmpty)
    val n0 = rows.head.getLong(1) // week-0 risk set = whole study population
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == n0,
      "every user must exit exactly once (event or censor)")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(5) >= a.getLong(5), "cumulative hazard must be monotone")
        assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3),
          "risk set must shrink by exactly the previous week's exits")
      case _ =>
    }
    val users = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(n0 == users, "study population = users with >= 1 purchase")
  }

  test("fanoFactor: hand-checked dispersion over the dense daily axis") {
    import spark.implicits._
    // type a: day counts 2, 0, 1 -> n=3, total=3, sum_c2=5
    // fano = (3*5 - 9)/(3*3) = 2/3 -> 666666 ppm
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 11:00:00"), 2L, "a", 0.0),
      (3L, ts("2024-01-03 10:00:00"), 1L, "a", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.fanoFactor(df).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4)) == (3L, 3L, 1000L, 666666L))
  }

  test("eventTrigrams: gap cuts the pattern, support counts users not loops") {
    import spark.implicits._
    val df = Seq(
      // u1: a->b->c inside the gap, twice (loop) — still ONE user
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 10:05:00"), 1L, "b", 0.0),
      (3L, ts("2024-01-01 10:10:00"), 1L, "c", 0.0),
      (4L, ts("2024-01-01 10:15:00"), 1L, "a", 0.0),
      (5L, ts("2024-01-01 10:20:00"), 1L, "b", 0.0),
      (6L, ts("2024-01-01 10:25:00"), 1L, "c", 0.0),
      // u2: a->b then a GAP before c — the trigram must NOT count
      (7L, ts("2024-01-02 10:00:00"), 2L, "a", 0.0),
      (8L, ts("2024-01-02 10:05:00"), 2L, "b", 0.0),
      (9L, ts("2024-01-02 11:00:00"), 2L, "c", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.eventTrigrams(df, gapSeconds = 1800L, minUsers = 1L)
      .orderBy("t1", "t2", "t3").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2),
        x.getLong(3), x.getLong(4))).toSeq
    // u1 contributes abc (x2 occurrences, 1 user), bca, cab, ab-gap
    // boundary pairs don't mint trigrams; u2's a,b,[gap]c contributes none
    assert(r == Seq(("a", "b", "c", 2L, 1L), ("b", "c", "a", 1L, 1L),
      ("c", "a", "b", 1L, 1L)))
  }

  test("activeStreaks: islands split at day gaps; multi-visit days count once") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 17:00:00"), 1L, "a", 0.0), // same day: once
      (3L, ts("2024-01-02 10:00:00"), 1L, "a", 0.0),
      (4L, ts("2024-01-03 10:00:00"), 1L, "a", 0.0),
      (5L, ts("2024-01-06 10:00:00"), 1L, "a", 0.0), // gap: new island
      (6L, ts("2024-01-07 10:00:00"), 1L, "a", 0.0),
      (7L, ts("2024-01-05 10:00:00"), 2L, "a", 0.0)  // one-day user
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.activeStreaks(df).orderBy("streak_days").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    // u1: runs of 3 and 2 -> longest 3; u2: longest 1
    assert(r == Seq((1L, 1L), (3L, 1L)))
    // corpus law: longest-streak histogram partitions the user base
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    assert(Sessions.activeStreaks(ev).agg(sum("n_users")).head.getLong(0)
      == ev.select("user_id").distinct().count())
  }

  test("ar1Daily: hand-checked lag-1 regression over the dense axis") {
    import spark.implicits._
    // daily counts 2, 0, 1 -> pairs (2,0),(0,1): num = 2*0 - 2*1 = -2,
    // den = 2*4 - 4 = 4 -> sign -1, |slope| = 500000 micro
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 11:00:00"), 2L, "a", 0.0),
      (3L, ts("2024-01-03 10:00:00"), 1L, "a", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.ar1Daily(df).collect()
    assert(r.length == 1)
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4), r(0).getLong(5)) == (2L, -2L, 4L, -1L, 500000L))
  }

  test("cusumDrift: hand-checked excursions and first-reach days") {
    import spark.implicits._
    // daily cents 100, 400, 100 -> target 200, cusum -100, +100, 0
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      (2L, ts("2024-01-02 10:00:00"), 1L, "a", 4.0),
      (3L, ts("2024-01-03 10:00:00"), 1L, "a", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Sessions.cusumDrift(df).collect()
    assert(r.length == 1)
    val d0 = 19723L // epoch day of 2024-01-01
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
      r(0).getLong(4), r(0).getLong(5)) ==
      (200L, 100L, d0 + 1, -100L, d0))
  }

  test("rollingActive: hand-checked DAU/WAU, window coverage, dense zero days") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "a", 0.0),  // same user+day: once
      (3L, ts("2024-01-01 10:00:00"), 2L, "a", 0.0),
      (4L, ts("2024-01-04 10:00:00"), 1L, "a", 0.0)   // days 2-3 silent
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.rollingActive(df, windowDays = 3).orderBy("day")
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // day0: dau 2, wau 2; day1: dau 0, wau 2 (both in trailing 3d);
    // day2: dau 0, wau 2; day3: dau 1, wau 1 (day0 aged out)
    assert(got == Seq((2L, 2L, 1000000L), (0L, 2L, 0L),
      (0L, 2L, 0L), (1L, 1L, 1000000L)))
  }

  test("rollingActive laws on corpus: dau <= wau, wau <= trailing-sum bound, stickiness in [0, 1e6]") {
    val r = Sessions.rollingActive(
      Tables.load(spark, TestSpark.Sf0001, "events")).cache()
    try {
      assert(r.filter(col("dau") > col("wau")).count() == 0)
      assert(r.filter(col("stickiness_ppm") > 1000000L
        || col("stickiness_ppm") < 0L).count() == 0)
      // WAU can never exceed the sum of the window's DAUs
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("day").rowsBetween(-6, 0)
      assert(r.withColumn("s", sum("dau").over(w))
        .filter(col("wau") > col("s")).count() == 0)
    } finally r.unpersist()
  }

  test("rollingActiveMerged ≡ rollingActive: hash law at windows 1/3/7/90, crafted + corpus") {
    import spark.implicits._
    // crafted: overlapping coverage (u1 days 0,1), adjacent-but-disjoint
    // intervals (u2 days 0 and 3 at window 3: [0,2]+[3,5] touch), a gap
    // wider than the window (u3 days 0 and 30), and a single-day user
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, ts("2024-01-02 10:00:00"), 1L, "a", 0.0),
      (3L, ts("2024-01-01 10:00:00"), 2L, "a", 0.0),
      (4L, ts("2024-01-04 10:00:00"), 2L, "a", 0.0),
      (5L, ts("2024-01-01 10:00:00"), 3L, "a", 0.0),
      (6L, ts("2024-01-31 10:00:00"), 3L, "a", 0.0),
      (7L, ts("2024-01-15 10:00:00"), 4L, "a", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val corpus = Tables.load(spark, TestSpark.Sf0001, "events")
    for (src <- Seq(df, corpus); w <- Seq(1, 3, 7, 90)) {
      val a = Sessions.rollingActive(src, windowDays = w).orderBy("day").collect().toSeq
      val b = Sessions.rollingActiveMerged(src, windowDays = w).orderBy("day").collect().toSeq
      assert(a == b, s"merged must equal exploded at windowDays=$w")
    }
  }

  test("growthAccounting: hand-checked new/retained/resurrected/churned, additivity") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),  // u1: w0, w1, w2
      (2L, ts("2024-01-08 10:00:00"), 1L, "a", 0.0),
      (3L, ts("2024-01-15 10:00:00"), 1L, "a", 0.0),
      (4L, ts("2024-01-01 11:00:00"), 2L, "a", 0.0),  // u2: w0, skip, w2
      (5L, ts("2024-01-15 11:00:00"), 2L, "a", 0.0),
      (6L, ts("2024-01-08 11:00:00"), 3L, "a", 0.0)   // u3: w1 only
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.growthAccounting(df).orderBy("week")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // (active, new, retained, resurrected, churned) per week
    assert(got == Seq((2L, 2L, 0L, 0L, 0L), (2L, 1L, 1L, 0L, 1L),
      (2L, 0L, 1L, 1L, 1L)))
    assert(got.forall(t => t._1 == t._2 + t._3 + t._4),
      "active must decompose exactly into new + retained + resurrected")
  }

  test("dailyTrend: exact slope on a hand series, zero-filled gap days, sign convention") {
    import spark.implicits._
    val df = Seq(
      // group "up": 1.00, 2.00, 3.00 over three days -> +100 cents/day
      (1L, ts("2024-01-01 10:00:00"), 1L, "up", 1.0),
      (2L, ts("2024-01-02 10:00:00"), 1L, "up", 2.0),
      (3L, ts("2024-01-03 10:00:00"), 1L, "up", 3.0),
      // group "gap": day 0 and day 2 only; the dense axis zero-fills day 1
      (4L, ts("2024-01-01 00:00:00"), 2L, "gap", 4.0),
      (5L, ts("2024-01-03 00:00:00"), 2L, "gap", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.dailyTrend(df).orderBy("grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // up: n=3, sy=600, sxy=800, sx=3, sxx=5 -> num=600, den=6, slope=+100c/day
    // gap: y=(400,0,200) -> sy=600, sxy=400 -> num=3*400-3*600=-600, den=6
    assert(got == Seq(
      ("gap", 3L, 600L, -600L, 6L, -1L, 100000000L),
      ("up", 3L, 600L, 600L, 6L, 1L, 100000000L)))
  }

  test("transitionMatrix: within-gap pairs counted, boundary crossings and tails excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, ts("2024-01-01 10:05:00"), 7L, "click", 0.0),  // view->click
      (3L, ts("2024-01-01 12:00:00"), 7L, "view", 0.0),   // gap > 30m: no click->view
      (4L, ts("2024-01-01 12:01:00"), 7L, "click", 0.0),  // view->click
      (5L, ts("2024-01-01 10:00:00"), 8L, "view", 0.0),
      (6L, ts("2024-01-01 10:01:00"), 8L, "view", 0.0)    // view->view
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.transitionMatrix(df).orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("view", "click", 2L, 3L, 666666L),
      ("view", "view", 1L, 3L, 333333L)))
  }

  test("transitionMatrix rows normalize on corpus: sum(n) == n_from per state, p_ppm <= 1e6") {
    val m = Sessions.transitionMatrix(
      Tables.load(spark, TestSpark.Sf0001, "events")).cache()
    try {
      val bad = m.groupBy("from_type")
        .agg(sum("n").as("s"), max("n_from").as("t"), min("n_from").as("t2"))
        .filter(col("s") =!= col("t") || col("t") =!= col("t2"))
      assert(bad.count() == 0, "each row's n must partition its from-state total")
      assert(m.filter(col("p_ppm") > 1000000L || col("p_ppm") < 0L).count() == 0)
    } finally m.unpersist()
  }

  test("concurrency: hand-checked bucket coverage, started counts, peak marker") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "a", 1.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, "a", 1.0),  // u7: [10:00, 10:10]
      (3L, ts("2024-01-01 10:50:00"), 8L, "a", 1.0),
      (4L, ts("2024-01-01 11:05:00"), 8L, "a", 1.0),  // u8 spans the 11:00 boundary
      (5L, ts("2024-01-01 11:30:00"), 9L, "a", 1.0)   // u9: single-event session
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.concurrency(df, bucketSeconds = 3600L, gapSeconds = 1800L)
      .orderBy("bucket_s")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 10:00 bucket: u7 + u8 live, both started; 11:00: u8 ongoing + u9 started
    assert(got.toSeq == Seq((2L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("concurrency conservation on corpus: starts partition sessions, peak is the max") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val c = Sessions.concurrency(ev).cache()
    try {
      // every session starts in exactly one bucket
      assert(c.agg(sum("started")).head.getLong(0) ==
        Sessions.sessionize(ev).count())
      // covered buckets have at least one live session; peak rows carry
      // exactly the global max and at least one exists
      assert(c.filter(col("concurrent") < 1).count() == 0)
      val mx = c.agg(max("concurrent")).head.getLong(0)
      assert(c.filter(col("is_peak") === 1).count() >= 1)
      assert(c.filter(col("is_peak") === 1 && col("concurrent") =!= mx).count() == 0)
      assert(c.filter(col("is_peak") === 0 && col("concurrent") === mx).count() == 0)
    } finally c.unpersist()
  }

  test("dedupPerWindow: hand-checked keeper, bucket boundary, tie-break") {
    import spark.implicits._
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1 clicks: 10s and 500s share bucket 0 (earliest 10s kept,
    // 1 dupe); 600s starts bucket 600 — kept separately. Two events at
    // the SAME instant (user 2, 50s): lower event_id wins.
    val ev = Seq(
      (101L, ts(10), 1L, "click"), (102L, ts(500), 1L, "click"),
      (103L, ts(600), 1L, "click"),
      (202L, ts(50), 2L, "click"), (201L, ts(50), 2L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Sessions.dedupPerWindow(ev, windowSeconds = 600L)
      .orderBy("bucket_start_s", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5),
        r.getLong(6))).toSeq
    assert(got === Seq(
      (0L, 1L, 101L, 2L, 1L),    // 10s beats 500s in bucket 0
      (0L, 2L, 201L, 2L, 1L),    // same instant: lower event_id wins
      (600L, 1L, 103L, 1L, 0L))) // boundary: 600s is its own bucket
  }

  test("dedupPerWindow: pre-epoch instants bucket by FLOOR, not truncation") {
    import spark.implicits._
    // 1969-12-31T23:59:59.500 = epoch −0.5s: floor semantics put it in
    // bucket −600; truncate-toward-zero arithmetic would land it in 0
    val ev = Seq((1L, new Timestamp(-500L), 1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = Sessions.dedupPerWindow(ev, windowSeconds = 600L).head
    assert(r.getLong(0) === -600L, s"pre-epoch bucket: ${r.getLong(0)}")
    assert(r.getLong(4) === -500000L, "kept ts is the exact µs instant")
  }

  test("dedupPerWindow conservation on corpus: events partition into groups, keepers unique") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val d = Sessions.dedupPerWindow(ev, windowSeconds = 600L)
    assert(d.agg(sum("n_events")).head.getLong(0) == ev.count(),
      "every event lands in exactly one group")
    assert(d.select("keep_event_id").distinct().count() == d.count(),
      "one keeper per group, no keeper reused")
    assert(d.filter(col("n_dupes") < 0).isEmpty)
  }

  test("retentionCohorts: offset-0 row counts the whole cohort, hand-checked triangle") {
    import spark.implicits._
    // bucket = 10s for a readable fixture; u1 first in bucket 0, active
    // 0 and 2; u2 first in bucket 0, active 0 only; u3 first in bucket 2
    val ev = Seq(
      (1L, ts("1970-01-01 00:00:01")), (1L, ts("1970-01-01 00:00:02")),
      (1L, ts("1970-01-01 00:00:21")),
      (2L, ts("1970-01-01 00:00:05")),
      (3L, ts("1970-01-01 00:00:25"))
    ).toDF("user_id", "ts")
    val got = Sessions.retentionCohorts(ev, bucketSeconds = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 0L, 2L), (0L, 2L, 1L), (2L, 0L, 1L)), s"got $got")
  }

  test("retentionCohorts laws on corpus: offsets non-negative, offset 0 == cohort size") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val t = Sessions.retentionCohorts(ev)
    assert(t.filter(col("bucket_offset") < 0).isEmpty, "no pre-cohort activity")
    // every user is active in their own first bucket by definition
    val zero = t.filter(col("bucket_offset") === 0)
      .select(col("cohort_bucket"), col("n_users").as("nz"))
    val cohortSizes = ev
      .groupBy(col("user_id"))
      .agg(min(expr("(unix_micros(ts) - pmod(unix_micros(ts), 604800000000)) div 604800000000")).as("cohort_bucket"))
      .groupBy("cohort_bucket").agg(count(lit(1)).as("n"))
    val joined = zero.join(cohortSizes, "cohort_bucket")
    assert(joined.filter(col("nz") =!= col("n")).isEmpty,
      "offset-0 row must count the full cohort")
  }

  test("gapFill: dense axis, zero-filled holes, hand-checked sums") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:05:00"), 7L, "a", 1.5),
      (2L, ts("2024-01-01 10:55:00"), 7L, "a", 2.0),
      (3L, ts("2024-01-01 13:05:00"), 7L, "a", 4.0),  // hours 11,12 are holes
      (4L, ts("2024-01-01 12:30:00"), 8L, "b", 8.0)   // b missing hours 10,13
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.gapFill(df, bucketSeconds = 3600L)
      .orderBy("event_type", "bucket_s").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000
    // 4 hours x 2 keys: the full cross-axis, holes at zero, cum monotone
    assert(got.length == 8)
    assert(got.toSeq == Seq(
      ("a", h10, 2L, 3.5, 2L), ("a", h10 + 3600, 0L, 0.0, 2L),
      ("a", h10 + 7200, 0L, 0.0, 2L), ("a", h10 + 10800, 1L, 4.0, 3L),
      ("b", h10, 0L, 0.0, 0L), ("b", h10 + 3600, 0L, 0.0, 0L),
      ("b", h10 + 7200, 1L, 8.0, 1L), ("b", h10 + 10800, 0L, 0.0, 1L)))
  }

  test("gapFill laws on corpus: axis complete per key, totals conserved, empty in empty out") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val g = Sessions.gapFill(ev, bucketSeconds = 3600L).cache()
    try {
      val nKeys = ev.select("event_type").distinct().count()
      val axisLen = g.select("bucket_s").distinct().count()
      assert(g.count() == nKeys * axisLen, "every key carries the full axis")
      assert(g.agg(sum("n_events")).head.getLong(0) == ev.count(),
        "zero-filling must not create or drop events")
      assert(Sessions.gapFill(ev.filter(lit(false))).isEmpty,
        "empty input yields an empty frame, not an error")
    } finally g.unpersist()
  }

  test("changeHistory: hand-checked intervals, within-run events collapse") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, ts("2024-01-01 10:05:00"), 7L, "view", 0.0),  // same state: no row
      (3L, ts("2024-01-01 10:10:00"), 7L, "click", 0.0),
      (4L, ts("2024-01-01 10:20:00"), 7L, "view", 0.0),  // state can recur
      (5L, ts("2024-01-01 09:00:00"), 8L, "error", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Sessions.changeHistory(df).orderBy("user_id", "version")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4), r.getLong(5)))
    def us(s: String) = ts(s).getTime * 1000L
    assert(got.toSeq == Seq(
      (7L, "view", us("2024-01-01 10:10:00"), 1L, 0L),
      (7L, "click", us("2024-01-01 10:20:00"), 2L, 0L),
      (7L, "view", -1L, 3L, 1L),
      (8L, "error", -1L, 1L, 1L)))
  }

  test("funnel: order matters, ties at the same instant count, counts never increase") {
    import spark.implicits._
    val df = Seq(
      // u7 converts fully; click at the same µs as view still counts
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, ts("2024-01-01 10:00:00"), 7L, "click", 0.0),
      (3L, ts("2024-01-01 10:30:00"), 7L, "purchase", 0.0),
      // u8 clicked BEFORE viewing: click must not count, purchase chain dies
      (4L, ts("2024-01-01 09:00:00"), 8L, "click", 0.0),
      (5L, ts("2024-01-01 09:30:00"), 8L, "view", 0.0),
      (6L, ts("2024-01-01 09:45:00"), 8L, "purchase", 0.0),
      // u9 views only
      (7L, ts("2024-01-01 08:00:00"), 9L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Sessions
      .funnel(df, Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "view", 3L, 1000000L),
      (2L, "click", 1L, 333333L),
      (3L, "purchase", 1L, 333333L)))
    assertThrows[IllegalArgumentException] {
      graft.operators.Sessions.funnel(df, Seq("view", "view"))
    }
  }

  test("funnel law on corpus: step counts are non-increasing, ppm consistent") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val f = graft.operators.Sessions
      .funnel(ev, Seq("view", "click", "purchase")).orderBy("step_idx")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(f.length == 3)
    assert(f.sliding(2).forall(p => p(0)._1 >= p(1)._1),
      "a later step can never out-count an earlier one")
    val n1 = f.head._1
    f.foreach { case (n, ppm) => assert(ppm == n * 1000000L / n1) }
  }

  test("changeHistory laws on corpus: intervals tile the timeline, one current per key") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val h = Sessions.changeHistory(ev).cache()
    try {
      // exactly one open interval per user, and it is the max version
      val cur = h.filter(col("is_current") === 1)
      assert(cur.count() == ev.select("user_id").distinct().count())
      assert(h.filter(col("valid_to_us").isNull && col("is_current") === 0).isEmpty)
      // intervals abut: every closed interval's end is the next version's start
      import org.apache.spark.sql.expressions.Window
      val nxt = h.withColumn("next_from",
        lead(col("valid_from_us"), 1).over(
          Window.partitionBy("user_id").orderBy("version")))
      assert(nxt.filter(col("valid_to_us").isNotNull &&
        col("valid_to_us") =!= col("next_from")).isEmpty,
        "validity intervals must tile without gaps or overlaps")
      // no two consecutive versions share a state (runs are collapsed)
      val runs = nxt.withColumn("next_state",
        lead(col("state"), 1).over(
          Window.partitionBy("user_id").orderBy("version")))
      assert(runs.filter(col("next_state").isNotNull &&
        col("next_state") === col("state")).isEmpty)
    } finally h.unpersist()
  }

  test("spikeDetection: flat history flags the burst, first W buckets unjudged, flat series clean") {
    import spark.implicits._
    def ev(t: Long, n: Int) = (0 until n).map(i =>
      ("a", new Timestamp(t * 1000L + i), 1.0))
    // 30 flat hourly buckets then one 10-event burst bucket
    val flat = (0 until 30).flatMap(h => ev(h * 3600L, 1))
    val burst = ev(30 * 3600L, 10)
    val rows = Sessions.spikeDetection(
        (flat ++ burst).toDF("event_type", "ts", "value"),
        bucketSeconds = 3600L, keyCol = "event_type", windowBuckets = 24)
      .orderBy("bucket_s").collect()
    // 31 buckets, first 24 unjudged
    assert(rows.length == 31 - 24)
    val spikes = rows.filter(_.getLong(7) == 1L).map(_.getLong(1))
    assert(spikes.toSeq == Seq(30L * 3600L),
      s"exactly the burst bucket flags: ${spikes.toSeq}")
    // zero-variance history + zero deviation stays clean
    val clean = Sessions.spikeDetection(
        flat.toDF("event_type", "ts", "value"),
        bucketSeconds = 3600L, keyCol = "event_type", windowBuckets = 24)
      .filter(col("is_spike") === 1L)
    assert(clean.isEmpty)
  }

  test("linearAttribution: equal ppm credit, first/last touch, organics visible, window edge") {
    import spark.implicits._
    def row(id: Long, u: Long, t: Long, typ: String) =
      (id, new Timestamp(t * 1000L), u, typ)
    val w = 7L * 86400L
    val ev = Seq(
      row(1L, 1L, 0L, "click"), row(2L, 1L, 10L, "click"),
      row(3L, 1L, 100L, "purchase"),
      row(4L, 2L, 0L, "purchase"),                  // organic
      row(5L, 3L, 0L, "click"),                     // exactly at the edge
      row(6L, 3L, w, "purchase"),
      row(7L, 4L, 0L, "click"),                     // one past the edge
      row(8L, 4L, w + 1L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val r = Sessions.linearAttribution(ev, windowSeconds = w)
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), x.getLong(3),
        if (x.isNullAt(4)) -1L else x.getLong(4),
        if (x.isNullAt(5)) -1L else x.getLong(5),
        if (x.isNullAt(6)) -1L else x.getLong(6)))
    assert(r.toSeq == Seq(
      (3L, 2L, 500000L, 1L, 2L),   // two touches, first=earliest click
      (4L, 0L, -1L, -1L, -1L),     // organic stays visible
      (6L, 1L, 1000000L, 5L, 5L),  // inclusive window edge
      (8L, 0L, -1L, -1L, -1L)))    // one second past: out
  }

  test("lookbackJoin == the naive range join on the real event stream (binning completeness)") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val tch = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = 86400L
    val binned = graft.operators.RangeJoin.lookbackJoin(conv, tch,
        key = "user_id", leftId = "event_id", leftTs = "ts",
        rightId = "event_id", rightTs = "ts", windowSeconds = w)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = conv.as("c").join(tch.as("t"),
        col("c.user_id") === col("t.user_id") &&
          unix_micros(col("c.ts")) - unix_micros(col("t.ts")) >= 0L &&
          unix_micros(col("c.ts")) - unix_micros(col("t.ts")) <= w * 1000000L)
      .select(col("c.event_id"), col("t.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length == binned.distinct.length, "no candidate emitted twice")
    assert(binned.toSet == naive.toSet,
      s"missing=${naive.toSet -- binned.toSet} extra=${binned.toSet -- naive.toSet}")
    assert(naive.nonEmpty)
  }

  test("timeWeightedAvg: hand-computed holds, last observation weightless, singleton NULL") {
    import spark.implicits._
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (7L, ts(0L), 1.0), (7L, ts(10L), 2.0), (7L, ts(30L), 4.0),
      (8L, ts(100L), 9.99)
    ).toDF("user_id", "ts", "value")
    val r = Sessions.timeWeightedAvg(ev).orderBy("key").collect()
    // key 7: holds 10s@100c + 20s@200c, last weightless ->
    // twap = (1000 + 4000) div 30 = 166; mean = 700 div 3 = 233
    val k7 = r(0)
    assert((k7.getLong(0), k7.getLong(1), k7.getLong(2), k7.getLong(3),
      k7.getLong(4)) == ((7L, 3L, 30L, 166L, 233L)))
    // a lone observation holds for no measured time: NULL twap, 0 span
    val k8 = r(1)
    assert(k8.getLong(1) == 1L && k8.getLong(2) == 0L && k8.isNullAt(3)
      && k8.getLong(4) == 999L)
    // burst insensitivity: after 1.0 held for 1000s, 99 rapid-fire
    // 500.0 samples arrive 1 ms apart (sub-second holds floor to 0) —
    // the plain mean is dragged to ~495, the twap stays at the held 1.0
    val burst = (0 until 99).map(i => (9L, new Timestamp(1000000L + i), 500.0))
    val ev2 = ((9L, ts(0L), 1.0) +: burst).toDF("user_id", "ts", "value")
    val b = Sessions.timeWeightedAvg(ev2).collect().head
    assert(b.getLong(3) == 100L, s"twap must shrug off the burst: $b")
    assert(b.getLong(4) == 49501L, "the plain mean is dragged to ~495")
  }
}
