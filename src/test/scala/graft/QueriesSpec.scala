package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5.2): every declared query runs at sf0.001 and
  * returns a sane frame; the word count reproduces known shape.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.Sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q01 word count is ordered by count desc") {
    val counts = SparkEntry.queries("q01_word_count")(spark, TestSpark.Sf0001)
      .select("cnt").collect().map(_.getLong(0))
    assert(counts.nonEmpty && counts.sameElements(counts.sortBy(-_)))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q162 Gini laws: in [0, (n-1)/n * 1e6), zero for an equal split") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q162_gini")(spark, TestSpark.Sf0001)
      .select(col("n_suppliers"), col("gini_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, g) =>
      assert(g >= 0L && g <= (n - 1) * 1000000L / n,
        s"Gini $g out of [0, (n-1)/n] for n=$n")
    }
  }

  test("q167 contingency laws: cells conserve the grand total, lift centers on 1e6") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q167_contingency_lift")(spark, TestSpark.Sf0001)
      .collect()
    assert(df.nonEmpty)
    val grand = df.head.getLong(5)
    assert(df.map(_.getLong(2)).sum == grand, "cell counts must sum to N")
    // expected counts also partition N up to per-cell floor slack
    val expSum = df.map(_.getLong(6)).sum
    assert(expSum <= grand && expSum >= grand - df.length,
      s"expected rows $expSum vs N=$grand with ${df.length} cells of slack")
  }

  test("q168 ABC laws: per-type shares partition 1e6, class revenue ordered A >= B-per-part") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q168_abc_classes")(spark, TestSpark.Sf0001)
      .collect().groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (ptype, cls) =>
      val shares = cls.map(_.getLong(4)).sum
      assert(shares <= 1000000L && shares >= 1000000L - cls.length,
        s"$ptype shares must partition the mass: $shares")
      // an A part out-earns any C part (classes are a revenue sort)
      val byCls = cls.map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3))).toMap
      for ((na, ca) <- byCls.get("A"); (nc, cc) <- byCls.get("C"))
        assert(ca / na + 1 >= cc / nc, // +1 absorbs the floored-mean tie edge
          s"$ptype: A per-part must out-earn C")
    }
  }

  test("q169 diversity laws: simpson in [0, (k-1)/k * 1e6], types <= events") {
    val rows = SparkEntry.queries("q169_event_diversity")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(k >= 1 && k <= n, s"types $k vs events $n")
      assert(s >= 0 && s <= (k - 1) * 1000000L / k + 1,
        s"simpson $s out of bounds for k=$k")
    }
  }

  test("q177 cross-tier audit conserves: decile docs sum to scored corpus, drops bounded") {
    val rows = SparkEntry.queries("q177_quality_dup_profile")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "can't drop more docs than exist")
      assert(r.getLong(3) <= 1000000L)
    }
    val scored = graft.operators.TextAnalysis.qualityDeciles(
      graft.sources.Tables.load(spark, TestSpark.Sf0001, "documents")).count()
    assert(rows.map(_.getLong(1)).sum == scored,
      "deciles must partition the scored corpus")
  }

  test("q178 RFM laws: segments partition the customer base, scores in [1,3]") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q178_rfm_segments")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2)).foreach(s =>
        assert(s >= 1 && s <= 3, s"tercile score out of range: $s"))
    }
    val customers = graft.sources.Tables
      .load(spark, TestSpark.Sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == customers,
      "RFM cells must partition the ordering customers")
  }

  test("q179 session-depth laws: monotone percentiles, session count conserved") {
    val r = SparkEntry.queries("q179_session_depth")(spark, TestSpark.Sf0001)
      .head()
    val (n, p50, p90, p99, mx) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(p50 <= p90 && p90 <= p99 && p99 <= mx)
    val sessions = graft.operators.Sessions.sessionize(
      graft.sources.Tables.load(spark, TestSpark.Sf0001, "events"), 1800L)
      .count()
    assert(n == sessions, "histogram must conserve the session count")
  }

  test("q181 whale laws: decile floor holds, whales carry at least their headcount share") {
    val r = SparkEntry.queries("q181_whale_share")(spark, TestSpark.Sf0001)
      .head()
    val (n, w, shareUser, shareCents) =
      (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5))
    assert(w >= n / 10, s"threshold decile must capture >= n/10 users: $w of $n")
    assert(shareCents >= shareUser,
      "the top-value users can't carry less than their headcount share")
    assert(shareCents <= 1000000L && shareUser <= 1000000L)
  }

  test("q182 purity laws: matches bounded by docs, sources partition the corpus") {
    val rows = SparkEntry.queries("q182_lang_purity")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val docs = graft.sources.Tables
      .load(spark, TestSpark.Sf0001, "documents").count()
    assert(rows.map(_.getLong(1)).sum == docs)
  }

  test("q184 cluster-provenance laws: sources bounded by size, docs conserve vs q47") {
    val rows = SparkEntry.queries("q184_dup_cluster_sources")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(0),
        "distinct sources must sit in [1, cluster_size]")
    }
    val clustered = SparkEntry.queries("q47_dedup_components")(
      spark, TestSpark.Sf0001).count()
    assert(rows.map(r => r.getLong(0) * r.getLong(2)).sum == clustered,
      "size x count cells must conserve the clustered-doc population")
  }

  test("q188 datasheet agrees with the per-tier queries it fuses") {
    val ds = SparkEntry.queries("q188_source_datasheet")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    val rich = SparkEntry.queries("q163_lexical_richness")(spark, TestSpark.Sf0001)
      .collect()
    assert(ds.size == rich.length, "one datasheet row per source")
    rich.foreach { r =>
      val d = ds(r.getString(0))
      assert(d.getLong(1) == r.getLong(1) && d.getLong(2) == r.getLong(2)
        && d.getLong(3) == r.getLong(5) && d.getLong(4) == r.getLong(6),
        s"datasheet richness drifted for ${r.getString(0)}")
    }
    val ks = SparkEntry.queries("q174_ks_drift")(spark, TestSpark.Sf0001)
      .collect()
    ks.foreach { r =>
      assert(ds(r.getString(0)).getLong(8) == r.getLong(2),
        s"datasheet KS drifted for ${r.getString(0)}")
    }
  }

  test("q155 HHI laws: bounded by 1e6, at least the top share's own square, floor of 1e6/n") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q155_market_concentration")(spark, TestSpark.Sf0001)
      .select(col("n_suppliers"), col("top_share_ppm"), col("hhi_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, top, hhi) =>
      assert(hhi <= 1000000L, s"HHI above monopoly: $hhi")
      assert(hhi >= top * top / 1000000L, "HHI can't undercut its own top share")
      // equal split minimizes HHI at ~1e6/n (floor slack from ppm rounding)
      assert(hhi >= 1000000L / n - n, s"HHI $hhi below the equal-split floor for n=$n")
    }
  }
}
