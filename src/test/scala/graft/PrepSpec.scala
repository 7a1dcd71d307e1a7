package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Prep
import graft.sources.Tables

/** Laws for the training-set preparation tier: split stability under
  * corpus change (the property hash-bucketing exists to provide) and
  * packing consistency against a linear-scan reference.
  */
class PrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val docs = Tables.load(spark, TestSpark.Sf0001, "documents")

  test("split: total partition, sane fractions, independent salts differ") {
    val s = Prep.split(docs, valPct = 10, testPct = 10).collect()
    assert(s.length == docs.count())
    val byLabel = s.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    // 10% buckets of a uniform 60-bit hash: generous 3x bounds
    assert(byLabel("train") > s.length / 2)
    assert(byLabel("val") < s.length * 3 / 10 && byLabel("test") < s.length * 3 / 10)
    val s2 = Prep.split(docs, valPct = 10, testPct = 10, salt = "holdout2")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s.exists(r => s2(r.getLong(0)) != r.getString(2)),
      "independent salt must produce a different assignment somewhere")
  }

  test("split: a document's assignment never changes when the corpus shrinks") {
    val full = Prep.split(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val half = Prep.split(docs.filter(col("doc_id") % 2 === 0)).collect()
    assert(half.nonEmpty)
    half.foreach(r => assert(full(r.getLong(0)) == r.getString(2)))
  }

  test("mix: rate-0 drops all, rate-100 keeps all, remixing only moves changed sources") {
    val m1 = Prep.mix(docs, Map("src0" -> 0, "src1" -> 100)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    assert(m1.filter(_._2 == "src0").forall(_._3 == 0L))
    assert(m1.filter(_._2 == "src1").forall(_._3 == 1L))
    // reweighting src0 must not disturb any other source's verdicts
    val m2 = Prep.mix(docs, Map("src0" -> 50, "src1" -> 100)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    val v2 = m2.map(r => r._1 -> r._3).toMap
    m1.filterNot(_._2 == "src0").foreach(r => assert(v2(r._1) == r._3))
  }

  test("pack: equals a per-(source, shard) linear-scan reference; offsets under budget") {
    val budget = 512L
    val got = Prep.pack(docs, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.forall(_._6 < budget), "a document must start inside its sequence")
    // reference: per (source, shard) in doc_id order, exclusive running sum
    val ref = got.groupBy(r => (r._2, r._3)).flatMap { case (_, rows) =>
      var cum = 0L
      rows.toSeq.sortBy(_._1).map { case (id, src, sh, n, _, _) =>
        val r = (id, src, sh, n, cum / budget, cum % budget)
        cum += n
        r
      }
    }.toSet
    assert(got.toSet == ref)
  }

  test("pack: sharding gives parallelism beyond the source count") {
    val got = Prep.pack(docs).collect()
    val sources = got.map(_.getString(1)).distinct.length
    val groups = got.map(r => (r.getString(1), r.getLong(2))).distinct.length
    // the window partitions by (source, shard): independent prefix-sum
    // units must outnumber sources, or packing serializes per source
    assert(groups > sources, s"$groups groups vs $sources sources")
    // and the physical Window really partitions on both keys
    val plan = Prep.pack(docs).queryExecution.executedPlan.toString
    val winLine = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(winLine.contains("source") && winLine.contains("shard"),
      s"window must partition by (source, shard): $winLine")
  }

  test("sampleToQuota: under-quota strata kept whole, capped stratum lands near quota") {
    val langN = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quota = langN.values.min // caps every stratum bigger than the smallest
    val s = Prep.sampleToQuota(docs, "lang", quota).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    assert(s.length == docs.count(), "every doc gets an auditable verdict")
    s.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.head._3 == langN(lang))
      val kept = rows.count(_._5 == 1L)
      if (langN(lang) <= quota) {
        assert(rows.head._4 == 1000000L && kept == rows.length,
          s"$lang is under quota and must be kept whole")
      } else {
        assert(rows.head._4 == 1000000L * quota / langN(lang))
        // binomial around quota: generous 4·√quota band
        val tol = 4 * math.sqrt(quota.toDouble)
        assert(math.abs(kept - quota) <= tol, s"$lang kept $kept vs quota $quota")
      }
    }
  }

  test("sampleToQuota: verdicts are pure per-doc functions — stable under repartitioning, quota 0 drops all") {
    val a = Prep.sampleToQuota(docs, "lang", 80L).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val b = Prep.sampleToQuota(docs.repartition(7), "lang", 80L).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(a == b)
    val z = Prep.sampleToQuota(docs, "lang", 0L).collect()
    assert(z.forall(_.getLong(5) == 0L))
  }

  test("epochs: expected multiplicity matches the weight; reweighting only moves changed sources") {
    val e1 = Prep.epochs(docs, Map("src0" -> 0.0, "src1" -> 2.5)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(e1.filter(_._2 == "src0").forall(_._3 == 0L), "0 epochs must drop")
    val s1 = e1.filter(_._2 == "src1")
    assert(s1.forall(r => r._3 == 2L || r._3 == 3L),
      "2.5 epochs must emit 2 or 3 repeats, nothing else")
    // expected multiplicity = the weight: mean within 4·σ of 2.5
    val mean = s1.map(_._3).sum.toDouble / s1.length
    assert(math.abs(mean - 2.5) <= 4 * 0.5 / math.sqrt(s1.length.toDouble),
      s"src1 mean epochs $mean vs weight 2.5")
    assert(e1.filterNot(r => r._2 == "src0" || r._2 == "src1").forall(_._3 == 1L))
    // changing src0's weight must not disturb any other source's counts
    val e2 = Prep.epochs(docs, Map("src0" -> 3.0, "src1" -> 2.5)).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    e1.filterNot(_._2 == "src0").foreach(r => assert(e2(r._1) == r._3))
    assert(e1.filter(_._2 == "src0").forall(r => e2(r._1) == 3L))
  }

  test("splitByGroup: zero cross-split near-dup edges; singletons match plain split") {
    import graft.operators.{Components, Dedup}
    val edges = Dedup.nearDupEdges(docs).cache()
    try {
      val comp = Components.connected(edges)
        .select(col("node").as("doc_id"), col("component").as("group_id"))
      val s = Prep.splitByGroup(docs, comp)
        .select("doc_id", "split").cache()
      try {
        // the q69 audit on the group-aware split must come back empty
        val crossing = edges
          .join(s.select(col("doc_id").as("i"), col("split").as("si")), "i")
          .join(s.select(col("doc_id").as("j"), col("split").as("sj")), "j")
          .filter(col("si") =!= col("sj"))
        assert(crossing.isEmpty, "a near-dup edge crossed split boundaries")
        // ungrouped docs: identical assignment to the plain q56 split
        val plain = Prep.split(docs).collect()
          .map(r => r.getLong(0) -> r.getString(2)).toMap
        val grouped = comp.select("doc_id").collect().map(_.getLong(0)).toSet
        assert(grouped.nonEmpty, "fixture must exercise real clusters")
        val got = s.collect().map(r => r.getLong(0) -> r.getString(1))
        assert(got.length == docs.count())
        got.filterNot(g => grouped(g._1))
          .foreach(g => assert(plain(g._1) == g._2))
      } finally s.unpersist()
    } finally edges.unpersist()
  }

  test("temperatureMix: sqrt curve hand-checked; smallest stratum kept whole") {
    import spark.implicits._
    // strata 4:1 — rates 1e6·sqrt(1/4) = 500000 and 1e6 exactly
    val df = ((1 to 80).map(i => (i.toLong, "big")) ++
      (81 to 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "lang")
    val r = Prep.temperatureMix(df, stratum = "lang")
    val rates = r.select("lang", "rate_ppm").distinct().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(rates == Map("big" -> 500000L, "small" -> 1000000L))
    // rate 1e6 keeps EVERY doc (bucket < 1e6 always)
    assert(r.filter(col("lang") === "small" && col("kept") === 0).isEmpty)
    // corpus law: rates are monotone non-increasing in stratum size and
    // every doc gets a verdict row
    val c = Prep.temperatureMix(docs, stratum = "lang")
    assert(c.count() == docs.count())
    val curve = c.select("n_stratum", "rate_ppm").distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    curve.zip(curve.tail).foreach { case ((n1, r1), (n2, r2)) =>
      assert(n1 < n2 || r1 == r2); assert(r2 <= r1) }
  }

  test("shuffleOrder: total permutation, contiguous per-shard positions, stable under repartitioning") {
    val s = Prep.shuffleOrder(docs, shards = 16)
    assert(s.count() == docs.count(), "every doc placed exactly once")
    assert(s.select("doc_id").distinct().count() == docs.count())
    assert(s.filter(col("shard") < 0 || col("shard") >= 16).isEmpty)
    // positions are 1..count within each shard — the loader can read
    // shards independently with no gaps or overlaps
    val bad = s.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.isEmpty, "per-shard positions must be contiguous from 1")
    // the ORDER is a pure function of ids — physical layout irrelevant
    def order(df: org.apache.spark.sql.DataFrame) =
      Prep.shuffleOrder(df, shards = 16).orderBy("shard", "pos")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order(docs.repartition(7)) == order(docs.repartition(13)))
    // and genuinely shuffled: not id order globally nor within a shard
    val byShard = order(docs)
    assert(byShard != byShard.sorted, "hash order must not be id order")
  }

  test("shuffleOrder guards: bad shard count and ill-formed salt fail fast") {
    assertThrows[IllegalArgumentException](Prep.shuffleOrder(docs, shards = 0))
    assertThrows[IllegalArgumentException](
      Prep.shuffleOrder(docs, salt = "bad'salt"))
  }

  test("zorderExpr: exhaustive bijection + de-interleave on the 4-bit grid") {
    import spark.implicits._
    val grid = (0 until 256).map(i => (i.toLong % 16, i.toLong / 16))
      .toDF("x", "y")
    val z = grid.selectExpr("x", "y", s"(${Prep.zorderExpr("x", "y", 4)}) AS z")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(z.map(_._3).distinct.length == 256, "interleave is injective on the grid")
    assert(z.forall { case (_, _, v) => v >= 0 && v < 256 }, "and onto [0, 4^bits)")
    z.foreach { case (x, y, v) =>
      val xr = (0 until 4).map(k => ((v >> (2 * k)) & 1L) << k).sum
      val yr = (0 until 4).map(k => ((v >> (2 * k + 1)) & 1L) << k).sum
      assert(xr == x && yr == y, s"de-interleave($v) != ($x,$y)")
    }
  }

  test("zorderLayout: every 1024-code bucket is an aligned 32x32 tile (2-D locality)") {
    val ev = graft.sources.Tables.load(spark, TestSpark.Sf0001, "events")
    val rows = Prep.zorderLayout(ev, bits = 8, buckets = 64).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xm, xx, ym, yx) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // 1024 consecutive Morton codes aligned at a multiple of 4^5 span
      // exactly one 32x32 tile — the audit must observe ranges inside it
      assert(xx - xm < 32, s"bucket ${r.getLong(0)}: x spread ${xx - xm}")
      assert(yx - ym < 32, s"bucket ${r.getLong(0)}: y spread ${yx - ym}")
    }
    // conservation: bucket counts sum to the event count
    assert(rows.map(_.getLong(1)).sum == ev.count())
  }

  test("weightedSample: deterministic, length-biased, zero-weight excluded") {
    val k = 50
    val s1 = Prep.weightedSample(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s1.length == k)
    assert(s1.toSeq == Prep.weightedSample(docs.repartition(13), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      "sample must not depend on partitioning")
    // priority sampling prefers heavy docs: the sample's mean weight
    // must exceed the corpus mean (uniform would match it)
    val corpusMean = docs.filter(col("n_chars") > 0)
      .agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = s1.map(_._2).sum.toDouble / k
    assert(sampleMean > corpusMean,
      s"weighted sample must over-represent long docs: $sampleMean <= $corpusMean")
    // independent salts disagree somewhere; invalid salts fail loudly
    val s2 = Prep.weightedSample(docs, k, salt = "ws2").collect()
      .map(_.getLong(0)).toSet
    assert(s1.map(_._1).toSet != s2)
    assertThrows[IllegalArgumentException] {
      Prep.weightedSample(docs, k, salt = "bad-salt!")
    }
    // zero/negative weights never sample (guard against div-by-zero)
    import spark.implicits._
    val z = Seq((1L, 0L), (2L, -5L), (3L, 10L)).toDF("doc_id", "n_chars")
    assert(Prep.weightedSample(z, 3).collect().map(_.getLong(0)).toSeq == Seq(3L))
    // fractional weights floor BEFORE the guard: 0.4 floors to 0 and is
    // excluded rather than reaching an integer divide-by-zero
    val fr = Seq((1L, 0.4), (2L, 1.7), (3L, 12.0)).toDF("doc_id", "n_chars")
    val fs = Prep.weightedSample(fr, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fs.keySet == Set(2L, 3L) && fs(2L) == 1L && fs(3L) == 12L)
  }
}
