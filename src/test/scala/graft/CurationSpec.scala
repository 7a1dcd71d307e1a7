package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.sources.Tables

/** Laws for the end-to-end curation pass (q48). */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("crafted corpus: every verdict branch fires with the right ref") {
    import spark.implicits._
    val rich = (1 to 120).map(i => s"word$i unique token number $i").mkString(" ")
    val docs = Seq(
      (1L, rich),                 // kept
      (2L, rich),                 // exact dup of 1 → exact_dup ref 1
      (3L, "tiny"),               // low_quality (few words)
      (4L, rich + " trailing near duplicate tail"), // near-dup of 1
      (5L, (1 to 150).map(i => s"other vocabulary item $i").mkString(" "))
    ).toDF("doc_id", "text")
    // doc 4 shares all but its 4 trailing shingles with doc 1 (J ≈ 0.99),
    // well above the canonical nearDupEdges threshold
    val got = Curation.curate(docs, minQuality = 0.15)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, "kept", None),
      (2L, "exact_dup", Some(1L)),
      (3L, "low_quality", None),
      (4L, "near_dup", Some(1L)),
      (5L, "kept", None)))
  }

  test("incremental curation == from-scratch curation (crafted delta + sf corpus)") {
    import spark.implicits._
    import graft.operators.Dedup
    val rich = (1 to 120).map(i => s"word$i unique token number $i").mkString(" ")
    val other = (1 to 150).map(i => s"other vocabulary item $i").mkString(" ")
    val corpus = Seq(
      (1L, rich), (2L, rich), (3L, "tiny"), (4L, other)
    ).toDF("doc_id", "text")
    val delta = Seq(
      (10L, rich),                                   // exact dup of a corpus keeper
      (11L, rich + " trailing near duplicate tail"), // near-dup crossing the cut
      (12L, other + " another close tail variant"),  // near-dup of corpus doc 4
      (13L, "junk"),                                 // low quality
      (14L, (1 to 130).map(i => s"fresh delta content piece $i").mkString(" "))
    ).toDF("doc_id", "text")
    val all = corpus.union(delta)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        Option(r.get(3)))).toSet
    val full = rows(Curation.curate(all))
    val inc = rows(Curation.curateIncremental(
      corpus, delta, Dedup.nearDupEdges(Curation.exactKeepers(corpus))))
    assert(inc == full, s"diff: ${(full -- inc) ++ (inc -- full)}")

    // and on the sf corpus at the q62/q64 cut
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val nf = math.floor(0.8 * docs.agg(max("doc_id")).head.getLong(0)).toLong
    val c2 = docs.filter(col("doc_id") < nf)
    val d2 = docs.filter(col("doc_id") >= nf)
    val full2 = rows(Curation.curate(docs))
    val inc2 = rows(Curation.curateIncremental(
      c2, d2, Dedup.nearDupEdges(Curation.exactKeepers(c2))))
    assert(inc2 == full2)
  }

  test("corpus laws: verdicts partition the corpus, refs point at kept docs") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val out = Curation.curate(docs, minQuality = 0.15).cache()
    try {
      assert(out.count() == docs.count()) // one verdict per doc, no loss
      // dropped-for-duplication docs must reference a doc that was kept
      val refs = out.filter(col("ref_id").isNotNull)
        .select(col("ref_id").as("doc_id")).distinct()
      val notKept = refs.join(out.filter(col("verdict") === "kept"), Seq("doc_id"), "left_anti")
      assert(notKept.isEmpty, "a dropped doc references a non-kept doc")
      // kept and low_quality rows never carry a ref
      assert(out.filter(col("verdict").isin("kept", "low_quality")
        && col("ref_id").isNotNull).isEmpty)
    } finally out.unpersist()
  }

  test("snapshotDiff: every status fires on a crafted pair of snapshots") {
    import spark.implicits._
    val prev = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma v1"), (4L, null: String)
    ).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "alpha"),      // unchanged
      (3L, "gamma v2"),   // changed
      (4L, null: String), // null-vs-null is unchanged, not churn
      (5L, "delta")       // added
    ).toDF("doc_id", "text") // doc 2 removed
    val got = Curation.snapshotDiff(prev, cur).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(3))
    assert(got.toSeq == Seq(1L -> "unchanged", 2L -> "removed",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
  }

  test("snapshotDiff: self-diff is all unchanged; id sets are preserved") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val d = Curation.snapshotDiff(docs, docs).cache()
    try {
      assert(d.count() == docs.count())
      assert(d.filter(col("status") =!= "unchanged").isEmpty)
    } finally d.unpersist()
  }

  test("qualityKeeper: one keeper per cluster, keeper maximizes rounded quality") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val k = Curation.qualityKeeper(docs).cache()
    try {
      assert(k.count() == docs.count(), "total audit: every doc gets a row")
      // exactly one kept member per cluster, and it IS the keeper_id
      val perCluster = k.groupBy("cluster_id")
        .agg(sum("kept").as("n_kept"), count(lit(1)).as("n"))
      assert(perCluster.filter(col("n_kept") =!= 1).isEmpty)
      assert(k.filter(col("kept") === 1 && col("doc_id") =!= col("keeper_id")).isEmpty)
      // the keeper's rounded quality is the cluster max
      val best = k.groupBy("cluster_id").agg(max("quality").as("maxq"))
      val bad = k.filter(col("kept") === 1).join(best, "cluster_id")
        .filter(col("quality") =!= col("maxq"))
      assert(bad.isEmpty, "keeper must carry the cluster's max quality")
      // the fixture corpus must exercise a case where quality-keeper
      // and min-id keeper disagree, or this test proves nothing
      assert(k.filter(col("kept") === 1 && col("doc_id") =!= col("cluster_id"))
        .count() > 0)
    } finally k.unpersist()
  }

  test("curation funnel: per-source counts partition the verdicts, rates exact") {
    val docs = graft.sources.Tables.load(spark, TestSpark.Sf0001, "documents")
    val f = SparkEntry.queries("q105_curation_funnel")(spark, TestSpark.Sf0001)
      .collect()
    assert(f.map(_.getLong(1)).sum == docs.count(),
      "sources partition the corpus")
    f.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) ==
        r.getLong(1), s"verdict counts must partition source ${r.getString(0)}")
      assert(r.getLong(6) == r.getLong(2) * 1000000L / r.getLong(1),
        "kept_ppm is the exact floored rate")
    }
  }

  test("paretoFrontier == the brute-force NOT EXISTS skyline (soundness + completeness)") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val scored = graft.operators.TextAnalysis.qualityScores(docs)
      .filter(org.apache.spark.sql.functions.col("quality").isNotNull)
      .selectExpr("doc_id", "cast(round(quality * 10000) as bigint) as qs",
        "n_words as tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)
    val want = scored.filter(b => !scored.exists(a => dominates(a, b)))
      .map(_._1).toSet
    val got = graft.operators.Curation.paretoFrontier(docs)
      .collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"sweep != brute force: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty)
  }
}
