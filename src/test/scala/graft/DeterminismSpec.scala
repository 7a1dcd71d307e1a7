package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.{Dedup, Prep, Similarity, TextAnalysis}
import graft.sources.Tables

/** The engine's determinism claim, tested head-on: results must be
  * BIT-IDENTICAL under different physical partitionings. Each case runs
  * one representative of a determinism-sensitive mechanism over inputs
  * repartitioned two different ways (coprime counts, so row→partition
  * assignment genuinely differs) and asserts set equality of collected
  * rows:
  *
  *   - minhashPairs: md5-derived permutations + band buckets;
  *   - ivfTrainedIndex: k-means centroid means via exact long sums
  *     (the mechanism that replaces order-dependent float averaging);
  *   - int8QuantAudit: micro-unit integer error aggregates;
  *   - pack: prefix-sum windows keyed (source, shard);
  *   - repetitionSignals: count aggregates + rounded ratios.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
  lazy val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")

  // sorted Seq, not Set: a partitioning-dependent DUPLICATION (e.g. a
  // dropped distinct emitting a pair twice under one layout) must fail
  // too, and set comparison would mask it
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def assertStable(f: DataFrame => DataFrame, in: DataFrame): Unit = {
    val a = rows(f(in.repartition(7)))
    val b = rows(f(in.repartition(13)))
    assert(a == b,
      s"partitioning changed the result: ${(a.diff(b)) ++ (b.diff(a))}")
  }

  test("minhash near-dup pairs are partitioning-independent") {
    assertStable(d => Dedup.minhashPairs(d), docs)
  }

  test("k-means-trained IVF centroids are partitioning-independent") {
    assertStable(e =>
      Similarity.ivfTrainedIndex(e, iters = 2, centroidEvery = 20).cents, emb)
  }

  test("int8 quantization audit is partitioning-independent") {
    assertStable(e => Similarity.int8QuantAudit(e), emb)
  }

  test("sequence packing is partitioning-independent") {
    assertStable(d => Prep.pack(d, budget = 512L), docs)
  }

  test("repetition signals are partitioning-independent") {
    assertStable(d => TextAnalysis.repetitionSignals(d), docs)
  }

  test("BM25 ranking is partitioning-independent") {
    assertStable(d =>
      graft.operators.TextIndex.bm25Rank(d, Seq("vector", "join"), k = 50), docs)
  }

  test("CMS estimates are partitioning-independent") {
    assertStable(d =>
      graft.operators.Sketches.cmsEstimates(d, Seq("join", "the", "zz")), docs)
  }

  test("BPE pair scoring is partitioning-independent") {
    assertStable(d => TextAnalysis.bpePairCounts(d, k = 20), docs)
  }

  test("round-7 tiers are partitioning-independent") {
    val ev = Tables.load(spark, TestSpark.Sf0001, "events")
    // column profile: xxhash-distinct pass + fused counts
    assertStable(d => graft.operators.Profile.columnProfile(d), docs)
    // mergeable profile partial (KMV buffers under different layouts)
    assertStable(d => graft.operators.Profile.mergeProfile(
      graft.operators.Profile.profilePartial(d)), docs)
    // gap-fill: axis generation + zero-fill + running sum
    assertStable(e => graft.operators.Sessions.gapFill(e), ev)
    // SCD2 history: windowed change detection
    assertStable(e => graft.operators.Sessions.changeHistory(e), ev)
    // funnel: chained min-reach joins
    assertStable(e => graft.operators.Sessions.funnel(
      e, Seq("view", "click", "purchase")), ev)
    // CMS join-size inner product
    assertStable(e => graft.operators.Sketches.cmsJoinSize(
      e, "user_id", e, "user_id"), ev)
    // quality deciles: histogram thresholds broadcast back
    assertStable(d => TextAnalysis.qualityDeciles(d), docs)
  }
}
