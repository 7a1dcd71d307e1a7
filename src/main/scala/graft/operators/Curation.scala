package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the pass an LLM-training pipeline runs
  * over raw documents, chaining the engine's tiers into one verdict per
  * document:
  *
  *   1. quality gate ([[TextAnalysis.qualityScores]] composite < min →
  *      `low_quality`);
  *   2. exact dedup among survivors (md5 fingerprint groups, lowest
  *      doc_id kept; others → `exact_dup`);
  *   3. near-dup clustering among exact-keepers
  *      ([[Dedup.nearDupEdges]] → [[Components.connected]]
  *      transitive clusters; non-representative members → `near_dup`);
  *   4. everything else → `kept`.
  *
  * `ref_id` names the document that superseded a dropped one (its exact
  * keeper or its cluster representative; NULL for `low_quality`/`kept`).
  *
  * Scale shape: stages 1–2 are one scan + one fingerprint shuffle; stage
  * 3 runs only over quality-passing exact-keepers (the corpus after the
  * cheap gates), so the expensive near-dup machinery sees the smallest
  * possible input — the ordering a 100 TB pass depends on.
  */
object Curation {

  def curate(docs: DataFrame, minQuality: Double = 0.15): DataFrame = {
    // Wide rows never recur: document text appears only in per-branch
    // pruned scans (Spark has no cross-branch subtree reuse, so "used
    // twice" means a re-scan with column pruning, never a re-shuffle of
    // text). The NARROW shared frames are a different story — since the
    // dedup tier hashes shingles to longs at birth, the near-dup stage's
    // shingle frame is 16 bytes/row and [[Dedup.minhashPairs]] local-
    // checkpoints it once for all four of its consumers, which removed
    // the ~2.4× lineage-recompute multiplier this pipeline used to pay.
    val base = docs.select(col("doc_id"), col("text"))
    // (doc_id, quality): ~16 B/row, read by the quality gate AND the
    // final verdict join — checkpoint so the scoring scan runs once
    val quality = Ckpt.narrow(
      TextAnalysis.qualityScores(docs).select("doc_id", "quality"))
    // (doc_id, fp): the exact-dedup key frame, read by the keeper
    // aggregation, the per-doc tag join and the keeper semi-join —
    // checkpoint so the md5 scan over text runs once
    val passed = Ckpt.narrow(base
      .join(quality.filter(col("quality") >= minQuality), "doc_id")
      .select(col("doc_id"), md5(col("text")).as("fp")))
    val keep1 = passed.groupBy("fp").agg(min("doc_id").as("exact_keep"))
    // (doc_id, exact_keep): two longs through the fingerprint join
    val exactTag = passed.join(keep1, "fp").select("doc_id", "exact_keep")

    // keepers' text re-enters via a semi-join against the pruned scan
    val exactKept = base.join(
      keep1.select(col("exact_keep").as("doc_id")), Seq("doc_id"), "left_semi")
    val comp = Components.connected(Dedup.nearDupEdges(exactKept))

    quality
      .join(exactTag, Seq("doc_id"), "left")
      .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"),
        // NULL quality (empty/whitespace-only doc: 0/0 words) is junk,
        // not a keeper — the isNull arm keeps it out of the silent
        // fall-through to "kept"
        when(col("quality").isNull || col("quality") < minQuality, "low_quality")
          .when(col("doc_id") =!= col("exact_keep"), "exact_dup")
          .when(col("component").isNotNull && col("component") =!= col("doc_id"),
            "near_dup")
          .otherwise("kept").as("verdict"),
        when(col("quality").isNull || col("quality") < minQuality,
            lit(null).cast("long"))
          .when(col("doc_id") =!= col("exact_keep"), col("exact_keep"))
          .when(col("component").isNotNull && col("component") =!= col("doc_id"),
            col("component"))
          .otherwise(lit(null).cast("long")).as("ref_id"))
  }
}
