package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over word occurrences — the heavy-hitter sketch for
  * key spaces too large to count exactly (URLs, n-grams, user ids): a
  * `d` hash-rows × `w` buckets counter matrix, update = +1 in one bucket
  * per row, estimate = min over rows. State is d·w longs regardless of
  * corpus size, merge is elementwise add (associative + commutative), so
  * partial aggregation combines map-side and the shuffle carries ≤ d·w
  * cells per mapper — the same mergeable-bounded-state story as the HLL
  * (q34) and GK (q49) tiers.
  *
  * Unlike those two, THIS sketch is engine-reproducible: bucket hashes
  * bottom out in the house portable md5 60-bit hash ([[Dedup]] doc), and
  * counter adds + min are exact integer ops — so the full estimate
  * surface gets a DuckDB hash gate, not a rows-only check. Classic
  * bounds still hold (per row E[overestimate] ≤ T/w; P[overestimate >
  * e·T/w on ALL d rows] ≤ e^−d) and are asserted in SketchSpec; the
  * audit output carries the exact count so the error is measured, not
  * assumed.
  */
object Sketches {

  /** The d (row, bucket) structs of a word's CMS positions — the ONE
    * hash definition shared by the matrix build and the probe side, so
    * the two can never desynchronize (a probe hashing differently from
    * the matrix would silently undercount, breaking the sketch's core
    * invariant). Row `r`'s hash = portable-md5("cms_r_" + word) mod w.
    */
  private def bucketStructs(d: Int, w: Int) = (0 until d).map { i =>
    struct(lit(i.toLong).as("r"),
      expr(s"cast(conv(substr(md5(concat('cms_${i}_', word)), 1, 15), " +
        s"16, 10) as bigint) % $w").as("bucket"))
  }

  /** The (row, bucket, c) counter matrix of the CMS over word
    * occurrences: one token explode, one map-side-combined agg bounded
    * by d·w cells.
    */
  def cmsWordMatrix(docs: DataFrame, d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1, w >= 1: d=$d w=$w")
    val toks = docs.select(
      explode(expr(TextAnalysis.WordsExpr)).as("word"))
    toks.select(explode(array(bucketStructs(d, w): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** CMS estimate audit for `probes`: per probe word, the sketch
    * estimate (min over rows of its bucket counters, 0 when a bucket is
    * empty), the exact occurrence count, and the overestimate (≥ 0 by
    * construction — CMS never undercounts). Total audit: every probe
    * gets a row, absent words report est ≥ exact = 0.
    *
    * Scale posture: the matrix agg is the only corpus-sized work; the
    * probe side is a bounded literal frame broadcast against d·w cells,
    * and the exact-count branch filters the token scan to the probe set
    * before its agg.
    */
  def cmsEstimates(docs: DataFrame, probes: Seq[String],
      d: Int = 4, w: Int = 1024): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    require(probes.forall(_.matches("[a-z0-9]+")),
      s"probes must be lowercase alphanumeric words: $probes")
    val spark = docs.sparkSession
    val matrix = cmsWordMatrix(docs, d, w)
    val probeDf = spark.createDataFrame(probes.map(Tuple1(_))).toDF("word")
    val probeBuckets = probeDf
      .select(col("word"), explode(array(bucketStructs(d, w): _*)).as("rb"))
      .select(col("word"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val est = probeBuckets.join(matrix, Seq("r", "bucket"), "left")
      .groupBy("word")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
    val exact = docs.select(explode(expr(TextAnalysis.WordsExpr)).as("word"))
      .filter(col("word").isin(probes.map(_.asInstanceOf[Any]): _*))
      .groupBy("word").agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("word"), "left")
      .select(col("word"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("est") - coalesce(col("exact"), lit(0L))).as("overestimate"))
  }
}
