package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication suite — the LLM-training-pipeline tier the
  * engine adds on top of the reference's MapReduce surface (the
  * reference's word count is the degenerate "analyze text by key" case;
  * dedup is the same shuffle-on-derived-key pattern at corpus scale).
  *
  * Tiers:
  *   - exact: hash-groupBy on a content fingerprint (md5) — one shuffle.
  *   - n-gram Jaccard: shingle → posting-list self-join → set overlap.
  *   - MinHash + LSH: the scale path — per-doc signatures (k hashes),
  *     banded into buckets; only same-bucket candidates are verified.
  *     At 100 TB the candidate join replaces the quadratic all-pairs
  *     join: cost ~ O(docs × bands) + O(sum over buckets of bucket²).
  *   - SimHash: 60-bit signature per doc; near-dups = small Hamming
  *     distance. Signature build is one shuffle; pair scan is over
  *     signatures (8 bytes/doc), not documents.
  *
  * All hash derivations go through md5 (not Spark's `hash`/`xxhash64`)
  * so results are engine-portable and oracle-checkable: the first 15 hex
  * chars of an md5 give a uniform 60-bit non-negative value that DuckDB
  * reproduces with `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`.
  */
object Dedup {

  /** Portable 60-bit hash of a string SQL expression (see class doc). */
  private[operators] def h60(sqlExpr: String): String =
    s"cast(conv(substr(md5($sqlExpr), 1, 15), 16, 10) as bigint)"

  /** Distinct word n-gram shingles per document: (doc_id, g).
    * Tokenization matches the reference's word model (whitespace split,
    * drop empties — reference src/main.c:19, fixed per SURVEY.md §2.2 Q1).
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val gram = (0 until n).map(k => s"w[i+$k]").mkString("concat_ws(' ', ", ", ", ")")
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(w)-$n), i -> $gram)")).as("g"))
      .distinct()
  }

  /** Exact-dedup tier: one row per distinct content fingerprint with the
    * group size and the kept (minimum) doc_id.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fingerprint"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))

  /** Pairwise shingle-set Jaccard via posting-list self-join:
    * J(a,b) = |A∩B| / (|A|+|B|-|A∩B|). The join shuffles on the shingle
    * (equi-key), so work is proportional to posting-list sizes squared —
    * use [[minhashPairs]] at scale; this is the exact tier.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame =
    jaccardOf(shingles(docs, n), threshold)

  private[operators] def jaccardOf(sh: DataFrame, threshold: Double): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(broadcast(sz.as("s1")), col("i") === col("s1.doc_id"))
      .join(broadcast(sz.as("s2")), col("j") === col("s2.doc_id"))
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingles. Returned long: (doc_id, s, minh).
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 16): DataFrame = {
    val seeds = sh.sparkSession.range(0, numHashes).toDF("s")
    sh.crossJoin(broadcast(seeds))
      .select(col("doc_id"), col("s"),
        expr(h60("concat(s, '|', g)")).as("h"))
      .groupBy("doc_id", "s")
      .agg(min("h").as("minh"))
  }

  /** LSH bands: group each doc's signature rows into `numHashes/rowsPerBand`
    * bands; band key = md5 of the ordered minhash values. Docs sharing any
    * (band, key) bucket are candidate pairs.
    */
  def lshBands(sig: DataFrame, rowsPerBand: Int = 4): DataFrame =
    sig.groupBy(col("doc_id"), expr(s"s div $rowsPerBand").as("b"))
      .agg(expr(
        "md5(array_join(transform(array_sort(collect_list(struct(s, minh))), x -> cast(x.minh as string)), ','))")
        .as("band_key"))

  /** Full MinHash-LSH near-dup pipeline: shingle → signature → band →
    * same-bucket candidates → exact Jaccard verification ≥ `threshold`.
    */
  def minhashPairs(
      docs: DataFrame, n: Int = 3, numHashes: Int = 16,
      rowsPerBand: Int = 4, threshold: Double = 0.7): DataFrame = {
    val sh = shingles(docs, n)
    val bands = lshBands(minhashSignatures(sh, numHashes), rowsPerBand)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    jaccardOf(sh, threshold).as("jac")
      .join(cand.as("c"), col("jac.i") === col("c.i") && col("jac.j") === col("c.j"), "left_semi")
  }

  /** SimHash: 60-bit signature per doc. Bit b of the signature is the
    * sign of the sum over shingles of ±1 depending on bit b of the
    * shingle hash. Near-duplicate docs differ in few bits.
    */
  def simhashSignatures(docs: DataFrame, n: Int = 3): DataFrame = {
    val h = shingles(docs, n)
      .select(col("doc_id"), expr(h60("concat('sh|', g)")).as("hv"))
    h.select(col("doc_id"), col("hv"), explode(expr("sequence(0, 59)")).as("b"))
      .groupBy("doc_id", "b")
      .agg(expr(
        "case when sum(case when (shiftright(hv, b) & 1) = 1 then 1 else -1 end) > 0 " +
          "then cast(1 as bigint) else cast(0 as bigint) end").as("bit"))
      .groupBy("doc_id")
      .agg(expr("sum(shiftleft(bit, b))").as("simhash"))
  }

  /** Candidate near-dup pairs by SimHash Hamming distance ≤ `maxHamming`.
    * The pair scan runs over 8-byte signatures, not documents; at scale,
    * block by signature prefix instead of the full self-join.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 10, n: Int = 3): DataFrame = {
    val sig = simhashSignatures(docs, n)
    sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
