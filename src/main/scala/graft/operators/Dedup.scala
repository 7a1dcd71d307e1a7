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
  private[graft] def h60(sqlExpr: String): String =
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
    // `sz` grows O(corpus): no broadcast hint — these are equi-joins AQE
    // plans on its own (and can still broadcast when actually small).
    inter
      .join(sz.as("s1"), col("i") === col("s1.doc_id"))
      .join(sz.as("s2"), col("j") === col("s2.doc_id"))
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact Jaccard restricted to the given candidate (i, j) pairs.
    *
    * Cost is O(|candidates| × shingles-per-doc), independent of the
    * number of non-candidate pairs: shingle sets are first semi-joined
    * down to docs that appear in some candidate pair, then the
    * intersection count is computed per candidate pair only (join the
    * pair to i's shingles, match them against j's). This is what makes
    * LSH an actual scale path — verification work tracks the candidate
    * set, never the full pair space.
    */
  private[operators] def jaccardOfCandidates(
      sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val candDocs = cand.select(col("i").as("doc_id"))
      .union(cand.select(col("j").as("doc_id"))).distinct()
    val shc = sh.join(candDocs, Seq("doc_id"), "left_semi")
    val sz = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shc.as("sa"), col("i") === col("sa.doc_id"))
      .join(shc.as("sb"), col("j") === col("sb.doc_id") && col("sa.g") === col("sb.g"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("c"))
    inter
      .join(sz.as("s1"), col("i") === col("s1.doc_id"))
      .join(sz.as("s2"), col("j") === col("s2.doc_id"))
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingles. Returned long: (doc_id, s, minh).
    *
    * Shape note: the broadcast seed fan-out IS the measured-fastest form
    * (a nested-loop product against a bounded `numHashes`-row literal
    * frame, fully pipelined). The 16× intermediate rows never reach the
    * wire — partial min aggregation combines them to `numHashes` rows
    * per doc per partition before the exchange. The alternative (all
    * minima as aggregate columns of one groupBy) shuffles the same bytes
    * but evaluates the md5s in the aggregate update path, ~1.5× slower
    * end-to-end at sf0.1.
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
    jaccardOfCandidates(sh, cand, threshold)
  }

  /** SimHash: 60-bit signature per doc. Bit b of the signature is the
    * sign of the sum over shingles of ±1 depending on bit b of the
    * shingle hash. Near-duplicate docs differ in few bits.
    */
  def simhashSignatures(docs: DataFrame, n: Int = 3): DataFrame = {
    val h = shingles(docs, n)
      .select(col("doc_id"), expr(h60("concat('sh|', g)")).as("hv"))
    // One aggregation pass: 60 conditional ±1 sums (one per signature
    // bit) in a single groupBy — no row explosion, so the shuffle moves
    // one row per (doc, shingle), not 60. The bit columns then fold into
    // the signature in a plain projection.
    val bitSums = (0 until 60).map { b =>
      sum(expr(s"case when (shiftright(hv, $b) & 1) = 1 then 1 else -1 end")).as(s"b$b")
    }
    val sigExpr = (0 until 60)
      .map(b => s"shiftleft(cast(case when b$b > 0 then 1 else 0 end as bigint), $b)")
      .mkString(" + ")
    h.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), expr(sigExpr).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ `maxHamming`, found by
    * pigeonhole blocking (Manku et al., WWW'07 shape): the 60-bit
    * signature is split into `maxHamming + 1` contiguous blocks, so any
    * pair within the distance bound must agree exactly on at least one
    * block. Candidates = pairs sharing a (block index, block value)
    * bucket — an equi self-join, never the all-pairs cross join — then
    * exact Hamming verification. No false negatives by construction.
    *
    * Scale note: block width is 60/(maxHamming+1) bits, so tighter
    * distance bounds give wider blocks and sharper buckets; for loose
    * bounds at very large corpora, widen the signature (this layout
    * generalizes) rather than shrinking blocks below ~8 bits.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 10, n: Int = 3): DataFrame = {
    val sig = simhashSignatures(docs, n)
    val nb = maxHamming + 1
    val blocks = (0 until nb).map { k =>
      val lo = k * 60 / nb
      val width = (k + 1) * 60 / nb - lo
      struct(lit(k).as("k"),
        expr(s"shiftright(simhash, $lo) & ${(1L << width) - 1}").as("v"))
    }
    val blocked = sig.select(col("doc_id"), col("simhash"),
      explode(array(blocks: _*)).as("blk"))
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.simhash").as("si"), col("b.simhash").as("sj"))
      .distinct()
      .select(col("i"), col("j"),
        expr("cast(bit_count(si ^ sj) as bigint)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
