package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval + persisted inverted index — the reference's term
  * lookup (reference `src/main.c:50-61`: scan the corpus, report one
  * term's count) grown into the shape a 100 TB corpus actually serves
  * queries from: a stored postings index consulted per query, and a
  * BM25 ranking over it.
  *
  * Scoring is EXACT-INTEGER rational BM25 (k1 = 6/5, b = 3/4) with the
  * engine's established no-libm parity trade ([[TextAnalysis.tfidfTopTerms]],
  * q84, q94): the Robertson idf stays the un-logged rational
  * (2·(N−df)+1)/(2·df+1) and every division is a declared-precision
  * BIGINT floor division, so scores are bit-identical in any engine —
  * DuckDB reproduces the ranking hash-exactly. With k1 = 6/5, b = 3/4:
  *
  *   tf_part = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
  *           = 22·10⁶·tf / (10⁷·tf + 3·10⁶ + 9·dl·invavg_ppm)   [×10⁷]
  *
  * where invavg_ppm = ⌊10⁶·D/T⌋ (D docs, T tokens — 1/avgdl in ppm,
  * floored ONCE corpus-wide), tf_part is floored to ppm, and the final
  * per-term score is ⌊tf_part_ppm·(2(N−df)+1) / (2df+1)⌋, summed per
  * doc as exact BIGINTs. Bounds: tf ≤ 4·10⁵ keeps 22·10¹²·tf inside
  * BIGINT; D, T are unbounded (the idf product caps at ~tf_part·2D ≈
  * 4.4·10⁶·D, safe past 10¹¹ docs).
  */
object TextIndex {

  /** The per-term BM25 numerator/denominator constants for k1 = 6/5,
    * b = 3/4, pre-scaled by 10⁷ (see object doc).
    */
  private val TfNum = 22000000000000L // 10⁶ (ppm) · 22·10⁶ (= 10⁷·(k1+1))
  private val TfDen1 = 10000000L      // 10⁷ · 1        (the tf coefficient)
  private val TfDen0 = 3000000L       // 10⁷ · k1·(1−b) (the constant term)
  private val TfDenL = 9L             //       k1·b     (the dl·invavg_ppm coefficient)

  /** A loaded inverted index: `postings` (word, doc_id, tf), `doclens`
    * (doc_id, n_tokens), and the corpus stats the scorer needs. Only
    * docs with ≥ 1 token appear (an empty doc can match no term).
    */
  final case class Index(postings: DataFrame, doclens: DataFrame,
      nDocs: Long, totalTokens: Long)

  /** Build the index frames from a corpus in one pass: tokenize
    * ([[TextAnalysis.WordsExpr]] — the ONE tokenizer), tf per (word,
    * doc), dl per doc. Postings are word-keyed, so the tf agg map-side
    * combines and the result partitions by the probe key.
    *
    * NOTE: corpus stats (D, T) are computed EAGERLY here — build is an
    * explicit index-build job, the same contract as the IVF tier's
    * eager `ivfTrainedIndex`; one-shot scan-path callers pay that one
    * stats scan inside [[bm25Rank]], repeated callers [[write]] once
    * and [[load]] per query.
    */
  def build(docs: DataFrame): Index = buildFrom(
    docs.select(col("doc_id"), explode(expr(TextAnalysis.WordsExpr)).as("word")))

  /** [[build]]'s body over an already-derived (doc_id, word) token
    * frame — factored out so [[write]] can hand in a CHECKPOINTED toks
    * frame and pay the corpus scan + tokenization exactly once.
    */
  private def buildFrom(toks: DataFrame): Index = {
    val postings = toks.groupBy("word", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val doclens = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"))
    val s = doclens.agg(count(lit(1)), sum("n_tokens")).head
    val (d, t) = if (s.isNullAt(1)) (0L, 0L) else (s.getLong(0), s.getLong(1))
    Index(postings, doclens, d, t)
  }

  /** Persist an index built from a corpus — the "index build job";
    * [[load]] is what query sessions pay. [[build]] piped into
    * [[compact]], so the canonical on-disk layout has ONE definition —
    * but with the token frame checkpointed first (Ckpt.narrow, the
    * engine's one lineage-cut policy point): build's eager stats head,
    * compact's postings write, and its doclens write are three
    * consumers of the same tokenization, and without the cut each would
    * re-scan and re-tokenize the corpus — tripling the dominant cost of
    * the fresh-build job. The ≤ |tokens|-row cut frame is released as
    * soon as the writes land.
    */
  def write(docs: DataFrame, dir: String): Unit = {
    val toks = Ckpt.narrowLazy(docs.select(col("doc_id"),
      explode(expr(TextAnalysis.WordsExpr)).as("word")))
    try compact(buildFrom(toks), dir) finally Ckpt.release(toks)
  }

  /** Load a stored index. Nothing here scans the corpus: the postings /
    * doclens frames are lazy parquet reads, and a term probe pushes its
    * `word IN (…)` filter into the postings scan.
    */
  def load(spark: SparkSession, dir: String): Index = {
    val s = spark.read.parquet(s"$dir/stats").head
    Index(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclens"),
      s.getAs[Long]("n_docs"), s.getAs[Long]("total_tokens"))
  }

  /** The reference's term lookup (R10) against the stored index: the
    * term's postings + corpus occurrence total, no corpus scan. Empty
    * result ⇔ the reference CLI's "not found" arm.
    */
  def lookup(idx: Index, term: String): DataFrame =
    idx.postings.filter(col("word") === term)
      .select(col("doc_id"), col("tf"))

  /** BM25 top-`k` docs for `terms` over an [[Index]] — shared by the
    * scan-side [[bm25Rank]] and the stored-index path, so the scoring
    * contract cannot drift between them. Output: (rank, doc_id,
    * score_ppm, n_hit_terms, n_tokens), rank 1 = best, ties by doc_id
    * asc. Only docs hitting ≥ 1 term appear (retrieval, not audit).
    *
    * Scale posture: the postings probe filters on the bounded term set
    * (pushed to the scan on the stored path), tf/df frames are ≤
    * |terms|·docs-hit rows, df and stats broadcast, the doc-grain score
    * agg map-side combines, and top-k is TakeOrderedAndProject — never
    * a global sort.
    */
  def bm25(idx: Index, terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"terms must be lowercase alphanumeric words: $terms")
    require(k >= 1, s"k must be >= 1, got $k")
    val invAvgPpm =
      if (idx.totalTokens == 0L) 0L else 1000000L * idx.nDocs / idx.totalTokens
    val qt = idx.postings
      .filter(col("word").isin(terms.map(_.asInstanceOf[Any]): _*))
    val dfreq = qt.groupBy("word").agg(count(lit(1)).as("df"))
    val term = qt.join(idx.doclens, "doc_id")
      .join(broadcast(dfreq), "word")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"($TfNum * tf) div " +
          s"($TfDen1 * tf + $TfDen0 + $TfDenL * n_tokens * $invAvgPpm)")
          .as("tfq_ppm"),
        col("df"))
    val scored = term.groupBy("doc_id")
      .agg(sum(expr(s"(tfq_ppm * (2 * (${idx.nDocs}L - df) + 1)) div " +
          "(2 * df + 1)")).as("score_ppm"),
        count(lit(1)).as("n_hit_terms"),
        max(col("n_tokens")).as("n_tokens"))
    val top = scored.orderBy(col("score_ppm").desc, col("doc_id")).limit(k)
    // rank over the ≤ k-row survivor frame only — trivial single partition
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score_ppm").desc, col("doc_id")))
          .cast("long"))
      .select("rank", "doc_id", "score_ppm", "n_hit_terms", "n_tokens")
  }

  /** BM25 straight off a corpus frame (index built in-query — the
    * one-shot path; repeated query loads should [[write]]/[[load]]).
    */
  def bm25Rank(docs: DataFrame, terms: Seq[String], k: Int = 20): DataFrame =
    bm25(build(docs), terms, k)

  /** Write an [[Index]]'s frames in the canonical stored layout — the
    * ONE definition of that layout, used by [[write]] for fresh builds
    * and directly for compacting an accumulated batch-partitioned
    * index (the [[graft.streaming.Streams]] `ingestTextIndex` artifact
    * shape, or any union of delta indexes): postings re-partitioned by
    * word into one file group per probe key, doclens coalesced, stats
    * collapsed to the summed 1-row manifest.
    * The maintenance job an ingest pipeline runs on a cadence so probe
    * latency doesn't degrade with batch count — ingest appends stay
    * O(delta), compaction pays the rewrite once. Safe to run against a
    * live ingest dir: it only reads committed batches.
    */
  def compact(idx: Index, outDir: String): Unit = {
    idx.postings.repartition(col("word")).write.mode("overwrite")
      .parquet(s"$outDir/postings")
    idx.doclens.write.mode("overwrite").parquet(s"$outDir/doclens")
    idx.postings.sparkSession.range(1)
      .select(lit(idx.nDocs).as("n_docs"),
        lit(idx.totalTokens).as("total_tokens"))
      .write.mode("overwrite").parquet(s"$outDir/stats")
  }

  /** [[TextAnalysis.lmFamiliarity]] as an INGEST-TIME gate: score a
    * delta of new docs against the STORED corpus index instead of
    * against themselves — corpus word counts come off the postings
    * frame (vocab-grain agg, never a corpus rescan), `corpus_tokens` off
    * the stats manifest, and the pass scans only the delta. Words the
    * corpus has never seen count as OOV (rank NULL → beyond any top-k),
    * which is exactly what makes novel-gibberish ingest score low;
    * q94's self-corpus variant can't express that arm (its vocab always
    * contains its own tokens). Same output contract as q94: total audit
    * over the delta, token-free docs carry NULLs.
    */
  def lmFamiliarity(idx: Index, docs: DataFrame,
      vocabTopK: Long = 1000L): DataFrame = {
    require(vocabTopK >= 1 && vocabTopK <= Int.MaxValue,
      s"vocabTopK must be in [1, 2^31): $vocabTopK")
    val freq = idx.postings.groupBy("word").agg(sum("tf").as("c"))
    // in-vocab set = top-K types via orderBy.limit (TakeOrderedAndProject
    // — no global vocab sort; the q94 de-weak pattern). Membership in the
    // ≤ K survivor frame replaces "rank ≤ K" exactly: (c desc, word) is a
    // total order, and corpus-unseen words miss BOTH left joins, landing
    // in the same OOV arm the old "rank IS NULL" caught.
    val inVocab = freq.orderBy(col("c").desc, col("word"))
      .limit(vocabTopK.toInt).select(col("word"), lit(true).as("_in_vocab"))
    val toks = docs.select(col("doc_id"),
      explode(expr(TextAnalysis.WordsExpr)).as("word"))
    val perDoc = toks.join(freq, Seq("word"), "left")
      .join(inVocab, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("c"), lit(0L))).as("_sum_c"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("_oov"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        expr("case when n_tokens > 0 then _sum_c div n_tokens end")
          .as("mean_tok_count"),
        expr("case when n_tokens > 0 then (_oov * 1000000L) div n_tokens end")
          .as("oov_ppm"),
        lit(idx.totalTokens).as("corpus_tokens"))
  }
}
