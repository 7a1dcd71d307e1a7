package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-iteration BPE tokenizer training as a stored artifact — the
  * driver loop SURVEY Q101 describes ("the driver loop applies the
  * winning merge and re-scores"; [[TextAnalysis.bpePairCounts]] is ONE
  * iteration's scoring pass, this runs N of them and persists the
  * result), plus application of the stored merges to a corpus.
  *
  * Symbol sequences are carried as delimiter-wrapped STRINGS rather
  * than arrays: a word's symbols `[ab, c]` render as `"|ab||c|"` (every
  * token individually wrapped in `|`, so each boundary is `||`).
  * The payoff is that applying merge (l, r) is one plain left-to-right
  * `replace(s, "|l||r|", "|lr|")` — string replace consumes matches
  * left-to-right without rescanning replaced output, which is EXACTLY
  * BPE's non-overlapping merge-application order ("aaa" + (a,a) →
  * [aa, a]), and the individually-wrapped rendering makes the pattern
  * boundary-safe (token "xa" never matches pattern "|a|…", and two
  * candidate matches never share a delimiter, so runs merge greedily:
  * "|a||a||a||a|" → "|aa||aa|"). The same rewrite is a single ANSI
  * `replace` in any engine, which is what lets a SQL oracle replay the
  * whole training loop bit-for-bit. Corpus words must not contain the
  * delimiter (enforced loudly in [[initState]]).
  *
  * Scale posture: token OCCURRENCES are scanned once ([[wordFreqs]],
  * map-side combined); the training state is the DISTINCT-word frame
  * (vocab-grain — the [[TextAnalysis.bpePairCounts]] pivot), so each
  * iteration costs one vocab-sized scan, an adjacent-pair agg bounded
  * by (symbols per word × vocab), and a 1-row argmax collect; lineage
  * is cut eagerly per iteration ([[Ckpt.narrow]], the PageRank round
  * idiom) so iteration k never recomputes iterations 1..k-1.
  * Application ([[tokenCounts]]) is again vocab-grain: a `replace`
  * chain of depth `nMerges` over distinct words, joined back to
  * occurrences by one word equi-join.
  */
object Bpe {

  /** One trained merge: at `step` (1-based), adjacent pair (left,
    * right) had the highest frequency-weighted corpus count
    * `pairCount` (ties (left, right) asc — the q101 order) and was
    * rewritten to the new symbol left+right everywhere.
    */
  final case class Merge(step: Long, left: String, right: String,
      merged: String, pairCount: Long)

  private val Delim = "|"

  /** Distinct-word frequencies — the one pass over token occurrences. */
  private[graft] def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(expr(TextAnalysis.WordsExpr)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial training state: every word as its character sequence in
    * the wrapped-string rendering ("abc" → "|a||b||c|"). Fails loudly
    * on a word containing the delimiter — silent corruption of the
    * boundary encoding must never train a plausible-looking tokenizer.
    */
  private[graft] def initState(wf: DataFrame): DataFrame = {
    val bad = wf.filter(col("word").contains(Delim)).limit(1).collect()
    require(bad.isEmpty,
      s"corpus word contains the '$Delim' delimiter: '${bad.headOption.map(_.getString(0)).getOrElse("")}'")
    wf.select(col("word"), col("freq"),
      concat(lit(Delim),
        array_join(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
          Delim + Delim),
        lit(Delim)).as("s"))
  }

  /** Frequency-weighted adjacent symbol-pair counts over a training
    * state — [[TextAnalysis.bpePairCounts]]'s scoring generalized from
    * characters to current symbols. Overlapping positions all count
    * ("|a||a||a|" contributes (a,a) twice), matching q101.
    */
  private[graft] def pairCounts(state: DataFrame): DataFrame =
    state.select(col("freq"),
        expr("split(substring(s, 2, length(s) - 2), '\\\\|\\\\|')").as("ts"))
      .select(col("freq"), col("ts"),
        explode(expr("if(size(ts) >= 2, sequence(1, size(ts) - 1), array())")).as("i"))
      .select(col("freq"),
        expr("element_at(ts, cast(i AS int))").as("left"),
        expr("element_at(ts, cast(i + 1 AS int))").as("right"))
      .groupBy("left", "right").agg(sum("freq").as("pair_count"))

  /** Rewrite every sequence with one merge — see the class doc for why
    * a plain string replace IS the BPE application semantics.
    */
  private[graft] def applyMerge(state: DataFrame, l: String, r: String): DataFrame =
    state.withColumn("s", replace(col("s"),
      lit(Delim + l + Delim + Delim + r + Delim),
      lit(Delim + l + r + Delim)))

  /** Train `nMerges` iterations: score, collect the 1-row argmax
    * (pair_count desc, left, right — the q101 tie order), rewrite,
    * repeat. Fails loudly if the corpus exhausts its pairs before
    * `nMerges` (every word fused to one symbol) — a silently short
    * merge list would change every downstream tokenization.
    */
  def train(docs: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var state = Ckpt.narrowLazy(initState(wordFreqs(docs)))
    val out = Seq.newBuilder[Merge]
    for (step <- 1 to nMerges) {
      val top = pairCounts(state)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"corpus pairs exhausted at iteration $step of $nMerges")
      val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += Merge(step.toLong, l, r, l + r, c)
      state = Ckpt.narrowLazy(applyMerge(state, l, r))
    }
    out.result()
  }

  /** Persist the trained tokenizer in the canonical stored layout:
    * `merges/` (step, left, right, merged, pair_count) — the whole
    * artifact; the vocab is derivable by replaying the merges, and the
    * merge LIST is what application consumes (the q96/q203 stored
    * protocol: build once at job time, every downstream read is flat).
    */
  def write(docs: DataFrame, nMerges: Int, outDir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, nMerges).toDF()
      .select(col("step"), col("left"), col("right"), col("merged"),
        col("pairCount").as("pair_count"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/merges")
  }

  /** The stored merge table, ordered by step. */
  def loadMergesDF(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/merges")

  /** The stored merge list collected for application — bounded by the
    * training parameter (a tokenizer ships 10⁴–10⁵ merges; collecting
    * it is loading the tokenizer, not a data collect).
    */
  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    loadMergesDF(spark, dir).orderBy("step")
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Tokens-per-word under the stored merges: the vocab-grain map
    * (word, freq, n_bpe_tokens) from applying the merge chain in
    * training order — one `replace` expression chain of depth
    * `merges.size` over DISTINCT words, never occurrences.
    */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val applied = merges.foldLeft(initState(wordFreqs(docs))) {
      case (st, (l, r)) => applyMerge(st, l, r)
    }
    applied.select(col("word"), col("freq"),
      size(expr("split(substring(s, 2, length(s) - 2), '\\\\|\\\\|')"))
        .cast("long").as("n_bpe_tokens"))
  }

  /** Per-language fertility under the stored merges: whitespace tokens
    * vs trained-BPE tokens in exact integer ppm — the q212 audit read
    * off the tokenizer a vocab actually ships, not the regex proxy.
    * One occurrence explode joined to the vocab-grain [[tokenCounts]]
    * map; every output group has ws_tokens ≥ 1 by construction (groups
    * exist only via exploded words), so the division is total.
    */
  def fertility(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("lang"), explode(expr(TextAnalysis.WordsExpr)).as("word"))
      .join(tokenCounts(docs, merges).select("word", "n_bpe_tokens"), "word")
      .groupBy("lang")
      .agg(count(lit(1)).as("ws_tokens"), sum("n_bpe_tokens").as("bpe_tokens"))
      .select(col("lang"), col("ws_tokens"), col("bpe_tokens"),
        expr("bpe_tokens * 1000000 div ws_tokens").as("fertility_ppm"))
}
