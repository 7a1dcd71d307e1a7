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
      expr(s"${Dedup.h60(s"concat('cms_${i}_', word)")} % $w").as("bucket"))
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

  /** The (row, bucket, c) counter matrix of a CMS over an arbitrary
    * key expression, rendered through the SAME hash family as
    * [[cmsWordMatrix]] (key cast to string first). Two matrices share
    * hash space exactly when they hash equal key strings — which is
    * precisely what [[cmsJoinSize]]'s inner product requires of its
    * two sides.
    */
  def cmsKeyMatrix(df: DataFrame, keyExpr: String,
      d: Int = 4, w: Int = 4096): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1, w >= 1: d=$d w=$w")
    df.select(expr(keyExpr).cast("string").as("word"))
      .filter(col("word").isNotNull) // NULL keys never join — exclude both sides
      .select(explode(array(bucketStructs(d, w): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Equi-join cardinality estimate WITHOUT running the join: the CMS
    * inner product (AGMS/count-min join-size estimation — Cormode &
    * Muthukrishnan). Per hash row r, Σ_bucket cA·cB over-estimates
    * |A ⋈ B| by the colliding cross terms; the min over the d rows is
    * the sketch estimate, never below the true size. The planner-side
    * use at 100 TB: decide broadcast vs shuffle vs salt BEFORE paying
    * the join, from two single-scan sketches of d·w cells each.
    *
    * All arithmetic is exact integer on the portable hash, so the
    * estimate hash-gates in DuckDB (the q98 contract). Caller bound:
    * per-row dot ≤ |A|·|B| must fit a BIGINT — at 3·10⁹ rows a side,
    * switch the sum to DECIMAL.
    */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      d: Int = 4, w: Int = 4096): DataFrame = {
    val ma = cmsKeyMatrix(a, aKey, d, w)
    val mb = cmsKeyMatrix(b, bKey, d, w).withColumnRenamed("c", "c2")
    val dots = ma.join(mb, Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("c") * col("c2")).as("dot"))
    // Anchor the min on a generated (0 until d) row axis: a hash row
    // whose two bucket sets are disjoint has true dot 0 and must
    // participate in the min (tightening the bound), and two fully
    // disjoint key sets estimate 0 rather than NULL — the planner-side
    // consumer always gets a number.
    a.sparkSession.range(d).select(col("id").as("r"))
      .join(dots, Seq("r"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_join_rows"))
  }

  /** The k (hash, bucket) positions of a fingerprint in an m-bit Bloom
    * filter — the ONE hash definition shared by build and probe (same
    * desynchronization argument as [[bucketStructs]]). Hash i = portable
    * md5("bloom_i_" + fp) mod m.
    */
  private def bloomBuckets(fpCol: String, k: Int, m: Int) = (0 until k).map { i =>
    expr(s"${Dedup.h60(s"concat('bloom_${i}_', $fpCol)")} % $m")
  }

  /** Occupied bucket set of an m-bit / k-hash Bloom filter over the
    * corpus's text fingerprints — the filter in relational form (one
    * row per SET bit, ≤ m rows total regardless of corpus size). The
    * classic ingest front door at 100 TB: a membership test against
    * this bounded set answers "definitely new" without joining the
    * fingerprint store, so only maybe-present rows pay the exact
    * check. Build is one scan + one distinct bounded by m; the bitmap
    * materialization (OR of per-partition bitmaps) is the physical
    * twin — this rendering keeps the whole surface relational so an
    * oracle reproduces it bit-for-bit.
    */
  def bloomBuild(corpus: DataFrame, k: Int = 4, m: Int = 131072): DataFrame = {
    require(k >= 1 && m >= 2, s"need k >= 1, m >= 2: k=$k m=$m")
    corpus.select(md5(col("text")).as("fp"))
      .select(explode(array(bloomBuckets("fp", k, m): _*)).as("bucket"))
      .distinct()
  }

  /** Membership audit of `probes` against the corpus filter: per probe
    * doc, the Bloom verdict (`maybe_present` = all k buckets set) and
    * the ground truth (`present` = fingerprint really in the corpus).
    * Bloom's contract — NO false negatives, measured false-positive
    * rate — is visible per row: present = 1 ⇒ maybe_present = 1 by
    * construction (same hashes, same buckets), and the false-positive
    * mass is exactly the maybe_present = 1 ∧ present = 0 rows.
    *
    * Scale posture: the occupied set is ≤ m rows (broadcast side);
    * probes explode to k rows each, one equi-join + count-of-hits agg;
    * the exact branch is a semi-join on the fingerprint only — at a
    * real front door it runs on the maybe rows alone, here it runs on
    * all probes because the AUDIT is the product.
    */
  /** Persist a built filter: occupied-bit rows + a 1-row (k, m) meta
    * frame. The artifact is ≤ m rows of one long — the cheapest stored
    * index in the engine, and the one a 100 TB ingest consults on
    * EVERY arriving document, so it living across jobs (not rebuilt
    * per session) is the whole point.
    */
  def writeBloom(corpus: DataFrame, dir: String, k: Int = 4,
      m: Int = 131072): Unit = {
    bloomBuild(corpus, k, m).write.mode("overwrite").parquet(s"$dir/bits")
    corpus.sparkSession.range(1)
      .select(lit(k.toLong).as("k"), lit(m.toLong).as("m"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Probe a STORED filter: the production front-door shape — no
    * corpus in reach, only the ≤ m-row bit set — so the output is the
    * Bloom verdict alone (doc_id, maybe_present). (k, m) come from the
    * artifact's meta, so probes can never hash differently from the
    * build that wrote it. Stored ≡ rebuilt is q119's hash law: the
    * oracle recomputes the same filter from the corpus itself.
    */
  def bloomMembershipStored(spark: org.apache.spark.sql.SparkSession,
      dir: String, probes: DataFrame): DataFrame = {
    val meta = spark.read.parquet(s"$dir/meta").head
    val (k, m) = (meta.getAs[Long]("k").toInt, meta.getAs[Long]("m").toInt)
    bloomProbe(spark.read.parquet(s"$dir/bits"), probes, k, m)
  }

  /** Verdict-only probe against an occupied-bucket frame — the ONE
    * probe definition behind [[bloomMembershipStored]] and the
    * streaming-accumulated filter
    * ([[graft.streaming.Streams.ingestBloomProbe]]).
    */
  def bloomProbe(occupied: DataFrame, probes: DataFrame,
      k: Int, m: Int): DataFrame = {
    val pb = probes.select(col("doc_id"), md5(col("text")).as("fp"))
    pb.select(col("doc_id"),
        explode(array(bloomBuckets("fp", k, m): _*)).as("bucket"))
      .join(occupied, "bucket")
      .groupBy("doc_id").agg(count(lit(1)).as("_hits"))
      .join(pb.select("doc_id"), Seq("doc_id"), "right")
      .select(col("doc_id"),
        (coalesce(col("_hits"), lit(0L)) === k).cast("bigint").as("maybe_present"))
  }

  def bloomMembership(corpus: DataFrame, probes: DataFrame,
      k: Int = 4, m: Int = 131072): DataFrame = {
    val occupied = bloomBuild(corpus, k, m)
    val pb = probes.select(col("doc_id"), md5(col("text")).as("fp"))
    val hits = pb
      .select(col("doc_id"),
        explode(array(bloomBuckets("fp", k, m): _*)).as("bucket"))
      .join(occupied, "bucket")
      .groupBy("doc_id").agg(count(lit(1)).as("_hits"))
    val truth = pb.join(
        corpus.select(md5(col("text")).as("fp")).distinct(), Seq("fp"), "left_semi")
      .select(col("doc_id"), lit(1L).as("present"))
    pb.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .join(truth, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("_hits"), lit(0L)) === k).cast("bigint").as("maybe_present"),
        coalesce(col("present"), lit(0L)).as("present"))
  }
}
