package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set preparation: deterministic splits, mixture-weight
  * sampling, and sequence packing — the last mile between a curated
  * corpus ([[Curation]]) and a training run. Every operator is a pure
  * function of (doc_id, text, source), so reruns, backfills, and
  * multi-engine pipelines assign every document identically
  * (oracle-checkable like the rest of the engine; all hashing bottoms
  * out in the same portable md5 derivation as [[Dedup.h60]]).
  */
object Prep {

  /** 60-bit md5 hash of "salt_doc_id" mod `modulus` — the shared bucket
    * derivation behind [[split]], [[mix]], and [[sampleToQuota]]. The
    * salt is interpolated into a SQL literal, so restrict it to
    * identifier characters rather than risking a Catalyst parse error
    * (or a silently different expression) on quotes/backslashes.
    */
  private def hashBucket(salt: String, modulus: Long,
      keyCol: String = "doc_id"): Column =
    hash60(salt, keyCol) % modulus

  /** The raw (un-bucketed) 60-bit salted key hash behind [[hashBucket]]
    * and [[weightedSample]]'s priorities — one salt-validation site.
    */
  private def hash60(salt: String, keyCol: String = "doc_id"): Column = {
    // ASCII-only (not isLetterOrDigit, which admits any Unicode letter):
    // the documented contract is the [A-Za-z0-9_] identifier class, and
    // keeping to it means both engines md5 the same single-byte UTF-8
    require(salt.nonEmpty && salt.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'),
      s"salt must be non-empty [A-Za-z0-9_], got '$salt'")
    expr(Dedup.h60(s"concat('${salt}_', cast($keyCol as string))"))
  }

  private def bucket100(salt: String): Column = hashBucket(salt, 100L)

  private def splitOf(bucketCol: Column, valPct: Int, testPct: Int): Column =
    when(bucketCol < testPct, "test")
      .when(bucketCol < testPct + valPct, "val")
      .otherwise("train")

  /** Deterministic train/val/test assignment by hash bucket:
    * bucket = 60-bit md5 of "salt_doc_id" mod 100, test = buckets
    * [0, testPct), val = [testPct, testPct+valPct), train = the rest.
    *
    * Hash-bucketing (vs `sample()`/`randomSplit`) is the contract a
    * 100 TB pipeline needs: a document's split NEVER changes when other
    * documents are added or removed, across reruns, engines, and
    * partitionings — so eval sets stay stable under corpus growth and
    * train/test contamination can be audited row-by-row (q69 is that
    * audit: near-dup edges crossing split boundaries). One narrow
    * scan, no shuffle, no RNG state. `salt` derives independent split
    * dimensions (e.g. a second holdout) from the same ids.
    */
  def split(docs: DataFrame, valPct: Int = 10, testPct: Int = 10,
      salt: String = "split"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"valPct ($valPct) + testPct ($testPct) must fit within 100")
    docs.select(col("doc_id"), bucket100(salt).cast("long").as("bucket"))
      .withColumn("split", splitOf(col("bucket"), valPct, testPct))
  }

  /** Per-(source, split) token-budget PARTIAL over a document slice:
    * (source, split, n_docs, ws_tokens). Split assignment is the [[split]]
    * hash bucket and the token count is the q39 whitespace counter —
    * both PER-DOC deterministic functions of the row alone — so
    * partials over disjoint slices fold by summing the two counters
    * with no approximation: a streamed fold is bit-identical to a
    * one-shot rollup of the union whatever the batching (the
    * [[graft.streaming.Streams.ingestBudget]] contract). State is
    * sources × splits rows, never documents.
    */
  def budgetPartial(docs: DataFrame): DataFrame =
    split(docs).select(col("doc_id"), col("split"))
      .join(TextAnalysis.tokenCounts(docs)
        .select(col("doc_id"), col("source"), col("ws_tokens")), "doc_id")
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("ws_tokens"))

  /** Fold [[budgetPartial]] frames from disjoint slices — associative,
    * commutative, exact (integer sums).
    */
  def mergeBudgetPartials(partials: DataFrame): DataFrame =
    partials.groupBy("source", "split")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("ws_tokens")).as("ws_tokens"))

  /** Epoch up-sampling — the half of mixture weighting [[mix]] cannot
    * express: rates ABOVE 1.0 (a rare, high-quality source seen 2.5×
    * per training pass, a boilerplate-heavy crawl seen 0.3×). Each
    * doc's repeat count is the integral part of its source's epochs
    * plus one more iff its hash bucket falls under the fractional part
    * (so a source's expected token multiplicity is exactly its epoch
    * weight, and reweighting only moves docs whose source changed —
    * [[mix]]'s auditability contract, extended above 1.0; epochs = 0
    * drops a source). The fraction is fixed to ppm DRIVER-side
    * (`round(frac·10⁶)` on the literal weight), so the per-row plan is
    * pure integer arithmetic — no float crosses engines. One narrow
    * scan; the training loader materializes the repeats, this pass only
    * assigns them.
    */
  def epochs(docs: DataFrame, epochsBySource: Map[String, Double],
      defaultEpochs: Double = 1.0, salt: String = "epoch"): DataFrame = {
    val all = epochsBySource.values ++ Seq(defaultEpochs)
    require(all.forall(e => e >= 0.0 && e <= 100.0 && !e.isNaN),
      "epoch weights must be in [0, 100]")
    def parts(e: Double): (Long, Long) =
      (math.floor(e).toLong, math.round((e - math.floor(e)) * 1000000L))
    val (dWhole, dFrac) = parts(defaultEpochs)
    val (whole, frac) = epochsBySource.foldLeft(
        (lit(dWhole), lit(dFrac))) { case ((w, f), (src, e)) =>
      val (ew, ef) = parts(e)
      (when(col("source") === src, ew).otherwise(w),
        when(col("source") === src, ef).otherwise(f))
    }
    docs.select(col("doc_id"), col("source"),
        hashBucket(salt, 1000000L).cast("long").as("bucket"),
        whole.cast("long").as("_w"), frac.cast("long").as("_f"))
      .select(col("doc_id"), col("source"), col("bucket"),
        (col("_w") + (col("bucket") < col("_f")).cast("bigint")).as("epochs"))
  }

  /** Group-aware deterministic split: like [[split]], but every document
    * in a group (a near-dup cluster, a domain, a conversation thread)
    * hashes on its GROUP id, so a whole cluster lands in one split and
    * cross-split leakage between grouped documents is zero by
    * construction — the production fix for what the q69 contamination
    * audit detects after the fact. `groups` is (doc_id, group_id);
    * ungrouped documents fall back to their own doc_id, so with the same
    * salt a singleton's assignment is IDENTICAL to [[split]]'s — adding
    * grouping only ever moves clustered documents.
    *
    * The trade vs [[split]]'s never-moves contract: a doc's split can
    * change when its cluster gains a member that merges it into another
    * cluster (group identity is the cluster's min doc_id) — inherent to
    * any leakage-free grouping, and why the emitted `split_key` is part
    * of the output: diffing yesterday's keys shows exactly which docs
    * moved and why. One equi-join + narrow scan; the near-dup edges that
    * typically feed `groups` are the corpus' stored index artifacts, so
    * this pass adds nothing quadratic.
    */
  def splitByGroup(docs: DataFrame, groups: DataFrame, valPct: Int = 10,
      testPct: Int = 10, salt: String = "split"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"valPct ($valPct) + testPct ($testPct) must fit within 100")
    docs.select(col("doc_id"))
      .join(groups.select(col("doc_id"), col("group_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("split_key"))
      .withColumn("bucket",
        hashBucket(salt, 100L, keyCol = "split_key").cast("long"))
      .withColumn("split", splitOf(col("bucket"), valPct, testPct))
  }

  /** Deterministic data mixing: per-source keep percentages (the
    * "mixture weights" step that rebalances sources before training),
    * applied with the same hash-bucket contract as [[split]] — a doc's
    * keep/drop verdict is a pure function of (salt, doc_id, its
    * source's rate), so remixing with new weights only moves documents
    * whose source rate changed, and reruns are byte-identical. Emits
    * the verdict for every doc (kept = 1/0) so sampling decisions are
    * auditable; filter on kept for the mixed corpus. One narrow scan.
    */
  def mix(docs: DataFrame, ratesPct: Map[String, Int],
      defaultPct: Int = 100, salt: String = "mix"): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "rates must be percentages in [0, 100]")
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (src, pct)) =>
      when(col("source") === src, pct).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"),
        bucket100(salt).cast("long").as("bucket"), rate.cast("long").as("rate_pct"))
      .withColumn("kept", (col("bucket") < col("rate_pct")).cast("bigint"))
  }

  /** Deterministic per-stratum quota sampling: down-sample every stratum
    * (a language, a source, a quality tier) to ~`quota` documents — the
    * corpus-rebalancing step that keeps one over-represented stratum
    * from dominating a training mix. Where [[mix]] applies USER-chosen
    * per-source rates, this derives each stratum's keep rate FROM the
    * data: rate_ppm = min(10⁶, ⌊10⁶·quota / count(stratum)⌋), applied
    * with the same hash-bucket contract (keep iff 60-bit md5 of
    * "salt_doc_id" mod 10⁶ < rate_ppm, parts-per-million so small
    * quotas over huge strata don't round to zero). Under-quota strata
    * are kept whole; kept counts land binomially around `quota` (exact
    * per-stratum cardinality would need a rank window — a per-stratum
    * sort that serializes a hot stratum through one task, the same
    * skew [[pack]]'s sharding exists to avoid — so the contract here
    * trades ±√quota cardinality noise for a doc's verdict being a pure
    * function of (salt, doc_id, its stratum's count): stable under
    * repartitioning, reruns, and engines).
    *
    * Plan shape at 100 TB: one map-side-combined count aggregation
    * (output bounded by |strata|), broadcast back, one narrow verdict
    * scan — no full-data shuffle, no window. Emits every doc's verdict
    * (kept = 1/0) for auditability, like [[mix]]. NULL strata don't
    * survive the equi-join back — coalesce upstream if a null stratum
    * must be sampled rather than dropped.
    */
  def sampleToQuota(docs: DataFrame, stratum: String, quota: Long,
      salt: String = "quota"): DataFrame = {
    require(quota >= 0, s"quota must be non-negative, got $quota")
    val counts = docs.groupBy(col(stratum))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("rate_ppm",
        expr(s"least(1000000L, (1000000L * ${quota}L) div n_stratum)"))
    docs.select(col("doc_id"), col(stratum),
        hashBucket(salt, 1000000L).cast("long").as("bucket"))
      .join(broadcast(counts), Seq(stratum))
      .select(col("doc_id"), col(stratum), col("n_stratum"), col("rate_ppm"),
        col("bucket"), (col("bucket") < col("rate_ppm")).cast("bigint").as("kept"))
  }

  /** Temperature-based stratum rebalancing at α = 1/2 — the multilingual
    * "temperature sampling" recipe (keep-probability ∝ (n_i/N)^(α−1), so
    * big strata down-weight toward equal shares): each stratum keeps at
    * rate √(n_min/n_i) — the smallest stratum whole, a stratum 4× its
    * size at half rate — applied with the same hash-bucket verdict
    * contract as [[mix]]/[[sampleToQuota]] (keep iff 60-bit md5 of
    * "salt_doc_id" mod 10⁶ < rate_ppm). α is FIXED at 1/2: √ is IEEE-
    * correctly-rounded in every engine, where a general pow(x, α) is
    * libm-dependent (final-ulp drift across engines would make the same
    * corpus sample differently on different systems — and poison the
    * oracle hash gate for the same reason). rate_ppm floors the exact
    * double once; every downstream comparison is integer.
    *
    * Plan shape: one bounded stratum-count agg, a 1-row min, broadcast
    * back, one narrow verdict scan — [[sampleToQuota]]'s cost model with
    * a data-derived curve instead of a flat quota.
    */
  def temperatureMix(docs: DataFrame, stratum: String = "lang",
      salt: String = "temp"): DataFrame = {
    val counts = docs.groupBy(col(stratum)).agg(count(lit(1)).as("n_stratum"))
    val nMin = counts.agg(min("n_stratum").as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(stratum), col("n_stratum"),
        floor(sqrt(col("n_min").cast("double") / col("n_stratum")) * 1000000.0)
          .cast("long").as("rate_ppm"))
    docs.select(col("doc_id"), col(stratum),
        hashBucket(salt, 1000000L).cast("long").as("bucket"))
      .join(broadcast(rates), Seq(stratum))
      .select(col("doc_id"), col(stratum), col("n_stratum"), col("rate_ppm"),
        col("bucket"), (col("bucket") < col("rate_ppm")).cast("bigint").as("kept"))
  }

  /** Sequence packing: concatenate documents in doc_id order within each
    * (source, shard) group and cut every `budget` tokens; a document
    * belongs to the sequence where it starts — sequence identity is
    * (source, shard, seq_id), with the document at position seq_offset.
    * Tokens are the BPE-ish [[TextAnalysis.tokenCounts]] `re_tokens`
    * measure.
    *
    * `shard` is a deterministic hash bucket of doc_id (the same portable
    * md5 derivation as [[split]]/[[mix]], salt "pack"), NOT a physical
    * partition number — it is part of the output contract, so reruns and
    * other engines shard identically. Sharding is what makes packing
    * scale: a window partitioned by `source` alone serializes each
    * source through one task (prefix sums don't parallelize within a
    * partition), so a corpus dominated by a few giant sources packs on a
    * few tasks no matter the cluster size. Partitioning by
    * (source, shard) caps any task's work at ~1/`shards` of its source
    * and keeps the plan ONE shuffle + per-partition sort — no iteration,
    * no driver-side loop. The trade: sequences never span shards, so up
    * to `shards` trailing sequences per source are under-filled (~shards
    * × budget/2 wasted tokens per source — noise against any real
    * source's token count; lower `shards` if sources are tiny).
    */
  def pack(docs: DataFrame, budget: Long = 512L, shards: Int = 64): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TextAnalysis.tokenCounts(docs)
      .select(col("doc_id"), col("source"), col("re_tokens").as("n_tokens"))
      .withColumn("shard",
        (expr(Dedup.h60("concat('pack_', cast(doc_id as string))")) % shards)
          .cast("long"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("seq_id"),
        ((col("cum") - col("n_tokens")) % budget).as("seq_offset"))
  }

  /** Deterministic corpus shuffle — the reproducible training-order
    * step (data order changes a training run; a rerun must read the
    * SAME order): each doc's 60-bit md5 shuffle key places it in a
    * shard (key mod `shards`) and its position within the shard is the
    * key-ascending rank (ties — 60-bit collisions — break by doc_id).
    * The loader reads shards in shard order, positions ascending, and
    * gets a hash-shuffled order that reruns, engines, and backfills
    * reproduce exactly — vs `orderBy(rand())`, which no two runs agree
    * on. `shuffle_key` is emitted so run-over-run diffs are explainable
    * row-by-row (the [[splitByGroup]] convention).
    *
    * Scale posture: one narrow scan + ONE window shuffle keyed by
    * shard; each shard sorts ~1/shards of the corpus in its own task —
    * size `shards` to the cluster exactly like [[pack]]. Positions are
    * per-snapshot (appends shift later positions); the ORDER for a
    * fixed corpus is immutable.
    */
  def shuffleOrder(docs: DataFrame, shards: Int = 64,
      salt: String = "shuffle"): DataFrame = {
    require(shards > 0, s"shard count must be positive, got $shards")
    // same SQL-literal salt contract as hashBucket
    require(salt.nonEmpty && salt.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'),
      s"salt must be non-empty [A-Za-z0-9_], got '$salt'")
    val key = expr(Dedup.h60(s"concat('${salt}_', cast(doc_id as string))"))
    val w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    docs.select(col("doc_id"),
        key.as("shuffle_key"), (key % shards).cast("long").as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos", "shuffle_key")
  }

  /** Morton (Z-order) interleave of two already-bucketed non-negative
    * integer coordinates into a single layout key: bit k of x lands at
    * key bit 2k, bit k of y at 2k+1. Pure div/mod arithmetic — no
    * engine-specific bit operators, so a SQL oracle reproduces the key
    * exactly. `bits` per dimension (key width = 2·bits).
    *
    * Why it exists at 100 TB: a table range-partitioned + sorted by
    * this key clusters BOTH dimensions at once, so parquet row-group
    * min/max pruning works for predicates on either column — the
    * standard multi-dimensional layout trick a single-column sort
    * cannot give. [[zorderLayout]] is the audit that proves the
    * locality (tight per-bucket ranges on both dims).
    */
  private[graft] def zorderExpr(x: String, y: String, bits: Int): String =
    (0 until bits).map { k =>
      val p = 1L << k; val wx = 1L << (2 * k); val wy = 1L << (2 * k + 1)
      s"((($x) div $p) % 2) * $wx + ((($y) div $p) % 2) * $wy"
    }.mkString(" + ")

  /** The audit's coordinate expressions, shared verbatim with the
    * DuckDB oracle builder so engine and gate cannot drift. Portable
    * non-negative arithmetic: ((a % m) + m) % m is the same text in
    * Spark SQL and DuckDB (pmod is Spark-only); y clamped to the grid
    * from both ends. The only DuckDB-side substitution is `div` → `//`.
    */
  private[graft] def zorderX(bits: Int): String = {
    val m = 1L << bits
    s"(((user_id % $m) + $m) % $m)"
  }

  private[graft] def zorderY(bits: Int): String =
    s"greatest(cast(0 as bigint), least(cast(floor(value) as bigint), ${(1L << bits) - 1}))"

  /** Z-order layout audit over `events`: coordinates x = user_id mod
    * 2^bits, y = floor(value) clamped to 2^bits − 1, Morton-interleaved
    * and grouped into `buckets` contiguous key ranges; per bucket the
    * row count and min/max of BOTH coordinates. Tight ranges on both
    * dims in every bucket == the key delivers two-dimensional pruning
    * (the property a 1-D sort on either column alone cannot give). One
    * scan + one bounded agg (`buckets` groups); no shuffle beyond it.
    */
  /** Materialize `events` as a Z-ordered parquet table: range-partition
    * on the Morton key, sort within partitions by it, write one file
    * per partition. Every output file then covers an (almost) aligned
    * Morton range, so its parquet column statistics are tight on BOTH
    * user and value dimensions — scans filtering on either column skip
    * whole files/row-groups (PartitioningSpec proves the per-file
    * tightness on the written artifact). This is the write-side twin of
    * [[zorderLayout]]'s audit: the audit claims the key clusters both
    * dims; this produces the table whose footers deliver the pruning.
    */
  def zorderWrite(events: DataFrame, dir: String, bits: Int = 8,
      partitions: Int = 16): Unit = {
    require(bits > 0 && bits <= 16, s"bits must be in [1,16], got $bits")
    require(partitions > 0, s"partitions must be positive, got $partitions")
    val z = zorderExpr(zorderX(bits), zorderY(bits), bits)
    events
      .withColumn("z", expr(z))
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
      // the key is fully derivable from (user_id, value): drop it so the
      // written table is a schema-identical drop-in for the source (the
      // projection preserves the partition sort, so the layout — and the
      // footer stats it buys — is unchanged)
      .drop("z")
      .write.mode("overwrite").parquet(dir)
  }

  def zorderLayout(events: DataFrame, bits: Int = 8,
      buckets: Int = 64): DataFrame = {
    require(bits > 0 && bits <= 16, s"bits must be in [1,16], got $bits")
    require(buckets > 0 && Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two, got $buckets")
    val z = zorderExpr(zorderX(bits), zorderY(bits), bits)
    val x = zorderX(bits)
    val y = zorderY(bits)
    val per = (1L << (2 * bits)) / buckets
    events
      .select(expr(s"($z) div $per").as("z_bucket"),
        expr(x).as("x"), expr(y).as("y"))
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n_events"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Deterministic weighted sample of `k` documents with inclusion
    * preference ∝ `weightCol` — priority sampling (Duffield/Lund/
    * Thorup's bottom-k shape): priority = uniform-hash / weight, keep
    * the k SMALLEST priorities. A heavier doc draws a proportionally
    * smaller priority, so it survives more often; the whole derivation
    * is a pure function of (salt, doc_id, weight), so reruns and other
    * engines pick the identical sample.
    *
    * House determinism: the division is INTEGER (hash div weight) —
    * zero float surface, ties broken by doc_id. Weights are taken as
    * INTEGERS (a fractional weight column floors; 0.4 floors to 0 and
    * is excluded). Rows whose floored weight is NULL or non-positive
    * are excluded — they carry no sampling mass, admitting weight 0
    * would divide by zero, and the caller almost certainly wants
    * "never sample empty docs" anyway. The guard runs on the FLOORED
    * weight, so a (0, 1) fractional can never reach the division.
    *
    * Scale shape: one scan + TakeOrderedAndProject — the per-partition
    * top-k heap shape, no global sort, no per-group state.
    */
  def weightedSample(docs: DataFrame, k: Int,
      weightCol: String = "n_chars", salt: String = "ws"): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    docs
      // try_cast, then guard the FLOORED weight: a 0.4 double passes
      // `raw > 0` but floors to 0 (divide-by-zero); NaN and
      // out-of-long-range weights try_cast to NULL instead of raising
      // ANSI CAST_OVERFLOW mid-scan — all excluded by one guard
      // (review findings)
      .select(col("doc_id"),
        expr(s"try_cast(`$weightCol` as long)").as("weight"),
        hash60(salt).as("__h"))
      .filter(col("weight").isNotNull && col("weight") > 0)
      // INTEGER division — `/` on Columns is double division, whose
      // rounding above 2^53 would diverge from an oracle's floor
      .select(col("doc_id"), col("weight"),
        expr("__h div weight").as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)
  }
}
