package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}
import graft.operators.{Dedup, Similarity, Sketches, TextIndex}

/** Structured Streaming tier over the `events` dataflow (SURVEY.md §2.5
  * streaming row, §7 step 7).
  *
  * Every transform here is written against the unified Dataset model: the
  * SAME function plans over a batch DataFrame and a `readStream` frame.
  * That is the differential-test contract (SURVEY §5.2 t3): the streaming
  * rendering fed the full event log must equal the batch rendering — e.g.
  * [[tumblingCounts]] over a stream ≡ the q25 batch buckets — because a
  * stream is just a table being incrementally materialized.
  *
  * Scale posture: windowed aggregations shuffle once on (window, key);
  * `withWatermark` bounds state (late rows beyond the delay are dropped
  * and window state older than the watermark is evicted, so state size
  * tracks the watermark horizon, not the stream length);
  * [[runningUserState]] keys state by user so it distributes across
  * executors with the shuffle and lives in the state store (RocksDB at
  * scale), never on the driver.
  */
object Streams {

  /** Tumbling 1-hour counts/sums per event_type — the streaming form of
    * q25 (`window(ts, 1h)` buckets align with `date_trunc('hour')`).
    * Pass a watermark to bound state / drop late data on streams.
    */
  def tumblingCounts(events: DataFrame, watermark: Option[String] = None): DataFrame =
    withWm(events, watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows: each event lands in `size`/`slide` overlapping
    * buckets (Spark plans this as a generate + single shuffle, not one
    * aggregation per offset).
    */
  def slidingCounts(
      events: DataFrame, size: String = "1 hour", slide: String = "30 minutes",
      watermark: Option[String] = None): DataFrame =
    withWm(events, watermark)
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user: a session extends while consecutive events
    * arrive within `gap`; on streams, sessions finalize once the
    * watermark passes their close (append mode).
    */
  def sessionCounts(
      events: DataFrame, gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame =
    withWm(events, watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("user_id"), col("n"), col("sum_value"))

  private def withWm(events: DataFrame, watermark: Option[String]): DataFrame =
    watermark.fold(events)(w => events.withWatermark("ts", w))

  /** Streaming ingest dedup, unbounded state: one event per `event_id`
    * survives, replays are dropped — exactly-once semantics over an
    * at-least-once transport. On a STREAM the survivor is the first
    * seen; the batch rendering keeps an arbitrary row per id, so the
    * batch ≡ stream differential holds when replays are byte-identical —
    * which is the redelivery case this exists for (a replay that
    * MUTATED payload is an upstream bug, not a duplicate). State grows
    * with distinct keys; use [[dedupWithinWatermark]] on long-running
    * streams.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Streaming ingest dedup with BOUNDED state: duplicates are dropped
    * only while their key's first arrival is younger than the watermark
    * delay, after which the key's state is evicted — state size tracks
    * the watermark horizon, not the stream length. The contract a 100 TB
    * ingest needs: replays land within the transport's redelivery window,
    * so eviction beyond it is safe and keeps the state store flat.
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: each event picks up its user's customer
    * segment. The static side is a plain DataFrame — Spark re-plans it
    * per micro-batch and broadcasts it when small, the standard shape
    * for dimension enrichment of a 100 TB/day event stream (no state
    * store involved; left join keeps events with no dimension row).
    */
  def withCustomerSegment(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      customer.select(col("c_custkey").as("user_id"), col("c_mktsegment")),
      Seq("user_id"), "left")

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks at most `windowSeconds` earlier. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * each side's state store holds only the watermark horizon — the
    * requirements Structured Streaming imposes for an unbounded
    * stream-stream inner join to run with bounded state. The same
    * transform over batch frames is the differential oracle.
    */
  def clickToPurchase(events: DataFrame, watermarkDelay: String = "1 hour",
      windowSeconds: Long = 3600L): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermarkDelay)
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Streaming ingest near-dup — the `foreachBatch` composition that
    * closes the loop between the streaming tier and the incremental
    * dedup tier: each micro-batch of documents is deduped against the
    * ACCUMULATED corpus index (the persisted shingle/band frames of
    * every prior batch — the `Dedup.writeIndex` artifact shape), then
    * appended to it. This is the actual shape of a production ingest:
    * per batch, only the new documents are shingled; the corpus side is
    * parquet reads of narrow index frames.
    *
    * Artifacts under `stateDir` (a distributed FS path in production):
    *   - `shingles/batch=N`, `bands/batch=N` — the accumulated index
    *   - `edges/batch=N` — verified near-dup edges touching batch N
    *     (including batch-internal pairs), ≡
    *     `Dedup.incrementalNearDupEdges(prior batches, batch N)` —
    *     differentially tested, micro-batch by micro-batch
    *   - `_committed/N` — written LAST per batch
    *
    * Exactly-once across restarts: a replayed batch id that is already
    * committed is skipped; a batch that crashed mid-write left no marker
    * and its batch-scoped dirs are simply overwritten on replay. Readers
    * ([[ingestIndex]]/[[ingestEdges]]) see only committed batches, so a
    * partial write is never observed.
    */
  def ingestNearDup(
      docs: DataFrame, stateDir: String, checkpointDir: String,
      n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucketSize: Int = Dedup.NearDupMaxBucket): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestNearDupBatch(batch.toDF(), stateDir, batchId,
          n, numHashes, rowsPerBand, threshold, maxBucketSize)
      }
      .start()

  /** One ingest step (see [[ingestNearDup]]); public for batch-mode
    * replays and tests — the streaming query calls exactly this.
    */
  def ingestNearDupBatch(
      batch: DataFrame, stateDir: String, batchId: Long,
      n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucketSize: Int = Dedup.NearDupMaxBucket): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed, durable
    // empty prior index for the first batch: the incremental pass then
    // returns exactly the batch-internal pairs (every pair "touches the
    // delta"), so one code path serves bootstrap and steady state
    val idx = ingestIndex(spark, stateDir, n, numHashes, rowsPerBand)
      .getOrElse(Dedup.buildIndex(batch.limit(0), n, numHashes, rowsPerBand))
    Dedup.incrementalNearDupEdgesIndexed(idx, batch, threshold, maxBucketSize)
      .write.mode("overwrite").parquet(s"$stateDir/edges/batch=$batchId")
    val sh = Dedup.shingles(batch, n)
    sh.write.mode("overwrite").parquet(s"$stateDir/shingles/batch=$batchId")
    Dedup.lshBands(sh, numHashes, rowsPerBand)
      .write.mode("overwrite").parquet(s"$stateDir/bands/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** Write the `_committed/<batchId>` marker LAST — the ONE definition
    * of the commit protocol all three ingest tiers share. Goes through
    * the Hadoop FileSystem of the state dir, so the same code runs
    * against HDFS/object stores, not just local disk (object-store
    * caveat: marker visibility needs read-after-write consistency,
    * which S3/GCS/ABFS all provide today).
    */
  private def markCommitted(spark: SparkSession, stateDir: String,
      batchId: Long): Unit = {
    val fs = fileSystem(spark, stateDir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$stateDir/_committed"))
    fs.create(
      new org.apache.hadoop.fs.Path(s"$stateDir/_committed/$batchId"), true).close()
  }

  /** The accumulated ingest index over all COMMITTED batches (None
    * before the first commit) — directly searchable by the incremental
    * Dedup operators. After a [[compactNearDup]] the base's canonical
    * frames stand in for the batches they folded: the read is base +
    * uncompacted deltas, so probe cost stays flat in batch count.
    */
  def ingestIndex(spark: SparkSession, stateDir: String,
      n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4): Option[Dedup.DedupIndex] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      if (c >= 0) {
        val m = spark.read.parquet(s"${baseDir(stateDir, c)}/index/meta").head
        require(m.getAs[Int]("n") == n && m.getAs[Int]("num_hashes") == numHashes &&
            m.getAs[Int]("rows_per_band") == rowsPerBand,
          s"ingestIndex params ($n,$numHashes,$rowsPerBand) differ from the " +
            s"compacted base's manifest ($m) — refusing to mix band layouts")
      }
      val basePfx = if (c >= 0) Seq(s"${baseDir(stateDir, c)}/index") else Nil
      Some(Dedup.DedupIndex(
        spark.read.parquet(basePfx.map(_ + "/shingles") ++
          ids.map(i => s"$stateDir/shingles/batch=$i"): _*),
        spark.read.parquet(basePfx.map(_ + "/bands") ++
          ids.map(i => s"$stateDir/bands/batch=$i"): _*),
        n, numHashes, rowsPerBand))
    }
  }

  /** All committed near-dup edges of an [[ingestNearDup]] run so far
    * (compacted base edges + uncompacted delta batches).
    */
  def ingestEdges(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else Some(spark.read.parquet(
      (if (c >= 0) Seq(s"${baseDir(stateDir, c)}/edges") else Nil) ++
        ids.map(i => s"$stateDir/edges/batch=$i"): _*))
  }

  /** Fold every committed near-dup ingest batch (and any prior base)
    * into a fresh canonical base: `base/compact=C/index` in the
    * [[Dedup.writeIndex]] layout (loadable by [[Dedup.loadIndex]] as a
    * standalone artifact) plus `base/compact=C/edges`, where C is the
    * newest committed batch folded in. The `_compacted/C` marker is
    * written LAST — the same commit protocol as the ingest itself, so a
    * crash mid-compact leaves readers on the previous view. Covered
    * batch dirs and the previous base are then deleted (set `gc = false`
    * when long-lived readers may still hold lazy plans over them — a
    * production job GCs on a delay horizon instead).
    *
    * Safe against a live ingest: only batches committed at the time of
    * the listing are folded; a batch that commits mid-compact stays a
    * delta until the next cadence run. Returns the new watermark C, or
    * None when there is nothing new to fold.
    */
  def compactNearDup(spark: SparkSession, stateDir: String,
      n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 4,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      val idx = ingestIndex(spark, stateDir, n, numHashes, rowsPerBand).get
      Dedup.compactIndex(idx, s"${baseDir(stateDir, c)}/index")
      ingestEdges(spark, stateDir).get.write.mode("overwrite")
        .parquet(s"${baseDir(stateDir, c)}/edges")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids,
        Seq("shingles", "bands", "edges"))
      Some(c)
    }
  }

  /** Streaming embedding ingest — the [[ingestNearDup]] shape on the
    * similarity tier: the FIRST micro-batch is the index build job
    * (k-means-trained on the bootstrap vectors, centroids + stride
    * persisted once), and every later batch runs the q87 contract —
    * assign ONLY the batch's vectors against the stored broadcast
    * centroids ([[Similarity.ivfAssign]]) and persist the batch's
    * assignment rows. Centroids never move per ingest (production
    * retrains on a cadence as a separate build job), so the accumulated
    * assignment is differentially ≡ a batch-mode [[Similarity.ivfAppend]]
    * chain over the same cuts — tested micro-batch by micro-batch,
    * across restarts.
    *
    * Artifacts under `stateDir`: `cents/` + `meta/` (bootstrap, the
    * [[Similarity.writeIvfIndex]] layout), `assigned/batch=N`,
    * `_committed/N` written LAST — the same exactly-once replay contract
    * as [[ingestNearDupBatch]].
    */
  def ingestIvf(emb: DataFrame, stateDir: String,
      checkpointDir: String, iters: Int = 2): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestIvfBatch(batch.toDF(), stateDir, batchId, iters)
      }
      .start()

  /** One embedding-ingest step (see [[ingestIvf]]); public for batch-mode
    * replays and tests — the streaming query calls exactly this.
    */
  def ingestIvfBatch(batch: DataFrame, stateDir: String, batchId: Long,
      iters: Int = 2): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    ingestIvfIndex(spark, stateDir) match {
      case None => // bootstrap: THIS batch is the index build job
        val idx = Similarity.ivfTrainedIndex(batch, iters = iters)
        idx.cents.write.mode("overwrite").parquet(s"$stateDir/cents")
        spark.range(1).select(lit(idx.stride).as("stride"))
          .write.mode("overwrite").parquet(s"$stateDir/meta")
        idx.assigned.write.mode("overwrite")
          .parquet(s"$stateDir/assigned/batch=$batchId")
      case Some(idx) => // steady state: one batch-sized scan, q87's law
        Similarity.ivfAssign(idx, batch).write.mode("overwrite")
          .parquet(s"$stateDir/assigned/batch=$batchId")
    }
    markCommitted(spark, stateDir, batchId)
  }

  /** The accumulated streamed index over all COMMITTED batches (None
    * before bootstrap commits) — directly [[Similarity.ivfSearch]]-able.
    * After a [[compactIvf]] the base's canonical artifact stands in for
    * the assignment deltas it folded.
    */
  def ingestIvfIndex(spark: SparkSession, stateDir: String): Option[Similarity.IvfIndex] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      // cents/stride never change after bootstrap; read them from the
      // base when one exists so the base alone is the full artifact
      val pfx = if (c >= 0) baseDir(stateDir, c) else stateDir
      Some(Similarity.ivfIndexFrom(
        spark.read.parquet(s"$pfx/meta").head.getAs[Int]("stride"),
        spark.read.parquet(s"$pfx/cents"),
        spark.read.parquet(
          (if (c >= 0) Seq(s"${baseDir(stateDir, c)}/assigned") else Nil) ++
            ids.map(i => s"$stateDir/assigned/batch=$i"): _*)))
    }
  }

  /** Fold every committed IVF assignment delta (and any prior base) into
    * a fresh canonical base: `base/compact=C` in the
    * [[Similarity.writeIvfIndex]] layout — cents + summed assignment +
    * stride manifest, loadable by [[Similarity.loadIvfIndex]] as a
    * standalone artifact. Same commit/GC protocol as [[compactNearDup]]
    * (`_compacted/C` marker written last; covered `assigned/batch=N`
    * dirs and the previous base deleted when `gc`). The bootstrap
    * `cents`/`meta` at the state root are kept — they are the build
    * job's artifact and stay byte-identical to the base's copy.
    */
  def compactIvf(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      Similarity.writeIvfIndex(
        ingestIvfIndex(spark, stateDir).get, baseDir(stateDir, c))
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("assigned"))
      Some(c)
    }
  }

  /** Streaming inverted-index ingest — the [[ingestNearDup]] shape on
    * the retrieval tier: each micro-batch of documents tokenizes ONLY
    * its own docs into postings/doclens frames and appends them to the
    * accumulated stored index (the [[graft.operators.TextIndex]] layout,
    * batch-partitioned). Because ingested doc_ids are append-only,
    * batch posting frames are (word, doc_id)-disjoint and the
    * accumulated index is exactly the from-scratch build — BM25 over
    * the streamed index ≡ [[graft.operators.TextIndex.bm25Rank]] over
    * everything ingested so far, differentially tested across restarts.
    *
    * Artifacts under `stateDir`: `postings/batch=N`, `doclens/batch=N`,
    * `stats/batch=N` (that batch's doc/token counts — the reader SUMS
    * them, so stats stay mergeable), `_committed/N` written LAST — the
    * same exactly-once replay contract as [[ingestNearDupBatch]].
    */
  def ingestTextIndex(docs: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestTextIndexBatch(batch.toDF(), stateDir, batchId)
      }
      .start()

  /** One text-index ingest step (see [[ingestTextIndex]]); public for
    * batch-mode replays and tests — the streaming query calls exactly
    * this.
    */
  def ingestTextIndexBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    val idx = TextIndex.build(batch)
    idx.postings.repartition(col("word")).write.mode("overwrite")
      .parquet(s"$stateDir/postings/batch=$batchId")
    idx.doclens.write.mode("overwrite")
      .parquet(s"$stateDir/doclens/batch=$batchId")
    spark.range(1)
      .select(lit(idx.nDocs).as("n_docs"),
        lit(idx.totalTokens).as("total_tokens"))
      .write.mode("overwrite").parquet(s"$stateDir/stats/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The accumulated streamed inverted index over all COMMITTED batches
    * (None before the first commit) — directly
    * [[graft.operators.TextIndex.bm25]]/`lookup`-servable.
    */
  def ingestTextIndexRead(spark: SparkSession,
      stateDir: String): Option[TextIndex.Index] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      // the base's stats manifest is the already-summed fold of the
      // batches it covers — summing it WITH the delta manifests keeps
      // stats mergeable across compactions
      val basePfx = if (c >= 0) Seq(baseDir(stateDir, c)) else Nil
      val s = spark.read
        .parquet(basePfx.map(_ + "/stats") ++
          ids.map(i => s"$stateDir/stats/batch=$i"): _*)
        .agg(sum("n_docs"), sum("total_tokens")).head
      Some(TextIndex.Index(
        spark.read.parquet(basePfx.map(_ + "/postings") ++
          ids.map(i => s"$stateDir/postings/batch=$i"): _*),
        spark.read.parquet(basePfx.map(_ + "/doclens") ++
          ids.map(i => s"$stateDir/doclens/batch=$i"): _*),
        s.getLong(0), s.getLong(1)))
    }
  }

  /** Fold every committed text-index ingest batch (and any prior base)
    * into a fresh canonical base: `base/compact=C` in the
    * [[TextIndex.compact]] layout — word-repartitioned postings,
    * doclens, summed stats manifest, loadable by [[TextIndex.load]] as
    * a standalone artifact. Same commit/GC protocol as
    * [[compactNearDup]]. This is the cadence job that keeps BM25 probe
    * cost flat: without it a term probe touches one posting file group
    * PER BATCH forever.
    */
  def compactTextIndex(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      TextIndex.compact(
        ingestTextIndexRead(spark, stateDir).get, baseDir(stateDir, c))
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids,
        Seq("postings", "doclens", "stats"))
      Some(c)
    }
  }

  /** Streaming ingest Bloom — the FOURTH `foreachBatch` composition:
    * the membership front door ([[Sketches.bloomMembership]]) built
    * incrementally. Per batch the arriving docs' occupied-bucket set
    * (distinct, ≤ m rows) lands under `bits/batch=N` with the (k, m)
    * meta written at bootstrap; the same marker-last commit protocol
    * as the other three tiers. Bloom state is a pure SET UNION — bits
    * only ever turn on — so the fold over committed batches is
    * associative, replay-safe, and order-independent: the streamed
    * filter is bit-identical to a batch [[Sketches.bloomBuild]] over
    * the union of the batches (the StreamingSpec differential).
    */
  def ingestBloom(docs: DataFrame, stateDir: String, checkpointDir: String,
      k: Int = 4, m: Int = 131072): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBloomBatch(batch.toDF(), stateDir, batchId, k, m)
      }
      .start()

  /** One Bloom ingest step (see [[ingestBloom]]); public for batch-mode
    * replays and tests — the streaming query calls exactly this.
    */
  def ingestBloomBatch(batch: DataFrame, stateDir: String, batchId: Long,
      k: Int = 4, m: Int = 131072): Unit = {
    val spark = batch.sparkSession
    val prior = committedBatches(spark, stateDir)
    if (prior.contains(batchId)) return // replayed
    // (k, m) drift gate: bucket sets hashed under different moduli must
    // never be unioned — a mixed filter can yield FALSE NEGATIVES, the
    // one failure a Bloom filter's contract forbids. On any non-first
    // batch the pinned meta is authoritative; fail loudly on mismatch
    // (the profile tier gates the same drift class via pp_version).
    if (prior.nonEmpty || compactedUpTo(spark, stateDir) >= 0) {
      val meta = spark.read.parquet(s"$stateDir/meta").head
      val (k0, m0) = (meta.getAs[Long]("k").toInt, meta.getAs[Long]("m").toInt)
      require(k0 == k && m0 == m,
        s"Bloom ingest (k=$k, m=$m) conflicts with the pinned state " +
          s"(k=$k0, m=$m0) at $stateDir — mixed-modulus bucket unions " +
          "break the no-false-negatives contract")
    }
    Sketches.bloomBuild(batch, k, m).write.mode("overwrite")
      .parquet(s"$stateDir/bits/batch=$batchId")
    // (k, m) pin: every batch writes the same one-row frame (the
    // foreachBatch loop is serial, and identical content makes the
    // overwrite idempotent under replay)
    spark.range(1)
      .select(lit(k.toLong).as("k"), lit(m.toLong).as("m"))
      .write.mode("overwrite").parquet(s"$stateDir/meta")
    markCommitted(spark, stateDir, batchId)
  }

  /** The accumulated streamed filter over all COMMITTED batches (and
    * any compacted base): the distinct union of their occupied-bucket
    * sets, with the pinned (k, m). None before the first commit.
    */
  def ingestBloomRead(spark: SparkSession,
      stateDir: String): Option[(DataFrame, Int, Int)] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      val meta = spark.read.parquet(s"$stateDir/meta").head
      val basePfx = if (c >= 0) Seq(baseDir(stateDir, c) + "/bits") else Nil
      Some((
        spark.read.parquet(
          basePfx ++ ids.map(i => s"$stateDir/bits/batch=$i"): _*).distinct(),
        meta.getAs[Long]("k").toInt, meta.getAs[Long]("m").toInt))
    }
  }

  /** Probe the streamed filter — verdict-only rows, the ingest
    * front-door shape ([[Sketches.bloomProbe]] over the accumulated
    * set). None before the first commit.
    */
  def ingestBloomProbe(spark: SparkSession, stateDir: String,
      probes: DataFrame): Option[DataFrame] =
    ingestBloomRead(spark, stateDir).map { case (occ, k, m) =>
      Sketches.bloomProbe(occ, probes, k, m)
    }

  /** Fold every committed Bloom batch (and any prior base) into a
    * fresh canonical base: `base/compact=C` in the [[Sketches.writeBloom]]
    * layout (`bits/` + `meta/`), loadable by
    * [[Sketches.bloomMembershipStored]] as a standalone artifact. Same
    * commit/GC protocol as the other tiers. Keeps probe cost flat: an
    * uncompacted probe unions one bucket-set file group per batch
    * forever.
    */
  def compactBloom(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      val (occ, k, m) = ingestBloomRead(spark, stateDir).get
      occ.write.mode("overwrite").parquet(baseDir(stateDir, c) + "/bits")
      spark.range(1)
        .select(lit(k.toLong).as("k"), lit(m.toLong).as("m"))
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/meta")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("bits"))
      Some(c)
    }
  }

  /** Streaming data-quality profile — the sixth `foreachBatch` ingest
    * composition: each micro-batch writes its MERGEABLE per-column
    * profile partial ([[graft.operators.Profile.profilePartial]]:
    * counts + portable min/max + a KMV distinct sketch) under
    * `profile/batch=N`, commit marker last (the shared exactly-once
    * protocol). [[ingestProfileRead]] folds every committed partial —
    * and because the KMV merge is lossless at the sketch level, the
    * streamed profile is IDENTICAL to a single-pass profile of all
    * data ingested so far, whatever the batching (the differential
    * law StreamingSpec pins). No compaction cadence needed: a partial
    * is O(columns) rows, so a year of micro-batches reads in
    * milliseconds.
    */
  def ingestProfile(rows: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestProfileBatch(batch.toDF(), stateDir, batchId)
      }
      .start()

  /** One profile ingest step (see [[ingestProfile]]); public for
    * batch-mode replays and tests.
    */
  def ingestProfileBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    graft.operators.Profile.profilePartial(batch)
      .write.mode("overwrite").parquet(s"$stateDir/profile/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The accumulated profile over all COMMITTED batches (None before
    * the first commit): (column_name, n_rows, n_nulls, n_distinct_est,
    * min_str, max_str).
    */
  def ingestProfileRead(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val ids = committedBatches(spark, stateDir).sorted
    if (ids.isEmpty) None
    else {
      // mergeSchema + an explicit version gate: a state dir written by
      // an older partial format must FAIL here, not silently mis-merge
      // (v1 rendered integral extrema as strings — coalescing them
      // under the v2 schema would discard them)
      val partials = spark.read.option("mergeSchema", "true")
        .parquet(ids.map(i => s"$stateDir/profile/batch=$i"): _*)
      val ok = partials.columns.contains("pp_version") && {
        // coalesce BEFORE min: rows from a version-less partial read
        // under the merged schema carry NULL, which a bare min() would
        // skip right past
        val r = partials.agg(org.apache.spark.sql.functions.min(
          coalesce(col("pp_version"), lit(-1L)))).head
        !r.isNullAt(0) &&
          r.getLong(0) == graft.operators.Profile.ProfilePartialVersion
      }
      if (!ok) throw new IllegalStateException(
        s"profile state under $stateDir carries partials from an older " +
          "format version — re-ingest (mixed-version folds would " +
          "silently mis-merge integral extrema)")
      Some(graft.operators.Profile.mergeProfile(partials))
    }
  }

  /** Streaming value histogram — the SEVENTH `foreachBatch` ingest
    * composition: each micro-batch writes its (grp, cents, c)
    * histogram partial ([[graft.operators.Profile.valueHist]] — a pure
    * mergeable: partials from disjoint batches fold by summing `c`,
    * so the fold is associative, replay-safe, and order-independent).
    * The folded histogram feeds the robust median/MAD outlier audit
    * ([[Profile.robustOutliersFromHist]]) — streamed ≡ the one-shot
    * batch [[Profile.robustOutliers]] over the union of the batches,
    * at hash level (the StreamingSpec differential). Same marker-last
    * commit protocol and [[compactValueHist]] cadence job as the
    * other tiers; state is bounded by groups × value grid, never rows.
    */
  def ingestValueHist(rows: DataFrame, stateDir: String, checkpointDir: String,
      groupCol: String, valueCol: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestValueHistBatch(batch.toDF(), stateDir, batchId, groupCol, valueCol)
      }
      .start()

  /** One histogram ingest step (see [[ingestValueHist]]); public for
    * batch-mode replays and tests.
    */
  def ingestValueHistBatch(batch: DataFrame, stateDir: String, batchId: Long,
      groupCol: String, valueCol: String): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    graft.operators.Profile.valueHist(batch, groupCol, valueCol)
      .write.mode("overwrite").parquet(s"$stateDir/hist/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The folded histogram over all COMMITTED batches (and any compacted
    * base): one row per (grp, cents) with the summed count. None before
    * the first commit.
    */
  def ingestValueHistRead(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      val basePfx = if (c >= 0) Seq(baseDir(stateDir, c) + "/hist") else Nil
      Some(spark.read
        .parquet(basePfx ++ ids.map(i => s"$stateDir/hist/batch=$i"): _*)
        .groupBy("grp", "cents").agg(sum("c").as("c")))
    }
  }

  /** The robust outlier audit over the streamed state — the ingest-side
    * face of q138. None before the first commit.
    */
  def ingestRobustOutliers(spark: SparkSession, stateDir: String,
      kNum: Long = 3L, kDen: Long = 1L): Option[DataFrame] =
    ingestValueHistRead(spark, stateDir)
      .map(graft.operators.Profile.robustOutliersFromHist(_, kNum, kDen))

  /** Fold every committed histogram batch (and any prior base) into a
    * fresh canonical base — same commit/GC protocol as [[compactBloom]];
    * keeps read cost flat as batch count grows.
    */
  def compactValueHist(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      ingestValueHistRead(spark, stateDir).get
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/hist")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("hist"))
      Some(c)
    }
  }

  /** Streaming per-label embedding-centroid state — the TENTH
    * `foreachBatch` ingest composition: each micro-batch of embedding
    * rows writes its per-label quantized component-sum partial
    * ([[graft.operators.Similarity.centroidPartial]] — a pure
    * mergeable: integer sums fold with NO precision loss, so the
    * streamed centroid is bit-identical to a one-shot scan whatever
    * the batching). The read face finishes the folded sums through the
    * SAME divide-back the batch queries use (q170/q206 arithmetic), so
    * a production drift monitor can compare live-ingested centroids
    * against a stored snapshot without ever rescanning the corpus.
    * Marker-last commit + [[compactCentroids]] cadence, the shared
    * protocol; state is labels × dim longs, never rows.
    */
  def ingestCentroids(emb: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestCentroidsBatch(batch.toDF(), stateDir, batchId)
      }
      .start()

  /** One centroid ingest step (see [[ingestCentroids]]); public for
    * batch-mode replays and tests.
    */
  def ingestCentroidsBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    graft.operators.Similarity.centroidPartial(batch)
      .write.mode("overwrite").parquet(s"$stateDir/cent/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The finished per-label centroids over all COMMITTED batches (and
    * any compacted base): (label, cnt, ce). None before the first
    * commit.
    */
  def ingestCentroidsRead(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      val basePfx = if (c >= 0) Seq(baseDir(stateDir, c) + "/cent") else Nil
      Some(graft.operators.Similarity.finishCentroids(
        graft.operators.Similarity.mergeCentroidPartials(spark.read
          .parquet(basePfx ++ ids.map(i => s"$stateDir/cent/batch=$i"): _*))))
    }
  }

  /** Fold the committed centroid partials into one base (the shared
    * compact/GC protocol) — merged SUMS are stored, not finished
    * centroids, so later deltas keep folding losslessly.
    */
  def compactCentroids(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      val basePfx = if (c0 >= 0) Seq(baseDir(stateDir, c0) + "/cent") else Nil
      graft.operators.Similarity.mergeCentroidPartials(spark.read
          .parquet(basePfx ++ ids.map(i => s"$stateDir/cent/batch=$i"): _*))
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/cent")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("cent"))
      Some(c)
    }
  }

  /** Streaming training-token budget — the ELEVENTH `foreachBatch`
    * ingest composition: each micro-batch of documents writes its
    * per-(source, split) doc/token partial
    * ([[graft.operators.Prep.budgetPartial]] — split assignment is the
    * q56 hash bucket and the count is the q39 whitespace counter, both
    * PER-DOC deterministic, so the partial is a pure integer mergeable
    * and the folded budget is bit-identical to a one-shot rollup of
    * every ingested doc whatever the batching — the StreamingSpec
    * differential). The LIVE face of q213's stored-manifest budget: a
    * mixture monitor watches per-(source, split) token mass fill as
    * batches land instead of waiting for the pipeline rebuild. (The
    * curation/semantic include flags are corpus-GLOBAL — a doc's
    * near-dup status can flip as later docs arrive — so the streamed
    * budget is the pre-chain mass; the stored manifest stays the
    * post-chain authority.) Marker-last commit + [[compactBudget]]
    * cadence; state is sources × splits rows per batch.
    */
  def ingestBudget(docs: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBudgetBatch(batch.toDF(), stateDir, batchId)
      }
      .start()

  /** One budget ingest step (see [[ingestBudget]]); public for
    * batch-mode replays and tests.
    */
  def ingestBudgetBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    graft.operators.Prep.budgetPartial(batch)
      .write.mode("overwrite").parquet(s"$stateDir/budget/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The folded (source, split, n_docs, ws_tokens) budget over all
    * COMMITTED batches (and any compacted base). None before the first
    * commit.
    */
  def ingestBudgetRead(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      val basePfx = if (c >= 0) Seq(baseDir(stateDir, c) + "/budget") else Nil
      Some(graft.operators.Prep.mergeBudgetPartials(spark.read
        .parquet(basePfx ++ ids.map(i => s"$stateDir/budget/batch=$i"): _*)))
    }
  }

  /** Fold the committed budget partials into one base (the shared
    * compact/GC protocol) — merged integer sums, so later deltas keep
    * folding losslessly.
    */
  def compactBudget(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      ingestBudgetRead(spark, stateDir).get
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/budget")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("budget"))
      Some(c)
    }
  }

  /** Streaming Markov transition matrix — the EIGHTH `foreachBatch`
    * ingest composition, and the first ORDER-SENSITIVE one: transition
    * counts are NOT a pure mergeable (the pair spanning two batches
    * belongs to neither batch alone), so each micro-batch carries a
    * per-user FRONTIER — the last (ts, event_id, type) seen per user —
    * and counts its within-batch pairs PLUS the frontier→first-event
    * boundary pair, writing a summable (from_type, to_type, n) partial.
    * Folded counts + the shared normalization tail
    * ([[graft.operators.Sessions.normalizeTransitions]]) ≡ the one-shot
    * batch [[graft.operators.Sessions.transitionMatrix]] over the
    * concatenated stream, at hash level (the StreamingSpec
    * differential).
    *
    * Contract: per-user event-time monotone ingest (append order — a
    * log). A batch event at-or-before its user's stored frontier would
    * silently mis-pair, so the batch step FAILS LOUDLY on the first
    * violation instead (the Bloom-meta / profile-version posture:
    * detectable drift never folds quietly). Same marker-last commit,
    * replay-skip, and [[compactTransitions]] cadence as the other
    * tiers; state is the (from, to) count grid plus one frontier row
    * per user.
    */
  def ingestTransitions(events: DataFrame, stateDir: String,
      checkpointDir: String, gapSeconds: Long = 1800L): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestTransitionsBatch(batch.toDF(), stateDir, batchId, gapSeconds)
      }
      .start()

  /** One transition ingest step (see [[ingestTransitions]]); public for
    * batch-mode replays and tests.
    */
  def ingestTransitionsBatch(batch: DataFrame, stateDir: String,
      batchId: Long, gapSeconds: Long = 1800L): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    val ev = batch.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    val all = latestTransitionFrontier(spark, stateDir) match {
      case None => ev
      case Some(f) =>
        val firsts = ev.groupBy("user_id")
          .agg(min(struct(unix_micros(col("ts")).as("ts_us"),
            col("event_id").as("event_id"))).as("first"))
        val viol = firsts
          .join(f.select(col("user_id"),
            struct(col("ts_us"), col("event_id")).as("last")), "user_id")
          .filter(!(col("first") > col("last")))
        val bad = viol.limit(1).collect()
        if (bad.nonEmpty) throw new IllegalStateException(
          s"ingestTransitions: batch $batchId carries an event at-or-" +
            s"before the stored frontier for user ${bad.head.get(0)} — " +
            "out-of-order ingest would silently mis-pair transitions; " +
            "this tier requires per-user event-time monotone batches")
        ev.unionByName(f.select(col("user_id"),
          expr("timestamp_micros(ts_us)").as("ts"), col("event_id"),
          col("event_type")))
    }
    graft.operators.Sessions.transitionCounts(all, gapSeconds)
      .write.mode("overwrite").parquet(s"$stateDir/trans/batch=$batchId")
    all.groupBy("user_id")
      .agg(max(struct(unix_micros(col("ts")).as("ts_us"),
        col("event_id").as("event_id"),
        col("event_type").as("event_type"))).as("m"))
      .select(col("user_id"), col("m.ts_us").as("ts_us"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"))
      .write.mode("overwrite").parquet(s"$stateDir/frontier/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The newest committed frontier snapshot (one row per user), from
    * the highest delta batch or, failing that, the compacted base.
    */
  private def latestTransitionFrontier(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (ids.nonEmpty)
      Some(spark.read.parquet(s"$stateDir/frontier/batch=${ids.max}"))
    else if (c >= 0)
      Some(spark.read.parquet(baseDir(stateDir, c) + "/frontier"))
    else None
  }

  /** The row-normalized transition matrix over all committed batches
    * (and any compacted base) — the ingest-side face of q151. None
    * before the first commit.
    */
  def ingestTransitionsRead(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      val basePfx = if (c >= 0) Seq(baseDir(stateDir, c) + "/trans") else Nil
      Some(graft.operators.Sessions.normalizeTransitions(spark.read
        .parquet(basePfx ++ ids.map(i => s"$stateDir/trans/batch=$i"): _*)
        .groupBy("from_type", "to_type").agg(sum("n").as("n"))))
    }
  }

  /** Fold every committed transition partial (and any prior base) into
    * a fresh canonical base, carrying the newest frontier forward —
    * same commit/GC protocol as [[compactValueHist]]; keeps read cost
    * flat as batch count grows.
    */
  def compactTransitions(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      val basePfx = if (c0 >= 0) Seq(baseDir(stateDir, c0) + "/trans") else Nil
      spark.read
        .parquet(basePfx ++ ids.map(i => s"$stateDir/trans/batch=$i"): _*)
        .groupBy("from_type", "to_type").agg(sum("n").as("n"))
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/trans")
      latestTransitionFrontier(spark, stateDir).get
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/frontier")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("trans", "frontier"))
      Some(c)
    }
  }

  /** Streaming survival analysis — the NINTH `foreachBatch` ingest
    * composition: the Nelson–Aalen repurchase hazard (batch face q165,
    * [[graft.operators.Sessions.repurchaseHazard]]) over an event
    * stream. Unlike the order-sensitive transitions tier, this state IS
    * a pure mergeable: the study needs only each user's two EARLIEST
    * purchases plus the corpus' last purchase second, and the global
    * two-earliest always lie inside the union of per-batch two-earliest
    * (each batch persists ≤ 2 slim (user_id, event_id, s) rows per user
    * and a 1-row batch horizon), so the fold is associative,
    * replay-safe, and order-independent — streamed ≡ batch is a hash
    * law whatever the batching (the StreamingSpec differential). Same
    * marker-last commit, replay-skip, and [[compactHazard]] cadence as
    * the other tiers; compaction re-ranks accumulated candidates back
    * to ≤ 2 rows per user, so state stays user-bounded however long the
    * ingest runs.
    */
  def ingestHazard(events: DataFrame, stateDir: String,
      checkpointDir: String, eventType: String = "purchase"): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestHazardBatch(batch.toDF(), stateDir, batchId, eventType)
      }
      .start()

  /** One hazard ingest step (see [[ingestHazard]]); public for
    * batch-mode replays and tests.
    */
  def ingestHazardBatch(batch: DataFrame, stateDir: String, batchId: Long,
      eventType: String = "purchase"): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    val sec = "((unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000)"
    val p = batch.filter(col("event_type") === eventType
        && col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), expr(sec).as("s"))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("s"), col("event_id"))
    p.withColumn("rn", row_number().over(byUser)).filter(col("rn") <= 2)
      .drop("rn")
      .write.mode("overwrite").parquet(s"$stateDir/firsts/batch=$batchId")
    p.agg(max(col("s")).as("tmax"))
      .write.mode("overwrite").parquet(s"$stateDir/hz/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The Nelson–Aalen hazard frame over everything ingested (and any
    * compacted base) — hash-identical to batch q165 over the union of
    * the batches. None before the first commit.
    */
  def ingestHazardRead(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else {
      def frames(f: String) =
        (if (c >= 0) Seq(baseDir(stateDir, c) + s"/$f") else Nil) ++
          ids.map(i => s"$stateDir/$f/batch=$i")
      val firsts = spark.read.parquet(frames("firsts"): _*)
      val horizon = spark.read.parquet(frames("hz"): _*)
        .agg(max(col("tmax")).as("tmax"))
      Some(graft.operators.Sessions.hazardFromPurchases(firsts, horizon))
    }
  }

  /** Fold every committed hazard batch (and any prior base) into a
    * fresh canonical base: candidates re-ranked back to ≤ 2 rows per
    * user, horizons folded to one row — same commit/GC protocol as the
    * other tiers; keeps BOTH read cost and state size flat as batch
    * count grows.
    */
  def compactHazard(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      def frames(f: String) =
        (if (c0 >= 0) Seq(baseDir(stateDir, c0) + s"/$f") else Nil) ++
          ids.map(i => s"$stateDir/$f/batch=$i")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("s"), col("event_id"))
      spark.read.parquet(frames("firsts"): _*)
        .withColumn("rn", row_number().over(byUser)).filter(col("rn") <= 2)
        .drop("rn")
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/firsts")
      spark.read.parquet(frames("hz"): _*)
        .agg(max(col("tmax")).as("tmax"))
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/hz")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("firsts", "hz"))
      Some(c)
    }
  }

  /** Streaming ingest of IMAGE FEATURES — the TWELFTH `foreachBatch`
    * composition, joining the multimodal tier to the ingest protocol:
    * as payload blobs arrive, ONLY the new batch pays the codec pass
    * ([[graft.operators.Multimodal.extractImageFeatures]] — the q215
    * per-partition `javax.imageio` decode), and its integer-exact
    * feature rows land under `features/batch=N` with the same
    * marker-last exactly-once contract as the other eleven tiers.
    * Feature rows are pure per-doc derivations of append-only doc_ids,
    * so batch frames are disjoint and the fold over committed batches
    * is row-identical to a batch decode over everything ingested — the
    * StreamingSpec differential, checked across replays and
    * compaction. At 100 TB this is THE shape for an image corpus: a
    * crawl never re-decodes yesterday's payloads, and downstream
    * consumers (dedup on the histogram fingerprint, resize manifests)
    * read the feature artifact, never the bytes.
    */
  def ingestImageFeatures(blobs: DataFrame, stateDir: String,
      checkpointDir: String): StreamingQuery =
    blobs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestImageFeaturesBatch(batch.toDF(), stateDir, batchId)
      }
      .start()

  /** One image-feature ingest step (see [[ingestImageFeatures]]);
    * public for batch-mode replays and tests. `batch` carries the
    * [[graft.operators.Multimodal.Blob]] schema (doc_id, bytes).
    */
  def ingestImageFeaturesBatch(batch: DataFrame, stateDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (committedBatches(spark, stateDir).contains(batchId)) return // replayed
    graft.operators.Multimodal
      .extractImageFeatures(batch.as[graft.operators.Multimodal.Blob](
        Encoders.product[graft.operators.Multimodal.Blob]))
      .write.mode("overwrite").parquet(s"$stateDir/features/batch=$batchId")
    markCommitted(spark, stateDir, batchId)
  }

  /** The accumulated feature table over all COMMITTED batches (None
    * before the first commit): (doc_id, width, height, lum_hist).
    */
  def ingestImageFeaturesRead(spark: SparkSession,
      stateDir: String): Option[DataFrame] = {
    val c = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c)
    if (c < 0 && ids.isEmpty) None
    else Some(spark.read.parquet(
      (if (c >= 0) Seq(baseDir(stateDir, c) + "/features") else Nil) ++
        ids.map(i => s"$stateDir/features/batch=$i"): _*))
  }

  /** Fold committed image-feature batches (and any prior base) into one
    * canonical base — same commit/GC protocol as [[compactNearDup]];
    * keeps a feature probe reading one file group instead of one per
    * batch forever. The fold is a plain disjoint union: no re-decode.
    */
  def compactImageFeatures(spark: SparkSession, stateDir: String,
      gc: Boolean = true): Option[Long] = {
    val c0 = compactedUpTo(spark, stateDir)
    val ids = deltaBatches(spark, stateDir, c0)
    if (ids.isEmpty) None
    else {
      val c = ids.max
      ingestImageFeaturesRead(spark, stateDir).get
        .write.mode("overwrite").parquet(baseDir(stateDir, c) + "/features")
      markCompacted(spark, stateDir, c)
      if (gc) gcCovered(spark, stateDir, c0, ids, Seq("features"))
      Some(c)
    }
  }

  private def fileSystem(
      spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def committedBatches(spark: SparkSession, stateDir: String): Seq[Long] = {
    val fs = fileSystem(spark, stateDir)
    val dir = new org.apache.hadoop.fs.Path(s"$stateDir/_committed")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName.toLong).sorted
  }

  // ——— compaction protocol, shared by all three ingest tiers ———
  // `_compacted/C` = every batch id ≤ C is folded into `base/compact=C`
  // (the tier's canonical standalone artifact layout). Markers in
  // `_committed` are never deleted — they are the replay-skip contract —
  // so readers resolve: C = max compacted marker, deltas = committed ids
  // greater than C.

  private def baseDir(stateDir: String, c: Long): String =
    s"$stateDir/base/compact=$c"

  /** Newest compaction watermark, or -1 when never compacted. */
  private def compactedUpTo(spark: SparkSession, stateDir: String): Long = {
    val fs = fileSystem(spark, stateDir)
    val dir = new org.apache.hadoop.fs.Path(s"$stateDir/_compacted")
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName.toLong).foldLeft(-1L)(math.max)
  }

  /** Committed batches NOT yet covered by the compaction watermark. */
  private def deltaBatches(spark: SparkSession, stateDir: String,
      compacted: Long): Seq[Long] =
    committedBatches(spark, stateDir).filter(_ > compacted)

  /** Write the `_compacted/<c>` marker — LAST, after the base's frames
    * are all durable (the same marker-last protocol as [[markCommitted]]).
    */
  private def markCompacted(spark: SparkSession, stateDir: String,
      c: Long): Unit = {
    val fs = fileSystem(spark, stateDir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$stateDir/_compacted"))
    fs.create(
      new org.apache.hadoop.fs.Path(s"$stateDir/_compacted/$c"), true).close()
  }

  /** Best-effort post-marker GC: delete the batch dirs the new base
    * covers (under each of `frames`) and the previous base. Runs AFTER
    * the marker commit, so a crash mid-GC only leaves extra files — the
    * next compaction's GC sweeps them (ids derive from `_committed`,
    * which is never pruned).
    */
  private def gcCovered(spark: SparkSession, stateDir: String,
      prevBase: Long, coveredIds: Seq[Long], frames: Seq[String]): Unit = {
    val fs = fileSystem(spark, stateDir)
    def rm(p: String): Unit =
      try fs.delete(new org.apache.hadoop.fs.Path(p), true)
      catch { case _: Throwable => () }
    for (f <- frames; i <- coveredIds) rm(s"$stateDir/$f/batch=$i")
    if (prevBase >= 0) rm(baseDir(stateDir, prevBase))
  }

  /** Typed event row for the stateful API (subset of the events schema). */
  case class UserEvent(user_id: Long, event_type: String, value: Double,
      ts: java.sql.Timestamp)

  /** Running per-user state: event count, value total, last event time. */
  case class UserState(user_id: Long, n_events: Long, total_value: Double)

  /** The sessionization state machine reads ONLY (user_id, ts) — a slim
    * keyed row keeps event_type/value strings out of the groupByKey
    * shuffle on the ingest path. (Public: encoder-generated projections
    * live outside this object and cannot access a private class.)
    */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Open-session island for [[sessionCloseEvents]] (epoch µs). */
  case class OpenSession(start_us: Long, last_us: Long, n: Long)

  /** [[sessionCloseEvents]] state: ALL islands not yet sealed by the
    * watermark, earliest first — not just the trailing one.
    */
  case class OpenSessions(islands: List[OpenSession])

  /** A closed session, emitted once (epoch µs bounds). */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Session-close events via `flatMapGroupsWithState` + event-time
    * timeout — the 0..n-outputs-per-group stateful surface (vs
    * [[runningUserState]]'s exactly-one).
    *
    * Append-once semantics mirror Spark's own `session_window` append
    * mode: an island [start, end] is emitted only once the event-time
    * watermark strictly passes end + gap — before that, an admissible
    * straggler (event-time ≥ watermark, allowed whenever watermarkDelay
    * > 0) could still land within the gap and merge with or bridge into
    * it, which batch [[graft.operators.Sessions.sessionize]] would fold
    * into one island. So state holds EVERY unsealed island, not just
    * the trailing one; the event-time timeout is set to the earliest
    * unsealed deadline, and each wake-up (new data or timeout) emits
    * exactly the islands the watermark has sealed. State per key is
    * bounded by the watermark horizon (islands older than delay + gap
    * are always sealed), evicted when no island remains.
    *
    * Differential contract (tested at delay 0 and 2h): streamed closed
    * sessions == batch sessionize islands, once the watermark has
    * flushed every trailing session.
    */
  def sessionCloseEvents(events: DataFrame, gapSeconds: Long = 1800L,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.OutputMode
    implicit val seEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
    implicit val osEnc: Encoder[OpenSessions] = Encoders.product[OpenSessions]
    implicit val csEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val gapUs = gapSeconds * 1000000L

    events.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSessions]) =>
          // One unified path for data batches AND timeout wake-ups (where
          // `it` is empty): fold the batch's sorted times into islands,
          // merge them with the parked ones (an early straggler can
          // extend an island backward or bridge two — never regress an
          // end), then emit exactly the islands the watermark has sealed.
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val parked = state.getOption.map(_.islands).getOrElse(Nil)
          val times = it
            // floorDiv, not /: getNanos is always the non-negative
            // sub-second part, so the seconds component must floor for
            // pre-epoch instants (-0.5s is floor(-500ms/1000) = -1s plus
            // 500000µs of nanos, not 0s plus 500000µs)
            .map(e => Math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
              e.ts.getNanos / 1000L)
            .toArray.sorted
          val fresh = times.foldLeft(List.empty[OpenSession]) {
            case (cur :: done, t) if t - cur.last_us <= gapUs =>
              cur.copy(last_us = t, n = cur.n + 1) :: done
            case (acc, t) => OpenSession(t, t, 1L) :: acc
          }
          val merged = (parked ++ fresh)
            .sortBy(s => (s.start_us, s.last_us))
            .foldLeft(List.empty[OpenSession]) {
              case (cur :: done, s) if s.start_us - cur.last_us <= gapUs =>
                OpenSession(cur.start_us, math.max(cur.last_us, s.last_us),
                  cur.n + s.n) :: done
              case (acc, s) => s :: acc
            }.reverse
          // strict <: a boundary event at exactly watermark == end + gap
          // is still admissible, so the island is not sealed yet
          val (flushed, pending) = merged.partition(_.last_us + gapUs < wmUs)
          if (pending.isEmpty) state.remove()
          else {
            state.update(OpenSessions(pending))
            // wake when the earliest deadline passes; a deadline may
            // already sit behind the watermark (late straggler reopened
            // it) — clamp forward, Spark rejects timestamps <= watermark
            state.setTimeoutTimestamp(math.max(
              pending.map(s => (s.last_us + gapUs) / 1000L + 1L).min,
              state.getCurrentWatermarkMs() + 1L))
          }
          flushed.iterator.map(s => ClosedSession(uid, s.start_us, s.last_us, s.n))
      }
  }

  /** Custom running state per user via `mapGroupsWithState` — the
    * arbitrary-stateful-processing surface (the streaming analogue of the
    * reference's user-defined Reducer: the framework shuffles by key and
    * hands the user code each key's values plus durable state).
    *
    * Emits the updated state for every group touched in a (micro-)batch.
    * On a batch Dataset the same code runs with initial-empty state, so
    * the result must equal a plain groupBy aggregation — that equivalence
    * is the differential test.
    */
  def runningUserState(events: Dataset[UserEvent]): Dataset[UserState] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stateEnc: Encoder[UserState] = Encoders.product[UserState]
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(uid, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          it.foreach { e => n += 1; total += e.value }
          val next = UserState(uid, n, total)
          state.update(next)
          next
      }
  }
}
