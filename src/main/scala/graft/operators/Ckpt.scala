package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's ONE policy point for cutting lineage on narrow frames.
  *
  * Operators checkpoint small derived frames (hashed shingles, band
  * keys, LSH buckets, signatures, edge lists — tens of bytes per row)
  * wherever one frame feeds both sides of a self-join or several
  * consumers, because Spark has no cross-branch subtree reuse and the
  * producing pipeline would otherwise run once PER consumer (measured:
  * q47 6.2s → 3.3s, q48 33s → 4s at sf0.1 from these cuts alone).
  *
  * `localCheckpoint` stores the blocks on executors: fastest, but NOT
  * fault-tolerant — losing an executor that holds a block fails the job
  * (truncated lineage cannot recompute). That is the right trade in
  * local mode and on stable clusters where these frames are rebuilt in
  * seconds. For long-running jobs on clusters with real executor churn,
  * swap the implementation here for `df.checkpoint()` against a
  * `sparkContext.setCheckpointDir` on durable storage (or persist with
  * replication) — every operator inherits the policy from this one
  * call site.
  */
private[graft] object Ckpt {
  /** Eagerly materialize and cut the lineage of a NARROW frame. */
  def narrow(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Lazy lineage cut for frames the caller materializes itself
    * immediately afterwards (e.g. a convergence-check `count()` in an
    * iterative loop): skips the extra eager job, same storage contract
    * as [[narrow]] once materialized.
    */
  def narrowLazy(df: DataFrame): DataFrame = df.localCheckpoint(false)

  /** Drop EVERY persistent RDD on the context — the run-boundary cleanup
    * for bench/verify loops. `catalog.clearCache()` only empties the SQL
    * CacheManager; localCheckpoint blocks live as plain persistent RDDs
    * and otherwise linger until the driver GCs their handles
    * (ContextCleaner), so a many-query run accumulates orphaned executor
    * storage the protocol's per-run isolation claim says it doesn't.
    *
    * CONTRACT: nothing may survive this call. A checkpointed DataFrame
    * held across it is unrecoverable (truncated lineage cannot recompute
    * dropped blocks — `Checkpoint block rdd_N_M not found`), and caches
    * created by anything else on the context die too. Call it only at a
    * boundary where every frame is about to be rebuilt from storage.
    */
  def releaseAllContextStorage(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
}
