package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive scan parallelism — the optimization-guide §2.5 fix for
  * "input skew: one huge unsplittable file".
  *
  * A parquet source with fewer splits than the session's parallelism
  * (locally: each testdata table is ONE file with ONE row group, so
  * every scan plans exactly one task) serializes all downstream
  * narrow-stage CPU through those few cores until the first exchange.
  * For scan-light relational work that is invisible; for the CPU-dense
  * tiers — shingling, char-trigram explodes, O(n²) verify kernels,
  * image/audio codec decode — the measured effect at sf0.1 is a whole
  * operator running single-threaded (q171: 7 single-task stages, 6.6 s;
  * q37: 15 tasks over 11 stages, 5.4 s — Probe, r14).
  *
  * [[apply]] round-robin-spreads such an input to defaultParallelism.
  * The decision reads the REAL partition count of the frame at query
  * construction, so this is scale-adaptive, not a local-mode constant:
  * at production scale a corpus scan plans ≥ cores splits and the
  * branch is the identity — no repartition node enters the plan, and
  * no payload byte is ever shuffled for parallelism that already
  * exists. When it does fire, the exchange is RoundRobinPartitioning
  * (deterministic under retry via Spark's sort-before-repartition
  * default), never a hash of a payload column.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // df.rdd forces a physical plan of the input at construction time
    // (VERDICT r14 #5) — cheap for the scan-rooted frames every caller
    // passes (wrap scans, not derived pipelines); the planned-split
    // count is exactly the information the decision needs
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
