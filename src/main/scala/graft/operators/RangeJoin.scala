package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) self-join: all row pairs whose timestamps lie within
  * `windowSeconds` of each other — the join shape Spark's built-ins
  * plan as a BroadcastNestedLoopJoin (quadratic) when written naively
  * as `abs(a.ts - b.ts) <= w`.
  *
  * Scale shape: bucketize time into `windowSeconds`-wide bins. Any
  * qualifying pair differs by at most one bin, so candidates are an
  * EQUI-join of each left row's bin against the right side exploded to
  * its three adjacent bins — one hash shuffle, 3× amplification of one
  * side, then exact |Δts| verification. A candidate pair matches on
  * exactly one probe bin (the left row's), so no distinct pass is
  * needed. Hot bins (load spikes) are ordinary shuffle skew — AQE's
  * skew-join split applies; at extreme densities widen the bin or add a
  * secondary salt on the verify join.
  */
object RangeJoin {

  /** Pairs (i, j, i < j by `idCol`) of `df` rows with
    * |ts_i − ts_j| ≤ `windowSeconds`, with the signed microsecond delta
    * (ts_j − ts_i).
    */
  def timeBandPairs(df: DataFrame, idCol: String, tsCol: String,
      windowSeconds: Long): DataFrame = {
    // a zero/negative window has no qualifying pairs and would make the
    // bin derivation an ANSI divide-by-zero mid-job — reject up front
    require(windowSeconds > 0, s"windowSeconds must be > 0, got $windowSeconds")
    val wUs = windowSeconds * 1000000L
    val base = df.select(col(idCol).as("id"), unix_micros(col(tsCol)).as("us"))
      .withColumn("bin", expr(s"us div $wUs"))
    val probes = base.withColumn("bin",
      explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
    base.as("a")
      .join(probes.as("b"),
        col("a.bin") === col("b.bin") && col("a.id") < col("b.id"))
      .filter(abs(col("b.us") - col("a.us")) <= wUs)
      .select(col("a.id").as("i"), col("b.id").as("j"),
        (col("b.us") - col("a.us")).as("delta_us"))
  }

  /** Keyed one-sided band join: for each left row, the right rows with
    * the SAME key whose timestamp falls in `[leftTs − windowSeconds,
    * leftTs]` — the lookback shape behind attribution, feature windows,
    * and "recent activity" enrichment.
    *
    * Same bucketization argument as [[timeBandPairs]], one-sided: a
    * window-wide lookback from a left row in bin b only reaches right
    * rows in bins b−1 and b, so the right side explodes to (bin, bin+1)
    * probes and candidates are ONE hash equi-join on (key, bin) — never
    * a nested-loop range join — then exact `0 ≤ Δ ≤ w` verification.
    * Inner-join semantics: left rows with no in-window partner emit
    * nothing (callers wanting them back left-join on the left id).
    *
    * Output: every left column prefixed `l_` is preserved by the
    * CALLER's projection; this returns (left id, right id, gap_us) at
    * candidate-verified grain.
    */
  def lookbackJoin(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftTs: String, rightId: String, rightTs: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be > 0, got $windowSeconds")
    val wUs = windowSeconds * 1000000L
    val l = left.select(col(key).as("k"), col(leftId).as("lid"),
        unix_micros(col(leftTs)).as("lus"))
      .withColumn("bin", expr(s"lus div $wUs"))
    val r = right.select(col(key).as("k"), col(rightId).as("rid"),
        unix_micros(col(rightTs)).as("rus"))
      .withColumn("bin",
        explode(array(expr(s"rus div $wUs"), expr(s"rus div $wUs") + 1)))
    l.join(r, Seq("k", "bin"))
      .filter(col("lus") - col("rus") >= 0L && col("lus") - col("rus") <= wUs)
      .select(col("k"), col("lid"), col("rid"),
        (col("lus") - col("rus")).as("gap_us"))
  }
}
