package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gap-and-island): consecutive events of a key
  * belong to one session while the gap between neighbors stays ≤ `gap`;
  * a larger gap opens a new session. The batch twin of
  * [[graft.streaming.Streams.sessionCounts]]'s `session_window` — the
  * differential test asserts the two renderings agree.
  *
  * Plan shape: ONE shuffle. Both window passes (lag, running sum) and the
  * final group-by are keyed by `user_id` — Spark's `HashPartitioning`
  * on `user_id` satisfies the grouping distribution for
  * `(user_id, session)`, so the sort-based windows and the aggregation
  * all run inside the same exchange. Per-partition state is a sort, no
  * buffering beyond the aggregation — survives arbitrarily long streams
  * of sessions per key.
  */
object Sessions {

  /** Per-session rollup: (user_id, session_start_us, session_end_us,
    * n_events, sum_value). Timestamps emitted as epoch microseconds
    * (exact integers — engine-portable, no format ambiguity).
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(unix_micros(col("ts"))).as("session_start_us"),
        max(unix_micros(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .drop("sess")
  }
}
