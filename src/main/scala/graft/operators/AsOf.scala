package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for each left row, the single latest
  * right row with the same key and `rightTs <= leftTs` (or `<` in strict
  * mode). The join Spark's built-in operators don't express directly —
  * composed here from a union and ONE window pass, per the
  * compose-existing-ops preference over a custom physical operator.
  *
  * Plan shape (the canonical distributed as-of): tag both sides, union,
  * shuffle ONCE on the key, sort each partition by (ts, side), and carry
  * the latest right payload forward with `last(_, ignoreNulls)` over
  * rows-unbounded-preceding. Left rows then read their match from the
  * running value. Cost is a single hash shuffle + per-partition sort —
  * identical asymptotics to a sort-merge equi-join, with no range
  * explosion and no per-row probe, so it survives a 100× scale-up.
  *
  * Skew caveat: AQE's skew handling splits JOIN partitions, not window
  * partitions — a pathologically hot key's full history still sorts and
  * scans in ONE task here. For genuinely hot keys (a device emitting a
  * large fraction of all rows), pass `sliceOf` to engage the time-sliced
  * two-pass variant: the window partitions by (key, coarse time slice)
  * so each slice sorts in its own task, and rows whose match precedes
  * their slice resolve through a second window over ONE boundary row per
  * slice (each slice's last right row, carried forward across slices — a
  * frame with one row per (key, slice), tiny by construction).
  * Differentially tested ≡ the plain path, including on a synthetic key
  * owning half the input. Opt-in because the plain path is one shuffle
  * and one sort — strictly cheaper until a key genuinely overflows a
  * task.
  *
  * Left-outer semantics: left rows with no qualifying right row keep NULL
  * match columns. Ties on (key, ts) between right rows resolve to the
  * largest `tiebreak` value (deterministic).
  */
object AsOf {

  /** @param left     left (probe) frame; all its columns are preserved
    * @param right    right (reference) frame: `key`, `rightTs`, payload
    * @param key      equi-join key column present on both sides
    * @param leftTs   left timestamp column
    * @param rightTs  right timestamp column (emitted as `asof_<rightTs>`)
    * @param payload  right columns to carry onto matches
    * @param tiebreak right column ordering equal-ts right rows (max wins)
    * @param strict   require `rightTs < leftTs` instead of `<=`
    * @param sliceOf  opt-in hot-key two-pass (class doc): maps the shared
    *                 timestamp column to a coarse slice id. MUST be
    *                 non-decreasing in the timestamp (e.g.
    *                 `ts => floor(unix_timestamp(ts) / 86400)`) so equal
    *                 timestamps land in one slice and slice order is time
    *                 order — the properties the cross-slice carry rests on.
    */
  def join(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payload: Seq[String], tiebreak: String,
      strict: Boolean = false,
      sliceOf: Option[Column => Column] = None): DataFrame = {

    // Internal working columns must never capture (and silently clobber)
    // a caller column: derive a prefix no caller column starts with.
    val taken = (left.columns ++ right.columns).toSet
    val p = Iterator.iterate("_asof_")(_ + "_")
      .find(pre => !taken.exists(_.startsWith(pre))).get
    val (atsC, sideC, mC, bestC) = (p + "ts", p + "side", p + "m", p + "best")
    require(!left.columns.contains(s"asof_$rightTs"),
      s"left frame already has output column asof_$rightTs")
    // payload columns are emitted under their own names next to every
    // left column — a shared name would yield a duplicate-named output
    // that only fails far downstream (ambiguous reference)
    val clash = payload.filterNot(_ == rightTs).filter(left.columns.contains)
    require(clash.isEmpty,
      s"payload column(s) ${clash.mkString(", ")} collide with left columns")
    // a payload column literally named asof_<rightTs> would duplicate the
    // emitted match-timestamp column even when the left frame is clean
    require(!payload.filterNot(_ == rightTs).contains(s"asof_$rightTs"),
      s"payload column asof_$rightTs collides with the emitted match timestamp")

    val matchCols = (rightTs +: payload.filterNot(_ == rightTs))
    val matchStruct = struct(
      col(tiebreak).as("_tb") +: matchCols.map(c => col(c).as(c)): _*)

    // equi-join semantics: a NULL key matches nothing. Dropping NULL-key
    // right rows up front keeps them out of the shared window partition
    // (left NULL-key rows then see no right rows and keep NULL matches,
    // exactly as an ASOF LEFT JOIN oracle renders them). A NULL rightTs
    // must go too: NULL <= leftTs is never true, but asc ordering puts
    // NULLS FIRST, where the running `last()` would otherwise pick the
    // row up as a spurious earliest match.
    val r = right.filter(col(key).isNotNull && col(rightTs).isNotNull).select(
      col(key).as(key), col(rightTs).as(atsC), lit(0).as(sideC),
      matchStruct.as(mC))
    val l = left
      .withColumn(atsC, col(leftTs))
      .withColumn(sideC, lit(1))

    // At equal ts: inclusive ⇒ right rows sort before left rows (visible);
    // strict ⇒ after (invisible). Among equal-ts right rows the largest
    // tiebreak must sort LAST so `last()` lands on it.
    val sideOrder = if (strict) col(sideC).desc else col(sideC).asc
    val leftCols = left.columns.toIndexedSeq.map(col)
    def outMatch(best: String) = matchCols.map(c =>
      col(s"$best.$c").as(if (c == rightTs) s"asof_$rightTs" else c))
    val u = l.unionByName(r, allowMissingColumns = true)

    sliceOf match {
      case None =>
        val w = Window.partitionBy(key)
          .orderBy(col(atsC).asc, sideOrder, col(s"$mC._tb").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn(bestC, last(col(mC), ignoreNulls = true).over(w))
          .filter(col(sideC) === 1)
          .select(leftCols ++ outMatch(bestC): _*)

      case Some(f) =>
        // Two-pass hot-key variant. Pass 1: the SAME running-last window,
        // partitioned by (key, slice) — each slice sorts in its own task.
        // Equal timestamps share a slice (sliceOf is a function of the
        // ts), so the strict/inclusive side ordering is fully resolved
        // within pass 1; only strictly-earlier slices remain.
        val (sliceC, lastC, prevC) = (p + "slice", p + "lastr", p + "prev")
        val us = u.withColumn(sliceC, f(col(atsC)))
        val w1 = Window.partitionBy(col(key), col(sliceC))
          .orderBy(col(atsC).asc, sideOrder, col(s"$mC._tb").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pass1 = us
          .withColumn(bestC, last(col(mC), ignoreNulls = true).over(w1))
          .filter(col(sideC) === 1)

        // Boundary frame: ONE row per (key, slice) present on either
        // side, holding the slice's last right row (max by (ts, tb) —
        // the row the running window ends on), then carried forward from
        // strictly earlier slices. Tiny by construction: its size is the
        // number of (key, slice) pairs, not rows.
        val lastRight = us.filter(col(sideC) === 0)
          .groupBy(col(key), col(sliceC))
          .agg(max_by(col(mC), struct(col(atsC), col(s"$mC._tb"))).as(lastC))
        val wS = Window.partitionBy(key).orderBy(col(sliceC).asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val prev = us.select(col(key), col(sliceC)).distinct()
          .join(lastRight, Seq(key, sliceC), "left")
          .withColumn(prevC, last(col(lastC), ignoreNulls = true).over(wS))
          .select(col(key), col(sliceC), col(prevC))

        // A left row's match: its slice's running last if any, else the
        // latest right row of any earlier slice. The join key (key,
        // slice) makes this an equi-join against the tiny boundary frame.
        val resolvedC = p + "resolved"
        pass1.join(prev, Seq(key, sliceC), "left")
          .withColumn(resolvedC, coalesce(col(bestC), col(prevC)))
          .select(leftCols ++ outMatch(resolvedC): _*)
    }
  }
}
