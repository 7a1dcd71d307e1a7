package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual complement to AQE's
  * runtime skew-split (which needs sort-merge stats and can't help when
  * one reduce key is hot inside an otherwise balanced stage).
  *
  * Shape: the skewed (large, hot-keyed) side gets a uniform salt in
  * [0, buckets); the other side is replicated `buckets` times with every
  * salt value. Joining on (key, salt) splits each hot key across
  * `buckets` reducers. Replication multiplies the small side — size it
  * like a broadcast budget: buckets × |right| must stay cluster-friendly.
  *
  * The salt derives from md5 of the row's key plus a disambiguator
  * column, not from `rand()` — deterministic replay (retried tasks emit
  * identical salts), which streaming/exactly-once pipelines require.
  */
object SkewJoin {

  /** One side's planner statistics: row count, the hottest key's row
    * share in ppm, and the mean serialized row width in bytes — the
    * numbers the strategy decision reads. Width is estimated as the
    * mean `octet_length(to_json(struct(*)))` — an over-approximation
    * (field names + quoting ride along), which is the safe direction
    * for a broadcast budget.
    */
  final case class SideStats(rows: Long, maxSharePpm: Long, avgRowBytes: Long)

  /** The chosen strategy plus the evidence it was chosen on, so a
    * pipeline can LOG why its join ran the way it did.
    */
  final case class JoinChoice(strategy: String, buckets: Int,
      estJoinRows: Long, left: SideStats, right: SideStats)

  /** Row-count threshold under which a side is ELIGIBLE for broadcast
    * (tune per deployment). Row count alone is not sufficient — a
    * million rows of document text is gigabytes, not megabytes — so the
    * decision also requires rows × [[SideStats.avgRowBytes]] to fit
    * [[BroadcastBytes]].
    */
  val BroadcastRows: Long = 1000000L

  /** Estimated-bytes budget for a broadcast side: rows × mean row width
    * must fit this or the side shuffles instead — the guard that keeps a
    * row-count-eligible but WIDE side (long text/array columns) from
    * OOMing the driver when the broadcast is forced by hint.
    */
  val BroadcastBytes: Long = 64L << 20

  /** Hot-key share (ppm of the side's rows) above which a plain
    * shuffle is presumed reducer-bound: 5% of one side on a single
    * reduce key dominates a 32-way stage.
    */
  val HotSharePpm: Long = 50000L

  /** One side fits a broadcast when its rows are at or under the row
    * threshold AND its estimated payload fits the bytes budget —
    * division instead of rows × width so the check can't overflow on a
    * huge mis-called side.
    */
  private def broadcastEligible(s: SideStats, broadcastRows: Long,
      broadcastBytes: Long): Boolean =
    s.rows <= broadcastRows &&
      s.avgRowBytes <= broadcastBytes / math.max(1L, s.rows)

  private def sideStats(df: DataFrame, key: String): SideStats = {
    val r = df.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("cnt"),
        sum(octet_length(to_json(struct(df.columns.map(col): _*))))
          .as("bytes"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"),
        coalesce(max(col("cnt")), lit(0L)).as("mx"),
        coalesce(sum(col("bytes")), lit(0L)).as("b"))
      .head()
    val (n, mx, b) = (r.getLong(0), r.getLong(1), r.getLong(2))
    SideStats(n, if (n > 0) mx * 1000000L / n else 0L,
      if (n > 0) (b + n - 1) / n else 0L)
  }

  /** Pick the join strategy for `left ⋈ right` on an equi-key BEFORE
    * paying the join — the executable rendering of the planner-side
    * audits (q126's CMS join-size estimate, q128's hot-key share):
    *
    *   1. EITHER side at or under `broadcastRows` whose estimated bytes
    *      (rows × mean serialized width) fit `broadcastBytes` →
    *      `"broadcast"` (no shuffle at all — hot keys are irrelevant
    *      when nothing partitions by key; the bytes gate keeps a
    *      row-count-small but WIDE side from OOMing the driver, and a
    *      wide-but-small side never vetoes broadcasting the other);
    *   2. else a side whose hottest key holds ≥ `hotSharePpm` of its
    *      rows → `"salted"` (that key would serialize one reducer;
    *      fan it over salt buckets sized to the observed share);
    *   3. else → `"plain"` (balanced shuffle; AQE handles residual
    *      runtime skew).
    *
    * Evidence cost: one map-side-combined per-key agg per side (the
    * q128 scan — at 100 TB feed the PERSISTED audit instead of
    * recomputing) and the d·w-cell CMS inner product for the output-
    * size estimate, which never executes the join. All three
    * aggregates are 1-row frames — the `.head()`s here are planner
    * decisions, not data movement.
    */
  def choose(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      broadcastRows: Long = BroadcastRows,
      hotSharePpm: Long = HotSharePpm,
      d: Int = 4, w: Int = 4096,
      broadcastBytes: Long = BroadcastBytes): JoinChoice = {
    val ls = sideStats(left, leftKey)
    val rs = sideStats(right, rightKey)
    val est = Sketches.cmsJoinSize(left, leftKey, right, rightKey, d, w)
      .head().getLong(0)
    val hottest = math.max(ls.maxSharePpm, rs.maxSharePpm)
    // EITHER side qualifying is enough — a row-count-smaller but WIDE
    // side failing its bytes gate must not veto broadcasting the other,
    // narrow side (review finding: that fell through to salted/plain
    // and paid a shuffle a valid broadcast would have skipped)
    val strategy =
      if (broadcastEligible(ls, broadcastRows, broadcastBytes) ||
          broadcastEligible(rs, broadcastRows, broadcastBytes))
        "broadcast"
      else if (hottest >= hotSharePpm) "salted"
      else "plain"
    // salt fan-out ∝ the hot key's share of a 32-way stage, clamped to
    // [4, 32] — replication cost on the other side stays bounded
    val buckets =
      if (strategy == "salted")
        math.min(32L, math.max(4L, hottest * 32L / 1000000L + 1L)).toInt
      else 0
    JoinChoice(strategy, buckets, est, ls, rs)
  }

  /** Choose AND execute: inner equi-join `left ⋈ right` on `key` under
    * [[choose]]'s strategy. Output columns are (key, left's others,
    * right's others) whichever branch ran, so downstream code never
    * sees the strategy. The salted branch salts whichever side carries
    * the hot key (salting the cold side would still funnel the hot
    * side's replicated rows through one reducer) and derives its
    * spreader from that side's FULL row content — deterministic on
    * replay; only rows identical in every column share a salt, which
    * spreads any real table (a key whose rows are all byte-identical
    * duplicates stays hot — dedup that table first).
    */
  def autoJoin(left: DataFrame, right: DataFrame, key: String,
      broadcastRows: Long = BroadcastRows,
      hotSharePpm: Long = HotSharePpm,
      broadcastBytes: Long = BroadcastBytes): (DataFrame, JoinChoice) = {
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key column names must not collide across sides: $overlap")
    val choice = choose(left, key, right, key, broadcastRows, hotSharePpm,
      broadcastBytes = broadcastBytes)
    val outCols = (Seq(key) ++ left.columns.filterNot(_ == key)
      ++ right.columns.filterNot(_ == key)).map(col)
    def rowDisambig(side: DataFrame): String =
      side.columns.filterNot(_ == key).map(c => s"cast(`$c` as string)") match {
        case cs if cs.isEmpty => "''"
        // concat_ws skips NULLs (a bare concat would nullify the salt
        // and silently drop the row from the (key, salt) equi-join)
        case cs => cs.mkString("concat_ws('|', ", ", ", ")")
      }
    val joined = choice.strategy match {
      case "broadcast" =>
        // broadcast the side that actually passed the eligibility gates
        // (not merely the row-count-smaller one); when both qualify,
        // prefer the smaller estimated payload — products are bounded
        // by the budget for eligible sides, so no overflow here
        val lOk = broadcastEligible(choice.left, broadcastRows, broadcastBytes)
        val rOk = broadcastEligible(choice.right, broadcastRows, broadcastBytes)
        val bcastLeft =
          if (lOk && rOk)
            choice.left.rows * choice.left.avgRowBytes <=
              choice.right.rows * choice.right.avgRowBytes
          else lOk
        if (bcastLeft) broadcast(left).join(right, key)
        else left.join(broadcast(right), key)
      case "salted" =>
        if (choice.left.maxSharePpm >= choice.right.maxSharePpm)
          salted(left, right, key, rowDisambig(left), choice.buckets)
        else salted(right, left, key, rowDisambig(right), choice.buckets)
      case _ => left.join(right, key)
    }
    (joined.select(outCols: _*), choice)
  }

  /** Inner-join `skewed` with `other` on `key`, fanning each of the
    * skewed side's keys over `buckets` sub-partitions.
    * @param disambig a skewed-side column whose (key, disambig) pairs
    *                 spread uniformly — typically a row id.
    */
  def salted(skewed: DataFrame, other: DataFrame, key: String,
      disambig: String, buckets: Int = 8): DataFrame = {
    // the working column must not capture (clobber, then drop) a caller
    // column of the same name
    require(!skewed.columns.contains("_salt") && !other.columns.contains("_salt"),
      "input frames must not already have a _salt column")
    val salted = skewed.withColumn("_salt",
      expr(s"pmod(${Dedup.h60(s"concat($key, '#', $disambig)")}, $buckets)"))
    val replicated = other.withColumn("_salt",
      explode(typedlit((0 until buckets).map(_.toLong))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
