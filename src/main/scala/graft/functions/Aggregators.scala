package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregation surface (`Aggregator[IN, BUF, OUT]`) — the
  * Spark rendering of the reference's user-defined reduce
  * (reference `src/mapreduce.h:11-14`: the whole point of its API is a
  * caller-supplied `Reducer` folding a key's value stream; SURVEY.md
  * §2.5 UDF/UDAF row).
  *
  * An `Aggregator` is the scale-correct shape for custom aggregation:
  * Catalyst plans it as partial (map-side) aggregation + merge, so the
  * shuffle moves one buffer per group per partition — never the group's
  * rows — exactly like built-in aggregates. Contrast with collecting a
  * group and folding on one node, which the reference does in RAM
  * (`mapreduce.c:78-86`) and which dies at 100 TB.
  */
object Aggregators {

  /** Intermediate buffer: weighted sum + total weight. */
  case class WAvgBuf(wsum: Double, w: Double)

  /** Weighted average of `value` by `weight` — e.g. an order-size-
    * weighted price. NaN on empty/zero-weight groups.
    */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
      WAvgBuf(b.wsum + in._1 * in._2, b.w + in._2)
    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.wsum + b.wsum, a.w + b.w)
    override def finish(b: WAvgBuf): Double =
      if (b.w == 0.0) Double.NaN else b.wsum / b.w
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: `wavg(value, weight)` (input encoder derived from the
    * TypeTag by `udaf`).
    */
  val wavg = udaf(WeightedAvg)

  /** Element-wise sum of equal-length `array<bigint>` rows — the
    * centroid-recompute step of distributed k-means
    * ([[graft.operators.Similarity.ivfTrainedIndex]]). Long adds are
    * exact and commutative, so the aggregate is bit-identical under any
    * partitioning / merge order — the property that lets an oracle
    * engine reproduce trained centroids exactly, where float sums could
    * not. Partial aggregation applies (reduce map-side, merge after the
    * shuffle), so the shuffle moves one 64-long buffer per (group,
    * partition), never member vectors.
    */
  object VecSumLong extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    private def add(b: Array[Long], in: Array[Long]): Array[Long] =
      if (b.isEmpty) in
      else if (in.isEmpty) b
      else {
        require(b.length == in.length,
          s"vec_sum_long over ragged arrays: ${b.length} vs ${in.length}")
        val out = new Array[Long](b.length)
        var i = 0
        while (i < b.length) { out(i) = b(i) + in(i); i += 1 }
        out
      }
    override def reduce(b: Array[Long], in: Array[Long]): Array[Long] = {
      // the empty array is the aggregation IDENTITY (zero/buffers), so a
      // null or zero-length INPUT row must fail loudly here — silently
      // treating it as identity would divide the caller's centroid mean
      // by a count that includes a vector contributing nothing
      require(in != null && in.nonEmpty,
        "vec_sum_long input row is null/empty — corrupt vector upstream")
      add(b, in)
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = add(a, b)
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = longArrEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrEnc
  }

  private implicit val longArrEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column form: `vec_sum_long(array<bigint>)`. */
  val vec_sum_long = udaf(VecSumLong)

  /** Bottom-`k` DISTINCT values of a hash column, sorted ascending —
    * the KMV (k-minimum-values) distinct-count sketch state. Feed it
    * the house portable 60-bit md5 of the keys; the estimator over the
    * finished array is `(k−1) · 2⁶⁰ / h_k` when the buffer saturates
    * (h_k = the k-th minimum) and the buffer size itself below
    * saturation, where it is EXACT (fewer than k distinct hashes seen
    * means the buffer holds every one of them).
    *
    * Scale contract, same as the HLL (q34) / GK (q49) / CMS (q98)
    * tiers: state is ≤ k longs per group regardless of input size,
    * reduce folds map-side, merge is a sorted-distinct merge
    * (associative + commutative) — the shuffle moves one ≤ k-long
    * buffer per group per partition. Unlike HLL/GK, every operation
    * here (md5, sorted insert, distinct merge) renders identically in
    * any engine, so the whole estimate is hash-gateable (q106).
    */
  final class KMinValues(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], h: Long): Array[Long] =
      // negative input is the NULL sentinel (the 60-bit hash domain is
      // non-negative): callers aggregating a nullable derivation pass
      // coalesce(hash, -1) — a typed Aggregator's Long input cannot
      // carry SQL NULL itself — and the sketch skips it, preserving
      // count-distinct's ignore-NULLs semantics (Profile.profilePartial)
      if (h < 0) b
      else if (b.length == k && h >= b(k - 1)) b // saturated and not a new minimum
      else {
        val i = java.util.Arrays.binarySearch(b, h)
        if (i >= 0) b // already a kept minimum (distinct contract)
        else {
          val at = -i - 1
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, at)
          out(at) = h
          System.arraycopy(b, at, out, at + 1, n - at - 1)
          out
        }
      }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else { // sorted-distinct two-pointer merge, capped at k
        val out = new Array[Long](math.min(a.length + b.length, k))
        var i = 0; var j = 0; var n = 0
        while (n < k && (i < a.length || j < b.length)) {
          val v =
            if (j >= b.length || (i < a.length && a(i) <= b(j))) {
              val x = a(i); i += 1
              if (j < b.length && b(j) == x) j += 1 // drop the duplicate
              x
            } else { val x = b(j); j += 1; x }
          out(n) = v; n += 1
        }
        if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = longArrEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrEnc
  }

  /** Column form: `kmv64(hash60)` — the k = 64 instance q106 gates
    * (rsd ≈ 1/√(k−2) ≈ 12.7%).
    */
  val kmv64 = udaf(new KMinValues(64))
}
