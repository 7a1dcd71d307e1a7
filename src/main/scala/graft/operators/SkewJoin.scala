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
