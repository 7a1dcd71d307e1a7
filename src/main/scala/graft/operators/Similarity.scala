package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[cosinePairs]] / [[cosineNeighbors]] / [[bruteForceTopK]]:
  *     exact brute force. The dot product runs inside whole-stage codegen
  *     via `zip_with` + `aggregate` (no UDF); the pair space is a
  *     broadcast-or-shuffle cross join — correct baseline, quadratic.
  *   - [[signLshBuckets]] / [[lshCosinePairs]]: the scale path — random-
  *     hyperplane (sign) LSH. L independent tables of k sign bits each;
  *     candidates share a (table, bucket) key, then get verified exactly.
  *     Replaces the quadratic join with O(docs × L) bucketing plus
  *     per-bucket joins, the same candidate-generation shape as
  *     [[Dedup.minhashPairs]].
  *
  * Projections are derived from md5 (deterministic, seed-free, engine-
  * portable) rather than a runtime RNG, so plans are reproducible and
  * testable across engines.
  */
object Similarity {

  /** `cos(a, b)` as a SQL expression over two array<double> columns. */
  private def cosExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, x) -> acc + x * x))
       |    * sqrt(aggregate($b, 0D, (acc, x) -> acc + x * x)))""".stripMargin

  private def asDouble(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("e"))

  /** All pairs (i < j) with cosine ≥ threshold — exact, brute force. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val v = asDouble(emb)
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        expr(cosExpr("a.e", "b.e")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
  }

  /** Neighbors of the given query vectors with cosine ≥ threshold.
    * The query side is broadcast — at scale this is a broadcast join of a
    * small query set against the full corpus, one scan, no shuffle.
    */
  def cosineNeighbors(emb: DataFrame, queries: DataFrame, threshold: Double): DataFrame = {
    val corpus = asDouble(emb)
    val q = asDouble(queries).withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("e", "qe")
    corpus.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(cosExpr("qe", "e")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Exact top-k neighbors per query vector (rank ties broken by id). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = asDouble(emb)
    val q = asDouble(queries).withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("e", "qe")
    val scored = corpus.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(cosExpr("qe", "e")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Sign-LSH bucket ids: `tables` independent tables, `bits` hyperplanes
    * each. Hyperplane component (t, p, d) = centered md5-derived value in
    * [-1, 1]; bucket bit p = sign of the projection. Output:
    * (vec_id, t, bucket).
    */
  def signLshBuckets(emb: DataFrame, tables: Int = 8, bits: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    val dims = asDouble(emb)
      .select(col("vec_id"), posexplode(col("e")).as(Seq("d", "x")))
    val planes = spark.range(0, tables).toDF("t")
      .crossJoin(spark.range(0, bits).toDF("p"))
      .crossJoin(spark.range(0, 4096).toDF("d")) // supports dim ≤ 4096
      .select(col("t"), col("p"), col("d"),
        expr(s"(${Dedup.h60("concat(t, '_', p, '_', d)")} % 2001 - 1000) / 1000.0").as("r"))
    dims.join(broadcast(planes), "d")
      .groupBy("vec_id", "t", "p")
      .agg(sum(col("x") * col("r")).as("proj"))
      .groupBy("vec_id", "t")
      .agg(expr("sum(shiftleft(case when proj > 0 then cast(1 as bigint) else cast(0 as bigint) end, p))")
        .as("bucket"))
  }

  /** LSH-accelerated near-dup pairs: same-(table, bucket) candidates,
    * exact cosine verification ≥ threshold.
    */
  def lshCosinePairs(
      emb: DataFrame, threshold: Double,
      tables: Int = 8, bits: Int = 4): DataFrame = {
    val buckets = signLshBuckets(emb, tables, bits)
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      .distinct()
    val v = asDouble(emb)
    cand
      .join(v.as("a"), col("i") === col("a.vec_id"))
      .join(v.as("b"), col("j") === col("b.vec_id"))
      .select(col("i"), col("j"), expr(cosExpr("a.e", "b.e")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
  }
}
