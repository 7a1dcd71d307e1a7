package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus up-scaler for the scale-decade measurement
  * (VERDICT r5 ask #4): derive a K×-larger `documents` / `embeddings` /
  * `events` slice from an existing sf directory WITHOUT changing the
  * workload's *shape* — duplicate rate, cluster geometry and sessions-
  * per-user stay constant as the corpus grows, which is the scaling
  * model a real 100 TB crawl follows (more of the same, not K copies
  * of one shard).
  *
  * Naive replication would be wrong in exactly the way that matters
  * here: identical texts across replicas are near-duplicates of each
  * other, so every LSH bucket would hold K copies of every doc and
  * candidate pairs would grow as K² BY CONSTRUCTION — any engine would
  * measure super-linear on such a corpus, and the measurement would
  * say nothing about the engine. The transforms below make replicas
  * mutually dissimilar while preserving each replica's internal
  * similarity structure EXACTLY:
  *
  *   - documents: per-replica vocabulary substitution. Word `w` becomes
  *     `w~r` in replica r > 0 iff `pmod(hash(w), 3) = 0` (a fixed,
  *     content-keyed third of the vocabulary). A bijective substitution
  *     keyed on the word alone preserves every intra-replica word-set
  *     and shingle-set Jaccard bit-for-bit (the planted near-dup pairs
  *     survive with their similarity unchanged), while cross-replica
  *     copies of the same doc keep only ≈ (2/3)ⁿ of their n-gram
  *     shingles — far below every near-dup threshold in the engine.
  *     Tokenization is the engine's own whitespace split
  *     ([[graft.operators.TextAnalysis]] `WordsExpr`), so `w~r` is one
  *     token, not a word plus debris.
  *   - embeddings: per-replica signed coordinate rotation
  *     `out(i) = s(r,i) · in((i + r) mod d)` with `s(r,i) = ±1` keyed
  *     on `hash(r, i)`. A permutation composed with a diagonal ±1 is
  *     orthogonal: norms and all intra-replica dot products are
  *     preserved exactly (cluster geometry, IVF cell balance, planted
  *     neighbor pairs), while cross-replica cosines decorrelate to
  *     noise. `label` is kept, so label-conditioned queries scale too.
  *   - events: id/user offsets only (`event_id`, `user_id` shifted by
  *     replica × stride); timestamps, types, values untouched. New
  *     users with the same per-user event histories — sessions per
  *     user and dupes per window stay constant, the user count grows.
  *
  * Replica 0 is the source data verbatim (ids included), so the scaled
  * corpus strictly contains the original. The remaining seven tables
  * are symlinked from the source dir — the scaled tiers only read the
  * three scaled tables, and the symlinks keep `Tables.registerAll`
  * working against the generated dir.
  *
  * Usage: `ScaleGen <srcSfDir> <outDir> <replicas>`
  */
object ScaleGen {

  /** documents replica r: ids offset, a content-keyed third of the
    * vocabulary suffixed `~r`, n_chars recomputed from the new text.
    */
  private[graft] def scaleDocuments(docs: DataFrame, replicas: Int, stride: Long): DataFrame = {
    val reps = docs.sparkSession.range(0, replicas).select(col("id").as("r"))
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("r") * lit(stride)).as("doc_id"),
        when(col("r") === 0, col("text")).otherwise(
          expr("""array_join(transform(filter(split(trim(text), '\\s+'), x -> x != ''),
                 |  w -> IF(pmod(hash(w), 3) = 0, concat(w, '~', r), w)), ' ')""".stripMargin))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** embeddings replica r: ids offset, signed coordinate rotation
    * (orthogonal per replica — intra-replica geometry exact).
    */
  private[graft] def scaleEmbeddings(emb: DataFrame, replicas: Int, stride: Long): DataFrame = {
    val reps = emb.sparkSession.range(0, replicas).select(col("id").as("r"))
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("r") * lit(stride)).as("vec_id"),
        expr("""transform(sequence(0, size(embedding) - 1),
               |  i -> CAST(element_at(embedding, CAST(pmod(i + r, size(embedding)) AS INT) + 1)
               |            * IF(pmod(hash(r, i), 2) = 0, 1.0, -1.0) AS FLOAT))""".stripMargin)
          .as("embedding"),
        col("label"))
  }

  /** events replica r: event/user ids offset, everything else verbatim. */
  private[graft] def scaleEvents(events: DataFrame, replicas: Int,
                                 idStride: Long, userStride: Long): DataFrame = {
    val reps = events.sparkSession.range(0, replicas).select(col("id").as("r"))
    events.crossJoin(broadcast(reps))
      .select(
        (col("event_id") + col("r") * lit(idStride)).as("event_id"),
        col("ts"),
        (col("user_id") + col("r") * lit(userStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  /** next power of ten above the max id — keeps scaled ids readable
    * (replica = leading digits) and collision-free by construction.
    */
  private[graft] def stride(df: DataFrame, idCol: String): Long = {
    val r = df.agg(max(idCol)).head
    val m = if (r.isNullAt(0)) 0L else r.getLong(0)
    var s = 1L
    while (s <= m) s *= 10
    s
  }

  def generate(spark: SparkSession, srcDir: String, outDir: String, replicas: Int): Unit = {
    import graft.sources.Tables
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)

    val docs = Tables.load(spark, srcDir, "documents")
    scaleDocuments(docs, replicas, stride(docs, "doc_id"))
      .repartition(math.max(2, replicas / 2))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = Tables.load(spark, srcDir, "embeddings")
    scaleEmbeddings(emb, replicas, stride(emb, "vec_id"))
      .repartition(math.max(2, replicas / 2))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    val ev = Tables.load(spark, srcDir, "events")
    scaleEvents(ev, replicas, stride(ev, "event_id"), stride(ev, "user_id"))
      .repartition(math.max(2, replicas))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // the un-scaled relational tables ride along as symlinks so the
    // generated dir is a complete sf layout
    for (t <- Tables.names if !Set("documents", "embeddings", "events").contains(t)) {
      val link = out.resolve(s"$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(srcDir, s"$t.parquet"))
    }
  }

  /** orders replica r: order keys offset; the customer/status/price/
    * date/priority columns ride verbatim — the same customers place K×
    * the orders, which is the bounded-dims growth model the engine's
    * 100 TB posture assumes (dims broadcastable, facts grow).
    */
  private[graft] def scaleOrders(orders: DataFrame, replicas: Int, stride: Long): DataFrame = {
    val reps = orders.sparkSession.range(0, replicas).select(col("id").as("r"))
    orders.crossJoin(broadcast(reps))
      .select(
        (col("o_orderkey") + col("r") * lit(stride)).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** lineitem replica r: l_orderkey offset by the SAME stride as
    * orders, so each replica's lines follow their replica's order and
    * the order ⋈ lineitem join stays bijective per replica; part/
    * supplier keys, quantities, prices, dates ride verbatim (per-order
    * line shape — and so q192's Σqty-per-order distribution — is
    * preserved exactly at every scale).
    */
  private[graft] def scaleLineitem(li: DataFrame, replicas: Int, orderStride: Long): DataFrame = {
    val reps = li.sparkSession.range(0, replicas).select(col("id").as("r"))
    li.crossJoin(broadcast(reps))
      .select(
        (col("l_orderkey") + col("r") * lit(orderStride)).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
  }

  /** Facts mode: scale the TPC-H fact tables (orders + lineitem) and
    * symlink everything else — the decade measurement for the
    * relational tier, whose queries the corpus-mode run reads as flat
    * (its facts are symlinked there). Replica 0 is the source verbatim,
    * so the scaled facts strictly contain the original.
    */
  def generateFacts(spark: SparkSession, srcDir: String, outDir: String, replicas: Int): Unit = {
    import graft.sources.Tables
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)

    val ord = Tables.load(spark, srcDir, "orders")
    val orderStride = stride(ord, "o_orderkey")
    scaleOrders(ord, replicas, orderStride)
      .repartition(math.max(2, replicas / 2))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    val li = Tables.load(spark, srcDir, "lineitem")
    scaleLineitem(li, replicas, orderStride)
      .repartition(math.max(2, replicas))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    for (t <- Tables.names if !Set("orders", "lineitem").contains(t)) {
      val link = out.resolve(s"$t.parquet")
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(srcDir, s"$t.parquet"))
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || (args.length == 4 && args(3) == "facts"),
      "usage: ScaleGen <srcSfDir> <outDir> <replicas> [facts]")
    val spark = Graft.session(appName = "graft-scalegen")
    if (args.length == 4) generateFacts(spark, args(0), args(1), args(2).toInt)
    else generate(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }
}
