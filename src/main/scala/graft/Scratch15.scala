package graft

/** Throwaway measurement harness (never in any gate; deleted at round end). */
object Scratch15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Graft.session(appName = "graft-scratch")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val d = df
      d.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      println(f"[scratch] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val b = graft.operators.Similarity.signLshBuckets(emb, 16, 12, 64)
    println(b.queryExecution.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    time("signLshBuckets 16x12")(
      graft.operators.Similarity.signLshBuckets(emb, 16, 12, 64))
    time("signLshBuckets 16x8")(
      graft.operators.Similarity.signLshBuckets(emb, 16, 8, 64))
    spark.stop()
  }
}
