package graft

// Throwaway profiling harness — not part of the engine surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val name = args.headOption.getOrElse("q27_dedup_minhash")
    if (name == "sharedruns_cap") {
      // A/B the stop-gram cap on sharedRuns over SPARK_GRAFT_SF_DIR:
      // Scratch sharedruns_cap <maxPostings> [runs]
      val cap = args.lift(1).map(_.toLong).getOrElse(
        sys.error("usage: Scratch sharedruns_cap <maxPostings> [runs]"))
      val runs = args.lift(2).map(_.toInt).getOrElse(3)
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Dedup.sharedRuns(docs, 3, 15L, cap)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        graft.operators.Ckpt.releaseGraftStorage(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SHAREDRUNS cap=$cap dir=$dir times=${times.map(t => f"$t%.2f").mkString(" ")}")
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, dir)
    if (args.contains("explain")) df.explain("formatted")
    if (args.contains("bnlj")) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val fin = plan.split("== Initial Plan ==").head
      println(s"PLANCHECK $name BNLJ=${fin.contains("BroadcastNestedLoopJoin")} CART=${fin.contains("CartesianProduct")}")
      if (fin.contains("BroadcastNestedLoopJoin") || fin.contains("CartesianProduct"))
        println(fin)
    } else {
      val runs = if (args.contains("warm")) 4 else 1
      val times = (1 to runs).map { _ =>
        // construction inside the timer — iterative operators and eager
        // checkpoints do real work before the final write (Bench times
        // the same way)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMED $name ${times.last}%.2f s  (all: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
