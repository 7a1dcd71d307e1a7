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
    if (name == "runs_probe") {
      // size the sharedRuns pipeline stages at SPARK_GRAFT_SF_DIR:
      // Scratch runs_probe <minRun>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val minRun = args.lift(1).map(_.toLong).getOrElse(10L)
      val n = 3
      val w = (minRun - n + 1).toInt
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val ps = graft.operators.Dedup.positionalShingles(docs, n)
      val occ = ps.groupBy("gh").agg(count(lit(1)).as("_occ"))
      val rare = occ.filter(col("_occ") <= 1000L).select("gh")
      val kept = ps.join(rare, "gh").cache()
      println(s"PROBE kept=${kept.count()}")
      val t0 = System.nanoTime()
      val m = kept.as("a").join(kept.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id")).count()
      println(f"PROBE matches=$m t=${(System.nanoTime()-t0)/1e9}%.1f s")
      val amin = Window.partitionBy("doc_id").orderBy("pos").rangeBetween(0, w - 1)
      val anchors = kept.withColumn("am", min(struct(col("gh"), col("pos"))).over(amin))
        .select(col("doc_id"), col("am.gh").as("gh"), col("am.pos").as("pos")).distinct().cache()
      println(s"PROBE anchors(w=$w)=${anchors.count()}")
      val t1 = System.nanoTime()
      val am = anchors.as("a").join(anchors.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          (col("a.pos") - col("b.pos")).as("diag"))
      val amc = am.count()
      val cd = am.distinct().count()
      val cp = am.select("i", "j").distinct().count()
      println(f"PROBE anchor_matches=$amc cand_diag=$cd cand_pairs=$cp t=${(System.nanoTime()-t1)/1e9}%.1f s")
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, dir)
    if (args.contains("show")) { df.show(50, truncate = false); spark.stop(); return }
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
