package graft

import org.apache.spark.scheduler._

/** Throwaway measurement harness for optimization experiments (never in
  * any gate; deleted at round end). Prints per-job wall time + driver
  * gaps for one warm query execution.
  */
object Scratch15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Graft.session(appName = "graft-scratch")
    @volatile var t0 = System.nanoTime()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val now = System.nanoTime()
        val gap = (now - t0) / 1e6
        starts.put(js.jobId, now)
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        println(f"[job ${js.jobId}%3d] gap ${gap}%7.1fms nTasks=${js.stageInfos.map(_.numTasks).sum}%d $d")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val now = System.nanoTime()
        t0 = now
        val dur = (now - starts.getOrDefault(je.jobId, now)) / 1e6
        println(f"[job ${je.jobId}%3d] ran ${dur}%7.1fms")
      }
    })
    val fn = SparkEntry.queries(name)
    Bench.timeOnce(spark, sfDir, fn) // warm-up
    println("=== timed run ===")
    t0 = System.nanoTime()
    val t = Bench.timeOnce(spark, sfDir, fn)
    println(f"[total] ${t}%.3fs")
    spark.stop()
  }
}
