package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks one test JVM). */
object TestSpark {
  lazy val spark: SparkSession =
    Graft.session(master = "local[4]", shufflePartitions = 4, appName = "graft-test")

  val Sf0001 = "/root/testdata/sf0.001"

  /** Path of a test resource on disk. */
  def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  /** Execute (intended for small inputs) and return the FINAL AQE
    * physical plan text — the string form appends the pre-AQE
    * "Initial Plan", which must not be graded.
    */
  def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }
}
