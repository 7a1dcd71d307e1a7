package graft

import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end pipeline driver's two laws (VERDICT r8 ask #3): the
  * final stored manifest equals the q66 gated query, and a mid-chain
  * restart re-executes exactly the unfinished stages — committed
  * artifacts are never recomputed.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("manifest ≡ q66; restart resumes without recomputing finished stages") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    def marker(stage: String) = java.nio.file.Paths.get(dir, "_done", stage)
    try {
      // cold run executes every stage in dependency order
      assert(Pipeline.run(spark, TestSpark.Sf0001, dir) == Pipeline.StageNames)
      def manifest() = spark.read.parquet(s"$dir/manifest")
        .orderBy("doc_id").collect().toSeq
      val expect = SparkEntry.queries("q66_training_manifest")(
        spark, TestSpark.Sf0001).collect().toSeq
      val first = manifest()
      assert(first.nonEmpty && first == expect,
        "stored manifest must equal the gated q66 composition")

      // clean restart: everything committed, nothing reruns
      assert(Pipeline.run(spark, TestSpark.Sf0001, dir).isEmpty)

      // crash during 'semantic': its marker (and everything after it)
      // never landed — the rerun executes exactly those stages and
      // leaves curation/split/tokens untouched
      java.nio.file.Files.delete(marker("semantic"))
      java.nio.file.Files.delete(marker("manifest"))
      val curationMtime = java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "curation"))
      assert(Pipeline.run(spark, TestSpark.Sf0001, dir)
        == Seq("semantic", "manifest"))
      assert(java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "curation")) == curationMtime,
        "a committed stage's artifact must not be rewritten on resume")
      assert(manifest() == expect, "resumed chain lands on the identical manifest")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("markers land beside the artifacts under a file:-qualified outDir; foreign provenance reruns") {
    // a Hadoop-qualified URI — java.nio.file.Paths.get would have thrown
    // on it, and on hdfs://-s3a:// the old marker I/O landed on the
    // driver's local disk; the fix resolves the FileSystem FROM outDir
    val raw = java.nio.file.Files.createTempDirectory("graft_pipeline_fs")
    val dir = "file:" + raw.toString
    try {
      assert(Pipeline.run(spark, TestSpark.Sf0001, dir) == Pipeline.StageNames)
      for (s <- Pipeline.StageNames)
        assert(java.nio.file.Files.exists(raw.resolve("_done").resolve(s)),
          s"marker for '$s' must live beside the artifacts")
      assert(Pipeline.run(spark, TestSpark.Sf0001, dir).isEmpty,
        "matching provenance resumes over every stage")
      // same outDir, DIFFERENT input dir: every marker's recorded sfDir
      // mismatches, so nothing stale is served — the full chain reruns
      assert(Pipeline.run(spark, "/root/testdata/sf0.01", dir)
        == Pipeline.StageNames,
        "an sfDir switch must invalidate every committed stage")
      assert(Pipeline.run(spark, "/root/testdata/sf0.01", dir).isEmpty,
        "the rerun re-commits under the new provenance")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(raw.toFile)
    }
  }
}
