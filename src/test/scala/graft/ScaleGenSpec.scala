package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ScaleGen]]'s contract: the K×-scaled corpus keeps the workload's
  * shape — replica 0 verbatim, intra-replica similarity structure
  * EXACTLY preserved (texts via bijective vocabulary substitution,
  * embeddings via an orthogonal transform), cross-replica similarity
  * destroyed, per-user event histories constant. These are the
  * invariants that make a [[ScaleBench]] exponent about the engine and
  * not about the corpus construction.
  */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scalegen-test")
    ScaleGen.generate(spark, TestSpark.Sf0001, d.toString, replicas = 3)
    d.toString
  }

  private def src(t: String) = graft.sources.Tables.load(spark, TestSpark.Sf0001, t)
  private def gen(t: String) = graft.sources.Tables.load(spark, outDir, t)

  test("documents: 3x rows, distinct ids, replica 0 verbatim") {
    val s = src("documents")
    val g = gen("documents")
    assert(g.count() === 3 * s.count())
    assert(g.select("doc_id").distinct().count() === g.count())
    // replica 0 = ids below the stride = the source rows, text included
    val stride = ScaleGen.stride(s, "doc_id")
    assert(g.filter(col("doc_id") < stride).exceptAll(s).isEmpty)
    assert(s.exceptAll(g.filter(col("doc_id") < stride)).isEmpty)
  }

  test("documents: intra-replica word-set Jaccard preserved exactly; cross-replica destroyed") {
    val s = src("documents")
    val stride = ScaleGen.stride(s, "doc_id")
    val words = gen("documents").select(col("doc_id"),
      array_distinct(expr("filter(split(trim(text), '\\\\s+'), x -> x != '')")).as("ws"))

    def jaccards(aOff: Long, bOff: Long) = words.as("a").join(words.as("b"),
        col("a.doc_id") + lit(bOff - aOff) === col("b.doc_id"))
      .filter(col("a.doc_id") >= aOff && col("a.doc_id") < aOff + stride / 3)
      .select(col("a.doc_id").as("id"),
        (size(array_intersect(col("a.ws"), col("b.ws"))).cast("double") /
          size(array_union(col("a.ws"), col("b.ws")))).as("j"))

    // within replica 1, consecutive-doc Jaccard must equal replica 0's
    // (bijective substitution keyed on the word alone)
    val r0 = words.filter(col("doc_id") < stride)
    val r1 = words.filter(col("doc_id") >= stride && col("doc_id") < 2 * stride)
    def pairJ(df: org.apache.spark.sql.DataFrame, off: Long) = df.as("a")
      .join(df.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select((col("a.doc_id") - off).as("id"),
        (size(array_intersect(col("a.ws"), col("b.ws"))).cast("double") /
          size(array_union(col("a.ws"), col("b.ws")))).as("j"))
    val drift = pairJ(r0, 0).as("x").join(pairJ(r1, stride).as("y"), "id")
      .select(abs(col("x.j") - col("y.j")).as("d")).agg(max("d")).head.getDouble(0)
    assert(drift === 0.0, "intra-replica Jaccard must be bit-identical across replicas")

    // the same doc across replicas keeps only ~half its word set
    val cross = jaccards(0, stride).agg(avg("j"), max("j")).head
    assert(cross.getDouble(0) < 0.62, s"mean cross-replica Jaccard ${cross.getDouble(0)}")
  }

  test("embeddings: 3x rows, norms and intra-replica dot products preserved") {
    val s = src("embeddings")
    val g = gen("embeddings")
    assert(g.count() === 3 * s.count())
    val stride = ScaleGen.stride(s, "vec_id")
    val dots = g.select(col("vec_id"), col("embedding"))
      .as("a").join(g.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"),
        expr("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x * y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("dot"))
    val r0 = dots.filter(col("vec_id") < stride - 1)
    val r1 = dots.filter(col("vec_id") >= stride && col("vec_id") < 2 * stride - 1)
      .withColumn("vec_id", col("vec_id") - stride)
    val drift = r0.as("x").join(r1.as("y"), "vec_id")
      .select(abs(col("x.dot") - col("y.dot")).as("d")).agg(max("d")).head.getDouble(0)
    // same float products, summed in rotated order — float-add jitter only
    assert(drift < 1e-4, s"intra-replica dot drift $drift")
    // cross-replica: the same vector decorrelates against its own image
    val cross = g.as("a").join(g.as("b"), col("a.vec_id") + lit(stride) === col("b.vec_id"))
      .select(expr("abs(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x * y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))").as("xdot"),
        expr("aggregate(transform(a.embedding, x -> CAST(x * x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("n2"))
    val Array(mx, mn) = cross.agg(avg(col("xdot") / col("n2")), avg("n2")).head
      .toSeq.map(_.asInstanceOf[Double]).toArray
    assert(mx < 0.3, s"mean |cos| of a vector vs its replica image $mx (norm² $mn)")
  }

  test("events: 3x rows, 3x users, per-user history shape exactly constant") {
    val s = src("events")
    val g = gen("events")
    assert(g.count() === 3 * s.count())
    assert(g.select("user_id").distinct().count() === 3 * s.select("user_id").distinct().count())
    // count-of-counts: the events-per-user histogram scales by exactly 3
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(count(lit(1)).as("n"))
        .groupBy("n").agg(count(lit(1)).as("users"))
    val diff = hist(s).withColumn("users", col("users") * 3)
      .exceptAll(hist(g)).count()
    assert(diff === 0L)
  }

  test("facts mode: 3x orders/lineitem, replica 0 verbatim, per-order basket shape constant, no orphan lines") {
    val d = java.nio.file.Files.createTempDirectory("graft-scalegen-facts")
    ScaleGen.generateFacts(spark, TestSpark.Sf0001, d.toString, replicas = 3)
    def fgen(t: String) = graft.sources.Tables.load(spark, d.toString, t)
    val (so, sl) = (src("orders"), src("lineitem"))
    val (go, gl) = (fgen("orders"), fgen("lineitem"))
    assert(go.count() === 3 * so.count())
    assert(gl.count() === 3 * sl.count())
    assert(go.select("o_orderkey").distinct().count() === go.count())
    // replica 0 = keys below the stride = the source rows verbatim
    val stride = ScaleGen.stride(so, "o_orderkey")
    assert(go.filter(col("o_orderkey") < stride).exceptAll(so).isEmpty)
    assert(gl.filter(col("l_orderkey") < stride).exceptAll(sl).isEmpty)
    // the orders ⋈ lineitem join stays total: no orphan lines
    assert(gl.join(go, gl("l_orderkey") === go("o_orderkey"), "left_anti")
      .isEmpty)
    // lines-per-order histogram scales by exactly 3 (q192's Σqty
    // distribution is a function of it)
    def hist(df: org.apache.spark.sql.DataFrame, k: String) =
      df.groupBy(col(k)).agg(count(lit(1)).as("n"))
        .groupBy("n").agg(count(lit(1)).as("orders"))
    assert(hist(sl, "l_orderkey").withColumn("orders", col("orders") * 3)
      .exceptAll(hist(gl, "l_orderkey")).isEmpty)
    // dims ride as symlinks: the scaled dir is a complete sf layout
    assert(fgen("customer").count() === src("customer").count())
  }
}
