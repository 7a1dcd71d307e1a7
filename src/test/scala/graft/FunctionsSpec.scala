package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.array_dot
import graft.operators.Similarity
import graft.sources.Tables

/** Native-expression tier tests: the codegen'd ArrayDot agrees with the
  * built-in higher-order-function rendering on both float and double
  * arrays, propagates nulls, resolves by name through the
  * SparkSessionExtensions registration, and the LSH dimensionality
  * guard fails loudly on misconfigured vectors (never silent truncation).
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("array_dot parity with aggregate(zip_with(...)) on double arrays") {
    val df = spark.range(0, 100).selectExpr(
      "id",
      "transform(sequence(0, 63), k -> cast(hash(id, k) % 1000 as double) / 100.0) as a",
      "transform(sequence(0, 63), k -> cast(hash(k, id) % 1000 as double) / 100.0) as b")
    val got = df.select(
      array_dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)").as("hof"))
    assert(got.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("array_dot widens float arrays identically to cast-then-dot") {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val got = emb.select(
      array_dot(col("embedding"), col("embedding")).as("fast"),
      expr("""aggregate(zip_with(transform(embedding, x -> cast(x as double)),
             |                  transform(embedding, x -> cast(x as double)),
             |                  (x, y) -> x * y), 0D, (acc, v) -> acc + v)""".stripMargin).as("hof"))
    assert(got.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("array_dot is resolvable from SQL text and propagates nulls") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(3.0, 4.0)))).toDF("a", "b")
    df.createOrReplaceTempView("arr_dot_in")
    val rows = spark.sql("SELECT graft_array_dot(a, b) AS d FROM arr_dot_in ORDER BY d")
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 11.0)
  }

  test("array_dot returns NULL on length mismatch, like zip_with+aggregate") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(
      array_dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        .as("hof")).head()
    // a truncated partial sum would dress a dimension bug up as a score
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("array_dot rejects non-numeric-array inputs at analysis") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_array_dot(array('x'), array('y'))").collect()
    }
    assert(err.getMessage.contains("graft_array_dot"))
  }

  test("signLshBuckets fails loudly when vectors exceed the configured dim") {
    val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings") // dim 64
    val err = intercept[Exception] {
      Similarity.signLshBuckets(emb, tables = 2, bits = 2, dim = 32).collect()
    }
    assert(err.getMessage.contains("configured dim 32"),
      s"expected the raise_error dim message, got: ${err.getMessage}")
  }

  test("graft_h60 equals the builtin conv(substr(md5)) chain on adversarial strings") {
    import spark.implicits._
    val crafted = Seq(
      "", " ", "a", "hello world", "\ttab\nnewline",
      "ünïcödé 中文 🎉", "\\back\\slash'quote\"dq",
      "x" * 10000,                  // long input
      "ws_0", "cms_3_the", "bloom_1_deadbeef" // real call-site shapes
    ).toDF("s")
    val corpus = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("text").as("s"))
    for (df <- Seq(crafted, corpus)) {
      val mismatch = df.select(
          expr("graft_h60(s)").as("native"),
          expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").as("chain"))
        .filter(col("native") =!= col("chain") ||
          col("native") < 0 || col("native") >= (1L << 60))
      assert(mismatch.isEmpty,
        s"native h60 diverged: ${mismatch.limit(3).collect().mkString}")
    }
    // null propagates; non-string inputs fail at analysis
    assert(crafted.select(expr("graft_h60(cast(null as string))"))
      .head.isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      crafted.select(expr("graft_h60(42)")).collect()
    }
  }

  test("planeComponent matches the documented md5 derivation") {
    // independently recompute one component the long way
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("3_1_7".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    assert(Similarity.planeComponent(3, 1, 7) == ((h % 2001) - 1000) / 1000.0)
    // and the whole family stays inside [-1, 1]
    assert((0 until 8).flatMap(t => (0 until 4).map(p =>
      Similarity.planeComponent(t, p, 0))).forall(r => r >= -1.0 && r <= 1.0))
  }
}
