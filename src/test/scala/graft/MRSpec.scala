package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.MR

/** The MR facade laws (SURVEY.md §5.2 t3): emit multiplicity is preserved
  * through the shuffle, every key is reduced exactly once with all its
  * values, the custom-partitioner path agrees with the Catalyst path, and
  * the default partitioner is bit-compatible with the reference's djb2
  * (reference src/mapreduce.c:129-138).
  */
object MRSpec {
  // Top-level object members: lambdas referencing them don't capture the
  // (non-serializable) suite instance.
  def tokenize(line: String): Seq[(String, Int)] =
    line.split("\\s+").toIndexedSeq.filter(_.nonEmpty).map(w => (w, 1))

  def countReducer(k: String, vs: Iterator[Int]): (String, Long) = (k, vs.size.toLong)

  def tokenizeBytes(line: String): Seq[(Array[Byte], Int)] =
    line.split("\\s+").toIndexedSeq.filter(_.nonEmpty)
      .map(w => (w.getBytes(java.nio.charset.StandardCharsets.UTF_8), 1))

  def bytesCountReducer(k: Array[Byte], vs: Iterator[Int]): (String, Long) =
    (new String(k, java.nio.charset.StandardCharsets.UTF_8), vs.size.toLong)
}

class MRSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import MRSpec._

  val expectedCounts = Map(
    "Hello" -> 2L, "hello" -> 1L, "world" -> 1L, "the" -> 1L, "quick" -> 1L,
    "brown" -> 1L, "fox." -> 1L, "The" -> 1L, "fox!" -> 1L,
    "trailing" -> 1L, "space" -> 1L)

  test("word count over the fixture matches hand-computed counts") {
    val got = MR.run[String, Int, (String, Long)](
      spark, Seq(TestSpark.resource("words.txt")),
      tokenize, countReducer, numPartitions = 4)
      .collect().toMap
    assert(got == expectedCounts)
  }

  test("custom-partitioner path (djb2) agrees with the Catalyst path") {
    val lines = spark.read.textFile(TestSpark.resource("words.txt"))
    val viaCustom = MR.runOnDataset[String, Int, (String, Long)](
      lines, tokenize, countReducer, 4,
      partitioner = Some(MR.defaultHashPartition(_, 4)))
      .collect().toMap
    assert(viaCustom == expectedCounts)
  }

  test("runFold (partial aggregation) agrees with grouped reduce") {
    val lines = spark.read.textFile(TestSpark.resource("words.txt"))
    val viaFold = MR.runFold[String, Int](lines, tokenize, _ + _)
      .collect().toMap.map { case (k, v) => (k, v.toLong) }
    assert(viaFold == expectedCounts)
  }

  test("multiplicity law: total reduced count == number of emitted pairs (ScalaCheck)") {
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "x1", "Y_2", "z.z"))
    val prop = Prop.forAll(wordGen) { words =>
      val lines = spark.createDataset(words.grouped(3).map(_.mkString(" ")).toSeq)
      val total = MR.runOnDataset[String, Int, (String, Long)](
        lines, tokenize, countReducer, 4)
        .collect().map(_._2).sum
      total == words.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("partition law: custom partitioner co-locates by hash mod n") {
    val gen = Gen.listOfN(50, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val prop = Prop.forAll(gen) { words =>
      words.isEmpty || {
        val lines = spark.createDataset(words.grouped(5).map(_.mkString(" ")).toSeq)
        // reducer returns (key, partition-consistency marker): every
        // value of a key must be seen in one reduce call
        val got = MR.runOnDataset[String, Int, (String, Long)](
          lines, tokenize, countReducer, 3,
          partitioner = Some(MR.defaultHashPartition(_, 3)))
          .collect().groupBy(_._1)
        got.forall { case (_, rows) => rows.length == 1 } &&
          got.view.mapValues(_.head._2).toMap ==
            words.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("djb2 reference parity, including keys that overflow 64 bits") {
    assert(MR.defaultHashPartition("", 1000000) == 5381 % 1000000)
    assert(MR.defaultHashPartition("a", 1000000) == 177670 % 1000000)
    // independent model of the reference's unsigned-64 accumulate + mod
    // (mapreduce.c:129-138): BigInt with explicit 2^64 wraparound over
    // the key's UTF-8 bytes as SIGNED chars (the reference's x86-64
    // Linux `char` sign-extends bytes >= 0x80 into the accumulator)
    val two64 = BigInt(1) << 64
    def ref(key: String, n: Int): Int = {
      var h = BigInt(5381)
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => h = (h * 33 + b).mod(two64))
      (h % n).toInt
    }
    val keys = Seq("hello", "hello world", "the quick brown fox jumps over the lazy dog",
      "supercalifragilisticexpialidocious", "aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      // non-ASCII: multi-byte UTF-8 with sign-extending high bytes — the
      // case the old UTF-16 code-unit fold diverged on
      "héllo wörld", "日本語テキスト", "naïve café", "Ω≈ç√∫ß", "😀ok")
    for (k <- keys; n <- Seq(3, 7, 26, 1000)) {
      // the longer keys (12+ chars) wrap 64 bits with the top bit set,
      // exercising the unsigned-remainder path; the short ones pin the
      // non-overflow agreement
      assert(MR.defaultHashPartition(k, n) == ref(k, n), s"key=$k n=$n")
    }
    // explicit sign-bit check: the 28-a key's djb2 value must be
    // "negative" as a signed Long or the test isn't covering unsigned mod
    assert({
      var h = 5381L
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaa".foreach(c => h = h * 33 + c.toInt)
      h < 0
    }, "test corpus no longer exercises the unsigned-remainder branch")
  }

  test("Array[Byte] keys group by VALUE equality on both reduce paths") {
    // regression: groupedRuns used Scala == (reference equality for JVM
    // arrays) — each BINARY-keyed row became its own run, one output per
    // row instead of per key, on both the default and user-partitioner
    // paths
    val lines = spark.read.textFile(TestSpark.resource("words.txt"))
    val viaDefault = MR.runOnDataset[Array[Byte], Int, (String, Long)](
      lines, tokenizeBytes, bytesCountReducer, 4).collect().toMap
    assert(viaDefault == expectedCounts)
    val viaCustom = MR.runOnDataset[Array[Byte], Int, (String, Long)](
      lines, tokenizeBytes, bytesCountReducer, 4,
      partitioner = Some(k => MR.defaultHashPartition(
        new String(k, java.nio.charset.StandardCharsets.UTF_8), 4)))
      .collect().toMap
    assert(viaCustom == expectedCounts)
  }

  test("groupedRuns: array keys delimit runs by content") {
    val sorted = Seq(
      (Array[Byte](1, 2), "a"), (Array[Byte](1, 2), "b"), (Array[Byte](3), "c"))
    val runs = MR.groupedRuns(sorted.iterator)
      .map { case (k, vs) => (k.toSeq, vs.toSeq) }.toSeq
    assert(runs == Seq((Seq[Byte](1, 2), Seq("a", "b")), (Seq[Byte](3), Seq("c"))))
  }

  test("groupedRuns: runs reconstruct the sorted input; partial consumption is safe") {
    val sorted = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5), ("c", 6))
    val rebuilt = MR.groupedRuns(sorted.iterator)
      .flatMap { case (k, vs) => vs.map((k, _)) }.toSeq
    assert(rebuilt == sorted)
    // consume only the key, never the values — next run must still be correct
    val keys = MR.groupedRuns(sorted.iterator).map(_._1).toSeq
    assert(keys == Seq("a", "b", "c"))
  }
}
