package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Laws for the multi-iteration BPE trainer (q223/q230): the
  * wrapped-string merge application must reproduce textbook BPE's
  * left-to-right non-overlapping rewrite, training must follow the
  * q101 tie order, and the stored artifact must equal a from-scratch
  * retrain (the stored ≡ recomputed law the DuckDB oracle also gates).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "en", t) }
      .toDF("doc_id", "lang", "text")
  }

  private def states(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(2)).toMap

  test("initState wraps each character; rejects delimiter-bearing words") {
    val st = states(Bpe.initState(Bpe.wordFreqs(docs("ab a"))))
    assert(st == Map("ab" -> "|a||b|", "a" -> "|a|"))
    val ex = intercept[IllegalArgumentException] {
      Bpe.initState(Bpe.wordFreqs(docs("ok b|d")))
    }
    assert(ex.getMessage.contains("delimiter"))
  }

  test("applyMerge: left-to-right non-overlapping, boundary-safe") {
    val st0 = Bpe.initState(Bpe.wordFreqs(docs("aaa aaaa xa ab")))
    val st = states(Bpe.applyMerge(st0, "a", "a"))
    // runs merge greedily left-to-right: aaa -> [aa, a], aaaa -> [aa, aa]
    assert(st("aaa") == "|aa||a|")
    assert(st("aaaa") == "|aa||aa|")
    // no mid-token or prefix false matches
    assert(st("xa") == "|x||a|")
    assert(st("ab") == "|a||b|")
    // a merged symbol can merge again in a later iteration
    val st2 = states(Bpe.applyMerge(Bpe.applyMerge(st0, "a", "a"), "aa", "aa"))
    assert(st2("aaaa") == "|aaaa|")
    assert(st2("aaa") == "|aa||a|")
  }

  test("train: argmax per step under the q101 tie order; merged symbols re-merge") {
    // freqs: ab x3, ac x1 -> step 1 merges (a,b) count 3; step 2 (a,c)
    val m = Bpe.train(docs("ab ab ac", "ab"), nMerges = 2)
    assert(m == Seq(Bpe.Merge(1L, "a", "b", "ab", 3L),
      Bpe.Merge(2L, "a", "c", "ac", 1L)))
    // tie on count breaks (left, right) asc: (a,b) vs (b,a) both x2
    val t = Bpe.train(docs("ab ba"), nMerges = 1)
    assert(t == Seq(Bpe.Merge(1L, "a", "b", "ab", 1L)))
  }

  test("train fails loudly when pairs exhaust before nMerges") {
    val ex = intercept[IllegalArgumentException] {
      Bpe.train(docs("ab ab"), nMerges = 2) // step 1 fuses the only word
    }
    assert(ex.getMessage.contains("exhausted"))
  }

  test("stored artifact round-trips: write/loadMerges == retrain") {
    val df = docs("abc abd abc cd", "abc cd cd")
    val trained = Bpe.train(df, nMerges = 3)
    val dir = java.nio.file.Files.createTempDirectory("bpe_spec_").toString
    try {
      Bpe.write(df, nMerges = 3, dir)
      assert(Bpe.loadMerges(spark, dir) ==
        trained.map(m => (m.left, m.right)))
      val stored = Bpe.loadMergesDF(spark, dir).orderBy("step").collect()
        .map(r => Bpe.Merge(r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(stored == trained)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("tokenCounts + fertility: hand-checked under a trained merge list") {
    val df = docs("ab ab c", "ab")
    // one merge (a,b): ab -> 1 token, c -> 1 token
    val tc = Bpe.tokenCounts(df, Seq(("a", "b"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tc == Map("ab" -> (3L, 1L), "c" -> (1L, 1L)))
    // 4 ws tokens, 4 bpe tokens -> fertility exactly 1e6
    val f = Bpe.fertility(df, Seq(("a", "b"))).collect()
    assert(f.length == 1)
    assert((f(0).getString(0), f(0).getLong(1), f(0).getLong(2),
      f(0).getLong(3)) == ("en", 4L, 4L, 1000000L))
    // with NO merges every char is a token: 1+1+... ab=2 chars x3 + c=1
    val f0 = Bpe.fertility(df, Seq.empty).collect()
    assert((f0(0).getLong(1), f0(0).getLong(2), f0(0).getLong(3)) ==
      (4L, 7L, 1750000L))
  }
}
