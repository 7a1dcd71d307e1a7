package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** t3 properties for the dedup/similarity tier (SURVEY.md §5.2):
  * MinHash recall against the exact shingle-Jaccard tier as ground truth,
  * SimHash separating planted near-dups from noise, and sign-LSH recall
  * on planted embedding near-dups.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
  lazy val emb = Tables.load(spark, TestSpark.Sf0001, "embeddings")

  test("exact tier: fingerprint groups partition the corpus") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.map(_.getLong(1)).sum == docs.count())
  }

  test("minhash LSH recall == 1.0 vs exact n-gram Jaccard at 0.8 (planted dups)") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = Dedup.minhashPairs(docs, 3, 16, 4, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dup pairs")
    assert(viaLsh == exact,
      s"missed: ${exact -- viaLsh}, spurious: ${viaLsh -- exact}")
  }

  test("simhash separates planted near-dups (<=10 bits) from noise") {
    val nearDups = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simPairs = Dedup.simhashPairs(docs, maxHamming = 10)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all planted near-dups are within 10 bits
    assert((nearDups -- simPairs).isEmpty, s"simhash missed: ${nearDups -- simPairs}")
  }

  test("sign-LSH finds planted embedding near-duplicates") {
    // plant: perturb 20 vectors slightly (cos ≈ 1), offset ids by 100000
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("transform(embedding, x -> cast(x * 1.01 + 0.001 as float))").as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(planted)
    val found = Similarity.lshCosinePairs(corpus, threshold = 0.95, tables = 8, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 20L).map(i => (i, i + 100000)).toSet
    val recall = expected.count(found.contains).toDouble / expected.size
    assert(recall >= 0.9, s"recall $recall, found ${found.size} pairs")
    // precision: every returned pair really has cos >= 0.95 (verified path)
    val exact = Similarity.cosinePairs(corpus, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.subsetOf(exact))
  }

  test("brute-force topk rank-1 equals scala-side argmax") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val top1 = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 5L).foreach { q =>
      val expected = vecs.keys.filter(_ != q)
        .maxBy(n => (math.rint(cos(vecs(q), vecs(n)) * 1e6), -n))
      assert(top1(q) == expected, s"query $q")
    }
  }
}
