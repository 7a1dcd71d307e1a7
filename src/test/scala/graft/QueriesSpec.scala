package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5.2): every declared query runs at sf0.001 and
  * returns a sane frame; the word count reproduces known shape.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.Sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q01 word count is ordered by count desc") {
    val counts = SparkEntry.queries("q01_word_count")(spark, TestSpark.Sf0001)
      .select("cnt").collect().map(_.getLong(0))
    assert(counts.nonEmpty && counts.sameElements(counts.sortBy(-_)))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
