package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, RangeJoin, Sessions}

/** ScalaCheck properties for the temporal operators: on arbitrary event
  * sets the bucketed/windowed implementations must agree with their
  * naive quadratic formulations.
  */
class TemporalPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Base = 1704100000000000L // 2024-01-01-ish, µs

  /** (id, ts) rows with timestamps scattered over a few bin widths. */
  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    offs <- Gen.listOfN(n, Gen.choose(0L, 40L * 1000000L))
  } yield offs.zipWithIndex.map { case (o, i) => (i.toLong, Base + o) }

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: band join == naive inequality join on random timestamps") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      val banded = RangeJoin.timeBandPairs(df, "event_id", "ts", windowSeconds = 5L)
        .select("i", "j").orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = for {
        (i, ti) <- rows; (j, tj) <- rows
        if i < j && math.abs(ti - tj) <= 5000000L
      } yield (i, j)
      banded.toSeq == naive.sorted
    })
  }

  test("property: as-of join == per-row argmax on random two-sided data") {
    import spark.implicits._
    check(Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      val left = ls.toDF("id", "us")
        .select(col("id"), lit(1L).as("k"), timestamp_micros(col("us")).as("lts"))
      val right = rs.toDF("rid", "rus")
        .select(col("rid"), lit(1L).as("k"), timestamp_micros(col("rus")).as("rts"))
      val got = AsOf.join(left, right, key = "k", leftTs = "lts", rightTs = "rts",
          payload = Seq("rid"), tiebreak = "rid")
        .select("id", "rid").orderBy("id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
      val expected = ls.sortBy(_._1).map { case (i, ti) =>
        val cands = rs.filter(_._2 <= ti)
        (i, if (cands.isEmpty) None
            else Some(cands.maxBy(c => (c._2, c._1))._1))
      }
      got.toSeq == expected
    })
  }

  test("property: sliced two-pass as-of == plain as-of on random data") {
    import spark.implicits._
    // 7-second slices against a 40-second scatter: some slices hold both
    // sides, some only left rows, some nothing — the carry-forward cases
    val slice: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => floor(unix_micros(t) / 7000000L)
    check(Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      val left = ls.toDF("id", "us")
        .select(col("id"), lit(1L).as("k"), timestamp_micros(col("us")).as("lts"))
      val right = rs.toDF("rid", "rus")
        .select(col("rid"), lit(1L).as("k"), timestamp_micros(col("rus")).as("rts"))
      def run(s: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column]) =
        AsOf.join(left, right, key = "k", leftTs = "lts", rightTs = "rts",
            payload = Seq("rid"), tiebreak = "rid", sliceOf = s)
          .select("id", "rid").orderBy("id")
          .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      run(Some(slice)) == run(None)
    })
  }

  test("property: sessionization islands equal a linear scan reference") {
    import spark.implicits._
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          lit(7L).as("user_id"), lit(1.0).as("value"))
      val got = Sessions.sessionize(df, gapSeconds = 5L)
        .select("session_start_us", "session_end_us", "n_events")
        .orderBy("session_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // reference: sort by (ts, id), split when gap > 5s
      val sorted = rows.sortBy(r => (r._2, r._1))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._2 - acc.head.head._2 > 5000000L) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      val expected = sessions.map(s =>
        (s.map(_._2).min, s.map(_._2).max, s.length.toLong))
      got.toSeq == expected
    })
  }
}
