package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Profile
import graft.operators.Profile._
import graft.sources.Tables

/** Laws for the data-quality tier (q120/q121). The gated queries run on
  * clean synthetic tables, so every VIOLATION arm is exercised here on
  * crafted frames: nulls, duplicate keys, out-of-range values, orphaned
  * foreign keys, and uncovered dimension rows.
  */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dirty = Seq(
    (1L, Option("a"), Option(5.0)),
    (2L, Option("a"), Option(500.0)), // dup key "a", out-of-range value
    (3L, None, Option(-1.0)),         // null key, out-of-range value
    (4L, Option("b"), None),          // null value
    (5L, Option("c"), Option(9.9))
  ).toDF("id", "k", "v")

  test("benfordAudit: hand-checked digits, dense axis, exclusions, ppm law") {
    // cents 100/200/1999/50 -> digits 1, 2, 1, 5; zero and negative excluded
    val df = Seq(1.00, 2.00, 19.99, 0.50, 0.0, -3.0).toDF("amt")
    val got = Profile.benfordAudit(df, Seq("amt")).orderBy("digit")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 9, "digit axis must be dense")
    assert(got.map(_._3).distinct.toSeq == Seq(4L), "n counts positive rows only")
    assert(got.map(t => t._1 -> t._2).toMap ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 1L,
        6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 0L))
    // the frozen expectation is a true distribution: exactly 1e6 ppm
    assert(Profile.BenfordPpm.map(_._2).sum == 1000000L)
  }

  test("benfordAudit conservation on corpus: observed partitions n, 9 rows per column") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val a = Profile.benfordAudit(li, Seq("l_extendedprice", "l_quantity")).cache()
    try {
      assert(a.count() == 18)
      val bad = a.groupBy("col_name")
        .agg(sum("observed").as("s"), max("n").as("n"), min("n").as("n2"))
        .filter(col("s") =!= col("n") || col("n") =!= col("n2"))
      assert(bad.count() == 0, "observed must partition each column's n")
    } finally a.unpersist()
  }

  test("columnProfile: counts nulls/distincts per column in one pass") {
    val p = Profile.columnProfile(dirty).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "k", "v"))
    p.values.foreach(r => assert(r.getLong(1) == 5)) // n_rows
    assert(p("id").getLong(2) == 0 && p("id").getLong(3) == 5)
    assert(p("k").getLong(2) == 1 && p("k").getLong(3) == 3)
    assert(p("v").getLong(2) == 1 && p("v").getLong(3) == 4)
    // portable min/max: bigint + string render; double stays NULL
    assert(p("id").getString(4) == "1" && p("id").getString(5) == "5")
    assert(p("k").getString(4) == "a" && p("k").getString(5) == "c")
    assert(p("v").isNullAt(4) && p("v").isNullAt(5))
  }

  test("columnProfile: approx path profiles the same columns without Expand") {
    val approx = Profile.columnProfile(dirty, exact = false)
    val rows = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL at rsd 5% is exact at cardinalities this small
    assert(rows("id") == 5 && rows("k") == 3 && rows("v") == 4)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must not plan an Expand")
  }

  test("constraintAudit: every violation arm fires on a dirty frame") {
    val child = Seq((10L, 1L), (11L, 1L), (12L, 99L)).toDF("cid", "fk")
    val audit = Profile.constraintAudit(
      Map("t" -> dirty, "child" -> child),
      Seq(
        NotNull("nn_k", "t", "k"),
        Unique("uq_k", "t", Seq("k")),
        InRange("rng_v", "t", "v", 0.0, 100.0),
        RefIntegrity("fk_child_t", "child", "fk", "t", "id"),
        Covered("cov_t_referenced", "t", "id", "child", "fk")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit("nn_k") == ((5L, 1L, 0L)))
    // 4 non-null keys, 3 distinct -> 1 surplus row (null key not counted)
    assert(audit("uq_k") == ((4L, 1L, 0L)))
    // 4 non-null values, two out of [0, 100]
    assert(audit("rng_v") == ((4L, 2L, 0L)))
    // fk=99 has no parent id
    assert(audit("fk_child_t") == ((3L, 1L, 0L)))
    // ids 2,3,4,5 are never referenced by child.fk
    assert(audit("cov_t_referenced") == ((5L, 4L, 0L)))
  }

  test("constraintAudit: clean data passes and names must be unique") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val ok = Profile.constraintAudit(Map("t" -> clean),
      Seq(NotNull("nn", "t", "k"), Unique("uq", "t", Seq("id"))))
      .collect()
    assert(ok.forall(r => r.getLong(2) == 0 && r.getLong(3) == 1))
    assertThrows[IllegalArgumentException] {
      Profile.constraintAudit(Map("t" -> clean),
        Seq(NotNull("dup", "t", "k"), NotNull("dup", "t", "id")))
    }
    assertThrows[IllegalArgumentException] {
      Profile.constraintAudit(Map("t" -> clean),
        Seq(NotNull("nn", "missing_table", "k")))
    }
  }

  test("violationSamples: names the orphans, caps at k, rejects unkeyed-only checks") {
    val child = Seq((10L, 1L), (11L, 99L), (12L, 98L), (13L, 97L))
      .toDF("cid", "fk")
    val got = Profile.violationSamples(
      Map("t" -> dirty, "child" -> child),
      Seq(RefIntegrity("fk_child_t", "child", "fk", "t", "id"),
        Covered("cov_t_referenced", "t", "id", "child", "fk")),
      k = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // k=2 keeps the two SMALLEST violating keys per check, by string order
    assert(got == Seq(
      ("cov_t_referenced", "2"), ("cov_t_referenced", "3"),
      ("fk_child_t", "97"), ("fk_child_t", "98")))
    assertThrows[IllegalArgumentException] {
      Profile.violationSamples(Map("t" -> dirty),
        Seq(NotNull("nn", "t", "k")))
    }
  }

  test("fdAudit: held and violated dependencies, null-det excluded, null dep counts") {
    val t = Seq(
      (Option(1L), Option("a")), (Option(1L), Option("a")), // 1 -> a, consistent
      (Option(2L), Option("a")), (Option(2L), Option("b")), // 2 -> {a,b}: violated
      (Option(3L), None),                                    // 3 -> NULL only: consistent
      (Option(4L), Option("c")), (Option(4L), None),         // 4 -> {c, NULL}: violated
      (None, Option("z"))                                    // NULL det: excluded
    ).toDF("det", "dep")
    val r = Profile.fdAudit(Map("t" -> t), Seq(("t", "det", "dep")))
      .collect().head
    assert(r.getString(0) == "t.det->dep")
    assert(r.getLong(1) == 4)  // dets 1..4
    assert(r.getLong(2) == 2 && r.getLong(4) == 0)  // dets 2 and 4 violate
    assert(r.getLong(3) == 2)  // worst fanout
    val held = Profile.fdAudit(Map("t" -> t.filter(col("det") <= 1)),
      Seq(("t", "det", "dep"))).collect().head
    assert(held.getLong(4) == 1 && held.getLong(2) == 0)
  }

  test("profilePartial/mergeProfile: any batching folds to the single-pass profile") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("column_name").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toSeq
    val single = canon(Profile.mergeProfile(Profile.profilePartial(docs)))
    val batched = canon(Profile.mergeProfile(
      Profile.profilePartial(docs.filter(col("doc_id") % 3 === 0))
        .unionByName(Profile.profilePartial(docs.filter(col("doc_id") % 3 === 1)))
        .unionByName(Profile.profilePartial(docs.filter(col("doc_id") % 3 === 2)))))
    assert(single == batched,
      "merge must be lossless under any batching of the data")
    // sub-saturation distinct estimates are EXACT (e.g. lang/source)
    val bySrc = single.map(r => r._1 -> r._4).toMap
    val exactSrc = docs.select("source").distinct().count()
    assert(bySrc("source") == exactSrc)
    // null handling: the KMV sentinel never counts a phantom value
    val p = Profile.mergeProfile(Profile.profilePartial(dirty))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(p("k") == ((1L, 3L)) && p("v") == ((1L, 4L)))
    // integral extrema must merge NUMERICALLY across batches whose
    // per-batch extremes differ in digit count — min("8","12") is "12"
    // lexicographically, the bug this pins
    import spark.implicits._
    val lo = Seq((8L, "a")).toDF("id", "k")
    val hi = Seq((12L, "b")).toDF("id", "k")
    val m = Profile.mergeProfile(
      Profile.profilePartial(lo).unionByName(Profile.profilePartial(hi)))
      .collect().map(r => r.getString(0) -> (r.getString(4), r.getString(5)))
      .toMap
    assert(m("id") == (("8", "12")),
      s"integral extrema merged lexicographically: ${m("id")}")
    assert(m("k") == (("a", "b")))
  }

  test("skewAudit: hot key, ppm share, max-key tie-break, nulls excluded") {
    val audit = Profile.skewAudit(Map("t" -> dirty), Seq("t" -> "k"))
      .collect()
    assert(audit.length == 1)
    val r = audit.head
    assert(r.getString(0) == "t.k")
    assert(r.getLong(1) == 4, "null keys carry no skew mass") // n_rows
    assert(r.getLong(2) == 3) // n_keys: a, b, c
    assert(r.getLong(3) == 2 && r.getString(4) == "a") // hottest key
    assert(r.getLong(5) == 500000L) // 2 of 4 rows -> 500000 ppm
    // all keys tie at count 1 -> the LARGEST key string wins
    val tied = Profile.skewAudit(
      Map("u" -> dirty.filter(col("k").isNotNull).dropDuplicates("k")),
      Seq("u" -> "k")).collect().head
    assert(tied.getLong(3) == 1 && tied.getString(4) == "c")
    assertThrows[IllegalArgumentException] {
      Profile.skewAudit(Map("t" -> dirty), Seq("t" -> "k", "t" -> "k"))
    }
  }

  test("q120/q121 shapes: bounded scans, no multi-distinct Expand, fused audits") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
    val plan = TestSpark.finalPlan(Profile.columnProfile(li))
    // exact profile = counts pass + primitive-pair distinct pass: two
    // column-pruned scans, and NEVER the multi-distinct rewrite's
    // Expand→SortAggregate (measured 9× slower at sf0.1)
    assert("Scan parquet".r.findAllIn(plan).size == 2,
      s"exact profile is a counts pass + a distinct pass:\n$plan")
    assert(!plan.contains("Expand"),
      s"multi-distinct Expand must not reappear:\n$plan")
    val approxPlan = TestSpark.finalPlan(Profile.columnProfile(li, exact = false))
    assert("Scan parquet".r.findAllIn(approxPlan).size == 1,
      s"approx profile must be a single scan:\n$approxPlan")
    val audit = Profile.constraintAudit(Map("t" -> li), Seq(
      NotNull("a", "t", "l_orderkey"),
      InRange("b", "t", "l_quantity", 1.0, 50.0),
      Unique("c", "t", Seq("l_orderkey", "l_linenumber"))))
    assert("Scan parquet".r.findAllIn(TestSpark.finalPlan(audit)).size == 1,
      "three same-table checks must fuse into one scan")
  }

  test("reconcileOrderTotals: consistent books match, drift measured exactly, line-less orders flagged") {
    import spark.implicits._
    val orders = Seq(
      (1L, "O", 230.0),  // 2 lines: 100*1.0*1.0 + 130*1.0*1.0
      (2L, "O", 150.0),  // 1 line recomputes 149.00 -> drift 100 cents
      (3L, "F", 42.5)    // no lines at all -> full header is drift
    ).toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val li = Seq(
      (1L, 100.0, 0.0, 0.0), (1L, 130.0, 0.0, 0.0),
      (2L, 149.0, 0.0, 0.0)
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val r = graft.operators.Profile.reconcileOrderTotals(orders, li)
      .orderBy("o_orderstatus").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      ("F", 1L, 0L, 0L, 4250L, 4250L),
      ("O", 2L, 1L, 500000L, 100L, 100L)))
  }

  test("robustOutliers: lower median/MAD match the sorted-array definition; 50% breakdown") {
    import spark.implicits._
    def audit(vals: Seq[Double]) = Profile.robustOutliers(
      vals.map(("g", _)).toDF("k", "v"), "k", "v").head
    // odd n: sorted cents [100,200,300,900,10000] -> med 300; devs
    // [200,100,0,600,9700] sorted [0,100,200,600,9700] -> mad 200;
    // fence 3*200=600: strict > excludes 600, flags only 9700
    val r = audit(Seq(1.0, 2.0, 3.0, 9.0, 100.0))
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))
      == ((5L, 300L, 200L, 1L, 9700L)))
    // even n takes the LOWER median: [100,200,300,400] -> 200
    assert(audit(Seq(1.0, 2.0, 3.0, 4.0)).getLong(2) == 200L)
    // 50% breakdown: corrupting 2 of 5 values with huge outliers moves
    // the median by one grid step at most and both land outside the fence
    val c = audit(Seq(1.0, 2.0, 3.0, 1e6, 2e6))
    assert(c.getLong(2) == 300L && c.getLong(4) == 2L,
      s"median must resist 40% corruption: $c")
  }
}
