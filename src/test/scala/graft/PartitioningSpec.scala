package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.sources.Tables

/** Partitioning techniques for the 1000-executor posture: salted joins
  * for hot keys and bucketed tables for exchange-free co-located joins.
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join: differential vs plain join, hot key spread over all salts") {
    val li = Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.load(spark, TestSpark.Sf0001, "orders")
      .select("o_orderkey", "o_orderdate")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    val plainDf = li.join(ord, "l_orderkey")
    val plain = plainDf.orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq)
    val saltedJ = SkewJoin.salted(li, ord, key = "l_orderkey",
        disambig = "l_linenumber", buckets = 8)
      .select(plainDf.columns.map(col).toIndexedSeq: _*)
      .orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq)
    assert(saltedJ.nonEmpty && saltedJ.toSeq == plain.toSeq)

    // a hot key's rows really fan out across salt buckets
    import spark.implicits._
    val hot = (1 to 800).map(i => (42L, i.toLong)).toDF("k", "row_id")
    val salts = hot.withColumn("_salt",
        expr("pmod(cast(conv(substr(md5(concat(k, '#', row_id)), 1, 15), 16, 10) as bigint), 8)"))
      .select(countDistinct("_salt")).head.getLong(0)
    assert(salts == 8L, s"hot key only reached $salts of 8 salt buckets")
  }

  test("SkewJoin.choose: broadcast / salted / plain on crafted bounded, skewed, disjoint inputs") {
    import spark.implicits._
    // thresholds scaled down so a unit-sized frame exercises each branch
    val bRows = 50L
    val hotPpm = 200000L // 20%

    // bounded: right side under the broadcast threshold
    val bigBalanced = (1 to 1000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "rid")
    val smallDim = (1 to 20).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val c1 = SkewJoin.choose(bigBalanced, "k", smallDim, "k", bRows, hotPpm)
    assert(c1.strategy == "broadcast", s"$c1")
    assert(c1.right.rows == 20L && c1.buckets == 0)

    // skewed: one key holds 60% of the big left side, both sides large
    val skewed = ((1 to 600).map(_ => 42L) ++ (601 to 1000).map(_.toLong))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "rid")
    val other = (1 to 1000).map(i => (i.toLong % 600, i.toLong)).toDF("k", "rid2")
    val c2 = SkewJoin.choose(skewed, "k", other, "k", bRows, hotPpm)
    assert(c2.strategy == "salted", s"$c2")
    assert(c2.left.maxSharePpm == 600000L, s"$c2")
    assert(c2.buckets >= 4 && c2.buckets <= 32)

    // balanced large sides → plain; disjoint keys → the estimate is
    // pure collision noise, bounded by the CMS inner-product guarantee
    // est ≤ truth + (e/w)·N₁·N₂ (here truth = 0, so ≤ e·10⁶/4096 ≈ 664
    // — never exactly 0 at this density: 1000 keys per side in 4096
    // cells collide deterministically)
    val balR = (1 to 1000).map(i => (i.toLong % 400, i.toLong)).toDF("k", "rid2")
    val c3 = SkewJoin.choose(bigBalanced, "k", balR, "k", bRows, hotPpm)
    assert(c3.strategy == "plain" && c3.buckets == 0, s"$c3")
    val disjointR = (1 to 1000).map(i => (i.toLong + 100000, i.toLong)).toDF("k", "rid2")
    val c4 = SkewJoin.choose(bigBalanced, "k", disjointR, "k", bRows, hotPpm)
    val collisionBound = (math.E * 1000L * 1000L / 4096L).toLong
    assert(c4.strategy == "plain" && c4.estJoinRows <= collisionBound,
      s"disjoint sides must estimate within the CMS collision bound $collisionBound: $c4")

    // row-count-eligible but WIDE side: the bytes budget overrides —
    // 20 rows of ~1 KB text under a 5 KB budget must not broadcast
    // (the forced-broadcast OOM shape), and with neither side hot the
    // decision falls through to plain
    val wideDim = (1 to 20).map(i => (i.toLong, "x" * 1000)).toDF("k", "txt")
    val c5 = SkewJoin.choose(bigBalanced, "k", wideDim, "k", bRows, hotPpm,
      broadcastBytes = 5000L)
    assert(c5.strategy == "plain", s"wide side must not broadcast: $c5")
    assert(c5.right.avgRowBytes >= 1000L, s"width estimate too small: $c5")

    // the converse: the row-count-SMALLER side is wide (fails its bytes
    // gate) but the OTHER side is narrow and under both gates — the
    // valid broadcast must be found there, not vetoed by the wide side
    val narrowL = (1 to 40).map(i => (i.toLong, i.toLong)).toDF("k", "rid")
    val c6 = SkewJoin.choose(narrowL, "k", wideDim, "k", bRows, hotPpm,
      broadcastBytes = 5000L)
    assert(c6.strategy == "broadcast", s"narrow other side must broadcast: $c6")
    val expect6 = narrowL.join(wideDim, "k").select("k", "rid", "txt")
      .orderBy("k", "rid").collect().toSeq
    val (got6, ch6) = SkewJoin.autoJoin(narrowL, wideDim, "k", bRows, hotPpm,
      broadcastBytes = 5000L)
    assert(ch6.strategy == "broadcast", s"$ch6")
    assert(got6.orderBy("k", "rid").collect().toSeq == expect6,
      "autoJoin(broadcast-other-side) must equal the plain join")

    // the estimate never undercounts the true join size (CMS law)
    val truth = bigBalanced.join(balR, "k").count()
    assert(c3.estJoinRows >= truth, s"est ${c3.estJoinRows} < true $truth")

    // autoJoin executes each branch with identical results + columns
    val plainCols = Seq("k", "rid", "rid2")
    for ((l, r) <- Seq((bigBalanced, smallDim.withColumnRenamed("name", "rid2")),
        (skewed, other), (bigBalanced, balR))) {
      val expect = l.join(r, "k").select(plainCols.map(col): _*)
        .orderBy("k", "rid", "rid2").collect().toSeq
      val (got, choice) = SkewJoin.autoJoin(l, r, "k", bRows, hotPpm)
      assert(got.columns.toSeq == plainCols, s"${choice.strategy}")
      assert(got.orderBy("k", "rid", "rid2").collect().toSeq == expect,
        s"autoJoin(${choice.strategy}) must equal the plain join")
    }
  }

  test("bucketed tables join without any exchange (co-located shuffle-free join)") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.load(spark, TestSpark.Sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.load(spark, TestSpark.Sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity"), first("o_totalprice"))
      val plan = TestSpark.finalPlan(joined)
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 0,
        s"bucketed join must be exchange-free, got $exchanges:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("zorderWrite: every physical file is tight on BOTH dims (file-skipping layout)") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.load(spark, TestSpark.Sf0001, "events")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      graft.operators.Prep.zorderWrite(ev, dir, bits = 8, partitions = 16)
      // per physical file: the spread of BOTH coordinates. A 1-D sort
      // on user_id would leave value spanning its full range in every
      // file; the Morton layout must bound both (range-partitioned
      // z splits are contiguous Morton ranges — allow the one-tile
      // boundary slack of an unaligned range: half the 256-wide grid).
      val x = graft.operators.Prep.zorderX(8)
      val y = graft.operators.Prep.zorderY(8)
      val perFile = spark.read.parquet(dir)
        .select(expr(x).as("x"), expr(y).as("y"),
          input_file_name().as("f"))
        .groupBy("f")
        .agg((max(col("x")) - min(col("x"))).as("dx"),
          (max(col("y")) - min(col("y"))).as("dy"),
          count(lit(1)).as("n"))
        .collect()
      assert(perFile.length > 4, "several physical files")
      assert(perFile.map(_.getAs[Long]("n")).sum == ev.count(), "lossless write")
      val loose = perFile.filter(r =>
        r.getAs[Long]("dx") > 128 || r.getAs[Long]("dy") > 128)
      assert(loose.isEmpty,
        s"files spanning more than half the grid on a dim: ${loose.mkString(";")}")
      // and collectively the files must beat the trivial layout: the
      // AVERAGE per-file spread is well under the full 255 range
      val avgDy = perFile.map(_.getAs[Long]("dy")).sum.toDouble / perFile.length
      assert(avgDy < 100, s"mean value-dim spread $avgDy — no better than unsorted")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
