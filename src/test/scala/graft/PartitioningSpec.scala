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
