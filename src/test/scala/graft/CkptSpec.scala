package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ckpt

/** The lineage-cut policy point: graft-created checkpoint storage is
  * tracked and released at run boundaries WITHOUT touching caches other
  * code holds on the shared SparkContext.
  */
class CkptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("releaseGraftStorage drops tracked checkpoints, foreign caches survive") {
    val sc = spark.sparkContext
    val base = sc.getPersistentRDDs.keySet
    val foreign = spark.range(10).toDF("x").persist()
    foreign.count()
    val foreignIds = sc.getPersistentRDDs.keySet -- base
    assert(foreignIds.nonEmpty, "foreign persist must register")

    val cp = Ckpt.narrow(spark.range(100).toDF("y"))
    assert(cp.count() == 100)
    val graftIds = sc.getPersistentRDDs.keySet -- base -- foreignIds
    assert(graftIds.nonEmpty, "narrow() must register persistent RDD blocks")

    Ckpt.releaseGraftStorage(spark)
    val after = sc.getPersistentRDDs.keySet
    assert(graftIds.forall(!after.contains(_)), "graft blocks must be dropped")
    assert(foreignIds.forall(after.contains), "foreign cache must survive")
    assert(foreign.count() == 10)
    foreign.unpersist()
  }

  test("release(df) frees one checkpointed frame; Dataset.unpersist alone cannot") {
    val sc = spark.sparkContext
    val base = sc.getPersistentRDDs.keySet
    val cp = Ckpt.narrow(spark.range(50).toDF("z"))
    assert(cp.count() == 50)
    val ids = sc.getPersistentRDDs.keySet -- base
    assert(ids.nonEmpty)
    // the Dataset-level call is a no-op for RDD-level checkpoint storage
    cp.unpersist()
    assert(ids.forall(sc.getPersistentRDDs.keySet.contains),
      "Dataset.unpersist must not be able to free checkpoint blocks (if it " +
        "ever can, Components' per-round release can simplify)")
    Ckpt.release(cp)
    val after = sc.getPersistentRDDs.keySet
    assert(ids.forall(!after.contains(_)), "release(df) must drop the blocks")
    // idempotent + harmless on non-checkpointed frames
    Ckpt.release(cp)
    Ckpt.release(spark.range(5).toDF("w"))
  }

  test("lazy checkpoints are tracked too") {
    val sc = spark.sparkContext
    val base = sc.getPersistentRDDs.keySet
    val cp = Ckpt.narrowLazy(spark.range(50).toDF("z"))
    assert(cp.count() == 50)
    assert((sc.getPersistentRDDs.keySet -- base).nonEmpty)
    Ckpt.releaseGraftStorage(spark)
    assert((sc.getPersistentRDDs.keySet -- base).isEmpty)
  }
}
