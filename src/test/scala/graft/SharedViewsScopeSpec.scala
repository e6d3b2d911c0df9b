package graft

import java.nio.file.Files

import org.apache.spark.storage.StorageLevel

import graft.core.SharedViews
import graft.operators.TextAnalysis

/** [[SharedViews.clearAll]] is scoped to registry-owned blocks: a library
  * user's own cached tables and localCheckpointed DataFrames survive it,
  * while the shared frozen views are dropped and rebuilt on next access.
  * (The whole-context sweep lives on as the bench-only
  * [[SharedViews.reclaimEverything]].)
  */
class SharedViewsScopeSpec extends SparkSpec {

  test("user caches survive clearAll; shared-view blocks do not") {
    import spark.implicits._
    val sc = spark.sparkContext
    // flush whatever earlier suites froze, so ownership diffs below are
    // exactly this test's
    SharedViews.clearAll(spark)
    val before = sc.getPersistentRDDs.keySet

    // a user's cached table, materialized
    val userCached = spark.range(0L, 1000L).toDF("id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    userCached.count()
    // a user's localCheckpointed DataFrame (CacheManager-invisible blocks)
    val userCp = spark.range(0L, 500L).toDF("id").localCheckpoint()
    val userIds = sc.getPersistentRDDs.keySet -- before

    // a real shared frozen view over a scratch documents table
    val dir = Files.createTempDirectory("svscope")
    dir.toFile.deleteOnExit()
    Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextAnalysis.sharedTokens(spark, dir.toString).count()
    val sharedIds = sc.getPersistentRDDs.keySet -- before -- userIds
    assert(sharedIds.nonEmpty, "shared view left no persisted blocks to scope")

    SharedViews.clearAll(spark)

    assert(userCached.storageLevel != StorageLevel.NONE,
      "clearAll dropped a user's cached table")
    assert(userCached.count() == 1000L)
    assert(userCp.count() == 500L, "clearAll broke a user's checkpointed DataFrame")
    assert(sc.getPersistentRDDs.keySet.intersect(userIds) == userIds,
      "clearAll unpersisted user-owned RDD blocks")
    assert(sc.getPersistentRDDs.keySet.intersect(sharedIds).isEmpty,
      "clearAll left registry-owned shared-view blocks persisted")

    // next access rebuilds the shared view from source
    assert(TextAnalysis.sharedTokens(spark, dir.toString).count() > 0)
    userCached.unpersist()
  }
}
