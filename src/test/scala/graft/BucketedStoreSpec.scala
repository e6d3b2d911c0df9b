package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.core.{BucketedMetricStore, StoreParams}

class BucketedStoreSpec extends SparkSpec {

  private def mkEvents(rows: Seq[(String, String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("ts", "f1", "f2", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("bucketed store: track → fetch roundtrip merges appended segments") {
    val store = new BucketedMetricStore(spark, "graft_bstore", buckets = 4)
    try {
      store.track(mkEvents(Seq(
        ("2024-01-01 10:05:00", "cpu", "host1", 10.0),
        ("2024-01-01 10:20:00", "cpu", "host2", 4.0))))
      store.track(mkEvents(Seq(("2024-01-01 10:45:00", "cpu", "host1", 7.0))))
      val exact = store.fetch("2024-01-01", "2024-01-02",
        Seq(Some("cpu"), Some("host1"))).collect()
      assert(exact.length == 1)
      assert(exact.head.getAs[Double]("total") == 17.0 && exact.head.getAs[Long]("cnt") == 2L)
      val rollup = store.fetch("2024-01-01", "2024-01-02", Seq(Some("cpu"))).collect()
      assert(rollup.length == 1)
      assert(rollup.head.getAs[Double]("total") == 21.0 && rollup.head.getAs[Long]("cnt") == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bstore")
  }

  test("bucketed store: segment-merge aggregation runs with zero shuffle") {
    val store = new BucketedMetricStore(spark, "graft_bstore_agg", buckets = 4)
    try {
      store.track(mkEvents(Seq(
        ("2024-01-01 10:05:00", "cpu", "host1", 10.0),
        ("2024-01-02 11:00:00", "mem", "host1", 3.0))))
      store.track(mkEvents(Seq(("2024-01-01 10:55:00", "cpu", "host1", 2.0))))
      val plan = finalPlan(store.points())
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free merge over the bucketed scan, got:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bstore_agg")
  }

  test("bucketed store: exact-series fetch prunes to a single bucket") {
    val store = new BucketedMetricStore(spark, "graft_bstore_prune", buckets = 4)
    try {
      store.track(mkEvents(Seq(
        ("2024-01-01 10:05:00", "cpu", "host1", 10.0),
        ("2024-01-01 10:06:00", "mem", "host1", 1.0),
        ("2024-01-01 10:07:00", "net", "host1", 2.0),
        ("2024-01-01 10:08:00", "dsk", "host1", 3.0))))
      val df = store.fetch("2024-01-01", "2024-01-02", Seq(Some("cpu"), Some("host1")))
      val plan = finalPlan(df)
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"expected single-bucket pruning on the exact f1 match, got:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bstore_prune")
  }

  test("bucketed store: expire drops epoch partitions via the catalog") {
    val store = new BucketedMetricStore(spark, "graft_bstore_exp",
      StoreParams(retentionEpochs = 2), buckets = 4)
    try {
      store.track(mkEvents(Seq(
        ("2024-01-01 10:00:00", "cpu", "host1", 1.0),
        ("2024-01-02 10:00:00", "cpu", "host1", 2.0),
        ("2024-01-05 10:00:00", "cpu", "host1", 3.0))))
      assert(store.expire() == Seq("2024-01-01", "2024-01-02"))
      val left = store.points().select(col("epoch")).distinct()
        .collect().map(_.getString(0)).toSeq
      assert(left == Seq("2024-01-05"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_bstore_exp")
  }

  test("bucketed store: compactAll preserves merged contents and bucketing") {
    val store = new BucketedMetricStore(spark, "graft_bstore_cmp", buckets = 4)
    try {
      store.track(mkEvents(Seq(("2024-01-01 10:05:00", "cpu", "host1", 10.0))))
      store.track(mkEvents(Seq(("2024-01-01 10:45:00", "cpu", "host1", 7.0))))
      store.compactAll()
      val r = store.fetch("2024-01-01", "2024-01-02",
        Seq(Some("cpu"), Some("host1"))).collect()
      assert(r.length == 1 && r.head.getAs[Double]("total") == 17.0)
      // still bucketed after the rewrite: merge stays shuffle-free
      val plan = finalPlan(store.points())
      assert(!plan.contains("Exchange hashpartitioning"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_bstore_cmp")
  }
}
