package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.core.Bucketing

class BucketingSpec extends SparkSpec {

  test("co-located join of bucketed tables has no shuffle exchange") {
    import spark.implicits._
    val l = (1L to 1000L).map(i => (i % 100, s"l$i")).toDF("k", "lv")
    val r = (1L to 500L).map(i => (i % 100, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(l, "graft_bl", "k", 4)
    Bucketing.writeBucketed(r, "graft_br", "k", 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = Bucketing.colocatedJoin(spark, "graft_bl", "graft_br", "k")
      assert(joined.count() == 1000L * 5) // 10 l-rows x 5 r-rows per key
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val s = plan.toString
      assert(s.contains("SortMergeJoin"))
      assert(!s.contains("ShuffleExchange") && !s.contains("Exchange hashpartitioning"),
        s"expected zero-shuffle co-located join, got:\n$s")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_bl")
      spark.sql("DROP TABLE IF EXISTS graft_br")
    }
  }
}
