package graft

/** Final-adaptive-plan inspector: executes each named query through the
  * noop sink (so the query's OWN AdaptiveSparkPlan finalizes — a count()
  * wraps a different plan) and prints scan / exchange / reuse counts
  * from the final plan, the noise-free truth about duplicate work.
  *
  * {{{ sbt "runMain graft.ProfilePlan <name> [<name>...]" }}}
  */
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val todo = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    todo.foreach { name =>
      graft.core.SharedViews.reclaimEverything(spark)
      val q = SparkEntry.queries(name)(spark, dir)
      // drive the EXACT AdaptiveSparkPlanExec instance to its final plan
      // (count()/write wrap the query in a new QueryExecution, leaving
      // this instance un-finalized)
      val exec = q.queryExecution.executedPlan
      exec.execute().count()
      // AdaptiveSparkPlan prints final plan THEN "== Initial Plan ==";
      // count only the final section
      val p = exec.toString.split("== Initial Plan ==").head
      def c(pat: String) = pat.r.findAllIn(p).length
      val perFile = "InMemoryFileIndex\\(1 paths\\)\\[file:([^\\]]+)\\]".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
        .groupBy(identity).view.mapValues(_.size)
        .map { case (f, n) => f.split('/').last -> n }.toMap
      val dup = perFile.filter(_._2 > 1).map { case (f, n) => s"$f x$n" }
      println(s"PLAN $name isFinal=${p.contains("isFinalPlan=true")} " +
        s"scans=${c("Scan parquet")} exch=${c("Exchange hashpartitioning")} " +
        s"singleExch=${c("Exchange SinglePartition")} bcast=${c("BroadcastExchange")} " +
        s"shufStages=${c("ShuffleQueryStage")} reused=${c("ReusedExchange|reuses operator id")}" +
        (if (dup.nonEmpty) s" DUPSCANS=${dup.mkString(",")}" else ""))
      if (sys.env.contains("PLAN_FULL")) println(p)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
