package graft

/** Final-adaptive-plan inspector: executes each named query through the
  * noop sink (so the query's OWN AdaptiveSparkPlan finalizes — a count()
  * wraps a different plan) and prints scan / exchange / reuse counts
  * from the final plan, the noise-free truth about duplicate work.
  *
  * {{{ sbt "runMain graft.ProfilePlan <name> [<name>...]" }}}
  */
object ProfilePlan {

  /** Pseudo-file key carrying the final-plan shuffle-exchange count in
    * the committed watchlist TSV (next to the per-file scan counts).
    */
  val ExchangesKey = "__exchanges__"

  /** Pseudo-file key carrying the final-plan broadcast-exchange count —
    * under AQE every broadcast build is a scheduled stage too, so the
    * floor-calibrated weak rule's stage estimate is
    * exchanges + bcasts + 1 (a 5-dim star join pays ~6 stage launches
    * before touching a byte; see BASELINE.md).
    */
  val BcastsKey = "__bcasts__"

  /** Final-plan per-parquet-file scan counts AND the shuffle-exchange
    * count for one registered query — shared by the CLI below and
    * PlanGuardSpec's committed watchlist (which pins both for every
    * query: a benign duplicate scan silently flipping into a duplicate
    * SHUFFLE fails CI on the scan axis, and a rewrite that adds a
    * shuffle at CONSTANT scan count — the r14 topk_movers disease
    * class — fails on the exchange axis).
    */
  def finalPlanScanCounts(spark: org.apache.spark.sql.SparkSession,
      name: String, dir: String): (String, Map[String, Int], Int, Int) = {
    val exec = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
    exec.execute().count()
    val p = exec.toString.split("== Initial Plan ==").head
    val perFile = "InMemoryFileIndex\\(1 paths\\)\\[file:([^\\]]+)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size)
      .map { case (f, n) => f.split('/').last -> n }.toMap
    // real exchanges are tree nodes ("+- Exchange hash…" /
    // "+- BroadcastExchange …"); a ReusedExchange prints its target
    // inline (", Exchange hash…") and must NOT count — reuse is the
    // cure, not the disease
    val nExch = "- Exchange ".r.findAllIn(p).length
    val nBcast = "- BroadcastExchange ".r.findAllIn(p).length
    (p, perFile, nExch, nBcast)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val todo = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val tsv = sys.env.get("PLAN_TSV").map(p => new java.io.PrintWriter(p))
    todo.foreach { name =>
      graft.core.SharedViews.reclaimEverything(spark)
      // drive the EXACT AdaptiveSparkPlanExec instance to its final plan
      // (count()/write wrap the query in a new QueryExecution, leaving
      // this instance un-finalized); count only the final section —
      // AdaptiveSparkPlan prints final plan THEN "== Initial Plan =="
      val (p, perFile, nExch, nBcast) = finalPlanScanCounts(spark, name, dir)
      def c(pat: String) = pat.r.findAllIn(p).length
      val dup = perFile.filter(_._2 > 1).map { case (f, n) => s"$f x$n" }
      tsv.foreach { w =>
        perFile.toSeq.sorted.foreach { case (f, n) => w.println(s"$name\t$f\t$n") }
        if (perFile.isEmpty) w.println(s"$name\t-\t0")
        w.println(s"$name\t$ExchangesKey\t$nExch")
        w.println(s"$name\t$BcastsKey\t$nBcast")
        w.flush()
      }
      println(s"PLAN $name isFinal=${p.contains("isFinalPlan=true")} " +
        s"scans=${c("Scan parquet")} exch=${c("Exchange hashpartitioning")} " +
        s"singleExch=${c("Exchange SinglePartition")} bcast=${c("BroadcastExchange")} " +
        s"shufStages=${c("ShuffleQueryStage")} reused=${c("ReusedExchange|reuses operator id")}" +
        (if (dup.nonEmpty) s" DUPSCANS=${dup.mkString(",")}" else ""))
      if (sys.env.contains("PLAN_FULL")) println(p)
      spark.catalog.clearCache()
    }
    tsv.foreach(_.close())
    spark.stop()
  }
}
