package graft


/** Single-query timing harness: `runMain graft.TimeQuery <name>...` times
  * the named SparkEntry queries at SPARK_GRAFT_SF_DIR (default sf0.1) with
  * Bench's protocol (untimed warmup, best-of-3, cache cleared between
  * passes) — the iterate-on-one-operator loop without a full bench run.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    args.foreach { name =>
      SparkEntry.queries(name)(spark, dir).count()
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        // Bench's honest-accounting protocol: shared frozen views rebuild
        // inside the timed region, billed to this query if it consumes one
        graft.core.SharedViews.reclaimEverything(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${ts.min}%.2f s (passes: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
