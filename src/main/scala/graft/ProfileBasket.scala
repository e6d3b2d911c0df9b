package graft
import org.apache.spark.sql.functions._

/** Scratch A/B for the market-basket pair aggregate's AQE partitioning:
  * is the bimodal latency (5.7 s vs 42-56 s same-code solo passes) the
  * coalesce of the ~150 MB pair shuffle into a handful of final-agg
  * partitions?
  */
object ProfileBasket {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val adv = sys.env.getOrElse("ADVISORY", "64m")
    val spark = Harness.session(
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> adv)
    println(s"advisory=$adv")
    for (pass <- 1 to 4) {
      val q = graft.operators.Analytics.marketBasket(spark, dir)
      val t0 = System.nanoTime()
      val exec = q.queryExecution.executedPlan
      exec.execute().count()
      println(f"pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (pass == 1) {
        val p = exec.toString.split("== Initial Plan ==").head
        // partition counts after AQE reads
        "AQEShuffleRead (\\w+)".r.findAllMatchIn(p).foreach(m => println("  AQERead " + m.group(1)))
        println(p.linesIterator.filter(_.contains("CoalescedShuffleRead")).take(5).mkString("\n"))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
