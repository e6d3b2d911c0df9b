package graft
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Structural profiler for registered queries: runs each named query at
  * SPARK_GRAFT_SF_DIR and reports the noise-free plan-work metrics —
  * tasks run, parquet bytes read, shuffle bytes written, peak-ish rows —
  * alongside wall time. Wall-clock on a contended box swings 5-10x at
  * constant code; these metrics don't, so regressions in duplicate
  * subtree work or shuffle volume are attributable.
  *
  * {{{ sbt "runMain graft.ProfileQ <name> [<name>...]" }}}
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val tasks = new LongAdder; val input = new LongAdder
    val sw = new LongAdder; val sr = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.increment()
        input.add(t.taskMetrics.inputMetrics.bytesRead)
        sw.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        sr.add(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })
    val todo = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    todo.foreach { name =>
      for (pass <- 1 to 2) {
        graft.core.SharedViews.reclaimEverything(spark)
        tasks.reset(); input.reset(); sw.reset(); sr.reset()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"METRIC $name pass=$pass rows=$n time=$dt%.1f tasks=${tasks.sum} " +
          f"input=${input.sum / 1e6}%.0fMB shufw=${sw.sum / 1e6}%.0fMB " +
          f"shufr=${sr.sum / 1e6}%.0fMB")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
