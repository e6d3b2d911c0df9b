package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Scratch: per-job timing for one SparkEntry query. */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = System.nanoTime()
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val d = (System.nanoTime() - starts.getOrElse(je.jobId, System.nanoTime())) / 1e9
        println(f"  job ${je.jobId}%3d  $d%6.3f s")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val d = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val ops = si.rddInfos.map(_.name).filter(n =>
          n != null && !n.startsWith("MapPartitions") && !n.startsWith("Shuffled"))
          .distinct.take(6).mkString("|")
        println(f"    stage ${si.stageId}%3d ${si.numTasks}%3d tasks  $d%6.3f s  $ops")
      }
    }
    args.foreach { name =>
      SparkEntry.queries(name)(spark, dir).count() // warmup
      spark.catalog.clearCache()
      println(s"=== $name timed pass ===")
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
