package graft
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch stage-timer for the tf-idf / dsir text plans, with the
  * noise-free structural metrics (tasks / input / shuffle bytes).
  */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val tasks = new LongAdder; val input = new LongAdder; val sw = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.increment()
        input.add(t.taskMetrics.inputMetrics.bytesRead)
        sw.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    def measure(name: String)(f: => Long): Unit = {
      tasks.reset(); input.reset(); sw.reset()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"METRIC $name rows=$r time=$dt%.1f tasks=${tasks.sum} " +
        f"input=${input.sum / 1e6}%.0fMB shufw=${sw.sum / 1e6}%.0fMB")
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")

    // unpersisted variant: df and scored both consume the same tf plan;
    // if AQE stage reuse fires, the tokenize+explode runs once anyway
    def noPersist(k: Int): DataFrame = {
      val tf = graft.operators.TextAnalysis.explodedTf(docs)
      val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfT, "term").crossJoin(broadcast(n))
        .withColumn("score", graft.functions.Hashing.rd4(
          (col("tf") * col("n_docs")).cast("double") / col("df")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
    }

    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      measure("current")(graft.operators.TextAnalysis.tfidfTopTerms(docs, 3).count())
      measure("noPersist")(noPersist(3).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
