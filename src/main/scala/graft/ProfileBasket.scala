package graft
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch harness for the market-basket plan: wall-clock on this box is
  * too noisy to A/B (5-10x same-code swings), so this reports the
  * noise-free structural metrics instead — tasks run, parquet bytes read,
  * shuffle bytes written — which directly expose duplicate subtree work.
  */
object ProfileBasket {
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
      Thread.sleep(300) // let listener drain
      println(f"METRIC $name rows=$r time=$dt%.1f tasks=${tasks.sum} " +
        f"input=${input.sum / 1e6}%.0fMB shufw=${sw.sum / 1e6}%.0fMB")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    def variantG(): DataFrame = {
      val dpG = li
        .select(col("l_orderkey"), col("l_partkey"))
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .repartition(col("l_orderkey"))
        .distinct()
      val pairs = dpG.as("a")
        .join(dpG.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .select((shiftleft(col("a.l_partkey"), 32) + col("b.l_partkey")).as("pp"))
        .groupBy(col("pp"))
        .agg(count(lit(1)).as("pair_count"))
        .filter(col("pair_count") >= 2L)
        .select(shiftright(col("pp"), 32).as("part_a"),
          (col("pp").bitwiseAND(lit(0xffffffffL))).as("part_b"),
          col("pair_count"))
      val marg = dpG.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val totals = dpG.groupBy(col("l_orderkey"))
        .agg(count(col("l_partkey")).as("__np"))
        .agg(count(lit(1)).as("n_orders"))
      pairs
        .join(broadcast(marg.select(col("l_partkey").as("part_a"), col("cnt").as("cnt_a"))), "part_a")
        .join(broadcast(marg.select(col("l_partkey").as("part_b"), col("cnt").as("cnt_b"))), "part_b")
        .crossJoin(broadcast(totals))
        .select(col("part_a"), col("part_b"), col("pair_count"), col("cnt_a"), col("cnt_b"))
        .orderBy(col("pair_count").desc, col("part_a"), col("part_b"))
        .limit(50)
    }

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      measure("current")(graft.operators.Analytics.marketBasket(spark, dir).count())
      measure("variantG")(variantG().count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
