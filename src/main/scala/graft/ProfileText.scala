package graft
import org.apache.spark.sql.functions._

/** Scratch stage-timer for the tf-idf / dsir text plans. */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val tf = graft.operators.TextAnalysis.inRowTf(docs)
      time("inRowTf sum")(println(tf.agg(sum(col("tf"))).collect().head))
      val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      time("dfT")(println(dfT.agg(sum(col("df"))).collect().head))
      time("tfidf full")(println(
        graft.operators.TextAnalysis.tfidfTopTerms(docs, 3).count()))
      time("dsir full")(println(
        graft.operators.TextAnalysis.dsirWeights(docs).count()))
      time("filterAgreement")(println(
        graft.operators.TextAnalysis.filterAgreement(docs, 0.55).count()))
      time("modelScores sum")(println(
        graft.operators.TextAnalysis.modelScores(docs)
          .agg(sum(col("n_tokens"))).collect().head))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
