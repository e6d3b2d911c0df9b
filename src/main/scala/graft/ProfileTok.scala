package graft
import org.apache.spark.sql.functions._

/** Scratch noop A/B: builtin split vs native WsTokensExpr, alone and
  * under the wordcount shape every text operator starts from.
  */
object ProfileTok {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    def bench(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"NOOP $name min=${ts.min}%.2f passes=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def wc(tk: org.apache.spark.sql.Column) = docs
      .select(col("doc_id"), explode(tk).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    for (round <- 1 to 2) {
      bench(s"r$round legacy explode", docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok")))
      bench(s"r$round native explode", docs.select(col("doc_id"), explode(graft.functions.WsTokensExpr.tokens(col("text"))).as("tok")))
      bench(s"r$round legacy wc", wc(split(col("text"), "\\s+")))
      bench(s"r$round native wc", wc(graft.functions.WsTokensExpr.tokens(col("text"))))
    }
    spark.stop()
  }
}
