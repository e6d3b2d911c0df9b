package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: interleaved same-JVM A/B of the r16 tf-grouped LM-score
  * build vs the legacy per-occurrence formulation (cross-run wall-clock
  * A/Bs on this box mislead in both directions — the ProfileShingles
  * lesson). Each round builds both variants from a fresh token explode,
  * action = noop-style count over the full result.
  * {{{ sbt "runMain graft.ProfileNll [sfDir]" }}}
  */
object ProfileNll {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    spark.sparkContext.setLogLevel("ERROR")

    def tk: DataFrame = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(
        graft.functions.WsTokensExpr.tokens(col("text"))).as("tok"))

    // the exact pre-r16 expression tree
    def legacy(tk: DataFrame): DataFrame = {
      val vocab = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = vocab.agg(sum(col("cnt")).as("n_total"))
      tk.join(vocab, "tok")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          graft.functions.Hashing.rd6(log(col("n_total") / col("cnt"))).as("nll"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          graft.functions.Hashing.rd4(avg(col("nll"))).as("avg_nll"))
    }

    def run(label: String, df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"NLL $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the r15-verdict tf-grouped candidate, frozen for the A/B record:
    // group occurrences to (doc, term, tf) below the vocab join —
    // REJECTED (adds a distinct-stream exchange + double hash
    // aggregation; lost to both other shapes at sf0.1)
    def tfGrouped(tk: DataFrame): DataFrame = {
      val tf = tk.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
      val tot = vocab.agg(sum(col("cnt")).as("n_total"))
      tf.join(vocab, "tok")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("tf"),
          floor(log(col("n_total") / col("cnt")) * 1000000.0 + 0.5)
            .cast("long").as("nll6"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          graft.functions.Hashing.rd4(
            sum(col("tf") * col("nll6")).cast("double") / 1000000.0 /
              sum(col("tf"))).as("avg_nll"))
    }
    for (round <- 1 to 3) {
      run(s"legacy r$round", legacy(tk))
      run(s"tfgrouped r$round", tfGrouped(tk))
      // production shape (vocab-side nll6): TextAnalysis.lmScoreOf itself,
      // so this profiler can never drift from the pipeline (r15 ADVICE)
      run(s"production r$round", graft.operators.TextAnalysis.lmScoreOf(tk))
    }
    spark.stop()
  }
}
