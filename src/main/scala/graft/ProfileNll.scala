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
    def shape(label: String, df: DataFrame): Unit = {
      val exec = df.queryExecution.executedPlan
      exec.execute().count()
      val p = exec.toString.split("== Initial Plan ==").head
      def c(pat: String) = pat.r.findAllIn(p).length
      println(s"SHAPE $label exch=${c("- Exchange ")} bcast=${c("- BroadcastExchange ")} " +
        s"reused=${c("ReusedExchange")} bnlj=${c("BroadcastNestedLoopJoin")} " +
        s"aggs=${c("HashAggregate")} stages=${c("QueryStage")}")
      if (sys.env.contains("NLL_FULL")) println(p)
    }
    if (sys.env.contains("NLL_SHAPE")) {
      shape("legacy", legacy(tk))
      shape("production", graft.operators.TextAnalysis.lmScoreOf(tk))
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
    // order A/B-able via NLL_ORDER=rev (run-order effects on this box are
    // real: page cache, JIT tiers and heap state all favor later runs of
    // the SAME plan and can penalize whichever variant runs last)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("legacy", () => legacy(tk)),
      ("tfgrouped", () => tfGrouped(tk)),
      // production shape (vocab-side nll6): TextAnalysis.lmScoreOf itself,
      // so this profiler can never drift from the pipeline (r15 ADVICE)
      ("production", () => graft.operators.TextAnalysis.lmScoreOf(tk)))
    val ordered = if (sys.env.get("NLL_ORDER").contains("rev")) variants.reverse
      else variants
    for (round <- 1 to 3; (label, mk) <- ordered)
      run(s"$label r$round", mk())
    spark.stop()
  }
}
