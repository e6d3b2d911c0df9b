package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch interleaved A/B: dsirWeights as registered (the r15 fused
  * conditional aggregate over a MEMORY_ONLY persist) vs the FROZEN
  * pre-r15 legacy shape (two bucket aggregates left-joined), optionally
  * without the persist — the r12 "re-A/B freezes after their inputs got
  * cheaper" check. The production arm calls TextAnalysis.dsirWeights
  * ITSELF so this profiler can never drift from the pipeline (the r15
  * ADVICE finding: `variant` had silently kept the pre-fusion plan).
  */
object ProfileDsir {
  import graft.operators.TextAnalysis.{tokens, withQuality}

  /** The FROZEN pre-r15 two-aggregate + left-join formulation — the
    * legacy reference for A/Bs, NOT the production plan (that is
    * [[graft.operators.TextAnalysis.dsirWeights]]).
    */
  def legacyVariant(docs: DataFrame, persist: Boolean, dim: Int = 64,
      qualityCut: Double = 0.7): DataFrame = {
    val q = withQuality(docs).select(col("doc_id"), col("quality"))
    val d0 = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .select(col("doc_id"),
        pmod(graft.functions.Hashing.h60(col("t")), lit(dim.toLong)).as("b"),
        col("c"))
      .join(q, "doc_id")
    val d = if (persist) d0.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY) else d0
    val rawTot = d.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val tgtTot = d.filter(col("quality") >= qualityCut)
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    val cnts = rawTot.join(tgtTot, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val tots = cnts.agg(sum(col("ct")).as("t"), sum(col("cr")).as("r"))
    val g = (floor(log((col("ct") + 1) / (col("t") + dim)) * 1000000.0 + 0.5) -
      floor(log((col("cr") + 1) / (col("r") + dim)) * 1000000.0 + 0.5)).cast("long")
    val lr = cnts.crossJoin(broadcast(tots)).select(col("b"), g.as("g"))
    d.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("g")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        graft.functions.Hashing.rd4(col("s") / 1000000.0).as("log_weight"),
        graft.functions.Hashing.rd4(
          col("s") / (col("n_tokens") * 1000000.0)).as("avg_log_ratio"))
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def variantOf(production: Boolean): DataFrame =
      if (production) graft.operators.TextAnalysis.dsirWeights(docs)
      else legacyVariant(docs, persist = false)
    def run(persist: Boolean): Double = {
      val t0 = System.nanoTime()
      variantOf(persist).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    run(true); run(false) // warm both codegen paths
    for (r <- 1 to 3)
      println(f"DSIR round=$r production=${run(true)}%.2f legacy_nopersist=${run(false)}%.2f")
    spark.stop()
  }
}
