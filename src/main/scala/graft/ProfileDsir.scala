package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch interleaved A/B: dsirWeights as registered (MEMORY_ONLY
  * persist of the exploded (doc, bucket) table) vs the same plan with
  * no persist (ReuseExchange sharing) — the r12 "re-A/B freezes after
  * their inputs got cheaper" check, post-native-tokenizer.
  */
object ProfileDsir {
  import graft.operators.TextAnalysis.{tokens, withQuality}

  def variant(docs: DataFrame, persist: Boolean, dim: Int = 64,
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
    def run(persist: Boolean): Double = {
      val t0 = System.nanoTime()
      variant(docs, persist).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    run(true); run(false) // warm both codegen paths
    for (r <- 1 to 3)
      println(f"DSIR round=$r persist=${run(true)}%.2f nopersist=${run(false)}%.2f")
    spark.stop()
  }
}
