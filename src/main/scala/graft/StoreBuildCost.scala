package graft

/** Dev tool (r15 verdict item 8): measure the one-time per-corpus build
  * cost of every standing store — the other side of the
  * materialized-ingest-state ledger. Remove the /tmp stores first to
  * time a cold build:
  * {{{ rm -rf /tmp/graft_quantizers /tmp/graft_embpairs \
  *            /tmp/graft_tokenizers /tmp/graft_docpairs
  *     sbt "runMain graft.StoreBuildCost [sfDir]" }}}
  */
object StoreBuildCost {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STORE_BUILD $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("docpairs") {
      graft.operators.DocPairsStore.lshPairs(spark, dir).count()
    }
    time("embpairs") {
      graft.operators.EmbPairsStore.pairs(spark, dir).count()
    }
    time("tokenizer_k8") {
      graft.operators.TokenizerStore.merges(spark, dir, 8).count()
    }
    time("quantizer_kmeans") {
      graft.operators.QuantizerStore.kmeans(spark, dir)._1.count()
    }
    time("quantizer_kmeanspp") {
      graft.operators.QuantizerStore.kmeansPp(spark, dir)._1.count()
    }
    spark.stop()
  }
}
