package graft

/** Dev tool: dump the formatted plan of an INTERNAL shared-view /
  * store build subtree (the part a registered query hides behind its
  * localCheckpoint or parquet read) — the plan evidence for rewrites
  * that land inside a build:
  * {{{ sbt "runMain graft.ExplainBuild <build> [sfDir]" }}}
  */
object ExplainBuild {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val df = args(0) match {
      case "nll_build" => graft.operators.TextAnalysis.lmScore(docs)
      case "exact_pairs_build" =>
        graft.operators.Dedup.ngramJaccard(docs, graft.operators.Dedup.SharedExactFloor)
      case "lsh_pairs_build" =>
        graft.operators.Dedup.minhashLsh(docs, graft.operators.Dedup.SharedPairFloor)
      case "sigs_build" => graft.operators.Dedup.minhashSignatures(docs)
      case other => sys.error(s"unknown build: $other")
    }
    println(s"===== ${args(0)} =====")
    df.explain("formatted")
    spark.stop()
  }
}
