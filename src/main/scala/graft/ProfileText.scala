package graft
import org.apache.spark.sql.functions._

/** Scratch: print the FINAL adaptive plan of the production tf-idf query
  * to check whether the tokenize exchange is reused across the df and
  * scored subtrees.
  */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("spark.sql.session.timeZone" -> "UTC")
    val q = SparkEntry.queries("text_tfidf_top_terms")(spark, dir)
    val t0 = System.nanoTime()
    // drive the EXACT AdaptiveSparkPlanExec to its final plan — count()
    // wraps the query in a NEW QueryExecution and this instance would
    // stay un-finalized (always printing 0 ReusedExchange); same pattern
    // as ProfilePlan
    val exec = q.queryExecution.executedPlan
    println("rows=" + exec.execute().count())
    println(f"time=${(System.nanoTime() - t0) / 1e9}%.1f")
    val p = exec.toString.split("== Initial Plan ==").head
    println("EXCH " + "Exchange ".r.findAllIn(p).length +
      " REUSEDexch " + "ReusedExchange".r.findAllIn(p).length +
      " SHUFSTAGE " + "ShuffleQueryStage".r.findAllIn(p).length +
      " isFinal " + p.contains("isFinalPlan=true"))
    println(p.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("QueryStage") || l.contains("Reused") ||
        l.contains("Scan ") || l.contains("Aggregate") || l.contains("Window"))
      .mkString("\n"))
    spark.stop()
  }
}
