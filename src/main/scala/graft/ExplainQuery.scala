package graft

/** Print the join/aggregate/exchange/scan skeleton of a registered
  * query's physical plan — the plan-shape review loop in one command:
  * {{{ sbt "runMain graft.ExplainQuery <name> [sfDir]" }}}
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Harness.session()
    val df = SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Aggregate") || l.contains("Exchange") ||
        l.contains("Scan") || l.contains("Window") || l.contains("Sort")).mkString("\n"))
    spark.stop()
  }
}
