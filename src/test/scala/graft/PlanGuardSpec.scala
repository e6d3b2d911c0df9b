package graft

/** Plan-shape regression guards over EVERY registered query: properties
  * that must hold for the plans to survive a 100 TB corpus, checked
  * against the real testdata schemas so a refactor that silently
  * introduces an unbounded plan fails CI, not production.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    // Scalar/tiny-side cross joins compile to BroadcastNestedLoopJoin with
    // a 1-row or k-row build — bounded. CartesianProduct (both sides
    // partitioned, |a|x|b| tasks) is never acceptable at scale.
    val offenders = SparkEntry.queries.flatMap { case (name, f) =>
      val plan = f(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("fetch pattern + range predicates reach the parquet scan") {
    val plan = SparkEntry.queries("ts_fetch_exact")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "no pushdown section in scan")
    // the range must push on the raw int64 nanos column (row-group stats
    // prune epochs), not only on the derived timestamp
    assert(plan.contains("GreaterThanOrEqual(ts,"), s"nanos range not pushed")
    assert(plan.contains("EqualTo(event_type,purchase)"), "pattern predicate not pushed")
  }

  test("column pruning: single-column projections do not scan full rows") {
    val plan = SparkEntry.queries("dedup_exact")(spark, dir)
      .queryExecution.executedPlan.toString
    // only the text column feeds the md5 groupBy — lang/source/n_chars
    // must be pruned from the read schema
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text") && !readSchema.contains("n_chars"),
      s"unpruned read schema: $readSchema")
  }
}
