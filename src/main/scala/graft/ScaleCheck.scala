package graft

import org.apache.spark.sql.functions._

import graft.core.Ranking

/** Scale sanity harness: runs the two-phase ranking primitives on a
  * synthetic table ~3 orders of magnitude larger than the sf0.1 inputs
  * (default 50M rows) to show the plan shape that replaced the
  * single-task windows actually holds as data grows — per-partition
  * work stays balanced, the driver only ever sees one metadata row per
  * partition, and NTILE assignment matches the windowed semantics on a
  * sample. `runMain graft.ScaleCheck [rows]`.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = Harness.session()

    // skewed synthetic revenue: xxhash noise, heavy-ish tail via square
    val df = spark.range(rows).select(
      col("id"),
      (pmod(xxhash64(col("id")), lit(1000000L)) * pmod(xxhash64(col("id"), lit(1)),
        lit(1000L))).cast("double").as("revenue"))

    import Harness.timed

    val ranked = timed(s"withGlobalRank over $rows rows") {
      val r = Ranking.withGlobalRank(df, Seq(col("revenue").desc, col("id")),
        "rnk", Some("tot"))
      r.select(max(col("rnk")), min(col("rnk")), max(col("tot"))).collect()
    }
    println(s"  rank bounds: ${ranked.head}")

    timed(s"withRunningSum over $rows rows") {
      val r = Ranking.withRunningSum(df, None,
        Seq(col("revenue").desc, col("id")),
        col("revenue"), "cum", Some("tot"))
      // the last-ranked row's running sum must equal the total
      println("  " + r.select(
        max(col("cum")).as("max_cum"), max(col("tot")).as("tot")).collect().head)
    }

    // NTILE semantics spot-check vs the window version on a 1M sample
    val sample = df.filter(pmod(col("id"), lit(rows / 1000000L max 1L)) === 0)
    val twoPhase = Ranking.withGlobalRank(sample,
        Seq(col("revenue").desc, col("id")), "rnk", Some("tot"))
      .select(col("id"), Ranking.ntileOfRank(10, col("rnk"), col("tot")).as("d"))
    val windowed = sample.select(col("id"), ntile(10).over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("revenue").desc, col("id"))).cast("long").as("d"))
    val diff = twoPhase.join(windowed, "id")
      .filter(twoPhase("d") =!= windowed("d")).count()
    println(s"ntile mismatches vs window on sample: $diff")
    require(diff == 0L, "two-phase NTILE diverged from the windowed version")

    // withRunningMax (the skyline sweep primitive) with a CLOSED-FORM
    // oracle: v(id) = id % 97 over id-order has exclusive prefix max
    // min(id, 97) - 1 (and NULL at id = 0) — every one of the 50M rows
    // is checked exactly, no windowed reference needed
    timed(s"withRunningMax over $rows rows (closed form)") {
      val vm = Ranking.withRunningMax(
        spark.range(rows).select(col("id"), pmod(col("id"), lit(97L)).as("v")),
        Seq(col("id")), col("v"), "pmax")
      // null-safe: `ok` is true/false (never NULL), and the row count is
      // asserted too — a dropped row or an unexpected NULL pmax cannot
      // silently pass the three-valued filter
      val ok = when(col("id") === 0L, col("pmax").isNull)
        .otherwise(coalesce(col("pmax") === least(col("id"), lit(97L)) - 1L, lit(false)))
      val agg = vm.agg(count(lit(1)).as("n"),
        sum(when(ok, 1L).otherwise(0L)).as("good")).collect().head
      require(agg.getLong(0) == rows && agg.getLong(1) == rows,
        s"running max diverged from closed form: ${agg.getLong(1)} of " +
          s"${agg.getLong(0)} rows ok (expected $rows)")
    }
    spark.stop()
  }
}
