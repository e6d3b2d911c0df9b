package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Ranking

/** Two-phase rank / running-sum helpers must be bit-identical to the
  * single-task window shapes they replace (row_number / NTILE / running
  * sum), across partition boundaries, strata, and bucket-remainder cases.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def sample(n: Int) =
    (1 to n).map(i => ((i * 7919) % 1000, i.toLong)).toDF("v", "k")

  test("withGlobalRank equals global row_number for a total order") {
    val df = sample(257)
    val got = Ranking.withGlobalRank(df, Seq(col("v").desc, col("k")), "rnk",
      Some("tot"), numParts = 7)
    val want = df.withColumn("rnk",
      row_number().over(Window.orderBy(col("v").desc, col("k"))).cast("long"))
    assert(got.select("k", "rnk").except(want.select("k", "rnk")).isEmpty)
    assert(got.select("tot").distinct().as[Long].collect().toSeq == Seq(257L))
  }

  test("ntileOfRank matches window NTILE incl. remainder buckets") {
    for (n <- Seq(4, 10); rows <- Seq(7, 40, 257)) {
      val df = sample(rows)
      val got = Ranking.withGlobalRank(df, Seq(col("v"), col("k")), "rnk",
          Some("tot"), numParts = 5)
        .select(col("k"), Ranking.ntileOfRank(n, col("rnk"), col("tot")).as("b"))
      val want = df.select(col("k"),
        ntile(n).over(Window.orderBy(col("v"), col("k"))).cast("long").as("b"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile($n) over $rows rows diverged")
    }
  }

  test("withRunningSum equals sequential running sum (global, long)") {
    val df = sample(100).withColumn("val", col("v").cast("long"))
    val got = Ranking.withRunningSum(df, None, Seq(col("k")), col("val"),
      "cum", Some("tot"), numParts = 6)
    val want = df.withColumn("cum", sum(col("val")).over(
      Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.select("k", "cum").except(want.select("k", "cum")).isEmpty)
    val t = df.agg(sum("val")).as[Long].head()
    assert(got.select("tot").distinct().as[Long].collect().toSeq == Seq(t))
  }

  test("withRunningSum restarts per stratum and spreads one stratum over partitions") {
    // one fat stratum ("en") dominating — the exact shape that used to be
    // a one-task-per-language window
    val df = (1 to 300).map(i => (if (i % 10 == 0) "de" else "en", i.toLong, (i % 13).toLong))
      .toDF("lang", "k", "val")
    val got = Ranking.withRunningSum(df, Some("lang"), Seq(col("k")), col("val"),
      "cum", Some("tot"), numParts = 8)
    val w = Window.partitionBy(col("lang")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("val")).over(w))
      .withColumn("tot", sum(col("val")).over(Window.partitionBy(col("lang"))))
    assert(got.select("lang", "k", "cum", "tot")
      .except(want.select("lang", "k", "cum", "tot")).isEmpty)
  }

  test("rewritten decile/rfm/pareto queries match their old window semantics") {
    val dir = "/root/testdata/sf0.001"
    // deciles: rank-based NTILE(10) must reproduce the window ntile version
    val rev = SparkEntry.queries("q_revenue_deciles")(spark, dir)
    val oldRev = graft.core.Tables.load(spark, dir, "orders")
      .join(graft.core.Tables.load(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))), 2)
        .cast("double").as("revenue"))
      .withColumn("decile", ntile(10).over(
        Window.orderBy(col("revenue").desc, col("o_custkey"))).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("revenue").cast("decimal(18,2)")), 2)
          .cast("double").as("total_revenue"),
        min(col("revenue")).as("min_revenue"),
        max(col("revenue")).as("max_revenue"))
    assert(rev.except(oldRev).isEmpty && oldRev.except(rev).isEmpty)

    // rfm: spot-check quartile population sizes (NTILE balance property)
    val rfm = SparkEntry.queries("q_rfm")(spark, dir)
    val byScore = rfm.groupBy("r_score").count().as[(Long, Long)].collect().toMap
    assert(byScore.keySet == Set(1L, 2L, 3L, 4L))
    assert(byScore.values.max - byScore.values.min <= 1)

    // pareto: kept set ends exactly where cumulative share crosses the cut
    val p = SparkEntry.queries("q_pareto_customers")(spark, dir)
      .orderBy(col("cum_share")).as[(Long, Double, Double)].collect()
    assert(p.last._3 >= 0.8 && p.init.forall(_._3 < 0.8))
  }

  test("withRunningSum tolerates all-NULL value cells like the window it replaces") {
    // a stratum whose only row has a NULL value: the per-cell partial sum
    // is NULL and must not NPE the driver-side offset collect
    val df = Seq(("de", 1L, Option.empty[Long]), ("en", 2L, Some(5L)),
      ("en", 3L, Some(7L))).toDF("lang", "k", "val")
    val got = Ranking.withRunningSum(df, Some("lang"), Seq(col("k")), col("val"),
        "cum", Some("tot"), numParts = 3)
      .orderBy(col("k")).select(col("cum")).collect()
    assert(got.head.isNullAt(0)) // NULL-valued row: window sum over nothing
    assert(got.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq ==
      Seq(-1L, 5L, 12L))
  }

  test("local-index overflow raises a loud error instead of corrupting ranks") {
    // forge a tiny 7-row local-index capacity: 100 rows over 2 partitions
    // must trip the in-plan guard (production capacity is 2^33 rows per
    // partition — unreachable at test scale, hence the hook)
    val df = sample(100)
    // consume the rank column: the guard rides the offset expression, so
    // a plan that prunes the ranks away (they can't corrupt anything
    // unused) also prunes the check
    val e = intercept[Exception] {
      Ranking.withGlobalRankBounded(df, Seq(col("v"), col("k")), "rnk",
        None, numParts = 2, maxIdx = 7).agg(max(col("rnk"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("local-index capacity")),
      s"unexpected error: $e")
    // and the untripped guard is invisible: same data, capacity fits
    val ok = Ranking.withGlobalRankBounded(df, Seq(col("v"), col("k")), "rnk",
      None, numParts = 2, maxIdx = 127)
    assert(ok.count() == 100)
  }

  test("withRunningSum keeps long sums exact past 2^53") {
    // per-partition partial = 2*(2^53 + 1): a Double cannot hold it (the
    // old driver-side Double round-trip lost the +2), a Long can
    val b = (1L << 53) + 1L
    val df = (1 to 4).map(i => (i.toLong, b)).toDF("k", "val")
    val got = Ranking.withRunningSum(df, None, Seq(col("k")), col("val"),
        "cum", Some("tot"), numParts = 2)
      .orderBy(col("k")).select(col("cum")).as[Long].collect().toSeq
    assert(got == Seq(b, 2 * b, 3 * b, 4 * b),
      s"long running sum drifted: $got")
  }

  test("boundaryRowsDesc selects exactly the rank-pass boundary rows, ties included") {
    // heavy ties on v (v = i % 7 over 500 rows ⇒ ~71-row tie groups):
    // the bracket must resolve the boundary WITHIN a tie group via the
    // key order, exactly as the full rank pass would
    val df = (0 until 500).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "v")
    val targets = Seq(3L, 126L, 250L, 374L, 498L)
    val got = Ranking.boundaryRowsDesc(df, col("k"),
      Seq("a" -> col("v")), _ => targets)("a")
    assert(got.isDefined, "verified brackets must resolve on tie-heavy data")
    val want = Ranking
      .withGlobalRank(df, Seq(col("v").desc, col("k")), "rnk")
      .filter(col("rnk").isin(targets: _*))
      .orderBy(col("rnk")).select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.get.map(r => (r.getLong(0), r.getLong(1))) == want,
      "selection diverged from the rank pass")
    // two metrics share the three jobs and each resolves independently
    val multi = Ranking.boundaryRowsDesc(df, col("k"),
      Seq("a" -> col("v"), "b" -> (lit(1000L) - col("k"))), _ => Seq(42L))
    val want42 = Ranking
      .withGlobalRank(df, Seq(col("v").desc, col("k")), "rnk")
      .filter(col("rnk") === 42L).select(col("k")).head().getLong(0)
    assert(multi("a").get.head.getLong(0) == want42,
      "multi-metric selection diverged from the rank pass")
    assert(multi("b").get.head.getLong(0) == 41L,
      "strict-order metric: desc-rank 42 of (1000-k) is k=41")
  }

  test("boundaryRowsDesc falls back loudly when the candidate cap trips") {
    // one giant tie group: every bracket holds all 300 rows, capRows=64
    // forces None — the caller's signal to run the exact rank pass
    val df = (0 until 300).map(i => (i.toLong, 5L)).toDF("k", "v")
    val got = Ranking.boundaryRowsDesc(df, col("k"),
      Seq("a" -> col("v")), _ => Seq(150L), capRows = 64L)
    assert(got("a").isEmpty, "cap overflow must yield None, not a collect flood")
    // and with a workable cap the same call resolves exactly
    val ok = Ranking.boundaryRowsDesc(df, col("k"),
      Seq("a" -> col("v")), _ => Seq(150L))
    assert(ok("a").get.head.getLong(0) == 149L,
      "within an all-tie group rank 150 is key 149")
  }

  test("withRunningMax equals the exclusive window max across partition cuts") {
    val df = sample(257).withColumn("val", col("v").cast("long"))
    val got = Ranking.withRunningMax(df, Seq(col("k")), col("val"), "pmax",
      numParts = 7)
    val want = df.withColumn("pmax", max(col("val")).over(
      Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)))
    assert(got.select("k", "pmax").except(want.select("k", "pmax")).isEmpty &&
      want.select("k", "pmax").except(got.select("k", "pmax")).isEmpty)
    // first row in order sees NULL (empty exclusive prefix)
    assert(got.orderBy(col("k")).select(col("pmax")).head().isNullAt(0))
  }
}
