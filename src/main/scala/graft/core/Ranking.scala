package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Exact distributed ranking and prefix sums WITHOUT a single-task global
  * window (the `Window.orderBy(...)`-with-no-partitionBy shape funnels the
  * whole input through one task — the classic 100×-scale killer).
  *
  * Shape shared by all helpers (the textbook two-phase scan):
  *   1. `repartitionByRange` on the sort key — order across partitions,
  *      balanced by construction (range boundaries come from sampling);
  *   2. `sortWithinPartitions` + `monotonically_increasing_id()` — the id
  *      encodes (partitionId << 33 | rowIndexInPartition), so after the
  *      lazy `localCheckpoint` freezes the RDD, every branch of the plan
  *      reads the SAME partition/row numbering;
  *   3. per-partition counts/partial sums as a TINY IN-PLAN aggregate
  *      (≤ one row per shuffle partition per stratum — metadata-bounded,
  *      like the epoch lists in MetricStore), prefix-summed by a window
  *      over that bounded aggregate and broadcast-joined back. No driver
  *      collect, no second driver job: the offsets branch and the final
  *      pass fold into ONE action (they share the checkpointed RDD, and
  *      the DAG scheduler runs its shuffle once);
  *   4. the broadcast join adds each partition's offset to its local
  *      index / running sum. Ranks need NO window at all; running sums
  *      use a window partitioned by `__pid` (32-way parallel, never one
  *      task).
  *
  * `order` must be a TOTAL order (include a unique tie-break key): with
  * the offsets branch and the final pass both reading the checkpointed
  * partitions, a non-total order could let two branches see tied rows in
  * different positions before the persist settles.
  *
  * On a multi-executor cluster prefer reliable `checkpoint()` over
  * `localCheckpoint()` if executor loss during the pass matters.
  * Row-index overflow needs > 2^33 rows in ONE partition — size numParts
  * so partitions stay far below that (32 parts × 8.6 B rows each covers
  * any realistic aggregate); the offsets pass raises a loud runtime error
  * (not silent rank corruption) if a partition ever exceeds the mask.
  */
object Ranking {

  private val IdxMask = (1L << 33) - 1

  /** numParts ≤ 0 (the default) follows `spark.sql.shuffle.partitions`,
    * so the range shuffle gets the same width every other shuffle in the
    * session gets — 32 here, thousands on a 1000-executor cluster. The
    * offset table stays one metadata row per partition either way.
    */
  private def resolveParts(df: DataFrame, numParts: Int): Int =
    if (numParts > 0) numParts
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Range-shuffle on `order`, stamp the frozen (pid, idx) id. The
    * checkpoint is LAZY: materialization folds into the caller's first
    * action, and both the offsets branch and the final pass read the one
    * shared RDD.
    */
  private def ranged(df: DataFrame, order: Seq[Column], numParts: Int): DataFrame =
    df.repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(eager = false)
      .withColumn("__pid", shiftright(col("__mid"), 33))

  /** Overflow guard as an in-plan expression: adds 0 when the partition's
    * row count fits the 33-bit local index, raises a runtime error
    * otherwise — silent rank corruption becomes a loud failure for free
    * (the guard rides the already-computed per-partition count).
    */
  private def overflowGuard(c: Column, maxIdx: Long): Column =
    coalesce(
      assert_true(c <= lit(maxIdx + 1),
        concat(lit(s"Ranking: partition row count "), c.cast("string"),
          lit(s" exceeds the ${maxIdx + 1}-row local-index capacity; raise numParts"))
      ).cast("long"),
      lit(0L))

  /** Per-partition counts of `r` with exclusive prefix offsets and the
    * grand total, as a bounded in-plan table: Aggregate(__pid) has at
    * most `numParts` rows by construction, `limit(numParts)` states that
    * bound in the plan (it can never drop a row), and the unpartitioned
    * prefix window above it is therefore over a bounded input — the
    * documented PlanGuard exemption, not an unbounded global window. The
    * full-frame total uses the SAME pid order, so its fold matches the
    * offset accumulation exactly (no summation-order ULP drift).
    */
  private def partitionOffsets(r: DataFrame, numParts: Int, maxIdx: Long): DataFrame = {
    val wOff = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    r.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .limit(numParts)
      .select(col("__pid"),
        (coalesce(sum(col("__c")).over(wOff), lit(0L)) + overflowGuard(col("__c"), maxIdx))
          .as("__off"),
        sum(col("__c")).over(wTot).as("__tot"))
  }

  /** Exact global `row_number()` over `order` (a TOTAL order — include a
    * unique tie-break key) as column `rankCol`; `totalCol`, when set, adds
    * the total row count (needed by [[ntileOfRank]]). Plan shape: one
    * range shuffle, no global window, no global sort, no driver collect —
    * offsets come from a broadcast-joined bounded aggregate, so the whole
    * pass is ONE action. Ranks are CONSECUTIVE, so lead/lag/rolling
    * shapes become plain equi-joins on `rank ± k`.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      totalCol: Option[String] = None, numParts: Int = 0): DataFrame =
    withGlobalRankBounded(df, order, rankCol, totalCol, numParts, IdxMask)

  /** [[withGlobalRank]] with an explicit local-index capacity — the test
    * hook for the overflow guard (production callers use the 2^33 mask).
    */
  private[graft] def withGlobalRankBounded(df: DataFrame, order: Seq[Column],
      rankCol: String, totalCol: Option[String], numParts: Int,
      maxIdx: Long): DataFrame = {
    val parts = resolveParts(df, numParts)
    val r = ranged(df, order, parts)
    val out = r.join(broadcast(partitionOffsets(r, parts, maxIdx)), "__pid")
      .withColumn(rankCol, col("__off") + col("__mid").bitwiseAND(lit(IdxMask)) + 1)
    (totalCol match {
      case Some(tc) => out.withColumnRenamed("__tot", tc)
      case None => out.drop("__tot")
    }).drop("__pid", "__off", "__mid")
  }

  /** [[withGlobalRank]] plus exact inclusive running sums of each
    * `(valueCol, cumName)` pair, all from ONE range shuffle and ONE
    * action — the building block for trailing-window rollups without any
    * global window: `trailing_k_sum(r) = cum(r) - cum(r-k)` via an
    * equi-join on the consecutive rank. Values must be LongType (exact).
    * `totalCol` adds the global row count (as [[withGlobalRank]]'s
    * total); `valueTotals` maps a cumName to a column carrying that
    * value's grand total (as [[withRunningSum]]'s totCol) — both ride
    * the same bounded offsets aggregate, no extra pass.
    */
  def withRankAndSums(df: DataFrame, order: Seq[Column], rankCol: String,
      values: Seq[(Column, String)], numParts: Int = 0,
      totalCol: Option[String] = None,
      valueTotals: Map[String, String] = Map.empty): DataFrame = {
    val parts = resolveParts(df, numParts)
    var r = ranged(df, order, parts)
    values.zipWithIndex.foreach { case ((v, _), i) => r = r.withColumn(s"__v$i", v) }
    values.indices.foreach { i =>
      require(r.schema(s"__v$i").dataType == LongType,
        s"withRankAndSums value ${values(i)._2} must be LongType")
    }
    // coalesce: a partition whose values are all NULL sums to NULL — treat
    // it as 0, matching the null-skipping window sum this helper replaces
    val wOff = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val totCols =
      totalCol.map(tc => sum(col("__c")).over(wTot).as(tc)).toSeq ++
        values.zipWithIndex.collect { case ((_, name), i) if valueTotals.contains(name) =>
          sum(col(s"__s$i")).over(wTot).as(valueTotals(name))
        }
    val offDf = r.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"),
        values.indices.map(i => coalesce(sum(col(s"__v$i")), lit(0L)).as(s"__s$i")): _*)
      .limit(parts) // exact bound: ≤ one row per shuffle partition
      .select(col("__pid") +:
        (coalesce(sum(col("__c")).over(wOff), lit(0L)) + overflowGuard(col("__c"), IdxMask))
          .as("__off") +:
        (values.indices.map(i =>
          coalesce(sum(col(s"__s$i")).over(wOff), lit(0L)).as(s"__soff$i")) ++ totCols): _*)
    val w = Window.partitionBy(col("__pid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = r.join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__off") + col("__mid").bitwiseAND(lit(IdxMask)) + 1)
    values.zipWithIndex.foreach { case ((_, name), i) =>
      out = out.withColumn(name, col(s"__soff$i") + sum(col(s"__v$i")).over(w))
    }
    out.drop("__pid" +: "__off" +: "__mid" +:
      values.indices.flatMap(i => Seq(s"__v$i", s"__soff$i")): _*)
  }

  /** Exact running sum of `value` over `order` (ascending within the given
    * order; include a unique tie-break), optionally restarting per
    * `partCol` stratum (range partitioning on (partCol, order) keeps each
    * stratum's rows ordered and lets ONE stratum span MANY partitions —
    * the fix for "one task per language"). `cumCol` is the inclusive
    * running sum; `totCol`, when set, adds the per-stratum (or global)
    * total. Value must be LongType or DoubleType; long sums are exact,
    * and the double path folds the per-partition partials in the same
    * pid order for both the offsets and the total, so `cum(last) == tot`
    * bit-exactly.
    */
  def withRunningSum(df: DataFrame, partCol: Option[String], order: Seq[Column],
      value: Column, cumCol: String, totCol: Option[String] = None,
      numParts: Int = 0): DataFrame = {
    val parts = resolveParts(df, numParts)
    val keyed = partCol.map(p => col(p) +: order).getOrElse(order)
    val r = ranged(df, keyed, parts).withColumn("__v", value)
    val isLong = r.schema("__v").dataType == LongType
    require(isLong || r.schema("__v").dataType == DoubleType,
      s"running-sum value must be long or double, got ${r.schema("__v").dataType}")
    // null-safe string key: the stratum column may contain nulls
    val partKey = coalesce(partCol.map(col).getOrElse(lit("")).cast("string"), lit("\u0000null"))
    val zero = if (isLong) lit(0L) else lit(0.0)
    // one row per (partition, stratum): strata are range-contiguous, so
    // this is ≤ numParts + |strata| rows — metadata-bounded. With a real
    // stratum column the prefix windows below partition on __k (bounded
    // per-stratum row sets); in the global case __k is a literal, so the
    // aggregate has ≤ numParts rows and carries that bound as a limit.
    var partials = r.groupBy(col("__pid"), partKey.cast("string").as("__k"))
      .agg(coalesce(sum(col("__v")), zero).as("__s"))
    if (partCol.isEmpty) partials = partials.limit(parts)
    // prefix offsets per stratum, in pid order (earlier range partitions
    // hold strictly earlier rows of the stratum); the full-frame total
    // folds the SAME pid-ordered partials, so for doubles the last row's
    // cum equals tot exactly.
    val wOff = Window.partitionBy(col("__k")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("__k")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offDf = partials.select(col("__pid"), col("__k"),
      coalesce(sum(col("__s")).over(wOff), zero).as("__off"),
      sum(col("__s")).over(wTot).as("__tot"))
    val w = Window.partitionBy(col("__pid"), col("__k")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = r.withColumn("__k", partKey.cast("string"))
      .join(broadcast(offDf), Seq("__pid", "__k"))
      .withColumn(cumCol, col("__off") + sum(col("__v")).over(w))
    totCol match {
      case Some(tc) => out.withColumnRenamed("__tot", tc)
        .drop("__pid", "__k", "__off", "__mid", "__v")
      case None => out.drop("__pid", "__k", "__off", "__mid", "__v", "__tot")
    }
  }

  /** EXCLUSIVE running max of a LongType `value` over a global `order`
    * (each row sees the max over all STRICTLY earlier rows; the first
    * row gets NULL) — the prefix-scan sibling of [[withRunningSum]],
    * same plan shape: one range shuffle, per-partition local prefix
    * windows (partitioned on `__pid`), a bounded ≤ numParts-row offsets
    * aggregate whose prefix max broadcasts back. Powers sort-based
    * sweep algorithms (e.g. the skyline dominance test) without an
    * unpartitioned window.
    */
  def withRunningMax(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String, numParts: Int = 0): DataFrame = {
    val parts = resolveParts(df, numParts)
    val r = ranged(df, order, parts).withColumn("__v", value)
    require(r.schema("__v").dataType == LongType,
      s"running-max value must be long, got ${r.schema("__v").dataType}")
    val wOff = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    // overflowGuard (adds 0, raises past the 33-bit local index) rides the
    // same aggregate: NULL + 0 stays NULL, max + 0 stays max
    val offDf = r.groupBy(col("__pid"))
      .agg(max(col("__v")).as("__pm"), count(lit(1)).as("__c"))
      .limit(parts) // exact bound: ≤ one row per shuffle partition
      .select(col("__pid"),
        (max(col("__pm")).over(wOff) + overflowGuard(col("__c"), IdxMask)).as("__moff"))
    val wLoc = Window.partitionBy(col("__pid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    r.join(broadcast(offDf), "__pid")
      .withColumn(outCol, greatest(max(col("__v")).over(wLoc), col("__moff")))
      .drop("__pid", "__mid", "__v", "__moff")
  }

  /** Exact order statistics WITHOUT a sort or range shuffle — the
    * two-pass selection that replaces a full [[withGlobalRank]] pass
    * when only a handful of ranked rows are needed (e.g. NTILE tile
    * boundaries): a rank pass computes |df| ranks to read k of them,
    * this computes exactly k.
    *
    * For each metric (a LONG-valued total-order twin of a df column,
    * e.g. `unix_date(d)` or exact cents) and each target DESC-rank
    * from `ranksOf(n)`, returns the full df row at that rank under
    * (metric DESC, key ASC) — via three shuffle-free jobs shared by ALL
    * metrics:
    *
    *   1. one aggregate of approx-percentile BRACKETS around each
    *      target (accuracy 10⁴, padded by the sketch's rank-error bound
    *      plus the integer tile-split slack);
    *   2. one aggregate of exact per-bracket counts — rows strictly
    *      above the bracket and rows inside it — which both VERIFIES
    *      the bracket (the sketch is an optimization, never trusted)
    *      and bounds the collect;
    *   3. one candidate-only collect of in-bracket rows (≤ `capRows`,
    *      else that metric reports None and the caller falls back to
    *      its rank pass — the loud guard for pathological tie floods,
    *      e.g. a metric with a billion-row tie group).
    *
    * The driver then sorts each bracket's candidates (bounded) and
    * picks rank − above − 1. Exactness never depends on the sketch:
    * a bracket that fails verification yields None, not a wrong row.
    * Ties are exact — a bracket includes every row carrying its edge
    * values, and `above` counts strictly-greater rows only.
    *
    * Returns per metric: Some(rows in target order) or None (fallback
    * required). `df` should be cheap to re-scan (checkpointed/frozen):
    * the three jobs scan it once each, map-side only.
    */
  def boundaryRowsDesc(df: DataFrame, key: Column,
      metrics: Seq[(String, Column)], ranksOf: Long => Seq[Long],
      capRows: Long = 1L << 20): Map[String, Option[Seq[org.apache.spark.sql.Row]]] = {
    val n = df.count()
    if (n == 0) return metrics.map(_._1 -> Some(Seq.empty[org.apache.spark.sql.Row])).toMap
    val targets = ranksOf(n).filter(t => t >= 1 && t <= n)
    if (targets.isEmpty)
      return metrics.map(_._1 -> Some(Seq.empty[org.apache.spark.sql.Row])).toMap
    val acc = 10000
    val delta = 2.0 / acc + 4.0 / n
    // job 1: brackets — per metric one approx_percentile over the asc
    // percentile pair of every target (desc rank t = asc position n-t+1)
    val ps = targets.flatMap { t =>
      val p = (n - t + 1).toDouble / n
      Seq(math.max(0.0, p - delta), math.min(1.0, p + delta))
    }
    val withNum = metrics.zipWithIndex.foldLeft(df) { case (d, ((_, v), i)) =>
      d.withColumn(s"__bn$i", v.cast("long"))
    }
    val percRow = withNum.agg(
      percentile_approx(col("__bn0"), typedLit(ps), lit(acc)).as("__p0"),
      metrics.indices.drop(1).map(i =>
        percentile_approx(col(s"__bn$i"), typedLit(ps), lit(acc)).as(s"__p$i")): _*
    ).head()
    val brackets: Seq[Seq[(Long, Long)]] = metrics.indices.map { i =>
      val arr = percRow.getSeq[Long](i)
      targets.indices.map(j => (arr(2 * j), arr(2 * j + 1)))
    }
    // job 2: exact verification counts per (metric, target) bracket
    val cntCols = metrics.indices.flatMap { i =>
      targets.indices.flatMap { j =>
        val (lo, hi) = brackets(i)(j)
        Seq(
          sum(when(col(s"__bn$i") > hi, 1L).otherwise(0L)).as(s"__a${i}_$j"),
          sum(when(col(s"__bn$i") >= lo && col(s"__bn$i") <= hi, 1L).otherwise(0L))
            .as(s"__c${i}_$j"))
      }
    }
    val cntRow = withNum.agg(cntCols.head, cntCols.tail: _*).head()
    def above(i: Int, j: Int) = cntRow.getLong(2 * (i * targets.size + j))
    def inside(i: Int, j: Int) = cntRow.getLong(2 * (i * targets.size + j) + 1)
    // a metric is bracket-resolvable iff every target lands inside its
    // verified bracket and the total candidate volume is collectable
    val ok: Seq[Boolean] = metrics.indices.map { i =>
      targets.indices.forall { j =>
        val t = targets(j)
        t > above(i, j) && t <= above(i, j) + inside(i, j)
      } && targets.indices.map(inside(i, _)).sum <= capRows
    }
    if (!ok.exists(identity))
      return metrics.map(_._1 -> None).toMap
    // job 3: one candidate-only collect across all resolvable brackets
    val candPred = metrics.indices.filter(ok).flatMap { i =>
      targets.indices.map { j =>
        val (lo, hi) = brackets(i)(j)
        col(s"__bn$i") >= lo && col(s"__bn$i") <= hi
      }
    }.reduce(_ || _)
    val keyIdx = df.columns.length + metrics.size
    val cand = withNum
      .filter(candPred)
      .select(df.columns.map(col) ++ metrics.indices.map(i => col(s"__bn$i")) :+
        key.as("__bkey"): _*)
      .collect()
    metrics.zipWithIndex.map { case ((name, _), i) =>
      name -> (if (!ok(i)) None else Some(targets.indices.map { j =>
        val (lo, hi) = brackets(i)(j)
        val rows = cand.filter { r =>
          val v = r.getLong(df.columns.length + i); v >= lo && v <= hi
        }.sortBy(r => (-r.getLong(df.columns.length + i), r.getLong(keyIdx)))
        rows((targets(j) - above(i, j) - 1).toInt)
      }))
    }.toMap
  }

  /** Exact SQL `NTILE(n)` bucket from a global rank and total count: the
    * first (total % n) buckets take ⌈total/n⌉ rows, the rest ⌊total/n⌋ —
    * bit-identical to the window NTILE every engine implements, computed
    * map-side from broadcast-joined ranks instead of a one-task sort.
    * (floor-of-double division is exact here: quotients are ≤ n and the
    * 1/divisor gap dwarfs double ulp at that magnitude.)
    */
  def ntileOfRank(n: Int, rank: Column, total: Column): Column = {
    val q = floor(total / n)
    val rem = total % n
    val thr = rem * (q + lit(1))
    when(rank <= thr, floor((rank - 1) / (q + lit(1))) + 1)
      .otherwise(rem + floor((rank - thr - 1) / greatest(q, lit(1))) + 1)
      .cast("long")
  }
}
