package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Exact distributed ranking and prefix sums WITHOUT a single-task global
  * window (the `Window.orderBy(...)`-with-no-partitionBy shape funnels the
  * whole input through one task — the classic 100×-scale killer).
  *
  * Shape shared by both helpers (the textbook two-phase scan):
  *   1. `repartitionByRange` on the sort key — order across partitions,
  *      balanced by construction (range boundaries come from sampling);
  *   2. `sortWithinPartitions` + `monotonically_increasing_id()` — the id
  *      encodes (partitionId << 33 | rowIndexInPartition), so after the
  *      eager `localCheckpoint` freezes it, both the offset pass and the
  *      final pass read the SAME partition/row numbering;
  *   3. one tiny driver-side collect of per-partition counts/partial sums
  *      (one row per shuffle partition — metadata-bounded, like the epoch
  *      lists in MetricStore), turned into broadcast offsets;
  *   4. a map-side broadcast join adds each partition's offset to its
  *      local index / running sum. Ranks need NO window at all; running
  *      sums use a window partitioned by `__pid` (32-way parallel, never
  *      one task).
  *
  * On a multi-executor cluster prefer reliable `checkpoint()` over
  * `localCheckpoint()` if executor loss during the two passes matters.
  * Row-index overflow needs > 2^33 rows in ONE partition — size numParts
  * so partitions stay far below that (32 parts × 8.6 B rows each covers
  * any realistic aggregate).
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
    * checkpoint is LAZY: the offsets pass right after is always the first
    * action, so materialization folds into that job instead of paying a
    * separate round-trip.
    */
  private def ranged(df: DataFrame, order: Seq[Column], numParts: Int): DataFrame =
    df.repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(eager = false)
      .withColumn("__pid", shiftright(col("__mid"), 33))

  /** Exact global `row_number()` over `order` (a TOTAL order — include a
    * unique tie-break key) as column `rankCol`; `totalCol`, when set, adds
    * the total row count (needed by [[ntileOfRank]]). Plan shape: one
    * range shuffle, no window, no global sort. Ranks are CONSECUTIVE, so
    * lead/lag/rolling shapes become plain equi-joins on `rank ± k`.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      totalCol: Option[String] = None, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val r = ranged(df, order, resolveParts(df, numParts))
    val counts = r.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = counts.map { case (pid, c) => val o = acc; acc += c; Row(pid, o) }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1),
      StructType(Seq(StructField("__pid", LongType), StructField("__off", LongType))))
    val out = r.join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__off") + col("__mid").bitwiseAND(lit(IdxMask)) + 1)
      .drop("__pid", "__off", "__mid")
    totalCol.fold(out)(tc => out.withColumn(tc, lit(acc)))
  }

  /** [[withGlobalRank]] plus exact inclusive running sums of each
    * `(valueCol, cumName)` pair, all from ONE range shuffle — the building
    * block for trailing-window rollups without any global window:
    * `trailing_k_sum(r) = cum(r) - cum(r-k)` via an equi-join on the
    * consecutive rank. Values must be LongType (exact).
    */
  def withRankAndSums(df: DataFrame, order: Seq[Column], rankCol: String,
      values: Seq[(Column, String)], numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    var r = ranged(df, order, resolveParts(df, numParts))
    values.zipWithIndex.foreach { case ((v, _), i) => r = r.withColumn(s"__v$i", v) }
    values.indices.foreach { i =>
      require(r.schema(s"__v$i").dataType == LongType,
        s"withRankAndSums value ${values(i)._2} must be LongType")
    }
    // coalesce: a partition whose values are all NULL sums to NULL, which
    // would NPE the driver-side getLong — treat it as 0, matching the
    // null-skipping window sum this helper replaces
    val partials = r.groupBy(col("__pid"))
      .agg(count(lit(1)).as("c"),
        values.indices.map(i => coalesce(sum(col(s"__v$i")), lit(0L)).as(s"s$i")): _*)
      .collect().map(x => (x.getLong(0), x.getLong(1),
        values.indices.map(i => x.getLong(2 + i))))
      .sortBy(_._1)
    var accC = 0L
    val accS = Array.fill(values.size)(0L)
    val offRows = partials.map { case (pid, c, ss) =>
      val row = Row.fromSeq(pid +: accC +: accS.toSeq)
      accC += c; ss.zipWithIndex.foreach { case (s, i) => accS(i) += s }
      row
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1),
      StructType(StructField("__pid", LongType) +: StructField("__off", LongType) +:
        values.indices.map(i => StructField(s"__soff$i", LongType))))
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
    * double sums differ from a sequential scan only by summation-grouping
    * ULPs (absorbed by any downstream rounding grid).
    */
  def withRunningSum(df: DataFrame, partCol: Option[String], order: Seq[Column],
      value: Column, cumCol: String, totCol: Option[String] = None,
      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val keyed = partCol.map(p => col(p) +: order).getOrElse(order)
    val r = ranged(df, keyed, resolveParts(df, numParts)).withColumn("__v", value)
    val isLong = r.schema("__v").dataType == LongType
    require(isLong || r.schema("__v").dataType == DoubleType,
      s"running-sum value must be long or double, got ${r.schema("__v").dataType}")
    // one row per (partition, stratum): strata are range-contiguous, so
    // this is ≤ numParts + |strata| rows — metadata-bounded
    // null-safe string key: the stratum column may contain nulls
    val partKey = coalesce(partCol.map(col).getOrElse(lit("")).cast("string"), lit("\u0000null"))
    // coalesce: an all-NULL (partition, stratum) cell sums to NULL, which
    // would NPE the driver-side getLong/getDouble — treat it as 0,
    // matching the null-skipping window sum this helper replaces
    val zero = if (isLong) lit(0L) else lit(0.0)
    val partialRows = r.groupBy(col("__pid"), partKey.cast("string").as("__k"))
      .agg(coalesce(sum(col("__v")), zero).as("s"))
      .collect()
    // prefix offsets per stratum, in pid order (earlier range partitions
    // hold strictly earlier rows of the stratum). Two typed accumulation
    // paths: long partials never round-trip through Double, so long sums
    // stay exact past 2^53.
    val offRows =
      if (isLong)
        partialRows.map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
          .groupBy(_._2).toSeq.flatMap { case (k, rows) =>
            var acc = 0L
            val tot = rows.map(_._3).sum
            rows.sortBy(_._1).map { case (pid, _, s) =>
              val o = acc; acc += s; Row(pid, k, o, tot)
            }
          }
      else
        partialRows.map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
          .groupBy(_._2).toSeq.flatMap { case (k, rows) =>
            var acc = 0.0
            val tot = rows.map(_._3).sum
            rows.sortBy(_._1).map { case (pid, _, s) =>
              val o = acc; acc += s; Row(pid, k, o, tot)
            }
          }
    val vt = if (isLong) LongType else DoubleType
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(StructField("__pid", LongType),
        StructField("__k", org.apache.spark.sql.types.StringType),
        StructField("__off", vt), StructField("__tot", vt))))
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
