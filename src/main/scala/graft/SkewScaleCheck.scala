package graft

import org.apache.spark.sql.functions._

import graft.core.Skew

/** Scale sanity harness for hot-key skew mitigation: a 50M-row fact
  * table whose hottest key owns 20% of all rows, joined to a dimension
  * too large to broadcast (broadcast disabled to model that regime —
  * with a genuinely small dim, broadcast IS the skew fix and salting is
  * moot). AQE is off so the measured partition shapes are the raw
  * hash-partitioned truth (AQE's skew split is the runtime fallback;
  * Skew.saltedJoin is for the planned-ahead case).
  *
  * Asserts:
  *   - the problem is real: the plain shuffle join funnels the hot
  *     key's entire output through ONE partition (max ≥ 5× mean);
  *   - saltedJoin fixes it: hot-key rows spread across `buckets`
  *     (key, salt) combos, max partition ≤ 2× mean;
  *   - semantics unchanged: identical row count and exact integer
  *     payload sum on both paths.
  *
  * `runMain graft.SkewScaleCheck [nRows]`.
  */
object SkewScaleCheck {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = Harness.session(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    val nKeys = 100000L
    // key 0 takes 20% of rows; the rest spread uniformly
    val big = spark.range(nRows).select(
      when(pmod(col("id"), lit(5L)) === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"),
      (col("id") % 1000L).as("v"))
    val small = spark.range(nKeys).select(col("id").as("k"), (col("id") * 7L).as("w"))

    import Harness.timed
    /** (rows, payload checksum, per-partition row counts) of a join result. */
    def profile(df: org.apache.spark.sql.DataFrame): (Long, Long, Seq[Long]) = {
      val parts = df.select((col("v") + col("w")).as("p"))
        .rdd.mapPartitions(it => {
          var n = 0L; var s = 0L
          it.foreach { r => n += 1; s += r.getLong(0) }
          Iterator((n, s))
        }).collect().toSeq
      (parts.map(_._1).sum, parts.map(_._2).sum, parts.map(_._1))
    }

    val (plainRows, plainSum, plainParts) = timed(s"plain shuffle join over $nRows rows") {
      profile(big.join(small, "k"))
    }
    val plainMax = plainParts.max
    val plainMean = plainRows.toDouble / plainParts.count(_ > 0)
    println(f"  plain: max partition $plainMax (${plainMax / plainMean}%.1f× mean) " +
      s"of ${plainParts.length} partitions")
    require(plainMax >= 5.0 * plainMean,
      f"hot key did not skew the plain join (max ${plainMax / plainMean}%.1f× mean) — " +
        "the harness premise is broken")

    val (saltRows, saltSum, saltParts) = timed("saltedJoin (32 buckets)") {
      profile(Skew.saltedJoin(big, small, "k", buckets = 32))
    }
    val saltMax = saltParts.max
    val saltMean = saltRows.toDouble / saltParts.count(_ > 0)
    println(f"  salted: max partition $saltMax (${saltMax / saltMean}%.1f× mean) " +
      s"of ${saltParts.length} partitions")
    require(saltMax <= 2.0 * saltMean,
      f"salted join still skewed: max partition ${saltMax / saltMean}%.1f× mean")

    require(saltRows == plainRows,
      s"salted join returned $saltRows rows, plain returned $plainRows")
    require(saltSum == plainSum,
      s"salted join checksum $saltSum != plain checksum $plainSum")

    println(s"SkewScaleCheck OK at $nRows rows")
    spark.stop()
  }
}
