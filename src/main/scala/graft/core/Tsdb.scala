package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native re-expression of kadiyadb's query semantics.
  *
  * Reference behavior (studied, not copied):
  *  - Track accumulates (total, count) into a resolution-sized bucket for
  *    EVERY prefix of the series field list (/root/reference/epoch/epoch.go:66-80,
  *    /root/reference/database.go:153-171).
  *  - Fetch returns matching series' points in [from, to), where the field
  *    pattern supports `*` wildcards (/root/reference/database.go:175-255,
  *    /root/reference/index/node.go:126-198).
  *  - Data is partitioned into duration-sized epochs; results are chunked
  *    per epoch; retention expires old epochs
  *    (/root/reference/database.go:267-277, /root/reference/epoch/cache.go:136-156).
  *
  * Here the "database" is the `events` fact table and a series is identified
  * by fields = [event_type, user_id]. All transformations are declarative
  * DataFrame ops: aggregation is map-side-partial (shuffle volume is
  * |series x buckets|, not |events|), pattern matching is a pushed-down
  * predicate, and epochs map to time-partitioning — so the same plan holds
  * on a 1000-executor cluster at 100 TB.
  */
object Tsdb {

  /** Resolution bucket of a timestamp. Spark's date_trunc promotes ntz
    * inputs back to session-tz timestamps; cast back so wall-clock (ntz)
    * semantics survive to the parquet output (matches the tz-naive source).
    */
  def bucket(ts: Column, resolution: String): Column =
    date_trunc(resolution, ts).cast("timestamp_ntz")

  /** Canonical materialized store: one row per (series-prefix, bucket).
    * Equivalent of Track()'s write amplification, done as ONE aggregation
    * with grouping sets (depth-1 and depth-2 prefixes), not two passes.
    * Output: f1 (event_type), f2 (user_id as string; NULL at depth 1),
    *         depth, bucket, total, cnt.
    */
  def trackRollup(events: DataFrame, resolution: String = "hour"): DataFrame = {
    val base = events
      .withColumn("f1", col("event_type"))
      .withColumn("f2", col("user_id").cast("string"))
      .withColumn("bucket", bucket(col("ts"), resolution))
    base
      .groupingSets(
        Seq(Seq(col("f1"), col("bucket")), Seq(col("f1"), col("f2"), col("bucket"))),
        col("f1"), col("f2"), col("bucket"))
      .agg(
        round(sum(col("value")), 2).as("total"),
        count(lit(1)).as("cnt"))
      .withColumn("depth", when(col("f2").isNull, 1).otherwise(2))
  }

  /** Fetch: field-pattern + time-range scan over the canonical store.
    * `pattern` entries: Some(v) = exact match, None = `*` wildcard.
    * Pattern length selects the prefix depth (kadiyadb returns the node at
    * exactly the queried depth — index/node.go:126). Bounds are [from, to).
    */
  def fetch(points: DataFrame, from: Column, to: Column, pattern: Seq[Option[String]]): DataFrame = {
    val depthMatch = col("depth") === lit(pattern.length)
    val fieldCols = Seq(col("f1"), col("f2"))
    val fieldMatch = pattern.zip(fieldCols).foldLeft(depthMatch) {
      case (acc, (Some(v), c)) => acc && c === lit(v)
      case (acc, (None, _))    => acc // wildcard
    }
    points.filter(fieldMatch && col("bucket") >= from && col("bucket") < to)
  }

  /** Epoch id for a bucket: duration-floor (database.go:267 split()). */
  def epochOf(bucket: Column, duration: String = "day"): Column =
    date_trunc(duration, bucket)
}
