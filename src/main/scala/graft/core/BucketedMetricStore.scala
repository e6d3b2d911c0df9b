package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MetricStore variant backed by a managed BUCKETED table: epoch
  * partitions (partition pruning + expire, like the directory store) plus
  * `bucketBy(buckets, firstField)` with files sorted by (fields..., bucket).
  *
  * What bucketing buys at 100 TB, on top of MetricStore's layout:
  *  - the merge-on-read aggregation in [[points]] runs with NO shuffle:
  *    the bucketed scan reports HashPartitioning(f1), which satisfies any
  *    grouping on a superset of {f1} — segment re-summing is map-side only;
  *  - store⋈store joins on the series key (correlation, as-of enrichment
  *    across two stores with the same bucket count) are zero-exchange
  *    sort-merge joins;
  *  - an exact-series fetch prunes to ONE bucket file group per epoch
  *    (`SelectedBucketsCount: 1 out of N` in the scan).
  *
  * Trade-off: bucket assignment hashes the FIRST field only, so a single
  * pathologically hot f1 value concentrates in one bucket — pick the
  * field order so f1 is the high-cardinality level (the reference has the
  * same concern in its index tree fan-out, /root/reference/index/node.go).
  *
  * Lifecycle: Track appends pre-aggregated delta segments (bucketed
  * appends are supported by saveAsTable); [[points]]/[[fetch]] merge
  * segments on read; [[expire]] drops whole epoch partitions through the
  * catalog. Per-epoch physical compaction belongs to the directory-backed
  * MetricStore — here [[compactAll]] rewrites the table in one bucketed
  * pass when segment counts warrant it.
  */
final class BucketedMetricStore(spark: SparkSession, val table: String,
    params: StoreParams = StoreParams(), buckets: Int = 32) {

  private val nFields = params.fields.length
  require(nFields >= 1, "at least one series field required")
  private def fieldCols = params.fields.map(col)

  private def ordered(df: DataFrame): DataFrame =
    df.select((fieldCols ++ Seq(col("bucket"), col("total"), col("cnt"),
      col("depth"), col("epoch"))): _*)

  def track(events: DataFrame): Unit =
    trackIncrements(events
      .withColumn("total", col("value"))
      .withColumn("cnt", lit(1L)))

  /** Append one pre-aggregated delta segment per (series prefix, bucket). */
  def trackIncrements(incs: DataFrame): Unit =
    ordered(MetricStore.aggregateIncrements(incs, params))
      .write.mode("append")
      .partitionBy("epoch")
      .bucketBy(buckets, params.fields.head)
      .sortBy(params.fields.head, (params.fields.tail :+ "bucket"): _*)
      .format("parquet")
      .saveAsTable(table)

  /** Segment-merged points; the grouping covers the bucket key, so the
    * bucketed scan's partitioning satisfies it — no Exchange in the plan.
    */
  def points(): DataFrame =
    spark.table(table)
      .groupBy((Seq(col("epoch"), col("depth")) ++ fieldCols :+ col("bucket")): _*)
      .agg(sum(col("total")).as("total"), sum(col("cnt")).as("cnt"))

  /** Fetch with kadiyadb pattern semantics (see MetricStore.fetch). An
    * exact first-field match additionally prunes to a single bucket.
    */
  def fetch(from: String, to: String, pattern: Seq[Option[String]]): DataFrame = {
    require(pattern.length <= nFields, s"pattern deeper than ${params.fields}")
    val pruned = points()
      .filter(col("epoch") >= date_format(Tsdb.epochOf(lit(from), params.epochDuration), "yyyy-MM-dd")
        && col("epoch") <= date_format(Tsdb.epochOf(lit(to), params.epochDuration), "yyyy-MM-dd"))
    val depthMatch = col("depth") === lit(pattern.length)
    val fieldMatch = pattern.zip(fieldCols).foldLeft(depthMatch) {
      case (acc, (Some(v), c)) => acc && c === lit(v)
      case (acc, (None, _))    => acc // wildcard
    }
    pruned.filter(fieldMatch &&
      col("bucket") >= lit(from).cast("timestamp_ntz") &&
      col("bucket") < lit(to).cast("timestamp_ntz"))
  }

  /** Expire epochs older than the retention window (counted back from the
    * newest epoch present), by dropping whole partitions through the
    * catalog. SHOW PARTITIONS is metadata-only — the collected list is
    * bounded by the number of epochs, never by data volume.
    */
  def expire(): Seq[String] = {
    val epochs = spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0).stripPrefix("epoch=")).toSeq
    if (epochs.isEmpty) return Seq.empty
    val cutoff = java.time.LocalDate.parse(epochs.max)
      .minusDays(params.retentionEpochs.toLong - 1)
    val dropped = epochs.filter(e => java.time.LocalDate.parse(e).isBefore(cutoff))
    dropped.foreach { e =>
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (epoch='$e') PURGE")
    }
    dropped.sorted
  }

  /** Rewrite the whole table with segments merged (one bucketed pass).
    * Unlike the directory store's per-epoch compact, bucketed saveAsTable
    * can't overwrite a single partition — run this on a cadence matched
    * to append volume, or stay on MetricStore when per-epoch compaction
    * dominates the write path.
    *
    * Durability: the merged rows are written to a staging TABLE first
    * (durable parquet), and the main table is then rewritten FROM the
    * staging table. A failure at any step leaves the data recoverable —
    * either the source table is untouched (staging write failed), or the
    * fully-written staging table still exists (swap failed). The merge
    * never lives only in volatile executor blocks.
    */
  def compactAll(): Unit = {
    val stage = table + "_compact_stage"
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    def writeBucketed(df: DataFrame, target: String): Unit =
      df.write.mode("overwrite")
        .partitionBy("epoch")
        .bucketBy(buckets, params.fields.head)
        .sortBy(params.fields.head, (params.fields.tail :+ "bucket"): _*)
        .format("parquet")
        .saveAsTable(target)
    writeBucketed(ordered(points()), stage)
    writeBucketed(ordered(spark.table(stage)), table)
    spark.sql(s"DROP TABLE $stage")
  }
}
