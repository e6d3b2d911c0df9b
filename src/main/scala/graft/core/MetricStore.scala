package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Store parameters — the Spark-native analog of kadiyadb's params.json
  * (/root/reference/database.go:15-31): resolution buckets points, epochs
  * partition storage, retention bounds history. MaxRO/MaxRWEpochs (an mmap
  * cache concern) have no Spark equivalent — the executor cache + partition
  * pruning fill that role.
  */
final case class StoreParams(
    resolution: String = "hour",
    epochDuration: String = "day",
    retentionEpochs: Int = 30)

/** Parquet-backed metric store with kadiyadb's DB API surface
  * (Track / Fetch / Expire / Sync — /root/reference/database.go:153-264).
  *
  * Layout: one parquet dataset partitioned by `epoch` (duration-floored
  * bucket). Track appends pre-aggregated segment files (the analog of RW
  * epoch blocks); Fetch merges segments with a sum-reaggregation (the
  * analog of reading RO+RW epochs) and prunes partitions via the epoch
  * predicate. Expire drops whole epoch partition directories, exactly like
  * cache.Expire's os.RemoveAll (/root/reference/epoch/cache.go:136-156).
  *
  * At cluster scale the same layout holds: epoch partitioning → partition
  * pruning; appends are small per-epoch deltas; a periodic compaction
  * (rewrite of one epoch partition) bounds segment counts.
  */
final class MetricStore(spark: SparkSession, path: String, params: StoreParams = StoreParams()) {

  private val dataDir = s"$path/points"

  /** Track: accumulate (total, count) per series prefix and bucket, append
    * to the epoch-partitioned store. Input schema: (ts, f1, f2, value).
    */
  def track(events: DataFrame): Unit = {
    val base = events
      .withColumn("bucket", Tsdb.bucket(col("ts"), params.resolution))
    val pts = base
      .groupingSets(
        Seq(Seq(col("f1"), col("bucket")), Seq(col("f1"), col("f2"), col("bucket"))),
        col("f1"), col("f2"), col("bucket"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("cnt"))
      .withColumn("depth", when(col("f2").isNull, 1).otherwise(2))
      .withColumn("epoch",
        date_format(Tsdb.epochOf(col("bucket"), params.epochDuration), "yyyy-MM-dd"))
    pts.write.mode("append").partitionBy("epoch").parquet(dataDir)
  }

  /** All points, segments merged (re-summed) back to one row per
    * (series, bucket). The epoch partition column stays available for
    * pruning by callers.
    */
  def points(): DataFrame =
    spark.read.parquet(dataDir)
      // partition-column inference types epoch=yyyy-MM-dd as DATE; keep the
      // store's contract stable as an ISO string (lexicographic == temporal)
      .withColumn("epoch", date_format(col("epoch"), "yyyy-MM-dd"))
      .groupBy(col("epoch"), col("depth"), col("f1"), col("f2"), col("bucket"))
      .agg(sum(col("total")).as("total"), sum(col("cnt")).as("cnt"))

  /** Fetch: field-pattern + [from, to) range, kadiyadb Fetch semantics.
    * The range predicate on `epoch` (a partition column) prunes whole
    * epoch directories before any file is read.
    */
  def fetch(from: String, to: String, pattern: Seq[Option[String]]): DataFrame = {
    val pruned = points()
      .filter(col("epoch") >= date_format(Tsdb.epochOf(lit(from), params.epochDuration), "yyyy-MM-dd")
        && col("epoch") <= date_format(Tsdb.epochOf(lit(to), params.epochDuration), "yyyy-MM-dd"))
    Tsdb.fetch(pruned, lit(from), lit(to), pattern)
  }

  /** Expire: physically drop epoch partitions older than `retentionEpochs`
    * counting back from the newest epoch present. Returns dropped epochs.
    */
  def expire(): Seq[String] = {
    val root = Paths.get(dataDir)
    if (!Files.exists(root)) return Seq.empty
    val epochs = listEpochDirs(root)
    if (epochs.isEmpty) return Seq.empty
    val keep = epochs.map(_._1).max
    val cutoff = java.time.LocalDate.parse(keep).minusDays(params.retentionEpochs.toLong - 1)
    val dropped = epochs.filter { case (e, _) => java.time.LocalDate.parse(e).isBefore(cutoff) }
    dropped.foreach { case (_, dir) =>
      Files.walk(dir).sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    }
    dropped.map(_._1).sorted
  }

  /** Sync: parquet appends are already durable; kept for API parity with
    * kadiyadb's DB.Sync (/root/reference/database.go:258).
    */
  def sync(): Unit = ()

  /** Compact one epoch partition: merge its accumulated append segments
    * back to one pre-aggregated file set. Bounds per-epoch file counts the
    * way kadiyadb's epoch close/snapshot does for its append logs
    * (/root/reference/index/index.go:24-65). Only the named partition is
    * rewritten (dynamic partition overwrite).
    */
  def compact(epoch: String): Unit = {
    val merged = spark.read.parquet(dataDir)
      .filter(col("epoch") === epoch)
      .withColumn("epoch", date_format(col("epoch"), "yyyy-MM-dd"))
      .groupBy(col("epoch"), col("depth"), col("f1"), col("f2"), col("bucket"))
      .agg(sum(col("total")).as("total"), sum(col("cnt")).as("cnt"))
      .select(col("f1"), col("f2"), col("bucket"), col("total"), col("cnt"),
        col("depth"), col("epoch"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.coalesce(1).write.mode("overwrite").partitionBy("epoch").parquet(dataDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  private def listEpochDirs(root: Path): Seq[(String, Path)] = {
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("epoch="))
        .map(p => (p.getFileName.toString.stripPrefix("epoch="), p))
        .toSeq
    } finally s.close()
  }
}
