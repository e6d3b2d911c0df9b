package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS) across generator versions; adapt to whichever the
    // file carries so every Tsdb operator sees the same schema: `ts` as
    // timestamp_ntz (wall-clock, matching the tz-naive source and the
    // DuckDB oracle) + `ts_ns` as raw wall-clock nanos since epoch.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // TIMESTAMP(NANOS) read as raw nanos (nanosAsLong). `div`
          // (integer division) is required: nano values exceed 2^53, so a
          // double roundtrip would lose precision. The raw nanos column
          // survives as ts_ns so range predicates stay pushable into the
          // parquet scan (a predicate on the derived ts cannot be pushed).
          df.withColumn("ts_ns", col("ts"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // TIMESTAMP(MICROS) inferred as ntz (isAdjustedToUTC=false under
          // the default inferTimestampNTZ). Here `ts` IS the raw scan
          // column — range predicates on it push down — and ts_ns is
          // derived via timestampdiff, pure wall-clock arithmetic on ntz
          // with no session-timezone dependence.
          df.withColumn("ts", col("ts").cast("timestamp_ntz"))
            .withColumn("ts_ns",
              expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
        case other =>
          // A session-timezone-adjusted TimestampType read (micros file
          // written with isAdjustedToUTC=true, or inferTimestampNTZ off)
          // would SILENTLY shift wall clocks in ts and the derived ts_ns
          // for any non-UTC session — fail loudly instead.
          throw new IllegalStateException(
            s"events.ts read as $other — expected raw nanos (LongType) or TIMESTAMP_NTZ; " +
              "refusing a timezone-adjusted read that would shift wall clocks")
      }
    else df
  }

  /** Ensure a CPU-heavy projection's input has at least the session's
    * shuffle-partition parallelism. Parquet splits at row-group
    * granularity, so a small file arrives as ONE scan task and
    * serializes per-row regex/shingling work onto one core while the
    * rest idle. At real corpus scale the scan already has more splits
    * than the session width and this is a no-op (nothing moves); call it
    * on the NARROW projection only, so the conditional shuffle carries
    * just the columns the hot expression needs.
    */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // no .rdd on a stream; micro-batches size themselves
    // If the plan already contains a shuffle-inducing operator, its output
    // is at shuffle width by construction — and, under AQE, the .rdd width
    // probe below would eagerly EXECUTE those upstream stages at plan time
    // just to read a partition count, doubling the work. Probe only
    // shuffle-free (scan + narrow) inputs, where .rdd is pure planning.
    // (coalesce — Repartition with shuffle=false — is NOT wide: it narrows
    // without an exchange, exactly the sub-width shape spread exists for)
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.optimizedPlan.collectFirst {
      case _: Aggregate | _: Join | _: Window | _: Sort | _: Deduplicate => ()
      case r: Repartition if r.shuffle => ()
      case _: RepartitionByExpression => ()
    }.isDefined
    if (wide) return df
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  import org.apache.spark.sql.types._

  /** Source schema for text-format event feeds (`ts` as an ISO-8601
    * wall-clock string). Explicit — schema inference would both scan the
    * data twice and guess types non-deterministically.
    */
  val eventsTextSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Load an events feed from CSV or JSON-lines with the SAME output
    * schema the parquet path produces (ts as timestamp_ntz + raw ts_ns) —
    * every Tsdb operator runs unchanged on top. ts_ns is derived at micro
    * precision (timestamp_ntz's full resolution), so a predicate on ts_ns
    * selects exactly the rows the same predicate on ts would, including
    * feeds with fractional-second timestamps.
    *
    * `value` is SNAPPED to the 2-dec cent grid at this boundary: the
    * exact-LONG-cents fused aggregates (ts_topk_movers et al.) assume
    * whole-cent values (`round(v*100)` lossless), and the generated
    * parquet honors the grid by construction (pinned in TablesSpec) — a
    * text feed carrying sub-cent values would otherwise silently diverge
    * from the per-bucket-rounded oracle arithmetic (r14 advice).
    */
  def loadEventsText(spark: SparkSession, path: String, format: String): DataFrame = {
    val reader = spark.read.schema(eventsTextSchema)
    val raw = format.toLowerCase match {
      // escape = '"' selects RFC-4180 doubled-quote style (Spark's default
      // escape is backslash, which mangles quoted JSON payload columns)
      case "csv" => reader.option("header", "true").option("escape", "\"").csv(path)
      case "json" | "jsonl" => reader.json(path)
      case other => throw new IllegalArgumentException(
        s"unsupported events text format '$other' (csv, json)")
    }
    raw
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .withColumn("ts_ns",
        expr("unix_micros(CAST(ts AS TIMESTAMP))") * 1000L)
      .withColumn("value", round(col("value") * 100).cast("long") / 100.0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"), col("ts_ns"))
  }
}
