package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    // read it as raw nanos and convert. `div` (integer division) is required:
    // nano values exceed 2^53, so a double roundtrip would lose precision.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // timestamp_ntz keeps wall-clock semantics end-to-end: the source file is
    // tz-naive and the DuckDB oracle compares naive timestamps. The raw nanos
    // column survives as ts_ns so range predicates stay pushable into the
    // parquet scan (a predicate on the derived ts cannot be pushed).
    if (name == "events")
      df.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }
}
