package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per test JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // plan-guard specs assert on full PushedFilters/ReadSchema lists
    .config("spark.sql.maxMetadataStringLength", "2000")
    // match Serve's serving config: graft_* SQL functions registered via
    // the extension, in every session of this context (incl. the
    // sessions Spark Connect creates per remote client)
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()

  /** Tiny events frame with the production schema (ts/event_type/user_id/value). */
  def eventsDf(rows: Seq[(String, String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ts", "event_type", "user_id", "value")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
  }

  def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
}
