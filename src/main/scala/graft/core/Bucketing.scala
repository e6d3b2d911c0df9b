package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage for co-located joins.
  *
  * At 100 TB the dominant cost of fact-to-fact joins (lineitem⋈orders,
  * points⋈points across epochs) is the shuffle. Writing both sides
  * bucketed + sorted on the join key makes the join a zero-exchange
  * sort-merge: each task reads matching bucket files from both tables.
  * This is the Spark analog of kadiyadb keeping a series' points
  * contiguous within an epoch block (/root/reference/block/block.go:49-61).
  */
object Bucketing {

  /** Persist `df` as a managed parquet table bucketed and sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner emits a
    * sort-merge join with NO shuffle exchange on either side.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
