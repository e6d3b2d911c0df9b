package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys.
  *
  * AQE's skew-join split handles most skew at runtime; this explicit
  * salted join is for the pathological case it can't: a single key so hot
  * one task would still own it (e.g. one shingle bucket holding a large
  * fraction of a 100 TB corpus). The large side gets a random salt in
  * [0, buckets); the small side is replicated across all salts; joining on
  * (key, salt) spreads the hot key over `buckets` tasks.
  */
object Skew {

  /** Equi-join `big` with `small` on `key`, salted `buckets` ways.
    * Result equals big.join(small, key) for inner joins.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
