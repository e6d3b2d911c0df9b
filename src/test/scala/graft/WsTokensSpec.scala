package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WsTokensExpr

/** Pins the native [[graft.functions.WsTokensExpr]] tokenizer
  * bit-identical to `split(text, '\\s+')` (Java split, limit -1) on
  * real testdata plus boundary edge cases.
  */
class WsTokensSpec extends SparkSpec {

  private def assertEqual(df: DataFrame): Unit = {
    val rows = df
      .select(col("doc_id"),
        split(col("text"), "\\s+").as("l"),
        WsTokensExpr.tokens(col("text")).as("n"))
      .collect()
    rows.foreach { r =>
      val l = if (r.isNullAt(1)) null else r.getSeq[String](1)
      val n = if (r.isNullAt(2)) null else r.getSeq[String](2)
      assert(n == l, s"token mismatch for doc ${r.getLong(0)}: $l vs $n")
    }
  }

  test("native tokens == split on edge cases") {
    assertEqual(docsDf(Seq(
      1L -> "the quick brown fox",
      2L -> "  leading",
      3L -> "trailing  ",
      4L -> " both  sides ",
      5L -> " ",
      6L -> "",
      7L -> "\t\n\f\r mixed\tseparators\nhere ",
      8L -> "single",
      9L -> "unicode tökens 😀 emoji",
      10L -> "a b"))) // NBSP is not Java \s: one token
  }

  test("native tokens == split handles null like the builtin") {
    import spark.implicits._
    assertEqual(Seq((1L, "x y"), (2L, null)).toDF("doc_id", "text"))
  }

  test("native tokens == split on the sf0.001 corpus") {
    assertEqual(graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")))
  }
}
