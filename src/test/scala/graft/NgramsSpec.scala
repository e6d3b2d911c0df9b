package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NgramsExpr

/** Pins the native [[graft.functions.NgramsExpr]] n-gram extraction
  * bit-identical to the legacy builtin chain (split + transform/slice/
  * array_join, optionally array_distinct) on real testdata + edge cases.
  */
class NgramsSpec extends SparkSpec {

  private def legacy(df: DataFrame, n: Int, distinct: Boolean): DataFrame = {
    val core =
      s"""CASE WHEN size(tk) >= $n
              THEN transform(sequence(1, size(tk) - ${n - 1}),
                             i -> array_join(slice(tk, i, $n), ' '))
              ELSE slice(tk, 1, 0) END"""
    df.select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .select(col("doc_id"),
        expr(if (distinct) s"array_distinct($core)" else core).as("g"))
  }

  private def native(df: DataFrame, n: Int, distinct: Boolean): DataFrame =
    df.select(col("doc_id"), NgramsExpr.grams(col("text"), n, distinct).as("g"))

  private def assertEqual(df: DataFrame, n: Int, distinct: Boolean): Unit = {
    def rows(d: DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val l = rows(legacy(df, n, distinct))
    val r = rows(native(df, n, distinct))
    assert(l.keySet == r.keySet)
    l.foreach { case (id, g) =>
      assert(r(id) == g, s"gram mismatch for doc $id at n=$n distinct=$distinct")
    }
  }

  private val edges = docsDf(Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "  leading ws",
    3L -> "trailing ws  ",
    4L -> " both two three four five six seven eight nine ",
    5L -> " ",
    6L -> "",
    7L -> "one two",
    8L -> "rep rep rep rep rep rep rep rep rep rep",
    9L -> "unicode tökens 😀 emoji mixed into the ascii stream right here ok"))

  test("native bigrams (positional) == legacy") { assertEqual(edges, 2, distinct = false) }
  test("native 8-grams (distinct) == legacy") { assertEqual(edges, 8, distinct = true) }

  test("native == legacy on the sf0.001 corpus") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assertEqual(docs, 2, distinct = false)
    assertEqual(docs, 8, distinct = true)
  }
}
