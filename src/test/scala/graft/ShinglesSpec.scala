package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, ShinglesExpr}

/** Pins the native [[graft.functions.ShinglesExpr]] shingle pass
  * bit-identical to the legacy builtin chain it replaced in round 15
  * (split + interpreted transform/slice/array_join + array_distinct +
  * per-row h60), on real testdata plus boundary-token edge cases, for
  * both registered n values (3-gram Jaccard family, 8-gram novelty
  * family).
  */
class ShinglesSpec extends SparkSpec {

  /** The exact pre-r15 expression chain from Dedup.shinglesFrom. */
  private def legacy(df: DataFrame, n: Int): DataFrame =
    df
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .select(col("doc_id"), explode(expr(
        s"""array_distinct(
              CASE WHEN size(tk) >= $n
                   THEN transform(sequence(1, size(tk) - ${n - 1}),
                                  i -> array_join(slice(tk, i, $n), ' '))
                   ELSE slice(tk, 1, 0) END)""")).as("sg"))
      .select(col("doc_id"), Hashing.h60(col("sg")).as("shingle"))

  private def native(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"),
      explode(ShinglesExpr.hashes(col("text"), n)).as("shingle"))

  private def assertEqual(df: DataFrame, n: Int): Unit = {
    def rows(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val l = rows(legacy(df, n))
    val r = rows(native(df, n))
    assert(r == l, s"shingle mismatch at n=$n")
  }

  private val edges = docsDf(Seq(
    1L -> "the quick brown fox jumps",
    2L -> "  leading ws makes an empty boundary token here",
    3L -> "trailing ws token boundary  ",
    4L -> " both  sides padded ",
    5L -> " ",                    // ["",""] — under any n>=3: no shingles
    6L -> "",                     // [""]
    7L -> "one two",              // fewer tokens than n=3
    8L -> "a b c",                // exactly 3 tokens
    9L -> "rep rep rep rep rep",  // duplicate n-grams collapse
    10L -> "unicode tökens 😀 emoji mixed into the ascii stream right here",
    11L -> "\ttabs\nand\rother\fseparators between words one two three"))

  test("native shingles == legacy chain on edge cases, n=3") { assertEqual(edges, 3) }
  test("native shingles == legacy chain on edge cases, n=8") { assertEqual(edges, 8) }

  test("native shingles == legacy chain on the sf0.001 corpus, n=3 and n=8") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assertEqual(docs, 3)
    assertEqual(docs, 8)
  }
}
