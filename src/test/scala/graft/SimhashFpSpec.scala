package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SimhashFpExpr

/** Pins the native [[graft.functions.SimhashFpExpr]] fingerprint fold
  * bit-identical to the legacy builtin formulation it replaced in round
  * 15 (the interpreted aggregate+zip_with fold), on real testdata plus
  * the split()-boundary edge cases.
  */
class SimhashFpSpec extends SparkSpec {

  /** The exact pre-r15 expression tree from Dedup.simhashFingerprints. */
  private def legacyFp(df: DataFrame): DataFrame = {
    val bits = graft.operators.Dedup.SimhashBits
    df
      .select(col("doc_id"),
        expr("""transform(array_distinct(split(text, '\\s+')),
                          t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))""")
          .as("hs"))
      .select(col("doc_id"),
        expr(
          s"""aggregate(hs,
                array_repeat(0L, $bits),
                (acc, h) -> zip_with(acc, sequence(0L, ${bits - 1}L),
                  (a, i) -> a + CASE WHEN (h div shiftleft(1L, CAST(i AS INT))) % 2 = 1
                                     THEN 1L ELSE -1L END),
                acc -> aggregate(
                  zip_with(acc, sequence(0L, ${bits - 1}L),
                    (s, i) -> CASE WHEN s > 0 THEN shiftleft(1L, CAST(i AS INT))
                                   ELSE 0L END),
                  0L, (x, y) -> x + y))""").as("fp"))
  }

  private def nativeFp(df: DataFrame): DataFrame =
    df.select(col("doc_id"), SimhashFpExpr.fp(col("text")).as("fp"))

  private def assertEqualFps(df: DataFrame): Unit = {
    val legacy = legacyFp(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = nativeFp(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size == legacy.size)
    legacy.foreach { case (id, fp) =>
      assert(native(id) == fp, s"fp mismatch for doc $id")
    }
  }

  test("native fp == legacy HOF fp on split()-boundary edge cases") {
    assertEqualFps(docsDf(Seq(
      1L -> "the quick brown fox",
      2L -> "  leading whitespace",
      3L -> "trailing whitespace  ",
      4L -> "  both  sides  ",
      5L -> " ",            // split -> ["", ""], one distinct empty token
      6L -> "",             // split -> [""]
      7L -> "\t\n\f\r mixed\tseparators\nhere ",
      8L -> "dup dup dup distinct once",
      9L -> "unicode tökens emoji 😀 mixed ascii",
      10L -> "a",           // single 1-byte token
      11L -> "x y"     // NBSP is NOT Java \s: one 4-byte token
    )))
  }

  test("native fp == legacy HOF fp on the sf0.001 documents corpus") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assertEqualFps(docs)
  }

  test("native fp survives null text like the legacy expression") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, null)).toDF("doc_id", "text")
    val legacy = legacyFp(df).collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val native = nativeFp(df).collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(native == legacy)
    assert(native(2L).isEmpty)
  }
}
