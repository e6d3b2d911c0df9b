package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FingerprintExpr

/** Pins the native [[graft.functions.FingerprintExpr]] rolling-hash fold
  * bit-identical to the legacy builtin formulation it replaced in round
  * 16 (the interpreted transform+aggregate chain — the last HOF kernel in
  * the text family), on real testdata plus the split()-boundary edge
  * cases. Unlike the SimHash fold this one is order- and multiplicity-
  * sensitive, so the edge list adds repeated tokens and both boundary
  * empties.
  */
class FingerprintSpec extends SparkSpec {

  /** The exact pre-r16 expression tree from TextAnalysis.fingerprint. */
  private def legacyFp(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      expr(
        """aggregate(
             transform(split(text, '\\s+'),
                       x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % 1000003),
             0L, (acc, x) -> (acc * 31 + x) % 2147483647)""").as("fingerprint"))

  private def nativeFp(df: DataFrame): DataFrame =
    df.select(col("doc_id"), FingerprintExpr.fp(col("text")).as("fingerprint"))

  private def assertEqualFps(df: DataFrame): Unit = {
    val legacy = legacyFp(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = nativeFp(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size == legacy.size)
    legacy.foreach { case (id, fp) =>
      assert(native(id) == fp, s"fingerprint mismatch for doc $id")
    }
  }

  test("native fingerprint == legacy HOF fold on split()-boundary edges") {
    assertEqualFps(docsDf(Seq(
      1L -> "the quick brown fox",
      2L -> "  leading whitespace",
      3L -> "trailing whitespace  ",
      4L -> "  both  sides  ",
      5L -> " ",            // split -> ["", ""]: TWO empty-token steps
      6L -> "",             // split -> [""]: one step
      7L -> "\t\n\f\r mixed\tseparators\nhere ",
      8L -> "dup dup dup order and multiplicity matter",
      9L -> "order matters reversed",
      10L -> "reversed matters order", // same tokens, different fold order
      11L -> "unicode tökens emoji 😀 mixed ascii",
      12L -> "a",
      13L -> "x y"     // NBSP is NOT Java \s: one 4-byte token
    )))
  }

  test("native fingerprint == legacy HOF fold on the sf0.001 corpus") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assertEqualFps(docs)
  }

  test("native fingerprint survives null text like the legacy expression") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, null)).toDF("doc_id", "text")
    val legacy = legacyFp(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val native = nativeFp(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(native == legacy)
    assert(native(2L).isEmpty)
  }
}
