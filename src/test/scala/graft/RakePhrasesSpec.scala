package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.RakePhrasesExpr

/** Pins the native [[graft.functions.RakePhrasesExpr]] phrase
  * segmentation bit-identical to the legacy interpreted HOF chain it
  * replaced in round 16 (flag/starts/stops/slice-join lambdas from
  * TextAnalysis.rakeKeyphrases), on real testdata plus edge cases. Order
  * and multiplicity both matter downstream (phrase occurrence counts),
  * so the comparison is on the exploded multiset per doc in positional
  * order.
  */
class RakePhrasesSpec extends SparkSpec {

  /** The exact pre-r16 expression tree from TextAnalysis.rakeKeyphrases. */
  private def legacyPhrases(df: DataFrame): DataFrame = {
    val stopArr = "array('the','a','of','and','to','in','is','')"
    df
      .select(col("doc_id"),
        graft.functions.WsTokensExpr.tokens(col("text")).as("tk"))
      .withColumn("flag", expr(s"transform(tk, t -> array_contains($stopArr, t))"))
      .withColumn("starts", expr(
        """CASE WHEN size(tk) < 1 THEN CAST(array() AS ARRAY<INT>)
               ELSE filter(sequence(1, size(tk)),
                    i -> NOT element_at(flag, i)
                         AND (i = 1 OR element_at(flag, i - 1)))
           END"""))
      .withColumn("stops", expr(
        """CASE WHEN size(tk) < 1 THEN CAST(array() AS ARRAY<INT>)
               ELSE filter(sequence(1, size(tk)), i -> element_at(flag, i))
           END"""))
      .select(col("doc_id"), expr(
        """transform(starts, s -> array_join(
             slice(tk, s,
               coalesce(array_min(filter(stops, x -> x > s)), size(tk) + 1) - s),
             ' '))""").as("phrases"))
  }

  private def nativePhrases(df: DataFrame): DataFrame =
    df.select(col("doc_id"), RakePhrasesExpr.phrases(col("text")).as("phrases"))

  private def assertEqualPhrases(df: DataFrame): Unit = {
    val legacy = legacyPhrases(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = nativePhrases(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.size == legacy.size)
    legacy.foreach { case (id, ph) =>
      assert(native(id) == ph, s"phrase mismatch for doc $id: ${native(id)} vs $ph")
    }
  }

  test("native phrases == legacy HOF chain on stopword/boundary edges") {
    assertEqualPhrases(docsDf(Seq(
      1L -> "the quick brown fox of the lazy dog",
      2L -> "  leading whitespace and trailing  ",
      3L -> " ",                   // only boundary empties: no phrases
      4L -> "",                    // empty text: no phrases
      5L -> "the of and to in is a",   // all stopwords: no phrases
      6L -> "repeat phrase and repeat phrase", // multiplicity preserved
      7L -> "a b a b",             // 'a' stop, 'b' phrase twice
      8L -> "one",                 // single-token phrase
      9L -> "THE The the",         // case-sensitive: only 'the' stops
      10L -> "ends with a stopword the",
      11L -> "tabs\tand\nnewlines\fsplit tokens the same way",
      12L -> "unicode tökens 😀 stay in one phrase"
    )))
  }

  test("native phrases == legacy HOF chain on the sf0.001 corpus") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    assertEqualPhrases(docs)
  }
}
