package graft

import org.apache.spark.sql.functions._
import graft.functions.TextStatsExpr

/** Pins graft.functions.TextStatsExpr (the fused single-pass text-counter
  * expression) BIT-IDENTICAL to the builtin split/filter/aggregate/regexp
  * formulas it replaced in withQuality / withGopherRules / withLangId /
  * filterAgreement — on adversarial shapes, on random strings, and through
  * both the codegen and interpreted paths.
  */
class TextStatsSpec extends SparkSpec {

  private val legacy = Seq(
    expr("size(split(text, '\\\\s+'))").cast("long").as("e_n_tokens"),
    expr("aggregate(split(text, '\\\\s+'), 0L, (a, x) -> a + length(x))")
      .as("e_sum_tok_chars"),
    expr("size(filter(split(text, '\\\\s+'), x -> x rlike '[a-z]'))")
      .cast("long").as("e_n_alpha"),
    expr("size(filter(split(text, '\\\\s+'), x -> x IN ('the','a','of','and','to','in','is')))")
      .cast("long").as("e_n_stops"),
    regexp_count(col("text"), lit("[^a-z0-9\\s]")).cast("long").as("e_n_symbol"),
    expr("size(filter(split(text, '\\\\s+'), x -> x = 'the'))").cast("long").as("e_c_the"),
    expr("size(filter(split(text, '\\\\s+'), x -> x = 'der'))").cast("long").as("e_c_der"),
    expr("size(filter(split(text, '\\\\s+'), x -> x = 'el'))").cast("long").as("e_c_el"),
    expr("size(filter(split(text, '\\\\s+'), x -> x = 'le'))").cast("long").as("e_c_le"))

  private val fields = Seq("n_tokens", "sum_tok_chars", "n_alpha", "n_stops",
    "n_symbol", "c_the", "c_der", "c_el", "c_le")

  private def assertMatches(texts: Seq[String]): Unit = {
    val df = docsDf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .withColumn("__s", TextStatsExpr.stats(col("text")))
    val cols = col("doc_id") +: col("text") +:
      (fields.map(f => col(s"__s.$f")) ++ legacy)
    val rows = df.select(cols: _*).collect()
    rows.foreach { r =>
      fields.zipWithIndex.foreach { case (f, i) =>
        val got = r.get(2 + i)
        val want = r.get(2 + fields.length + i)
        assert(got == want,
          s"$f mismatch on ${Option(r.getString(1)).map(_.take(60))}: got $got want $want")
      }
    }
  }

  test("adversarial shapes match the builtin formulas field-for-field") {
    assertMatches(Seq(
      "",                         // split('') = [''] -> 1 empty part
      " ",                        // ['',''] -> 2 parts
      "   \t\r\n \f ",      // every Java-\s char, one run
      "a",                        // stopword alone
      " a ",                      // stop with leading/trailing empties
      "the cat sat on the mat",   // markers + stops
      "theory android elbow left",// stop/marker PREFIXES must not count
      "th an o t i e l d",        // near-miss short tokens
      "of to in is and a the",    // the whole stop list
      "der el le der le el",      // the non-stop markers
      "UPPER Case MiXeD",         // uppercase = symbols, no alpha a-z? (has them)
      "ABC DEF",                  // tokens with NO lowercase at all
      "123 456 7z",               // digits, one trailing alpha
      "!!! ??? ;;; ...",          // pure symbols
      "tab\tsep\nnewline\rcr",    // mixed single separators
      "a  b   c",                 // multi-char separator runs
      "trailing space ",          // trailing empty part
      " leading",                 // leading empty part
      "café naïve",     // 2-byte UTF-8 letters (symbols, char len)
      " nbsp is not ws",// NBSP is NOT Java \s -> token char + symbol
      "emoji 😀 end",   // non-BMP codepoint (4-byte UTF-8): ONE symbol
      "世界 hello world", // CJK (3-byte) tokens
      "eléphant le el",      // marker prefix with accent continuation
      "x" * 5000,                 // long single token
      ("the " * 2000).trim))      // many marker hits
  }

  test("random strings match on both codegen and interpreted paths") {
    val rnd = new scala.util.Random(421)
    val alphabet =
      "abcdefghijklmnopqrstuvwxyz0123456789 \t\n\r\f!?.,;ABCXYZé 世" +
        "😀" // keep the surrogate PAIR together so strings stay valid UTF-16
    val words = Seq("the", "a", "of", "and", "to", "in", "is", "der", "el", "le",
      "theo", "ele", "lee", "an", "d")
    val texts = (1 to 300).map { _ =>
      val sb = new StringBuilder
      val n = rnd.nextInt(40)
      (0 until n).foreach { _ =>
        if (rnd.nextBoolean()) sb.append(words(rnd.nextInt(words.length)))
        else {
          val m = rnd.nextInt(6)
          (0 until m).foreach { _ =>
            val i = rnd.nextInt(alphabet.length)
            // never start at a low surrogate (keeps UTF-16 valid)
            val c = alphabet.charAt(i)
            if (Character.isLowSurrogate(c)) sb.append("😀")
            else if (Character.isHighSurrogate(c)) sb.append("😀")
            else sb.append(c)
          }
        }
        if (rnd.nextInt(3) == 0) sb.append(' ')
      }
      sb.toString
    }
    assertMatches(texts)
    // interpreted path: evaluate the helper directly and compare to one
    // codegen'd row
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("the el le der a of")
    val row = graft.functions.TextStatsHelper.compute(s)
    assert(row.getLong(0) == 6L && row.getLong(3) == 3L && row.getLong(5) == 1L &&
      row.getLong(6) == 1L && row.getLong(7) == 1L && row.getLong(8) == 1L)
  }

  test("null text yields a null struct, not an NPE") {
    val df = docsDf(Seq((1L, "ok"))).union(
      spark.sql("SELECT 2L AS doc_id, CAST(NULL AS STRING) AS text"))
    val out = df.select(col("doc_id"), TextStatsExpr.stats(col("text")).as("s"))
      .orderBy("doc_id").collect()
    assert(out(0).getStruct(1).getLong(0) == 1L)
    assert(out(1).isNullAt(1))
  }

  test("rewritten screens keep their legacy column types") {
    import graft.operators.TextAnalysis
    val d = docsDf(Seq((1L, "the quick brown fox")))
    val q = TextAnalysis.withQuality(d)
    assert(q.schema("n_tokens").dataType.typeName == "integer")
    assert(q.schema("quality").dataType.typeName == "double")
    val g = TextAnalysis.withGopherRules(d)
    assert(g.schema("n_tokens").dataType.typeName == "long")
    assert(g.schema("stop_hits").dataType.typeName == "long")
    assert(g.schema("mean_tok_chars").dataType.typeName == "double")
    val l = TextAnalysis.langId(d)
    assert(l.schema("c_en").dataType.typeName == "integer")
    assert(l.select("pred_lang").head.getString(0) == "en")
  }
}
