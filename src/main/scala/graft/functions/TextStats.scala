package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the per-document text-screen hot path.
  *
  * Every text-quality screen (quality composite, Gopher rules, the linear
  * quality model, lang-id marker voting) derives from the same handful of
  * whitespace-token statistics. Computing them with builtins costs one
  * regex `split` (array allocation) plus one INTERPRETED higher-order
  * lambda (~1µs/token — `filter`/`aggregate` have no codegen) per
  * statistic per row; profiled on the documents corpus the screen stack
  * paid 2-4 split()+lambda evaluations per row even after manual
  * projection-level CSE.
  *
  * TextStats replaces all of it with ONE pass over the UTF-8 bytes — no
  * regex, no token array, no lambda dispatch — returning a struct of
  * counters that are BIT-IDENTICAL to the builtin formulas they replace
  * (pinned by TextStatsSpec against the legacy expressions):
  *
  *  - `n_tokens`      = size(split(text, '\\s+'))              (Java split
  *    semantics, limit -1: leading/trailing separator runs produce empty
  *    parts, the empty string yields one empty part)
  *  - `sum_tok_chars` = aggregate(tk, 0L, (a,x) -> a + length(x))
  *  - `n_alpha`       = size(filter(tk, x -> x rlike '[a-z]'))
  *  - `n_stops`       = size(filter(tk, x -> x IN ('the','a','of','and',
  *    'to','in','is')))
  *  - `n_symbol`      = regexp_count(text, '[^a-z0-9\\s]')     (one count
  *    per non-matching CODEPOINT — multi-byte lead bytes count once)
  *  - `c_the/c_der/c_el/c_le` = size(filter(tk, x -> x = '<marker>')) —
  *    the lang-id marker votes.
  *
  * `\s` here is Java-regex ASCII whitespace ([ \t\n\x0B\f\r]) — the same
  * class `split(text, '\\s+')` used, so non-ASCII spaces are token chars
  * (and symbols), exactly as before. DuckDB oracle twins keep using the
  * regex formulas; equality holds because the counters are integers.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema

  // Fail at analysis rather than a runtime ClassCastException in
  // compute() when handed a non-string child.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats expects a STRING child, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    TextStatsHelper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStatsHelper.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_tok_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stops", LongType, nullable = false),
    StructField("n_symbol", LongType, nullable = false),
    StructField("c_the", LongType, nullable = false),
    StructField("c_der", LongType, nullable = false),
    StructField("c_el", LongType, nullable = false),
    StructField("c_le", LongType, nullable = false)))

  /** The struct column: one fused pass over `text`. */
  def stats(text: Column): Column =
    SqlBridge.column(TextStatsExpr(SqlBridge.expression(text)))
}

/** The single-pass scan, Java-callable from generated code (static
  * forwarder). Iterates raw UTF-8 bytes: ASCII classes ([a-z], [0-9],
  * Java-\s) are single-byte tests; multi-byte codepoints are counted at
  * their lead byte ((b & 0xC0) != 0x80) so char counts match
  * UTF8String.numChars and per-codepoint regex match counts.
  */
object TextStatsHelper {

  def compute(s: UTF8String): InternalRow = {
    val n = s.numBytes
    var i = 0
    var sepRuns = 0L
    var inWs = false
    var sumLen = 0L
    var nAlpha = 0L
    var nStops = 0L
    var nSym = 0L
    var cThe = 0L
    var cDer = 0L
    var cEl = 0L
    var cLe = 0L
    // current-token state
    var tokStart = 0
    var tokChars = 0L
    var tokHasAlpha = false
    var inTok = false

    // token-end bookkeeping: length/alpha tallies plus the tiny
    // fixed-width stop/marker table (all stop + marker words are ≤ 3
    // ASCII bytes, so a byteLen switch + direct byte compares suffice)
    def endToken(endExcl: Int): Unit = {
      sumLen += tokChars
      if (tokHasAlpha) nAlpha += 1
      val len = endExcl - tokStart
      if (len >= 1 && len <= 3) {
        val b0 = s.getByte(tokStart)
        if (len == 1) {
          if (b0 == 'a') nStops += 1
        } else {
          val b1 = s.getByte(tokStart + 1)
          if (len == 2) {
            if (b0 == 'o' && b1 == 'f') nStops += 1
            else if (b0 == 't' && b1 == 'o') nStops += 1
            else if (b0 == 'i' && (b1 == 'n' || b1 == 's')) nStops += 1
            else if (b0 == 'e' && b1 == 'l') cEl += 1
            else if (b0 == 'l' && b1 == 'e') cLe += 1
          } else {
            val b2 = s.getByte(tokStart + 2)
            if (b0 == 't' && b1 == 'h' && b2 == 'e') { nStops += 1; cThe += 1 }
            else if (b0 == 'a' && b1 == 'n' && b2 == 'd') nStops += 1
            else if (b0 == 'd' && b1 == 'e' && b2 == 'r') cDer += 1
          }
        }
      }
      inTok = false
      tokChars = 0L
      tokHasAlpha = false
    }

    while (i < n) {
      val b = s.getByte(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 11 || b == '\f' || b == '\r'
      if (isWs) {
        if (inTok) endToken(i)
        if (!inWs) sepRuns += 1
        inWs = true
      } else {
        if (!inTok) { inTok = true; tokStart = i }
        inWs = false
        if ((b & 0xC0) != 0x80) { // non-continuation: one codepoint
          tokChars += 1
          val isLower = b >= 'a' && b <= 'z'
          if (isLower) tokHasAlpha = true
          else if (!(b >= '0' && b <= '9')) nSym += 1
        }
      }
      i += 1
    }
    if (inTok) endToken(n)
    // Java split(limit=-1): parts = separator runs + 1 (leading/trailing
    // runs contribute empty parts; "" -> [""]).
    val nTokens = sepRuns + 1L
    new GenericInternalRow(Array[Any](
      nTokens, sumLen, nAlpha, nStops, nSym, cThe, cDer, cEl, cLe))
  }
}
