package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: `split(text, '\\s+')` with Java
  * `String.split(regex, -1)` semantics, as one compiled byte scan.
  *
  * The builtin StringSplit evaluates through `UTF8String.split`, which
  * (as of Spark 4.x) compiles the regex pattern and round-trips the
  * UTF-8 payload through java.lang.String ON EVERY ROW — the tokenize
  * is the scan-stage cost of every text operator (LM scores, tf-idf,
  * DSIR, entropy, vocabulary, BM25, packing). This expression walks the
  * UTF-8 bytes once and emits ZERO-COPY token slices over the same
  * backing array.
  *
  * Exact-equality contract (pinned by WsTokensSpec against
  * `split(text, '\\s+')` on real testdata + edge cases):
  *  - separators are runs of Java-regex `\s` = ASCII [ \t\n\x0B\f\r]
  *    (multi-byte whitespace codepoints are TOKEN bytes, as before);
  *  - limit -1 boundary semantics: a leading separator run yields an
  *    empty first token, a trailing run an empty last token, and the
  *    empty string yields one empty token.
  */
case class WsTokensExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ws_tokens expects a STRING child, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    WsTokensHelper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokensHelper.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsTokensExpr {
  /** The token array column: one fused compiled pass over `text`. */
  def tokens(text: Column): Column =
    SqlBridge.column(WsTokensExpr(SqlBridge.expression(text)))
}

/** The single-pass scan, Java-callable from generated code. */
object WsTokensHelper {

  private val Empty = UTF8String.EMPTY_UTF8

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 11 || b == '\f' || b == '\r'

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](8)
    if (n == 0 || isWs(bytes(0))) out.add(Empty)
    var i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        val st = i
        while (i < n && !isWs(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, st, i - st)) // zero-copy slice
      } else i += 1
    }
    if (n > 0 && isWs(bytes(n - 1))) out.add(Empty)
    new GenericArrayData(out.toArray)
  }
}
