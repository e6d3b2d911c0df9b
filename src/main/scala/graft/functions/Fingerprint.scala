package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling document-fingerprint fold
  * ([[graft.operators.TextAnalysis.fingerprint]]).
  *
  * The builtin formulation was the last interpreted higher-order-function
  * kernel in the text family (the r15 verdict's "not yet" list):
  *
  *   aggregate(
  *     transform(split(text, '\\s+'),
  *               x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  *                    % 1000003),
  *     0L, (acc, x) -> (acc * 31 + x) % 2147483647)
  *
  * `transform`/`aggregate` lambdas run INTERPRETED (~1µs/element, no
  * codegen), and the chain additionally materializes the split token
  * array plus a transformed copy per row. Unlike the SimHash/Shingles
  * folds this one is ORDER- and MULTIPLICITY-sensitive (a sequential
  * hash chain), so neither of those expressions drops in — it needs its
  * own single compiled pass (optimization guide §4).
  *
  * Semantics replicated exactly (pinned by FingerprintSpec against the
  * original expression tree on the real corpus + boundary cases):
  *  - `split(text, '\\s+')` is Java-regex split with limit -1: tokens in
  *    document order; an empty part leads when the text is empty or
  *    starts with whitespace, and TRAILS when it ends with whitespace
  *    (both can occur — " " yields ["", ""]). Every part, empty included,
  *    contributes one fold step, in order, with multiplicity.
  *  - the per-token value is the first 15 hex digits of md5(token) (the
  *    Hashing.h60 contract) reduced mod 1000003.
  *  - the fold is exact long arithmetic: acc = (acc*31 + x) % 2147483647,
  *    every operand non-negative and far below overflow.
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects a STRING child, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    FingerprintHelper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FingerprintHelper.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintExpr {
  /** The rolling-hash fingerprint column: one fused compiled pass. */
  def fp(text: Column): Column =
    SqlBridge.column(FingerprintExpr(SqlBridge.expression(text)))
}

/** The single-pass ordered fold, Java-callable from generated code. */
object FingerprintHelper {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 11 || b == '\f' || b == '\r'

  /** h60(token bytes) % 1000003 — md5 first 15 hex digits = digest bytes
    * 0..6 plus the high nibble of byte 7 (the Hashing.h60jvm contract).
    */
  private def tokenValue(digest: MessageDigest, bytes: Array[Byte],
      start: Int, len: Int): Long = {
    digest.reset()
    digest.update(bytes, start, len)
    val d = digest.digest()
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
    h = (h << 4) | ((d(7) >> 4) & 0xFL)
    h % 1000003L
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val digest = md5.get()
    var acc = 0L
    def step(start: Int, endExcl: Int): Unit = {
      acc = (acc * 31L + tokenValue(digest, bytes, start, endExcl - start)) %
        2147483647L
    }
    // Java split(regex, -1) emits a LEADING empty part when the text is
    // empty or starts with a separator...
    if (n == 0 || isWs(bytes(0))) step(0, 0)
    var i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        step(start, i)
      } else i += 1
    }
    // ...and a TRAILING empty part when it ends with one (limit -1 keeps
    // trailing empties; both boundary empties occur for all-whitespace
    // text).
    if (n > 0 && isWs(bytes(n - 1))) step(0, 0)
    acc
  }
}
