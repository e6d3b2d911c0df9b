package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram extraction as STRINGS — the sibling of
  * [[ShinglesExpr]] for consumers that need the gram text itself
  * (top-bigram and boilerplate reports), replacing the interpreted
  * `transform(sequence(...), i -> array_join(slice(tk, i, n), ' '))`
  * lambda (plus `array_distinct` when `distinct`).
  *
  * Exact-equality contract (pinned by NgramsSpec against the legacy
  * builtin chain): Java split(limit -1) boundary tokens participate,
  * grams are the n consecutive tokens joined by one space, order is
  * positional (or first-occurrence when `distinct`), and docs with
  * fewer than n tokens yield an empty array.
  */
case class NgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngrams expects a STRING child and n >= 1, got ${child.dataType.sql}, n=$n")

  override protected def nullSafeEval(input: Any): Any =
    NgramsHelper.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramsHelper.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramsExpr {
  def grams(text: Column, n: Int, distinct: Boolean): Column =
    SqlBridge.column(NgramsExpr(SqlBridge.expression(text), n, distinct))
}

/** The single-pass scan, Java-callable from generated code. */
object NgramsHelper {

  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    // token offsets in unboxed int[] buffers (r15 ADVICE: the previous
    // ArrayList<Integer> boxed two Integers per token in this hot path)
    val tok = new TokenOffsets().scan(bytes)
    val starts = tok.starts
    val ends = tok.ends
    val t = tok.count
    if (t < n) return new GenericArrayData(Array.empty[Any])
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    val out = new java.util.ArrayList[AnyRef](t - n + 1)
    var g = 0
    while (g <= t - n) {
      var glen = n - 1
      var j = 0
      while (j < n) { glen += ends(g + j) - starts(g + j); j += 1 }
      val gram = new Array[Byte](glen)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { gram(p) = ' '; p += 1 }
        val st = starts(g + j); val en = ends(g + j)
        System.arraycopy(bytes, st, gram, p, en - st)
        p += en - st
        j += 1
      }
      val u = UTF8String.fromBytes(gram)
      if (seen == null || seen.add(u)) out.add(u)
      g += 1
    }
    new GenericArrayData(out.toArray)
  }
}
