package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatDotProduct, Hashing}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available to pure-SQL users.
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  *
  * (The Scala API goes through graft.functions.VectorFunctions directly
  * and does not require the extension.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(ext: SparkSessionExtensions, name: String, arity: Int)(
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name takes $arity argument(s)")
        build(args)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_dot", 2)(args => FloatDotProduct(args.head, args(1)))
    // the engine-portable primitives every graft operator builds on, for
    // pure-SQL users (catalyst trees mirroring graft.functions.Hashing;
    // DuckDB twins documented there)
    register(ext, "graft_h60", 1)(args => GraftExtensions.h60Expr(args.head))
    register(ext, "graft_rd4", 1)(args => GraftExtensions.rdExpr(args.head, 10000.0))
    register(ext, "graft_rd2", 1)(args => GraftExtensions.rdExpr(args.head, 100.0))
    register(ext, "graft_cosine", 2)(args =>
      GraftExtensions.cosineExpr(args.head, args(1)))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.LongType

  /** Catalyst twin of Hashing.h60: conv(substr(md5(x),1,15),16,10)::long. */
  private[graft] def h60Expr(arg: Expression): Expression =
    Cast(Conv(Substring(Md5(arg), Literal(1), Literal(15)),
      Literal(16), Literal(10)), LongType)

  /** Catalyst twin of Hashing.rd4/rd2: floor(x*scale + 0.5)/scale. */
  private[graft] def rdExpr(arg: Expression, scale: Double): Expression =
    Divide(Floor(Add(Multiply(arg, Literal(scale)), Literal(0.5))), Literal(scale))

  /** Cosine over two float vectors, composed from the codegen'd dot:
    * dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))).
    */
  private[graft] def cosineExpr(a: Expression, b: Expression): Expression =
    Divide(FloatDotProduct(a, b),
      Multiply(Sqrt(FloatDotProduct(a, a)), Sqrt(FloatDotProduct(b, b))))
}
