package graft

import graft.functions.{ArrayDot, ShingleHashes, TokenPolyHashes}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the custom Catalyst expressions: `array_dot`,
  * `shingle_hashes`, `token_poly_hashes` become callable from
  * `spark.sql(...)`.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (the standard SparkSessionExtensions mechanism), or
  *  - [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected a literal int, got $other")
  }

  private[graft] val descriptions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("array_dot",
      "array_dot(a, b) - codegen'd double dot product of two float/double arrays",
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot takes 2 arguments")
        ArrayDot(args(0), args(1))
      }),
    ("shingle_hashes",
      "shingle_hashes(text, n) - distinct word n-gram shingle hashes as array<bigint>",
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes takes 2 arguments")
        ShingleHashes(args(0), intArg(args(1), "shingle_hashes"))
      }),
    ("token_poly_hashes",
      "token_poly_hashes(text) - distinct 62-bit SQL-portable token hashes",
      (args: Seq[Expression]) => {
        require(args.length == 1, "token_poly_hashes takes 1 argument")
        TokenPolyHashes(args(0))
      }),
    // an AGGREGATE registers the same way: the analyzer wraps a returned
    // AggregateFunction in its AggregateExpression
    ("hll_sketch",
      "hll_sketch(key) - certified-HLL struct(n_regs, isum, hll_estimate)",
      (args: Seq[Expression]) => {
        require(args.length == 1, "hll_sketch takes 1 argument")
        graft.functions.HllSketchAgg(args(0))
      }),
  )

  /** Register the functions on a live session (temp-function scope). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (name, _, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
