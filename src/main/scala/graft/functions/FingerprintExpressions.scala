package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Rabin–Karp document fingerprint as one codegen'd kernel.
  *
  * The Column form (`aggregate(filter(split(text, "")), …)`) materializes
  * a per-CHARACTER string array per row and folds it with an interpreted
  * higher-order lambda — three allocations and a virtual call per
  * character on the hottest sampling path in the engine
  * (`Sampling.hashSample` gates every row of the corpus through it).
  * This expression walks the code points in a tight loop instead;
  * arithmetic is verified identical to the Column form (same
  * `acc·31 + codePoint mod 1e9+7` fold — `ascii()` of a 1-char split
  * cell IS the code point, surrogate pairs included), so every
  * fingerprint-certified oracle replays unchanged.
  */
object TextOps {
  private final val M = 1000000007L

  def rollingFingerprint(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = java.lang.Math.floorMod(acc * 31L + cp, M)
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Codegen'd Rabin–Karp fingerprint over a string column. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint needs a string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextOps.rollingFingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextOps.rollingFingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object FingerprintFunctions {
  def rolling_fingerprint(text: Column): Column =
    GraftBridge.column(RollingFingerprint(GraftBridge.expression(text)))
}
