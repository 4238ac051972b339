package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** The per-row bloom membership probe as ONE codegen'd kernel.
  *
  * The Column formulation of a k-probe conjunction re-derives the two
  * Kirsch–Mitzenmacher base hashes inside every conjunct — and twice per
  * conjunct, because the position feeds both the word index (pos / 64)
  * and the bit index (pos % 64) — 4·k hash chains per row for k
  * single-multiply probes. Catalyst's subexpression elimination does not
  * reach across split filter conjuncts, so the duplication survives to
  * the generated code. This expression computes h1/h2 exactly once and
  * loops the k probes in a tight JVM method; the word array rides the
  * plan as a codegen reference object instead of a 1024-element array
  * literal. Arithmetic is bit-identical to [[graft.ext.Bloom]]'s Column
  * build side (floorMod ≡ pmod for the positive moduli used).
  */
object BloomOps {
  private final val P = 2147483647L // 2^31 - 1

  private def mix(key: Long, m1: Long, m2: Long): Long = {
    val x0 = java.lang.Math.floorMod(key, P)
    val x1 = java.lang.Math.floorMod(x0 * m1, P)
    val x2 = x1 ^ (x1 >>> 15)
    val x3 = java.lang.Math.floorMod(x2 * m2, P)
    x3 ^ (x3 >>> 13)
  }

  /** All k bits set? h1/h2 once, then k adds-and-mods. */
  def mightContain(key: Long, words: Array[Long], k: Int): Boolean = {
    val h1 = mix(key, 1103515245L, 1566083941L)
    val stride = mix(key, 69069L, 1277459L) * 2L + 1L
    val m = words.length.toLong * 64L
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(h1 + j * stride, m)
      if (((words((pos / 64L).toInt) >>> (pos % 64L).toInt) & 1L) == 0L)
        return false
      j += 1
    }
    true
  }
}

/** Codegen'd bloom probe over a pre-normalized `bigint` key. */
case class BloomProbe(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe needs a bigint key, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    BloomOps.mightContain(input.asInstanceOf[Long], words, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomOps.mightContain($c, $ref, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)

  // content-compare the baked word array (the default case-class equality
  // is reference-based) so plan canonicalization and exchange reuse work
  override def equals(other: Any): Boolean = other match {
    case b: BloomProbe =>
      b.child == child && b.k == k && java.util.Arrays.equals(b.words, words)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + k) + java.util.Arrays.hashCode(words)
}

object BloomFunctions {
  def bloom_probe(key: Column, words: Array[Long], k: Int): Column =
    GraftBridge.column(BloomProbe(GraftBridge.expression(key), words, k))
}
