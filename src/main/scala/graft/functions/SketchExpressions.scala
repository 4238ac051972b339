package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Single-pass sketch kernels over a document's shingle/token hash array.
  *
  * Both replace an explode → shuffle → many-aggregate formulation with a
  * per-row loop: the sketch of one document depends only on that
  * document's own hash set, so distributing it over a groupBy was pure
  * overhead — a 260k-row shuffle and a 128-buffer hash aggregate at
  * sf0.1, per query. As row-local expressions they run inside
  * WholeStageCodegen in the scan stage, shuffle NOTHING, and scale
  * embarrassingly (each of the 100 TB's splits sketches independently).
  */
object SketchOps {
  private final val P = 2147483647L // 2^31 - 1

  /** MinHash: for permutation i, min over hashes h of
    * (a_i * (h mod P) + b_i) mod P — identical arithmetic to the previous
    * aggregate form (Dedup.minhashAgg), so signatures are unchanged. */
  def minhash(grams: ArrayData, coeffs: Array[Long]): ArrayData = {
    val numHashes = coeffs.length / 2
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = grams.numElements()
    var g = 0
    while (g < n) {
      val raw = grams.getLong(g) % P
      val h = if (raw < 0) raw + P else raw
      var i = 0
      while (i < numHashes) {
        val v = (coeffs(2 * i) * h + coeffs(2 * i + 1)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash sign-bit signature: bit j set iff 2 * |{h : bit j of h}| >= n
    * — the same majority-with-tie rule as the lane-packed aggregate form. */
  def simhash(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (n > 0 && 2 * ones(j) >= n) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Codegen'd MinHash signature over an `array<long>` of shingle hashes.
  * Coefficients are baked into the plan (deterministic from the seed
  * schedule in [[graft.ext.Dedup]]). */
case class MinHashSignature(child: Expression, coeffs: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchOps.minhash(input.asInstanceOf[ArrayData], coeffs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashCoeffs", coeffs, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchOps.minhash($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  // Array[Long] is reference-compared by the default case-class equality;
  // content equality keeps plan canonicalization/reuse working.
  override def equals(other: Any): Boolean = other match {
    case m: MinHashSignature =>
      m.child == child && java.util.Arrays.equals(m.coeffs, coeffs)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(coeffs)
}

/** Codegen'd SimHash signature over an `array<long>` of token hashes. */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_signature needs array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SketchOps.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object SketchFunctions {
  def minhash_signature(grams: Column, coeffs: Array[Long]): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(grams), coeffs))

  def simhash_signature(hashes: Column): Column =
    GraftBridge.column(SimHashSignature(GraftBridge.expression(hashes)))
}
