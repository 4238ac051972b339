package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Runtime kernels for [[ArrayDot]]. Top-level object → the Scala compiler
  * emits static forwarders, so generated Java code can call
  * `graft.functions.VectorOps.dot(...)` directly.
  *
  * Accumulation is a sequential left-to-right double sum — the same value
  * (bit-for-bit) as `aggregate(zip_with(a, b, _*_), 0.0, _+_)` after an
  * element-wise double cast, and the same as DuckDB's `list_dot_product`
  * over `DOUBLE[]`, so results hash-match across engines.
  */
object VectorOps {
  /** Dot product; each side read as float or double per its array type and
    * widened to double BEFORE multiplying (float multiply then widen would
    * be a different value). Length mismatch → NaN would hide bugs; the
    * expression layer returns null instead via [[ArrayDot.nullSafeEval]].
    * Only safe when neither input array can contain null elements. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Null-element-tolerant variant for `containsNull` array types: any null
    * element nulls the whole product — the same propagation as the
    * `zip_with` + `aggregate` formulation this expression replaced (an
    * unchecked read would silently treat null slots as 0.0). */
  def dotNullable(a: ArrayData, b: ArrayData,
                  aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}

/** Codegen'd dot product over two `array<float|double>` columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.5 allows one where the
  * built-ins genuinely can't express the semantics *efficiently*): Spark's
  * higher-order functions (`zip_with`, `aggregate`) are evaluated
  * interpreted — a lambda closure per element — and sit outside whole-stage
  * codegen. For pairwise similarity over N² candidate pairs that constant
  * factor dominates the entire job (BENCH_r02: sim_neardup 68 s of a 141 s
  * total). This expression compiles to a tight primitive loop inside the
  * generated code, stays inside WholeStageCodegen, and needs no UDF
  * serialization. Mixed float/double sides are supported so raw float
  * embeddings join double literals (query vectors, hyperplanes) without a
  * per-row cast pass.
  *
  * Null contract: null if either side is null OR lengths differ (matching
  * `zip_with`'s null padding, which nulls the whole aggregate).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def okElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left) && okElem(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else if (elemsNullable)
      VectorOps.dotNullable(x, y, elemIsFloat(left), elemIsFloat(right))
    else VectorOps.dot(x, y, elemIsFloat(left), elemIsFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = elemIsFloat(left).toString
    val rf = elemIsFloat(right).toString
    if (!elemsNullable)
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = graft.functions.VectorOps.dot($a, $b, $lf, $rf);
        |}
      """.stripMargin)
    else {
      val tmp = ctx.freshName("graftDot") // unique per instance: several
      // ArrayDots can share one codegen scope and locals must not collide
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  java.lang.Double $tmp =
        |    graft.functions.VectorOps.dotNullable($a, $b, $lf, $rf);
        |  if ($tmp == null) {
        |    ${ev.isNull} = true;
        |  } else {
        |    ${ev.value} = $tmp.doubleValue();
        |  }
        |}
      """.stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Runtime kernel for [[JlProject]] — see that class for the contract. */
object JlOps {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** The hash-derived Achlioptas ±1 sign: multiply-mod-prime mixing of
    * (i, j) with every intermediate far under 2⁶³. MUST stay bit-identical
    * to the formula documented at `graft.ext.Similarity.randomProject` —
    * external engines regenerate the matrix from this formula alone. */
  @inline private def sign(i: Long, j: Long): Double = {
    val h = (i * 73856093L + j * 19349663L + 83492791L) % 65521L
    val m = (h * 2654435761L) % 2147483647L
    1.0 - 2.0 * (m % 2L).toDouble
  }

  /** All `outDim` projections of one vector: per-output-dim in-order IEEE
    * double fold over input positions (i ascending), identical summation
    * order to the interpreted `aggregate` HOF this kernel replaced. */
  def project(v: ArrayData, isFloat: Boolean, outDim: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += sign(i.toLong, j.toLong) * x
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Null-element-tolerant variant: any null input slot nulls EVERY output
    * slot — each output dim's fold reads every input position, so this is
    * exactly what the interpreted `aggregate` produced (null poisons the
    * accumulator). The row itself survives (array of nulls, not a null
    * array) so downstream posexplode emits the same (j, null) rows. */
  def projectNullable(v: ArrayData, isFloat: Boolean, outDim: Int): ArrayData = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        return new GenericArrayData(Array.fill[Any](outDim)(null))
      i += 1
    }
    project(v, isFloat, outDim)
  }
}

/** Codegen'd Johnson–Lindenstrauss projection of one `array<float|double>`
  * vector onto `outDim` hash-derived ±1 Achlioptas directions (sign matrix
  * regenerated from the (i,j) hash formula — nothing stored, nothing
  * sampled; see `graft.ext.Similarity.randomProject` for the published
  * construction this certifies against).
  *
  * Why an Expression: the interpreted formulation is a `transform` ×
  * `aggregate` HOF nest — dim×outDim closure evaluations per row (~1,024
  * at 64→16), the exact interpreted-HOF cost class [[ArrayDot]] was built
  * to remove from the pairwise-similarity path. This compiles to two
  * nested primitive loops inside whole-stage codegen, one kernel call per
  * row. Output values are bit-identical to the HOF version: same hash,
  * same per-j in-order IEEE double fold.
  *
  * Null contract: null input → null output; a null input SLOT → all-null
  * output slots (matching null poisoning of the interpreted fold). */
case class JlProject(child: Expression, outDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      if (outDim > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"jl_project outDim must be positive, got $outDim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"jl_project needs an array<float|double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = elemsNullable)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elemsNullable) JlOps.projectNullable(v, elemIsFloat, outDim)
    else JlOps.project(v, elemIsFloat, outDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = elemIsFloat.toString
    val kernel = if (elemsNullable) "projectNullable" else "project"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.JlOps.$kernel($a, $f, $outDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

/** Runtime kernel for [[CellArgmin]]. */
object CellOps {
  /** Nearest-centroid cell with the portable quantized-distance contract
    * (`graft.ext.KMeans` class doc): per-cell distance is an IN-ORDER
    * IEEE fold of (x−c)² seeded at 0.0, quantized `floor(·1e8 + 0.5)` to
    * a long, ties to the LOWER cell id (strict `<` while scanning cells
    * in ascending id order IS that tiebreak). Must stay bit-identical to
    * the interpreted `aggregate`+`array_min(struct)` formulation it
    * replaced — external engines replay the same arithmetic. */
  def argmin(v: ArrayData, isFloat: Boolean, cents: Array[Array[Double]]): Int = {
    var best = Long.MaxValue
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var acc = 0.0
      var i = 0
      while (i < c.length) {
        val d = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - c(i)
        acc += d * d
        i += 1
      }
      val q = math.floor(acc * 1e8 + 0.5).toLong
      if (q < best) { best = q; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Null-element-tolerant variant (the [[JlOps.projectNullable]] dual):
    * any null input slot nulls the whole cell id — every cell's distance
    * fold reads every slot, so a null slot poisons all k accumulators
    * exactly as the interpreted `aggregate`+`array_min` it replaced
    * propagated null. Returns a boxed Integer so codegen can branch. */
  def argminNullable(v: ArrayData, isFloat: Boolean,
                     cents: Array[Array[Double]]): java.lang.Integer = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    Integer.valueOf(argmin(v, isFloat, cents))
  }
}

/** Codegen'd nearest-centroid assignment against a literal centroid
  * matrix — the k-means ASSIGNMENT step and the IVF probe-side cell
  * router.
  *
  * Why an Expression: the interpreted formulation
  * (`array_min` over k `aggregate` folds of d dims) costs k·d
  * interpreted closure calls per row and re-evaluates the centroid
  * literals through `element_at` each time; at build time that is
  * `iters` full corpus passes of it (BENCH: sim_ivf 1.0→31 s when the
  * planted label column became a real learned quantizer). This compiles
  * to two primitive loops over a referenced double[][] inside
  * whole-stage codegen — same arithmetic, same tiebreak, bit-identical
  * (property-tested vs the in-memory Lloyd model).
  *
  * Null contract: null vector → null cell; a null input SLOT (possible
  * only when the array type declares containsNull) → null cell, matching
  * the null poisoning of the interpreted fold (every cell's distance
  * reads every slot). Vectors shorter than the centroid dimensionality
  * are a caller bug surfaced as the same ArrayIndexOutOfBounds the
  * interpreted fold would hide as null — the corpus contract everywhere
  * here is fixed-dim vectors. */
case class CellArgmin(child: Expression, cents: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      if (cents.nonEmpty && cents.forall(_.size == cents.head.size))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "cell_argmin needs a non-empty rectangular centroid matrix")
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_argmin needs an array<float|double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable || elemsNullable

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any =
    if (elemsNullable)
      CellOps.argminNullable(a.asInstanceOf[ArrayData], elemIsFloat, matrix)
    else CellOps.argmin(a.asInstanceOf[ArrayData], elemIsFloat, matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = elemIsFloat.toString
    val m = ctx.addReferenceObj("graftCents", matrix, "double[][]")
    if (elemsNullable)
      nullSafeCodeGen(ctx, ev, a => s"""
        java.lang.Integer graftCell = graft.functions.CellOps.argminNullable($a, $f, $m);
        if (graftCell == null) { ${ev.isNull} = true; }
        else { ${ev.value} = graftCell.intValue(); }""")
    else
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.CellOps.argmin($a, $f, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): CellArgmin =
    copy(child = newChild)
}

/** Column-level entry points for the custom expressions. */
object VectorFunctions {
  /** `array_dot(a, b)` — codegen'd double dot product. */
  def array_dot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `jl_project(v, outDim)` — codegen'd JL ±1 projection (array<double>
    * of length outDim). */
  def jl_project(v: Column, outDim: Int): Column =
    GraftBridge.column(JlProject(GraftBridge.expression(v), outDim))

  /** `cell_argmin(v, cents)` — codegen'd nearest-centroid cell id (int),
    * portable quantized-distance arithmetic, ties to the lower cell. */
  def cell_argmin(v: Column, cents: Seq[Seq[Double]]): Column =
    GraftBridge.column(CellArgmin(GraftBridge.expression(v), cents))
}
