package graft

import graft.functions.{ArrayDot, CellArgmin, GramPolyHashes, JlProject, MinHashSignature, RollingFingerprint, ShingleHashes, SimHashSignature, TokenPolyHashes}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))
    }
    // SQL UPDATE / MERGE INTO on the tx catalog: the analyzed
    // UpdateTable/MergeIntoTable nodes become runnable copy-on-write
    // commands (see graft.sources.TxRowLevel).
    ext.injectPostHocResolutionRule(s => graft.sources.TxRowLevel.RowLevelRule(s))
    // Deletion-vector reads: relations over tombstone-bearing tx
    // snapshots are swapped for the DV-aware snapshot read. MUST run
    // after RowLevelRule — it skips row-level targets by matching the
    // converted commands (see graft.sources.DvReadRule scaladoc).
    ext.injectPostHocResolutionRule(s => graft.sources.DvReadRule(s))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected a literal int, got $other")
  }

  /** Evaluate a plan-constant argument at registration time — the SQL
    * spelling of the Scala APIs' baked-in coefficient arrays. Resolution
    * is bottom-up, so by the time this builder runs an `array(array(…))`
    * argument is a resolved, foldable CreateArray tree; anything
    * row-dependent is refused loudly (the kernels bake these values into
    * generated code, so they must be constants). */
  private def constArg(e: Expression, fn: String): Any = {
    require(e.resolved && e.foldable,
      s"$fn: argument must be a constant expression, got $e")
    e.eval()
  }

  private def doubleMatrixArg(e: Expression, fn: String): Seq[Seq[Double]] = {
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => ()
      case other => throw new IllegalArgumentException(
        s"$fn: centroids must be array<array<double>> (cast element " +
          s"literals to double), got ${other.simpleString}")
    }
    val rows = constArg(e, fn).asInstanceOf[ArrayData]
    (0 until rows.numElements()).map { i =>
      val r = rows.getArray(i)
      require(r != null, s"$fn: centroid row $i is null")
      (0 until r.numElements()).map(j => r.getDouble(j))
    }
  }

  private def longArrayArg(e: Expression, fn: String): Array[Long] = {
    e.dataType match {
      case ArrayType(LongType, _) => ()
      case other => throw new IllegalArgumentException(
        s"$fn: coefficients must be array<bigint>, got ${other.simpleString}")
    }
    constArg(e, fn).asInstanceOf[ArrayData].toLongArray()
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
    ("jl_project",
      "jl_project(vec, out_dim) - codegen'd JL ±1 projection of an " +
        "array<float|double> onto out_dim hash-derived directions",
      (args: Seq[Expression]) => {
        require(args.length == 2, "jl_project takes 2 arguments")
        JlProject(args(0), intArg(args(1), "jl_project"))
      }),
    ("cell_argmin",
      "cell_argmin(vec, centroids) - nearest-centroid cell id over a " +
        "constant array<array<double>> (quantized distance, low-id ties)",
      (args: Seq[Expression]) => {
        require(args.length == 2, "cell_argmin takes 2 arguments")
        CellArgmin(args(0), doubleMatrixArg(args(1), "cell_argmin"))
      }),
    ("html_strip",
      "html_strip(html) - HTML-to-text: tags/comments/script+style " +
        "bodies dropped, entities decoded; NULL on malformed input",
      (args: Seq[Expression]) => {
        require(args.length == 1, "html_strip takes 1 argument")
        graft.functions.HtmlStrip(args(0))
      }),
    ("rolling_fingerprint",
      "rolling_fingerprint(text) - Rabin-Karp codepoint fingerprint mod 1e9+7",
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_fingerprint takes 1 argument")
        RollingFingerprint(args(0))
      }),
    ("gram_poly_hashes",
      "gram_poly_hashes(text, k) - sequential word-k-gram 62-bit poly " +
        "hashes as array<bigint> (the winnowing front end)",
      (args: Seq[Expression]) => {
        require(args.length == 2, "gram_poly_hashes takes 2 arguments")
        GramPolyHashes(args(0), intArg(args(1), "gram_poly_hashes"))
      }),
    ("simhash_signature",
      "simhash_signature(hashes) - 64-bit SimHash over an array<bigint> " +
        "of token hashes",
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_signature takes 1 argument")
        SimHashSignature(args(0))
      }),
    ("minhash_signature",
      "minhash_signature(hashes, coeffs) - MinHash signature over an " +
        "array<bigint> with a constant array<bigint> coefficient schedule",
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_signature takes 2 arguments")
        val cs = longArrayArg(args(1), "minhash_signature")
        require(cs.nonEmpty && cs.length % 2 == 0,
          "minhash_signature: coefficients are (a,b) pairs — need an " +
            s"even nonzero length, got ${cs.length}")
        MinHashSignature(args(0), cs)
      }),
  )

  /** Register the functions on a live session (temp-function scope). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (name, _, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
