package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for [[ShingleHashes]]: one pass over the document string,
  * producing the DISTINCT 64-bit hashes of its word n-gram shingles.
  *
  * Token semantics match `split(text, " ")` with trailing empties kept
  * (Spark's split keeps them), and texts with fewer than n tokens collapse
  * to ONE whole-text shingle — identical set semantics to
  * [[graft.ext.Dedup.shingles]], with each shingle string replaced by its
  * FNV-1a-64 hash over its characters (tokens joined by a single space).
  * No shingle string is ever materialized: the hash is rolled char-by-char
  * across the token window.
  */
object ShingleOps {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  private def fnvChar(h0: Long, c: Char): Long = {
    // two FNV-1a rounds per UTF-16 char (low byte, high byte)
    var h = h0
    h = (h ^ (c & 0xff)) * FnvPrime
    h = (h ^ ((c >> 8) & 0xff)) * FnvPrime
    h
  }

  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // token boundaries (split on single space, keep empties)
    val starts = new java.util.ArrayList[Int]()
    starts.add(0)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') starts.add(i + 1)
      i += 1
    }
    val nTok = starts.size()
    def tokEnd(t: Int): Int =
      if (t + 1 < nTok) starts.get(t + 1) - 1 else s.length
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nTok < n) {
      // whole-text shingle = all tokens joined by ' ' = the string itself
      var h = FnvOffset
      var j = 0
      while (j < s.length) { h = fnvChar(h, s.charAt(j)); j += 1 }
      out.add(h)
    } else {
      var t = 0
      while (t <= nTok - n) {
        var h = FnvOffset
        var w = t
        while (w < t + n) {
          if (w > t) h = fnvChar(h, ' ')
          var j = starts.get(w)
          val e = tokEnd(w)
          while (j < e) { h = fnvChar(h, s.charAt(j)); j += 1 }
          w += 1
        }
        out.add(h)
        t += 1
      }
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd `text → array<long>` of distinct word-n-gram shingle hashes.
  *
  * Why a custom Expression: the declarative formulation
  * (`array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(text, " "), i+1, n))))`) runs three interpreted higher-order
  * functions and allocates every shingle string — measured at 2.75 s of a
  * 7 s dedup_jaccard at sf0.1, and it shuffles ~20-byte strings where 8-byte
  * longs suffice. This kernel is one pass, zero shingle allocations, stays
  * inside WholeStageCodegen, and its output joins/intersects as longs.
  * Downstream set arithmetic (Jaccard, MinHash) is hash-collision-tolerant
  * by construction (64-bit space vs per-document set sizes in the tens).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleOps.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleOps.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Runtime kernel for [[TokenPolyHashes]]: distinct non-empty tokens of a
  * space-separated text, each hashed with a PORTABLE 62-bit polynomial
  * hash — two 31-bit Rabin-Karp folds over the token's code points, packed
  * as `h1 * 2^31 + h2`:
  *
  *   h1 = fold(acc * 31  + cp) mod (2^31 - 1)
  *   h2 = fold(acc * 131 + cp) mod 2147483629
  *
  * Every intermediate fits a signed 64-bit int, so the exact same value is
  * computable in ANSI SQL / DuckDB (`list_reduce` over `ascii(c)`), which
  * is what makes a hash-matching external oracle for SimHash possible at
  * all — xxhash64 is engine-internal. Code-point iteration (not UTF-16
  * units) matches SQL `string_split(t, '')` + `ascii` semantics beyond the
  * BMP.
  */
object TokenPolyOps {
  private final val P1 = 2147483647L // 2^31 - 1
  private final val P2 = 2147483629L // largest prime < 2^31 - 17

  def tokenPolyHashes(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    val len = s.length
    while (i <= len) {
      val end0 = s.indexOf(' ', i)
      val end = if (end0 < 0) len else end0
      if (end > i) { // skip empty tokens
        var h1 = 0L
        var h2 = 0L
        var j = i
        while (j < end) {
          val cp = s.codePointAt(j)
          h1 = (h1 * 31L + cp) % P1
          h2 = (h2 * 131L + cp) % P2
          j += Character.charCount(cp)
        }
        out.add(h1 * 2147483648L + h2) // h1 * 2^31 + h2 < 2^62
      }
      i = end + 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd `text → array<long>` of distinct token poly-hashes (62-bit,
  * SQL-portable — see [[TokenPolyOps]]). Used by SimHash so its full
  * pipeline can be certified against a DuckDB oracle. */
case class TokenPolyHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_poly_hashes needs a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenPolyOps.tokenPolyHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenPolyOps.tokenPolyHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenPolyHashes =
    copy(child = newChild)
}

/** Runtime kernel for [[GramPolyHashes]]: the SEQUENTIAL (per-position,
  * duplicates kept) 62-bit poly hashes of a text's word k-grams — the
  * winnowing input, where [[TokenPolyOps]] (distinct, order-lost) and
  * [[ShingleOps]] (distinct, FNV — not SQL-replayable) both can't serve.
  * Each k-gram is hashed as its tokens joined by a single space, with the
  * same two Rabin-Karp folds as [[TokenPolyOps]], so an external SQL
  * engine reproduces every value via `array_to_string(ws[i:i+k-1], ' ')`
  * + `list_reduce` over code points. Empty tokens are skipped; fewer than
  * k tokens collapse to ONE whole-text gram; zero tokens yield an empty
  * array. O(tokens·k·chars) per row — the rolling-hash variant (prefix
  * hashes + precomputed modular powers) drops the k factor if profiles
  * ever show it, at the cost of a less obviously-portable formula. */
object GramPolyOps {
  private final val P1 = 2147483647L // 2^31 - 1
  private final val P2 = 2147483629L

  def gramPolyHashes(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val len = s.length
    while (i <= len) {
      val e0 = s.indexOf(' ', i)
      val e = if (e0 < 0) len else e0
      if (e > i) { starts.add(i); ends.add(e) }
      i = e + 1
    }
    val t = starts.size()
    if (t == 0) return new GenericArrayData(Array.emptyLongArray)
    val kk = math.min(k, t)
    val nG = t - kk + 1
    val out = new Array[Long](nG)
    var g = 0
    while (g < nG) {
      var h1 = 0L
      var h2 = 0L
      var w = 0
      while (w < kk) {
        if (w > 0) { // the joining space, code point 32
          h1 = (h1 * 31L + 32L) % P1
          h2 = (h2 * 131L + 32L) % P2
        }
        var j = starts.get(g + w)
        val e = ends.get(g + w)
        while (j < e) {
          val cp = s.codePointAt(j)
          h1 = (h1 * 31L + cp) % P1
          h2 = (h2 * 131L + cp) % P2
          j += Character.charCount(cp)
        }
        w += 1
      }
      out(g) = h1 * 2147483648L + h2
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd `text → array<long>` of SEQUENTIAL word-k-gram poly-hashes
  * (62-bit, SQL-portable — see [[GramPolyOps]]). The winnowing front end. */
case class GramPolyHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_poly_hashes needs a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GramPolyOps.gramPolyHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramPolyOps.gramPolyHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramPolyHashes =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Distinct word n-gram shingle hashes of a text column, as array<long>. */
  def shingle_hashes(text: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(text), n))

  /** Distinct non-empty token poly-hashes (62-bit, SQL-portable). */
  def token_poly_hashes(text: Column): Column =
    GraftBridge.column(TokenPolyHashes(GraftBridge.expression(text)))

  /** Sequential word-k-gram poly-hashes (62-bit, SQL-portable). */
  def gram_poly_hashes(text: Column, k: Int): Column =
    GraftBridge.column(GramPolyHashes(GraftBridge.expression(text), k))
}
