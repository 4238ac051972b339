package graft.compile

import graft.ir.{FilterExpr, UnsupportedQueryException}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[FilterExpr]] → Catalyst [[Column]] tree (SURVEY.md §2.1 table).
  *
  * The whole filter becomes ONE `Column` conjunction so Catalyst's
  * `PushDownPredicates` pushes it into the Parquet scan intact — the Spark
  * analog of the reference shipping the filter dict to the Mongo server
  * (/root/reference/No_Sql.py:404).
  *
  * Null/type semantics (SURVEY.md §7.4):
  *  - `$ne` → null-safe `NOT (col <=> lit)`: Mongo `$ne` matches docs where
  *    the field is null/missing; Spark `=!=` would be null-rejecting.
  *  - range ops stay null-rejecting (matches Mongo).
  *  - literals are typed against the column's schema type; a type mismatch
  *    is a compile-time error, not a silent cast (Mongo type-brackets
  *    comparisons: 25 never equals "25").
  *  - string literals against Timestamp/Date columns are parsed (the
  *    reference's `joining_date` is a lexicographic ISO string; the
  *    testdata's real timestamp columns need typed literals).
  */
object FilterCompiler {

  /** Compile against a known schema (typed literals, field checking). */
  def compile(f: FilterExpr, schema: StructType): Column = f match {
    case FilterExpr.True         => lit(true)
    case FilterExpr.And(cs)      =>
      cs.map(compile(_, schema)).reduceOption(_ && _).getOrElse(lit(true))
    // Mongo `{field: null}` / `{$eq: null}` matches null-or-missing fields;
    // `col === lit(null)` would match nothing. Null-safe via `<=>`.
    case FilterExpr.Eq(fl, null) => col(fl).isNull
    case FilterExpr.Eq(fl, v)    => col(fl) === typedLit(fl, v, schema)
    case FilterExpr.Ne(fl, v)    => !(col(fl) <=> typedLit(fl, v, schema))
    case FilterExpr.Gt(fl, v)    => col(fl) > typedLit(fl, v, schema)
    case FilterExpr.Lt(fl, v)    => col(fl) < typedLit(fl, v, schema)
    case FilterExpr.Gte(fl, v)   => col(fl) >= typedLit(fl, v, schema)
    case FilterExpr.Lte(fl, v)   => col(fl) <= typedLit(fl, v, schema)
    case FilterExpr.In(fl, vs)   =>
      // Mongo `$in` with null in the list also matches null/missing fields;
      // Spark `isin` is null-rejecting, so the null arm is explicit.
      val nonNull = vs.filter(_ != null)
      val base =
        if (nonNull.isEmpty) lit(false)
        else col(fl).isin(nonNull.map(rawTyped(fl, _, schema)): _*)
      if (vs.exists(_ == null)) base || col(fl).isNull else base
    case FilterExpr.Regex(fl, pat, ci) =>
      col(fl).rlike(javaRegex(pat, ci))
  }

  /** Mongo regex is PCRE; Spark `rlike` is Java regex. The reference only
    * emits literal word patterns (dept names, No_Sql.py:359) where the
    * dialects agree. Patterns Java can't compile are rejected loudly
    * rather than silently diverging (SURVEY.md §7.4.2). */
  private[graft] def javaRegex(pattern: String, ci: Boolean): String = {
    val p = if (ci) "(?i)" + pattern else pattern
    try { java.util.regex.Pattern.compile(p); p }
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw new UnsupportedQueryException(
          s"regex '$pattern' is not valid Java regex (PCRE-only construct?): " +
            e.getMessage)
    }
  }

  private def fieldType(field: String, schema: StructType): DataType =
    schema.fields.find(_.name == field).map(_.dataType).getOrElse(
      throw new UnsupportedQueryException(
        s"unknown field '$field' (schema has ${schema.fieldNames.mkString(", ")})"))

  private def typedLit(field: String, v: Any, schema: StructType): Column =
    lit(rawTyped(field, v, schema))

  /** Type the JSON literal to the column's schema type; mismatches error.
    *
    * BigInt literals (the NL compiler's digit runs — Python `int()` is
    * arbitrary-precision, No_Sql.py:325) narrow EXACTLY or error: a value
    * outside the column type's exact range (e.g. 2^53+1 against a double
    * column) raises instead of silently rounding to a different number. */
  private[graft] def rawTyped(field: String, v: Any, schema: StructType): Any =
    (v, fieldType(field, schema)) match {
      case (null, _)                       => null
      case (bi: BigInt, t)                 => narrowBigInt(field, bi, t)
      case (d: Double, DoubleType)         => d
      case (d: Double, FloatType)          => d.toFloat
      case (d: Double, LongType)           => d.toLong
      case (d: Double, IntegerType)        => d.toInt
      case (d: Double, ShortType)          => d.toShort
      // valueOf uses the canonical Double.toString scale; `new BigDecimal(d)`
      // would take the double's exact binary expansion (scale ~55 for 0.1),
      // exceeding Spark's max decimal precision of 38.
      case (d: Double, _: DecimalType)     => java.math.BigDecimal.valueOf(d)
      case (s: String, StringType)         => s
      case (b: Boolean, BooleanType)       => b
      case (s: String, TimestampType)      => parseTs(field, s)
      case (s: String, TimestampNTZType)   => parseTsNtz(field, s)
      case (s: String, DateType)           => parseDate(field, s)
      case (v, t) =>
        throw new UnsupportedQueryException(
          s"literal $v (${v.getClass.getSimpleName}) does not match column " +
            s"'$field' of type ${t.simpleString} — Mongo type-brackets " +
            "comparisons; no implicit cast (SURVEY.md §7.4.4)")
    }

  private def narrowBigInt(field: String, bi: BigInt, t: DataType): Any = {
    def fail() = throw new UnsupportedQueryException(
      s"integer literal $bi exceeds the exact range of column '$field' " +
        s"(${t.simpleString}) — refusing to round (SURVEY.md §7.4.4)")
    // exactness check uses `new java.math.BigDecimal(d)` — the double's
    // EXACT binary expansion; Scala's BigDecimal(d) rounds through
    // Double.toString and would reject exactly-representable values like 2^60
    def exactly(d: Double): Boolean =
      d.isFinite &&
        new java.math.BigDecimal(d)
          .compareTo(new java.math.BigDecimal(bi.bigInteger)) == 0
    t match {
      case DoubleType =>
        val d = bi.toDouble
        if (exactly(d)) d else fail()
      case FloatType =>
        val f = bi.toFloat
        if (exactly(f.toDouble)) f else fail()
      case LongType    => if (bi.isValidLong) bi.toLong else fail()
      case IntegerType => if (bi.isValidInt) bi.toInt else fail()
      case ShortType   => if (bi.isValidShort) bi.toShort else fail()
      case _: DecimalType => new java.math.BigDecimal(bi.bigInteger)
      case _ => fail()
    }
  }

  private def parseTs(field: String, s: String): java.sql.Timestamp =
    try {
      if (s.length == 10) java.sql.Timestamp.valueOf(s + " 00:00:00")
      else java.sql.Timestamp.valueOf(s.replace('T', ' '))
    } catch {
      case _: IllegalArgumentException =>
        throw new UnsupportedQueryException(
          s"cannot parse '$s' as timestamp for column '$field'")
    }

  /** Spark reads parquet `isAdjustedToUTC=false` timestamps as
    * TIMESTAMP_NTZ — literal is a LocalDateTime, no zone applied. */
  private def parseTsNtz(field: String, s: String): java.time.LocalDateTime =
    try {
      if (s.length == 10) java.time.LocalDate.parse(s).atStartOfDay()
      else java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    } catch {
      case _: java.time.format.DateTimeParseException =>
        throw new UnsupportedQueryException(
          s"cannot parse '$s' as timestamp_ntz for column '$field'")
    }

  private def parseDate(field: String, s: String): java.sql.Date =
    try java.sql.Date.valueOf(s)
    catch {
      case _: IllegalArgumentException =>
        throw new UnsupportedQueryException(
          s"cannot parse '$s' as date for column '$field'")
    }
}
