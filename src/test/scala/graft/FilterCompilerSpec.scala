package graft

import graft.compile.FilterCompiler
import graft.ir.{FilterExpr, UnsupportedQueryException}

/** SURVEY.md §5.1: every §2.1 operator, the null-semantics rules of §7.4.1,
  * and the typed-literal rules of §7.4.4, on the in-memory fixture. */
class FilterCompilerSpec extends SparkSpec {

  private def run(f: FilterExpr) =
    ids(employees.filter(FilterCompiler.compile(f, employees.schema)))

  test("Eq implicit equality") {
    assert(run(FilterExpr.Eq("salary", 50000.0)) == Seq(2L, 4L))
  }

  test("Eq on string") {
    assert(run(FilterExpr.Eq("department", "sales")) == Seq(2L))
  }

  test("Eq null matches null fields (Mongo {f: null})") {
    assert(run(FilterExpr.Eq("department", null)) == Seq(4L))
  }

  test("Ne is null-safe: matches rows where field is null") {
    // Mongo $ne matches missing/null; Spark =!= would drop emp 4
    assert(run(FilterExpr.Ne("department", "sales")) == Seq(1L, 3L, 4L, 5L))
  }

  test("Gt / Lt / Gte / Lte are null-rejecting like Mongo range ops") {
    assert(run(FilterExpr.Gt("salary", 70000.0)) == Seq(1L, 5L))
    assert(run(FilterExpr.Lt("age", 35.0)) == Seq(2L))
    assert(run(FilterExpr.Gte("salary", 70000.0)) == Seq(1L, 3L, 5L))
    assert(run(FilterExpr.Lte("age", 35.0)) == Seq(1L, 2L, 4L))
  }

  test("In membership") {
    assert(run(FilterExpr.In("department", Seq("sales", "hr"))) == Seq(2L, 5L))
  }

  test("In with null in the list also matches null fields") {
    assert(run(FilterExpr.In("department", Seq("sales", null))) == Seq(2L, 4L))
  }

  test("In with empty list matches nothing") {
    assert(run(FilterExpr.In("department", Nil)).isEmpty)
  }

  test("Regex case-insensitive substring (the prompt's canonical form)") {
    assert(run(FilterExpr.Regex("department", "ENGINEER",
      caseInsensitive = true)) == Seq(1L))
    assert(run(FilterExpr.Regex("department", "ENGINEER",
      caseInsensitive = false)).isEmpty)
  }

  test("Regex rejects PCRE-only constructs loudly (SURVEY.md §7.4.2)") {
    intercept[UnsupportedQueryException] {
      FilterCompiler.compile(
        FilterExpr.Regex("name", "(?<name>a)(?P=name)", caseInsensitive = false),
        employees.schema)
    }
  }

  test("And conjunction; empty And matches all") {
    assert(run(FilterExpr.And(Seq(
      FilterExpr.Eq("salary", 50000.0),
      FilterExpr.Gt("age", 30.0)))) == Seq(4L))
    assert(run(FilterExpr.And(Nil)) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("True matches all") {
    assert(run(FilterExpr.True) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("unknown field errors") {
    intercept[UnsupportedQueryException] {
      FilterCompiler.compile(FilterExpr.Eq("nope", 1.0), employees.schema)
    }
  }

  test("type mismatch errors instead of casting (Mongo type brackets)") {
    intercept[UnsupportedQueryException] {
      run(FilterExpr.Eq("salary", "50000")) // string vs double column
    }
    intercept[UnsupportedQueryException] {
      run(FilterExpr.Eq("department", 7.0)) // number vs string column
    }
  }

  test("BigInt literals narrow exactly; out-of-range errors, in-range works") {
    // 2^53+1 is not exactly a double -> loud error, no silent rounding
    intercept[UnsupportedQueryException] {
      run(FilterExpr.Gt("salary", BigInt("9007199254740993")))
    }
    // 2^60 IS exactly a double -> compiles
    assert(run(FilterExpr.Gt("salary", BigInt("1152921504606846976"))).isEmpty)
    assert(run(FilterExpr.Eq("salary", BigInt(50000))) == Seq(2L, 4L))
  }

  test("string literal against timestamp column parses; garbage errors") {
    import org.apache.spark.sql.functions._
    val df = employees.withColumn("joined",
      to_timestamp(lit("2021-06-01 00:00:00")))
    val got = df.filter(FilterCompiler.compile(
      FilterExpr.Gt("joined", "2021-01-01"), df.schema)).count()
    assert(got == 5)
    intercept[UnsupportedQueryException] {
      FilterCompiler.compile(FilterExpr.Gt("joined", "not-a-date"), df.schema)
    }
  }
}
