package graft

import graft.compile.{NlColumnCompiler, NlCompiler}
import graft.ir.{FilterExpr, QuerySpec}
import org.apache.spark.sql.functions._

/** Column-compiler ≡ scalar-compiler, row for row — including the quirks:
  * first-digit-run numbers, substring keyword hits, rule shadowing, and
  * the no-else fall-throughs. The word-soup corpus deliberately mixes
  * keywords from DIFFERENT rules in one string so priority order matters. */
class NlColumnCompilerSpec extends SparkSpec {

  private def scalarTuple(text: String): (String, String, String, String) = {
    val spec = NlCompiler.compile(text)
    import FilterExpr._
    def rule(f: String) = f match {
      case "salary"           => "salary"
      case "age"              => "age"
      case "experience_years" => "experience"
    }
    spec match {
      case QuerySpec(Gt(f, v), Nil, None) => (rule(f), f, "gt", v.toString)
      case QuerySpec(Lt(f, v), Nil, None) => (rule(f), f, "lt", v.toString)
      case QuerySpec(Eq(f, v), Nil, None) => (rule(f), f, "eq", v.toString)
      case QuerySpec(Regex("department", p, true), Nil, None) =>
        ("department", "department", "regex", p)
      case QuerySpec(True, Seq("name"), None) =>
        ("name_projection", null, null, null)
      case QuerySpec(True, Nil, None) => ("all", null, null, null)
      case other => throw new MatchError(s"unexpected spec for '$text': $other")
    }
  }

  private def columnTuples(texts: Seq[String]): Seq[(String, String, String, String)] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text")
      .select(col("i"), NlColumnCompiler.classify(col("text")).as("c"))
      .orderBy("i")
      .select("c.rule", "c.field", "c.op", "c.value")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq
  }

  test("word-soup corpus: column classifier equals the scalar compiler") {
    val words = Seq("salary", "earning", "pay", "income", "age", "older",
      "younger", "above", "over", "under", "below", "more", "less",
      "greater", "experience", "engineers", "developer", "marketing",
      "sales", "hr", "human", "names", "show", "find", "with", "than",
      "message", "exactly", "employees", "people", "hello", "world",
      "42", "7", "123456789012345678901234567890")
    val rnd = new scala.util.Random(7)
    val corpus = (1 to 400).map { _ =>
      (0 to rnd.nextInt(6)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    } ++ Seq(
      "find employees earning more than 3000",
      "employees with pay under 2000",
      "staff with salary exactly 655",
      "people with age above 40",
      "message for engineers",   // "age" in "message", no digits
      "show customer names",
      "with experience more than 20",
      "hello world",
      "engineers with age over 30", // age shadows department
      "age 55 mentioned",           // direction-less age falls through to all
      "experience 9 noted",         // direction-less experience falls through
      "salary",                     // keyword with no number -> all
      "salary below 007",           // int() normalization: 007 -> 7
      "salary exactly 000",         // all-zero run -> single 0
      "age over 0042")              // leading zeros through a non-salary rule
    assert(columnTuples(corpus) == corpus.map(scalarTuple))
  }

  test("classification stays inside whole-stage codegen (no UDF barrier)") {
    // parquet-backed input (a literal local Seq constant-folds to a
    // LocalTableScan and proves nothing about the expression chain)
    val df = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(NlColumnCompiler.classify(
        concat(lit("salary above "), col("c_custkey"))).as("c"))
    // "*(n)" is the whole-stage-codegen marker in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), plan.take(500))
  }
}
