package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dataset-scale dual of [[NlCompiler]]: classifies a COLUMN of NL query
  * strings entirely with codegen'd Spark expressions (`lower` /
  * `regexp_extract` / `when` chains) — the shape for compiling millions of
  * logged NL queries in one distributed pass, vs the scalar compiler's
  * one-string-at-a-time driver loop (SURVEY.md §2.6).
  *
  * Rule-for-rule identical to [[NlCompiler.compile]]
  * (/root/reference/No_Sql.py:316-377), INCLUDING the quirks:
  * first-digit-run-only numbers, substring keyword hits ("message"
  * contains "age"), rule-order shadowing (age fires before department),
  * and the no-else fall-throughs of the age and experience rules.
  * Equivalence with the scalar compiler is property-tested row-for-row in
  * NlColumnCompilerSpec.
  *
  * Output is a struct of four nullable strings:
  *   rule  — salary | age | department | name_projection | experience | all
  *   field — the filtered column (null for name_projection / all)
  *   op    — gt | lt | eq | regex (null for name_projection / all)
  *   value — the first digit run (arbitrary precision preserved: numbers
  *           stay strings end-to-end, like the scalar compiler's BigInt)
  *           or the department synonym target
  */
object NlColumnCompiler {

  private def containsAny(t: Column, kws: Seq[String]): Column =
    kws.map(k => instr(t, k) > 0).reduce(_ or _)

  private val nullStr = lit(null).cast("string")

  private def out(rule: String, field: Column, op: Column,
                  value: Column): Column =
    struct(lit(rule).as("rule"), field.as("field"), op.as("op"),
      value.as("value"))

  /** Classify one NL string column. One pass, no shuffle, no UDF — the
    * whole chain stays inside WholeStageCodegen. */
  def classify(text: Column): Column = {
    val t = lower(text)
    // Python int(re.search(r'\d+', t)) — the FIRST digit run only
    // (No_Sql.py:325); empty string = no number in the text. int() also
    // NORMALIZES ("007" → 7), as does the scalar compiler's BigInt — strip
    // leading zeros (keeping a lone "0") so the two compilers emit the
    // same value string for every input, not just zero-free ones
    val num = regexp_replace(regexp_extract(t, "\\d+", 0), "^0+(?=\\d)", "")
    val hasNum = num =!= ""

    // Rule 1: salary (No_Sql.py:322-331) — HAS an else branch (eq)
    val salaryHit = containsAny(t, Seq("salary", "earn", "pay", "income")) &&
      hasNum
    val salaryOp =
      when(containsAny(t, Seq("above", "over", "more", "greater", ">")), "gt")
        .when(containsAny(t, Seq("below", "under", "less", "<")), "lt")
        .otherwise("eq")

    // Rule 2: age (No_Sql.py:334-341) — NO else branch: age+number with no
    // direction word falls through to the rules below
    val ageBase = instr(t, "age") > 0 && hasNum
    val ageGt = ageBase && containsAny(t, Seq("older", "above", "over"))
    val ageLt = ageBase && containsAny(t, Seq("younger", "below", "under"))

    // Rule 5: experience (No_Sql.py:366-373) — same fall-through shape
    val expBase = instr(t, "experience") > 0 && hasNum
    val expGt = expBase && containsAny(t, Seq("more", "over", "above"))
    val expLt = expBase && containsAny(t, Seq("less", "under", "below"))

    // Priority order = the scalar compiler's early returns; the department
    // whens preserve the synonym table's insertion order (No_Sql.py:344-357)
    val chain = when(salaryHit, out("salary", lit("salary"), salaryOp, num))
      .when(ageGt, out("age", lit("age"), lit("gt"), num))
      .when(ageLt, out("age", lit("age"), lit("lt"), num))
    NlCompiler.deptSynonymTable.foldLeft(chain) { case (c, (kws, dept)) =>
      c.when(containsAny(t, kws),
        out("department", lit("department"), lit("regex"), lit(dept)))
    }
      .when(instr(t, "name") > 0,
        out("name_projection", nullStr, nullStr, nullStr))
      .when(expGt, out("experience", lit("experience_years"), lit("gt"), num))
      .when(expLt, out("experience", lit("experience_years"), lit("lt"), num))
      .otherwise(out("all", nullStr, nullStr, nullStr))
  }
}
