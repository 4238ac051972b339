package graft

import graft.compile.NlCompiler
import graft.exec.Executor
import graft.ext.{Dedup, Events, Multimodal, Similarity, TextStats}
import graft.ir.MongoJson
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryHelpers._

/** Reference-parity core: find-spec filters, projection, limit clamp, counts, the NL fallback compiler, and the repair cascade.
  *
  * One of six per-domain registries merged by [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] — pure relocation of the former monolithic
  * maps, no behavior change (32 entries). */
private[graft] object QueriesCore {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- §2.1 core filter predicates (full JSON→IR→Column pipeline) -----
    "filter_eq" -> (mongo("customer",
      """{"filter": {"c_mktsegment": "BUILDING"}}""", "c_custkey") _),
    "filter_ne_nullsafe" -> (mongo("customer",
      """{"filter": {"c_mktsegment": {"$ne": "BUILDING"}}}""", "c_custkey") _),
    "filter_gt" -> (mongo("customer",
      """{"filter": {"c_acctbal": {"$gt": 5000}}}""", "c_custkey") _),
    "filter_lt" -> (mongo("customer",
      """{"filter": {"c_acctbal": {"$lt": 1000}}}""", "c_custkey") _),
    "filter_gte" -> (mongo("customer",
      """{"filter": {"c_acctbal": {"$gte": 9000}}}""", "c_custkey") _),
    "filter_lte" -> (mongo("customer",
      """{"filter": {"c_acctbal": {"$lte": 100}}}""", "c_custkey") _),
    "filter_in" -> (mongo("customer",
      """{"filter": {"c_mktsegment": {"$in": ["MACHINERY", "FURNITURE"]}}}""",
      "c_custkey") _),
    "filter_regex_ci" -> (mongo("part",
      """{"filter": {"p_type": {"$regex": "econ", "$options": "i"}}}""",
      "p_partkey") _),
    "filter_and" -> (mongo("customer",
      """{"filter": {"c_mktsegment": "BUILDING", "c_acctbal": {"$gt": 2500}}}""",
      "c_custkey") _),
    "filter_between" -> (mongo("customer",
      """{"filter": {"c_acctbal": {"$gte": 1000, "$lte": 2000}}}""",
      "c_custkey") _),
    // string literal against a real TimestampType column — the second typed
    // path of FilterCompiler (SURVEY.md §7.4.3); projection keeps the raw
    // timestamp out of the hashed output
    "filter_date" -> (mongo("orders",
      """{"filter": {"o_orderdate": {"$gte": "1997-06-15"}},
        | "projection": {"o_orderkey": 1, "o_orderpriority": 1}}""".stripMargin,
      "o_orderkey") _),
    // ----- §2.2 projection / §2.3 limit -----
    "projection" -> (mongo("customer",
      """{"filter": {}, "projection": {"c_custkey": 1, "c_name": 1}}""",
      "c_custkey") _),
    "limit_topk" -> ((s: SparkSession, dir: String) =>
      Executor.plan(
        Tables.customer(s, dir).orderBy("c_custkey"),
        MongoJson.parse("""{"filter": {}}""").copy(limit = Some(50)))),
    "limit_clamp" -> ((s: SparkSession, dir: String) =>
      // limit 5000 clamps to 1000 (No_Sql.py:397)
      Executor.plan(
        Tables.customer(s, dir).orderBy("c_custkey"),
        MongoJson.parse("""{"filter": {}}""").copy(limit = Some(5000)))),
    // ----- §2.4 counts -----
    "count_filtered" -> ((s: SparkSession, dir: String) =>
      Executor.plan(Tables.customer(s, dir),
          MongoJson.parse("""{"filter": {"c_mktsegment": "BUILDING"}}"""))
        .agg(count(lit(1)).as("n"))),
    "count_all" -> ((s: SparkSession, dir: String) =>
      Tables.customer(s, dir).agg(count(lit(1)).as("n"))),
    // the metadata fast path itself (estimated_document_count,
    // No_Sql.py:416): footer-only read, no scan job — same exact count
    "count_meta" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Seq(graft.sources.ParquetMeta.footerCount(s, s"$dir/customer.parquet"))
        .toDF("n")
    }),
    "agg_history_stats" -> ((s: SparkSession, dir: String) => {
      // query-history analytics (main.py:263-268) modeled on the events
      // table: success = non-error event, execution_time = value
      val ev = Tables.events(s, dir)
      ev.agg(
        count(lit(1)).as("n_queries"),
        (sum((col("event_type") =!= "error").cast("long")) * lit(100.0) /
          count(lit(1))).as("success_rate"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("mean_exec"))
    }),
    // ----- §2.6 NL fallback compiler (one per rule + quirks) -----
    "nl_salary_gt" -> (nl("Find employees earning more than 3000", "emp_id") _),
    "nl_salary_lt" -> (nl("employees with pay under 2000", "emp_id") _),
    "nl_salary_eq" -> (nl("employees with salary 655", "emp_id") _),
    "nl_age_gt" -> (nl("employees with age above 40", "emp_id") _),
    "nl_age_lt" -> (nl("employees with age younger than 30", "emp_id") _),
    // rule-order shadowing: the age rule fires first, the department
    // predicate is dropped (No_Sql.py:334-341 before :344-359)
    "nl_shadow" -> (nl("engineers with age over 30", "emp_id") _),
    "nl_dept" -> (nl("show all engineers", "emp_id") _),
    "nl_name_proj" -> (nl("show customer names", "name") _),
    "nl_experience" -> (nl("people with experience more than 20", "emp_id") _),
    "nl_default" -> (nl("hello world", "emp_id") _),
    // arbitrary-precision literal end-to-end: 2^60 is double-exact, so it
    // compiles (values beyond the exact range error loudly instead)
    "nl_bignum" -> (nl("salary below 1152921504606846976", "emp_id") _),
    // dataset-scale NL compiler (§2.6 column-level mapping): classify a
    // COLUMN of NL strings in one distributed codegen'd pass — templates
    // cover every rule plus the quirks (substring "age" in "message",
    // rule shadowing, direction-less fall-through); the oracle derives
    // the EXPECTED classification per template independently (SQL CASE),
    // so a green row certifies the classifier, not just the plumbing
    "nl_bulk" -> ((s: SparkSession, dir: String) => {
      val base = Tables.customer(s, dir).select(col("c_custkey").as("id"))
      val k = col("id") % 10
      val n = col("id").cast("string")
      val nl = when(k === 0, concat(lit("find employees earning more than "), n))
        .when(k === 1, concat(lit("employees with pay under "), n))
        .when(k === 2, concat(lit("staff with salary exactly "), n))
        .when(k === 3, concat(lit("people with age above "), n))
        .when(k === 4, lit("message for engineers"))      // "age" substring quirk
        .when(k === 5, lit("show customer names"))
        .when(k === 6, concat(lit("with experience more than "), n))
        .when(k === 7, lit("hello world"))
        .when(k === 8, concat(lit("engineers with age over "), n)) // shadowing
        .otherwise(concat(lit("age "), n, lit(" mentioned")))      // fall-through
      val cls = graft.compile.NlColumnCompiler.classify(nl)
      base.select(col("id"), cls.getField("rule").as("rule"),
          cls.getField("field").as("field"), cls.getField("op").as("op"),
          cls.getField("value").as("value"))
        .orderBy("id")
    }),
    // ----- §2.7 LLM-response repair cascade -----
    "nl_repair" -> ((s: SparkSession, dir: String) =>
      Executor.plan(Tables.employees(s, dir), MongoJson.parseWithRepair(
        "```json\n{'filter': {'department': {'$regex': 'sales', " +
          "'$options': 'i'}}, 'projection': {}}\n```"))
        .orderBy("emp_id")),
    // ----- §2.10 dedup -----
    "dedup_exact" -> ((s: SparkSession, dir: String) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", Seq("lang", "source"))
        .orderBy("doc_id")),
  )

  val oracles: Map[String, String] = Map(
    "filter_eq" ->
      "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey",
    "filter_ne_nullsafe" ->
      "SELECT * FROM customer WHERE c_mktsegment IS DISTINCT FROM 'BUILDING' ORDER BY c_custkey",
    "filter_gt" ->
      "SELECT * FROM customer WHERE c_acctbal > 5000 ORDER BY c_custkey",
    "filter_lt" ->
      "SELECT * FROM customer WHERE c_acctbal < 1000 ORDER BY c_custkey",
    "filter_gte" ->
      "SELECT * FROM customer WHERE c_acctbal >= 9000 ORDER BY c_custkey",
    "filter_lte" ->
      "SELECT * FROM customer WHERE c_acctbal <= 100 ORDER BY c_custkey",
    "filter_in" ->
      "SELECT * FROM customer WHERE c_mktsegment IN ('MACHINERY', 'FURNITURE') ORDER BY c_custkey",
    "filter_regex_ci" ->
      "SELECT * FROM part WHERE regexp_matches(p_type, '(?i)econ') ORDER BY p_partkey",
    "filter_and" ->
      "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 2500 ORDER BY c_custkey",
    "filter_between" ->
      "SELECT * FROM customer WHERE c_acctbal >= 1000 AND c_acctbal <= 2000 ORDER BY c_custkey",
    "filter_date" ->
      ("SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1997-06-15 00:00:00' ORDER BY o_orderkey"),
    "projection" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",
    "limit_topk" ->
      "SELECT * FROM customer ORDER BY c_custkey LIMIT 50",
    "limit_clamp" ->
      "SELECT * FROM customer ORDER BY c_custkey LIMIT 1000",
    "count_filtered" ->
      "SELECT count(*) AS n FROM customer WHERE c_mktsegment = 'BUILDING'",
    "count_all" ->
      "SELECT count(*) AS n FROM customer",
    "count_meta" ->
      "SELECT count(*) AS n FROM customer",
    "agg_history_stats" ->
      ("SELECT count(*) AS n_queries, " +
        "sum(CASE WHEN event_type != 'error' THEN 1 ELSE 0 END) * 100.0 / count(*) AS success_rate, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_exec " +
        "FROM events"),
    "nl_salary_gt" ->
      s"SELECT * FROM $Emp WHERE salary > 3000 ORDER BY emp_id",
    "nl_salary_lt" ->
      s"SELECT * FROM $Emp WHERE salary < 2000 ORDER BY emp_id",
    "nl_salary_eq" ->
      s"SELECT * FROM $Emp WHERE salary = 655 ORDER BY emp_id",
    "nl_age_gt" ->
      s"SELECT * FROM $Emp WHERE age > 40 ORDER BY emp_id",
    "nl_age_lt" ->
      s"SELECT * FROM $Emp WHERE age < 30 ORDER BY emp_id",
    "nl_shadow" ->
      s"SELECT * FROM $Emp WHERE age > 30 ORDER BY emp_id",
    "nl_dept" ->
      s"SELECT * FROM $Emp WHERE regexp_matches(department, '(?i)engineering') ORDER BY emp_id",
    "nl_name_proj" ->
      s"SELECT name FROM $Emp ORDER BY name",
    "nl_experience" ->
      s"SELECT * FROM $Emp WHERE experience_years > 20 ORDER BY emp_id",
    "nl_default" ->
      s"SELECT * FROM $Emp ORDER BY emp_id",
    "nl_bignum" ->
      s"SELECT * FROM $Emp WHERE salary < 1152921504606846976 ORDER BY emp_id",
    "nl_repair" ->
      s"SELECT * FROM $Emp WHERE regexp_matches(department, '(?i)sales') ORDER BY emp_id",
    // EXPECTED classification per template family, derived independently
    // of the engine's string analysis: template k of customer row id must
    // classify as the rule the template was built to trigger
    "nl_bulk" ->
      ("""SELECT c_custkey AS id,
         |  CASE c_custkey % 10
         |    WHEN 0 THEN 'salary' WHEN 1 THEN 'salary' WHEN 2 THEN 'salary'
         |    WHEN 3 THEN 'age' WHEN 4 THEN 'department'
         |    WHEN 5 THEN 'name_projection' WHEN 6 THEN 'experience'
         |    WHEN 8 THEN 'age' ELSE 'all' END AS rule,
         |  CASE c_custkey % 10
         |    WHEN 0 THEN 'salary' WHEN 1 THEN 'salary' WHEN 2 THEN 'salary'
         |    WHEN 3 THEN 'age' WHEN 4 THEN 'department'
         |    WHEN 6 THEN 'experience_years' WHEN 8 THEN 'age'
         |    ELSE NULL END AS field,
         |  CASE c_custkey % 10
         |    WHEN 0 THEN 'gt' WHEN 1 THEN 'lt' WHEN 2 THEN 'eq'
         |    WHEN 3 THEN 'gt' WHEN 4 THEN 'regex' WHEN 6 THEN 'gt'
         |    WHEN 8 THEN 'gt' ELSE NULL END AS op,
         |  CASE c_custkey % 10
         |    WHEN 4 THEN 'engineering'
         |    WHEN 5 THEN NULL WHEN 7 THEN NULL WHEN 9 THEN NULL
         |    ELSE CAST(c_custkey AS VARCHAR) END AS value
         |FROM customer ORDER BY id""".stripMargin),
    "dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, lang, source FROM documents GROUP BY lang, source ORDER BY 1",
  )
}
