package graft.exec

import graft.compile.FilterCompiler
import graft.ir.{FilterExpr, QuerySpec, UnsupportedQueryException}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Execution of a [[QuerySpec]] over a DataFrame — the Spark analog of the
  * reference's `run_mongo_query` (/root/reference/No_Sql.py:379-445):
  * filter → total-matching count → projection → clamped limit → sanitize.
  *
  * Plan-shape notes (SURVEY.md §4): the filter is one Column conjunction →
  * Catalyst pushes it into the Parquet scan (`PushedFilters`); the
  * projection is a plain `select` → column pruning reaches `ReadSchema`;
  * the limit lands on `CollectLimitExec`. The count's metadata fast path
  * (`estimated_document_count`, No_Sql.py:416) maps to Spark's Parquet
  * footer count — enable `spark.sql.parquet.aggregatePushdown=true` and an
  * empty-filter `count()` never scans data.
  */
object Executor {

  /** Result envelope, mirroring the reference's response fields
    * (app_server.py:84-93): total matching count + the (≤ limit) rows. */
  final case class QueryResult(
      totalMatching: Long,
      rows: DataFrame,
      mongoQueryJson: String)

  /** Limit clamp [1, 1000] (No_Sql.py:397; app_server.py:78). */
  def clampLimit(n: Int): Int = math.max(1, math.min(n, 1000))

  val DefaultLimit = 50 // app_server.py:78, main.py:331

  /** Lazy plan only — no action. Callers pick collect/count/write. */
  def plan(df: DataFrame, spec: QuerySpec): DataFrame = {
    val filtered = spec.filter match {
      case FilterExpr.True => df
      case f               => df.filter(FilterCompiler.compile(f, df.schema))
    }
    val projected = spec.projection match {
      case Nil  => filtered
      case cols =>
        val missing = cols.filterNot(df.schema.fieldNames.contains)
        if (missing.nonEmpty)
          throw new UnsupportedQueryException(
            s"projection references unknown field(s): ${missing.mkString(", ")}")
        filtered.select(cols.map(col): _*)
    }
    spec.limit.map(n => projected.limit(clampLimit(n))).getOrElse(projected)
  }

  /** Full reference-parity execution: rows + total-matching count.
    * Count runs on the UNlimited, UNprojected filtered frame
    * (No_Sql.py:414-416); empty filter takes the metadata path. */
  def exec(df: DataFrame, spec: QuerySpec,
           limit: Int = DefaultLimit): QueryResult = {
    val total = spec.filter match {
      case FilterExpr.True => df.count() // metadata-count fast path analog
      case f               => df.filter(FilterCompiler.compile(f, df.schema)).count()
    }
    val rows = Sanitizer.sanitize(
      plan(df, spec.copy(limit = Some(spec.limit.getOrElse(limit)))))
    QueryResult(total, rows, graft.ir.MongoJson.toJson(spec))
  }
}
