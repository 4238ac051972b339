package graft.ir

/** The engine's single query IR: a typed ADT equivalent of the reference's
  * Mongo find-spec JSON object `{"filter": {...}, "projection": {...}}`
  * (shape mandated at /root/reference/No_Sql.py:117-122, normalized at
  * No_Sql.py:304-314). `limit` travels separately in the reference's HTTP
  * request (app_server.py:78) and is applied at execution (No_Sql.py:397,404),
  * so it is an `Option[Int]` here, clamped by the executor.
  *
  * Literal values are the JSON scalar universe the reference can produce:
  * `Double` (all JSON numbers), `String`, `Boolean`, `null`. The filter
  * compiler types them against the target schema (SURVEY.md §7.4.4).
  */
sealed trait FilterExpr extends Product with Serializable

object FilterExpr {
  /** Empty filter `{}` — match-all (No_Sql.py:376-377, 309-310). */
  case object True extends FilterExpr

  /** `$eq` / implicit `{field: value}` (No_Sql.py:119, 331). */
  final case class Eq(field: String, value: Any) extends FilterExpr

  /** `$ne`. Mongo `$ne` also matches docs where the field is null/missing —
    * compiled null-safely (SURVEY.md §7.4.1). (No_Sql.py:119) */
  final case class Ne(field: String, value: Any) extends FilterExpr

  /** `$gt` (No_Sql.py:119, 327, 339, 371). Null-rejecting, like Mongo. */
  final case class Gt(field: String, value: Any) extends FilterExpr

  /** `$lt` (No_Sql.py:119, 329, 341, 373). */
  final case class Lt(field: String, value: Any) extends FilterExpr

  /** `$gte` (No_Sql.py:119; declared, LLM-emitted only). */
  final case class Gte(field: String, value: Any) extends FilterExpr

  /** `$lte` (No_Sql.py:119). */
  final case class Lte(field: String, value: Any) extends FilterExpr

  /** `$in` (No_Sql.py:119). */
  final case class In(field: String, values: Seq[Any]) extends FilterExpr

  /** `$regex` with optional `$options: "i"` — the prompt's canonical
    * text-search form (No_Sql.py:120, constructed at No_Sql.py:359). */
  final case class Regex(field: String, pattern: String,
                         caseInsensitive: Boolean) extends FilterExpr

  /** Implicit AND: conjunction of all top-level field predicates
    * (Mongo find semantics; multi-field examples No_Sql.py:126-132). */
  final case class And(children: Seq[FilterExpr]) extends FilterExpr
}

/** A complete compiled query. `projection == Nil` means all columns
  * (`{}` normalized to None at No_Sql.py:396). */
final case class QuerySpec(
    filter: FilterExpr = FilterExpr.True,
    projection: Seq[String] = Nil,
    limit: Option[Int] = None)

/** Loud failure for anything outside the reference's declared operator
  * surface (SURVEY.md §2.1 "reject loudly rather than silently
  * mis-execute"). */
final class UnsupportedQueryException(msg: String)
    extends IllegalArgumentException(msg)
