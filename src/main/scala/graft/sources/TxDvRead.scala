package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** The deletion-vector READ path for SQL: a DSv2 relation over a
  * snapshot with live tombstones cannot be served by the plain
  * delegated parquet scan (a scan has nowhere to hang the anti-join),
  * so this post-hoc resolution rule swaps such relations for the
  * DV-aware snapshot read ([[TxTable.readVersion]] — the SAME
  * distributed left-anti every API reader uses; AQE broadcasts the
  * tombstones when small). The replacement is wrapped in a Project
  * that aliases the new outputs onto the ORIGINAL attribute ids, so
  * every parent expression keeps resolving — the Delta
  * PreprocessTableWithDVs shape. Tables without tombstones never
  * match: their scans stay the stats-pruned [[TxScanBuilder]] path,
  * cost unchanged.
  *
  * Row-level command targets are deliberately NOT rewritten: DELETE
  * resolves through `SupportsDelete` and UPDATE/MERGE through
  * [[TxRowLevel.RowLevelRule]] (injected BEFORE this rule), and their
  * engines read the manifest's dvDirs themselves. A MERGE's SOURCE
  * subtree, by contrast, is an ordinary read and rewrites here — both
  * before conversion (`MergeIntoTable.sourceTable`) and after
  * ([[TxMergeCommand]] holds the analyzed source as a field a plain
  * transform would never reach). */
final case class DvReadRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def rewrite(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case rel: DataSourceV2Relation
          if rel.table.isInstanceOf[TxSqlTable] &&
            rel.table.asInstanceOf[TxSqlTable].hasDeletionVectors =>
        val t = rel.table.asInstanceOf[TxSqlTable]
        val read = TxTable.readVersion(session, t.tablePath.toString,
          t.snapshotVersion).queryExecution.analyzed
        Project(rel.output.zip(read.output).map { case (old, n) =>
          Alias(n, old.name)(exprId = old.exprId,
            qualifier = old.qualifier)
        }, read)
    }

  /** Row-level command TARGETS stay untouched, but their CONDITION
    * subqueries are ordinary reads: a DV-bearing graft relation inside
    * `WHERE id IN (SELECT … FROM graft_dv_t)` of another connector's
    * DELETE/UPDATE must swap here, or the execution tripwire throws a
    * misleading "register GraftExtensions" on a session that did. */
  private def rewriteCondSubqueries(p: LogicalPlan): LogicalPlan =
    p.transformExpressions {
      case s: org.apache.spark.sql.catalyst.expressions
          .SubqueryExpression => s.withNewPlan(rewrite(s.plan))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => rewriteCondSubqueries(d)
    case u: UpdateTable => rewriteCondSubqueries(u)
    case m: MergeIntoTable =>
      rewriteCondSubqueries(m.copy(sourceTable = rewrite(m.sourceTable)))
    case c: TxMergeCommand => c.copy(source = rewrite(c.source))
    case other => rewrite(other)
  }
}
