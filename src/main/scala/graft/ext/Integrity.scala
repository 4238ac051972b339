package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity auditing — the data-quality gate a pipeline runs
  * after every ingest: how many child rows reference a parent that does
  * not exist (dropped partition, late dimension, corrupted key).
  *
  * Shape at 100 TB: the child anti-joins the DISTINCT parent keys — the
  * parent table collapses to its key column before anything moves, AQE
  * broadcasts it when small, and the output is one row per relationship
  * (a count), so the audit costs one scan per side regardless of how
  * wide the tables are. Orphan counts rather than orphan rows on
  * purpose: the audit must be cheap enough to run always; fetching the
  * offending rows is the follow-up query you run when a count is
  * nonzero. */
object Integrity {

  /** One relationship: rows of `child` whose `childKey` has no match in
    * `parent.parentKey`. NULL child keys count as orphans (a null FK
    * cannot reference anything — flagging it is the point of the audit). */
  def orphans(child: DataFrame, parent: DataFrame, childKey: String,
              parentKey: String, relName: String): DataFrame =
    child.join(parent.select(col(parentKey)).distinct(),
        child(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit(relName).as("rel"), col("n_orphans"))

  /** Several relationships in one frame (one row each). */
  def audit(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one relationship")
    checks.reduce(_.unionByName(_))
  }
}
