package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import scala.util.control.NonFatal

/** Scale-adaptive parallelism floor for CPU-heavy narrow pipelines
  * (spark_optimization_guide §2.5 "input skew: one huge unsplittable
  * file … repartition immediately after the read").
  *
  * The driver's testdata is one single-row-group parquet file per table,
  * so every scan plans exactly ONE task and everything before the first
  * exchange — shingle/minhash kernels, trigram explosion, levenshtein
  * verification, media decoding — runs on 1 of N cores (measured:
  * `text_lmscore`'s trigram+count map stage was a single 2.6 s task on
  * `local[32]`). The same shape recurs at any scale as the small tail of
  * a table (one little delta file after compaction), so the fix is a
  * FLOOR, not a constant: raise the partition count to the session's
  * default parallelism when the plan has fewer, never lower it — at
  * cluster scale a healthy multi-thousand-partition scan passes through
  * untouched.
  *
  * Only narrow plans are eligible. Probing the partition count goes
  * through `df.rdd`, and on an exchange-bearing plan AQE's
  * `getFinalPhysicalPlan` would EXECUTE the upstream stages eagerly;
  * a narrow chain (scan → project/filter/generate) is planned without
  * AQE, so the probe is free. Anything else returns unchanged.
  *
  * Row-order note: round-robin repartition reorders rows, so callers
  * must be order-insensitive up to their own final sort — true of every
  * aggregate/join operator this is applied to (their declared queries
  * end in a total-order `orderBy` and are oracle-certified after the
  * change).
  */
private[graft] object Par {

  /** True when the optimized plan is a narrow chain over leaf relations:
    * no joins, aggregates, sorts, windows, repartitions, limits or
    * set-ops — i.e. partition count equals scan parallelism and `.rdd`
    * cannot trigger stage execution. */
  private def isNarrow(plan: LogicalPlan): Boolean = plan.collectFirst {
    case _: Join => ()
    case _: Aggregate => ()
    case _: Window => ()
    case _: Sort => ()
    case _: RepartitionOperation => ()
    case _: GlobalLimit => ()
    case _: LocalLimit => ()
    case _: Union => ()
    case _: Intersect => ()
    case _: Except => ()
    case _: Distinct => ()
    case _: Deduplicate => ()
    // A cached frame appears as an InMemoryRelation leaf — narrow to this
    // scan, but probing its partition count via df.rdd plans the cached
    // AQE subtree, and with canChangeCachedPlanOutputPartitioning enabled
    // that executes upstream stages eagerly. Treat it as not eligible:
    // the cache's partitioning was decided when it was built.
    case _: InMemoryRelation => ()
  }.isEmpty

  /** Fan `df` out to the session's default parallelism when its (narrow)
    * plan would run on fewer tasks; otherwise return it unchanged. The
    * repartition shuffles only the narrow pre-kernel rows (for the
    * operators using this: raw text / ids, a few MB), in exchange for
    * N-way parallelism of the expensive per-row work downstream. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (target <= 1) return df
    try {
      if (!isNarrow(df.queryExecution.optimizedPlan)) df
      else if (df.rdd.getNumPartitions < target) df.repartition(target)
      else df
    } catch { case NonFatal(_) => df }
  }
}
