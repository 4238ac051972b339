package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass every
  * long-lived 100 TB corpus needs: streaming ingest and per-batch sinks
  * leave thousands of KB-sized files per partition, and scan throughput
  * dies on file-open overhead long before bytes become the bottleneck.
  *
  * The planner assigns each file to a compaction group by ordered
  * cumulative fill: files are walked in deterministic (path) order per
  * partition directory, and a file starts a new group whenever its start
  * offset crosses a `targetBytes` boundary — greedy first-fit in one
  * window pass, no driver loop. Groups can overshoot by at most one file,
  * which is the right trade: splitting a file across groups would defeat
  * the point.
  *
  * Scale notes: the input is the FILE INVENTORY — O(files) metadata rows,
  * orders of magnitude smaller than the data — and the window partitions
  * by the partition directory (compaction never merges across Hive
  * partitions, which is also what keeps partition pruning intact after
  * the rewrite). No global sort, no single-partition window: the widest
  * sequential stretch is one directory's file list. The plan output is
  * exactly what a rewrite job consumes: read each group, write one file.
  */
object Compaction {

  /** Plan compaction groups. Output: one row per file with its partition
    * dir, size, and `grp` — the 0-based group index within the partition
    * dir. `targetBytes` must be positive; zero would divide-by-zero into
    * nonsense groups, so reject it loudly. */
  def plan(inventory: DataFrame, partCol: String, pathCol: String,
           bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val w = Window.partitionBy(col(partCol)).orderBy(col(pathCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inventory
      .select(col(partCol), col(pathCol), col(bytesCol).cast("long").as(bytesCol))
      .withColumn("start_off", sum(col(bytesCol)).over(w) - col(bytesCol))
      .select(col(partCol), col(pathCol), col(bytesCol),
        expr(s"start_off div $targetBytes").as("grp"))
  }
}
