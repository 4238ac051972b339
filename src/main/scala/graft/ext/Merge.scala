package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge / upsert — applying an incremental change feed to a base
  * snapshot, the maintenance step of every continuously-refreshed training
  * corpus (new crawls in, takedowns out, metadata fixes in place).
  *
  * Semantics (MERGE with latest-wins): the change feed carries full rows
  * plus an op column (`I`/`U` upsert, `D` delete) and a monotonically
  * increasing sequence column; for each key only the HIGHEST-sequence
  * change applies. Ties break by op descending (`U` over `I` over `D`),
  * then by a 64-bit hash of the full payload — a TOTAL order, so a feed
  * that carries duplicate `(key, seq, op)` rows with different payloads
  * still replays to the same survivor on every run and every partition
  * layout (row_number over a partial order would pick whichever row the
  * shuffle happened to deliver first). Then
  *
  *   result = (base ⟕̸ touched-keys) ∪ (latest changes that are upserts)
  *
  * Plan shape at 100 TB: the change feed is orders of magnitude smaller
  * than the base, so the latest-wins window runs on the feed alone (one
  * small shuffle), and the anti-join against its key set is
  * broadcast-sized — AQE picks BroadcastHashJoin and the BASE NEVER
  * SHUFFLES; survivors stream straight from the scan into the union. No
  * hint is forced: a pathological feed bigger than the broadcast threshold
  * degrades to a shuffled anti-join instead of OOMing the driver (the
  * same deliberate choice as [[Components.applyClusters]]).
  */
object Merge {

  /** Apply `changes` to `base`. `changes` must have every `base` column
    * plus `opCol` (values I/U/D) and `seqCol`; output has exactly the
    * `base` columns. Reserved-name collisions fail loudly up front. */
  def upsert(base: DataFrame, changes: DataFrame, keyCol: String,
             opCol: String, seqCol: String): DataFrame = {
    val reserved = Seq("__rnk")
    require(!(base.columns ++ changes.columns).exists(reserved.contains),
      s"column names ${reserved.mkString(",")} are reserved by Merge.upsert")
    val baseCols = base.columns.toSeq
    require(baseCols.forall(changes.columns.contains),
      "changes must carry every base column")
    // latest change per key: window over the FEED only (small by contract).
    // The payload-hash third key makes the order TOTAL: duplicate
    // (key, seq, op) rows survive deterministically (hash-equal payloads
    // are identical rows, so either pick is the same row).
    val latest = changes
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col(seqCol).desc, col(opCol).desc,
            xxhash64(baseCols.map(col): _*).desc)))
      .filter(col("__rnk") === 1)
    // every touched key leaves the base; upserts re-enter with feed values
    val touched = latest.select(col(keyCol))
    val survivors = base.join(touched, Seq(keyCol), "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(baseCols.map(col): _*)
    survivors.union(upserts)
  }

  /** Build the full SCD-type-2 history from a change feed: one validity
    * interval per change, `valid_from` = its own sequence, `valid_to` =
    * the NEXT change's sequence for the key (null while current), and
    * `is_current` only on the open interval. Delete rows close the
    * previous interval (they participate in the `lead`) but emit no
    * version of their own — after a delete tail the key has no current
    * row, which is exactly what "deleted" means in a history table.
    *
    * Duplicate `(key, seq)` rows are replayed latest-wins FIRST with the
    * same total order as [[upsert]] (op desc, then payload hash), so the
    * interval chain is well-defined on any feed the upsert path accepts.
    *
    * Plan shape: both the dedup and the `lead` are windows over the SAME
    * `(key, seq)` partitioning — Spark plans ONE exchange and sorts once;
    * nothing here touches the base table at all, so history maintenance
    * scales with the feed, not the corpus. */
  def scd2(changes: DataFrame, keyCol: String, opCol: String,
           seqCol: String): DataFrame = {
    val reserved = Seq("__rnk", "valid_from", "valid_to", "is_current")
    require(!changes.columns.exists(reserved.contains),
      s"column names ${reserved.mkString(",")} are reserved by Merge.scd2")
    val payload = changes.columns.toSeq.filterNot(c => c == opCol || c == seqCol)
    val byKeySeq = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val deduped = changes
      .withColumn("__rnk", row_number().over(
        Window.partitionBy(col(keyCol), col(seqCol))
          .orderBy(col(opCol).desc, xxhash64(payload.map(col): _*).desc)))
      .filter(col("__rnk") === 1)
      .drop("__rnk")
    deduped
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(byKeySeq))
      .filter(col(opCol) =!= "D")
      .select(payload.map(col) ++ Seq(col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }
}
