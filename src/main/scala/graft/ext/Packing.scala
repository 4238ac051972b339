package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign each document the training block it starts in
  * when documents are concatenated in a stable order and cut every `budget`
  * tokens (the concat-and-cut packing LLM pretraining loaders use; blocks
  * are dense by construction, and a document straddling a cut simply
  * continues into the next block).
  *
  * Distribution: one window per shard — a hash shuffle on the shard column
  * and an in-partition sort, nothing global. A single total order would
  * serialize the corpus through one partition; sharding (by language,
  * source, or an explicit hash bucket) keeps every partition independent,
  * which is exactly how packed shards are consumed downstream. Block ids
  * are therefore per-shard, deterministic, and reproducible run-to-run
  * because the order is (shard, id), never load order.
  */
object Packing {

  /** Deterministic SIZE-BALANCED shard assignment — the export primitive
    * that turns a filtered corpus into `numShards` training shards of
    * near-equal byte/token mass (a skewed shard is a straggler for every
    * epoch of downstream training). The assignment is the two-level
    * LPT-flavored round-robin:
    *
    *  1. docs hash into `buckets` independent groups (`id mod buckets`);
    *  2. WITHIN each bucket, docs rank by (size desc, id) — one window
    *     per bucket, never a global total order (the single-partition
    *     sort a naive global rank-mod-k would serialize the corpus
    *     through at 100 TB);
    *  3. `shard = (rank0 + bucket) mod numShards` — each bucket deals
    *     its size-sorted docs round-robin (consecutive sizes land on
    *     different shards, so large docs spread instead of clumping),
    *     offset by the bucket id so the buckets' largest docs don't all
    *     pile onto shard 0.
    *
    * Every step is integer arithmetic over (id, size) — deterministic,
    * reproducible run-to-run, engine-replayable in SQL. Balance
    * improves with `buckets` (each shard receives every numShards-th
    * element of every bucket's size-sorted order); the widest window is
    * one bucket's doc list.
    *
    * @return input columns + `shard` (0-based). */
  def shardBalanced(df: DataFrame, idCol: String, sizeCol: String,
                    numShards: Int, buckets: Int = 64): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val w = Window.partitionBy(col("__b"))
      .orderBy(col(sizeCol).desc, col(idCol).asc)
    df.withColumn("__b",
        pmod(col(idCol).cast("long"), lit(buckets.toLong)))
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("shard",
        pmod(col("__r") - 1L + col("__b"), lit(numShards.toLong)))
      .drop("__r", "__b")
  }

  /** @param budget tokens per block (> 0)
    * @return input columns + `n_tokens` (whitespace tokens of `textCol`)
    *         + `block` (0-based per-shard block index the document starts
    *         in) */
  def packBlocks(df: DataFrame, idCol: String, textCol: String,
                 shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    df.withColumn("n_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      // the block a document STARTS in is decided by the tokens packed
      // before it: floor(preceding_total / budget)
      .withColumn("block",
        floor((col("__cum") - col("n_tokens")) / lit(budget.toDouble))
          .cast("long"))
      .drop("__cum")
  }
}
