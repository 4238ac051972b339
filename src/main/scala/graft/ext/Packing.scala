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
