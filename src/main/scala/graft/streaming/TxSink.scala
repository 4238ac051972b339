package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sources.TxTable

/** Exactly-once transactional streaming sink: a `foreachBatch` handler
  * that appends each micro-batch to a [[TxTable]] as one atomic commit,
  * stamped with the batch id — the Delta `txnAppId`/`txnVersion` recipe
  * on top of the manifest log.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: after
  * a crash between "sink wrote" and "checkpoint advanced", the SAME batch
  * id is replayed. A plain parquet append would duplicate those rows;
  * here the batch id rides the manifest's op field (`stream:<id>`), so a
  * replay sees its id already in the log and skips — at-least-once
  * delivery × idempotent commit = exactly-once table contents. Readers
  * never see a half-applied batch (manifest publish is atomic), and a
  * crash BEFORE publish leaves only an unreferenced data dir that
  * [[TxTable.vacuum]] reclaims.
  *
  * Scale shape: the skip check reads the O(versions) manifest log once
  * per batch (driver metadata, like the commit itself); rows flow through
  * an ordinary distributed `DataFrame` write. A long-running stream
  * interleaves cleanly with batch writers on the same table — the OCC
  * version check serializes them.
  */
object TxSink {

  private val Label = "^stream:(\\d+)$".r

  /** The last batch id this sink recorded in `tableDir`'s log, if any. */
  def lastBatchId(tableDir: String): Option[Long] =
    TxTable.history(tableDir)
      .collect { case (_, Label(id)) => id.toLong }
      .maxOption

  /** Append one micro-batch; replays of an already-committed batch id are
    * skipped. Returns true when a commit happened. Pass as
    * `.foreachBatch((b, id) => TxSink.appendBatch(dir, b, id): Unit)`. */
  def appendBatch(tableDir: String, batch: DataFrame, batchId: Long): Boolean =
    if (lastBatchId(tableDir).exists(batchId <= _)) false
    else {
      TxTable.commit(batch, tableDir, "append",
        opLabel = Some(s"stream:$batchId"))
      true
    }
}
