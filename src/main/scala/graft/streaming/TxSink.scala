package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.sources.TxTable

/** Exactly-once transactional streaming sink: a `foreachBatch` handler
  * that appends each micro-batch to a [[TxTable]] as one atomic commit,
  * stamped with the stream's (appId, batchId) — the full Delta
  * `txnAppId`/`txnVersion` recipe on top of the manifest log.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: after
  * a crash between "sink wrote" and "checkpoint advanced", the SAME batch
  * id is replayed. A plain parquet append would duplicate those rows;
  * here the watermark rides the manifest's carried-forward `txns` map
  * keyed by `appId`, so a replay sees its batch id already recorded and
  * skips — at-least-once delivery × idempotent commit = exactly-once
  * table contents. Readers never see a half-applied batch (manifest
  * publish is atomic), and a crash BEFORE publish leaves only an
  * unreferenced data dir that [[TxTable.vacuum]] reclaims.
  *
  * Why the appId half matters (and why the skip check is NOT a bare
  * batch-id compare): batch ids are per-checkpoint, starting at 0 — a
  * NEW stream (fresh checkpoint) writing to an existing table would
  * otherwise find some old stream's high batch id and silently drop all
  * of its own early batches. Scoping the watermark by `appId` (one id
  * per logical stream, normally the checkpoint/query id) makes distinct
  * streams independent. And because the watermark lives in the `txns`
  * map that EVERY subsequent commit carries forward into its own
  * manifest (see [[TxTable.Manifest]]), [[TxTable.vacuum]] expiring the
  * historical manifest that first recorded a batch cannot regress the
  * watermark — the latest manifest always holds it. (Reading it from
  * `history()` op labels, as a naive port would, loses exactly that
  * guarantee.)
  *
  * Scale shape: the skip check reads ONE manifest (the latest) per
  * batch — driver metadata, like the commit itself; rows flow through
  * an ordinary distributed `DataFrame` write. A long-running stream
  * interleaves cleanly with batch writers on the same table — the OCC
  * version check serializes them.
  */
object TxSink {

  private def txnKey(appId: String) = s"stream:$appId"

  /** The last batch id stream `appId` recorded in `tableDir`'s log. */
  def lastBatchId(tableDir: String, appId: String): Option[Long] =
    TxTable.lastTxn(tableDir, txnKey(appId))

  /** Append one micro-batch for stream `appId`; replays of an
    * already-committed batch id are skipped. Returns true when a commit
    * happened. Pass as
    * `.foreachBatch((b, id) => TxSink.appendBatch(dir, b, id, qid): Unit)`
    * with `qid` stable across restarts (the checkpoint/query id). */
  def appendBatch(tableDir: String, batch: DataFrame, batchId: Long,
                  appId: String,
                  primitive: graft.sources.CommitPrimitive =
                    graft.sources.PosixLinkPrimitive): Boolean =
    if (lastBatchId(tableDir, appId).exists(batchId <= _)) false
    else {
      TxTable.commit(batch, tableDir, "append",
        opLabel = Some(s"stream:$appId:$batchId"),
        txn = Some(txnKey(appId) -> batchId), primitive = primitive)
      true
    }
}
