package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.catalog.TakedownSaga

/** Always-on takedown feed — the removal mirror of the two ingest
  * streams: a stream of takedown requests (`download_url` / `doc_id`
  * / `vec_id` columns per the saga roster) drives
  * [[graft.catalog.TakedownSaga]] through `foreachBatch`, so every
  * batch is one durable intent + completion across the catalog, the
  * dedup index, and the ANN index. This is the production shape of
  * the reference's deletion endpoint (a package delete cascading
  * through its index rows) when removals arrive as a FEED — DMCA
  * queues, license-revocation diffs, GDPR requests.
  *
  * Replay contract, two layers deep: the batchId rides the saga
  * INTENT as the saga log's own `tag` (a replayed batch finds its
  * intent already committed and no-ops instead of opening a
  * duplicate), and each member-store delete rides the saga id on the
  * `tdtag` channel (a crash mid-apply re-applies only the stores the
  * watermark hasn't covered). Every batch also drives
  * [[TakedownSaga.runPending]], so intents stranded by an earlier
  * coordinator crash complete on the next arrival — recovery is the
  * steady state, not a special restart path. */
object TakedownStream {

  /** One micro-batch: durable intent (tagged with the batchId), then
    * completion of everything pending — this batch's intent AND any
    * stranded predecessor. Empty batches still drive recovery (a
    * crash can strand an intent with no follow-up arrivals; the
    * empty-batch tick is what finishes it). */
  def processBatch(sagaRoot: String, stores: TakedownSaga.Stores,
      batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty)
      TakedownSaga.begin(batch.sparkSession, sagaRoot, batch, stores,
        tag = Some(batchId))
    TakedownSaga.runPending(batch.sparkSession, sagaRoot)
    ()
  }

  /** Wire a streaming takedown-request frame into the saga at
    * `sagaRoot` (ONE saga log per store roster — the watermark
    * contract). `vacuumEvery > 0` prunes completed saga history on a
    * batch cadence, like the ingest streams' retention knobs. */
  def run(requests: DataFrame, sagaRoot: String,
      stores: TakedownSaga.Stores, checkpointDir: String,
      vacuumEvery: Int = 0, vacuumKeep: Int = 16): StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(sagaRoot, stores, batch, batchId)
        if (vacuumEvery > 0 && batchId % vacuumEvery == 0)
          TakedownSaga.vacuum(sagaRoot, keep = vacuumKeep)
        ()
      }
      .start()
}
