package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{IvfIndexStore, SimilarityOps}

/** Always-on embedding ingest — the ANN mirror of
  * [[DedupIngestStream]]: a (vec_id, embedding) stream drives
  * [[graft.ops.IvfIndexStore.append]] through `foreachBatch`, so the
  * persisted IVF index is the stream's state, growing one O(batch)
  * inverted-list shard per micro-batch on the FROZEN centroids.
  * Unlike the dedup index, a from-scratch bootstrap needs a non-empty
  * [[graft.ops.IvfIndexStore.save]] first: the coarse quantizer must
  * TRAIN on something, and retraining is a generation change
  * (re-save), never a stream-side mutation — the standard IVF
  * deployment cadence (train daily/weekly offline, ingest
  * continuously).
  *
  * Replay contract: the batchId rides the append record's `tag`; a
  * replayed batch at or below the committed tag is a no-op, so a
  * crash between the CAS and the checkpoint advance cannot
  * double-append a shard (EmbeddingIngestStreamSpec's replay twin). */
object EmbeddingIngestStream {

  /** One micro-batch: quantize and append. Empty batches are skipped
    * (naturally idempotent). Returns the committed (or, on replay,
    * already-committed) version. */
  def processBatch(root: String, batch: DataFrame, batchId: Long): Long =
    if (batch.isEmpty) IvfIndexStore.latestVersion(root)
    else {
      try IvfIndexStore.append(batch.sparkSession, root,
        SimilarityOps.quantizeEmbeddings(
          batch.select("vec_id", "embedding")),
        tag = Some(batchId))
      finally SimilarityOps.releaseCaches()
    }

  /** Wire a streaming (vec_id, embedding) frame into the saved index
    * at `root`. */
  def run(embeddings: DataFrame, root: String, checkpointDir: String)
      : StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(root, batch, batchId); ()
      }
      .start()
}
