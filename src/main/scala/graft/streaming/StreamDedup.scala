package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental LSH candidate generation for streaming corpus ingest —
  * the stateful half of the `d_stream_dedup` decision (see
  * `ops/DedupOps.streamDedup`): documents arrive continuously, each
  * carries its 8 MinHash band buckets (`DedupOps.bandFrame`), and the
  * bucket-keyed state emits one candidate pair per (new doc, earlier
  * same-bucket doc). Downstream, candidates are verified with exact
  * Jaccard against a document store and the first-seen-wins decision is
  * `witness = min(matching earlier id)` — exactly the batch plan's
  * semantics, which is what makes the streaming machine testable
  * against it (DedupStreamSpec proves equality over micro-batch
  * splits).
  *
  * Order independence: within a micro-batch the emitted pair set is
  * all-pairs among (state ∪ batch) minus the pairs already emitted
  * (those among state), each normalized to (lower id, higher id) — no
  * dependence on intra-batch arrival order, so batch-boundary placement
  * and replays cannot change the emitted set (append-mode exactly-once
  * downstream of a replayed batch dedupes on the pair key).
  *
  * 100 TB shape: state per bucket is the doc_id list of that bucket —
  * the same collision groups the batch equi-join shuffles; hot buckets
  * are the same hot keys either way. Production would cap per-bucket
  * state (a bucket past ~10^3 ids is a degenerate shingle, cf. the
  * reference's frequent-gram suppression) — the cap is a policy knob,
  * not a structural limit.
  */
object StreamDedup {

  /** One (document × band) arrival: the unit the bucket-keyed state
    * machine consumes. */
  case class BandRow(band_idx: Int, band_hash: Int, doc_id: Long)

  /** Normalized candidate pair, d1 < d2. */
  case class CandPair(d1: Long, d2: Long)

  /** Bucket-keyed incremental candidate emission. State per
    * (band_idx, band_hash) = doc_ids seen so far in that bucket. */
  def candidates(input: Dataset[BandRow]): Dataset[CandPair] = {
    import input.sparkSession.implicits._
    input
      .groupByKey(r => (r.band_idx, r.band_hash))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Int), rows: Iterator[BandRow],
            state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty)
          val seenSet = seen.toSet
          val fresh = rows.map(_.doc_id).toSeq.distinct
            .filterNot(seenSet.contains)
          val vsSeen = for (d <- fresh; e <- seen)
            yield CandPair(math.min(d, e), math.max(d, e))
          val vsFresh = for {
            i <- fresh.indices; j <- fresh.indices if i < j
          } yield CandPair(math.min(fresh(i), fresh(j)),
            math.max(fresh(i), fresh(j)))
          if (fresh.nonEmpty) state.update(seen ++ fresh)
          (vsSeen ++ vsFresh).iterator
      }
  }
}
