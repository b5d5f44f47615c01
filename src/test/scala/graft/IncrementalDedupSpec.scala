package graft

import graft.ops.DedupOps

/** The incremental-ingest verdict (`d_incremental_dedup`): a new
  * shard (doc_id % 5 == 0) deduped against the standing corpus
  * through the banded MinHash index, first-seen-wins within the
  * shard. Seeded with exact duplicates (J = 1.0, so every expected
  * pair collides in every band — the verdicts are deterministic
  * facts, not probabilistic ones), covering all three verdicts, the
  * corpus-over-shard witness tie-break, and the invariant that the
  * corpus side never appears in the output.
  */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val tA = "alpha beta gamma delta epsilon zeta eta theta"
  private val tB = "one two three four five six seven eight"
  private val tC = "red orange yellow green blue indigo violet ultra"

  test("verdicts: dup_corpus, admitted, dup_increment, and the " +
      "max-jaccard/min-id witness rule") {
    // corpus: 1=tA, 2=tB; increment: 5=tA (dup of corpus 1),
    // 10=tC (unique → admitted), 15=tC (dup of EARLIER increment 10),
    // 20=tA (J=1.0 vs corpus 1 AND increment 5 → tie on jaccard,
    // min witness id wins → corpus 1)
    val docs = Seq(
      (1L, tA), (2L, tB),
      (5L, tA), (10L, tC), (15L, tC), (20L, tA)).toDF("doc_id", "text")
    val out = DedupOps.incrementalVerdicts(DedupOps.shingleDocs(docs))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq

    assert(out == Seq(
      (5L, "dup_corpus", 1L),
      (10L, "admitted", -1L),
      (15L, "dup_increment", 10L),
      (20L, "dup_corpus", 1L)),
      s"got $out")
  }

  test("an increment doc similar ONLY to a later increment doc is " +
      "admitted (first-seen-wins is directional)") {
    // 5=tC is the FIRST appearance of tC in the shard; 10=tC repeats
    // it. 5 must be admitted, 10 rejected against 5 — never the
    // reverse, and never both rejected.
    val docs = Seq((1L, tA), (5L, tC), (10L, tC)).toDF("doc_id", "text")
    val out = DedupOps.incrementalVerdicts(DedupOps.shingleDocs(docs))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((5L, "admitted"), (10L, "dup_increment")),
      s"got $out")
  }

  test("exactly one output row per increment doc; the corpus side " +
      "never leaks into the output") {
    val docs = Seq(
      (1L, tA), (2L, tB), (3L, tC), (4L, tA), // corpus incl. dups
      (5L, tB), (10L, tB)).toDF("doc_id", "text")
    val out = DedupOps.incrementalVerdicts(DedupOps.shingleDocs(docs))
    assert(out.count() == 2)
    assert(out.filter("doc_id % 5 != 0").count() == 0,
      "corpus docs (incl. corpus-corpus duplicates) must not appear")
  }
}
