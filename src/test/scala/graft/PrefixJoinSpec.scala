package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** `d_jaccard_prefix_join` claims the prefix filter is LOSSLESS: the
  * candidate join on df-ascending prefixes must produce every exact
  * ≥0.5-Jaccard pair. The driver oracle checks that on the synthetic
  * corpus; this spec checks it on the borderline corpus the recall
  * gate uses (J ∈ [0.5, 0.6) pairs, where the 8×4 LSH bands miss
  * ~half — exactly the pairs a probabilistic filter drops and a
  * correct prefix filter must keep).
  */
class PrefixJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val M = 42
  private val NPairs = 40

  // the LshRecallSpec construction: pair i's two docs share a k-token
  // prefix, all tokens unique to the pair → J = (k-2)/(80-(k-2));
  // plus a 50-doc noise cohort all sharing ONE hot 3-token phrase
  // (J = 1/79 pairwise, far below threshold) — 1,225 shared-gram
  // pairs a naive gram join must examine and the candidate stage must
  // prune (the hot gram's high df pushes it out of every prefix)
  private def corpus = (0 until NPairs).flatMap { i =>
    val k = 29 + (i % 3)
    val a = (1 to M).map(j => s"p${i}a$j")
    val b = a.take(k) ++ (1 to (M - k)).map(j => s"p${i}b$j")
    Seq((i.toLong * 2, a.mkString(" ")), (i.toLong * 2 + 1, b.mkString(" ")))
  } ++ (0 until 50).map { i =>
    val tail = (1 to M - 3).map(j => s"z${i}t$j")
    (1000L + i, (Seq("zz1", "zz2", "zz3") ++ tail).mkString(" "))
  }

  test("prefix filter keeps every exact pair LSH would band-miss") {
    val docs = DedupOps.shingleDocs(corpus.toDF("doc_id", "text"))
    val exact = DedupOps.exactJaccardPairs(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.size == NPairs, s"expected $NPairs seeded pairs, got ${exact.size}")

    // the registered query's candidate stage, via the SAME helper it
    // runs (prefix + size + positional filters — all must be lossless)
    val cand = DedupOps.prefixCandidates(docs)
      .as[(Long, Long)].collect().toSet

    val missed = exact -- cand
    assert(missed.isEmpty, s"prefix filter dropped true pairs: $missed")

    // and the filter actually prunes: candidate pairs stay well below
    // the all-shared-gram pair count the naive join would examine
    val grams = docs.select(col("doc_id"), explode(col("sh")).as("g"))
    val allShared = grams.select(col("doc_id").as("d1"), col("g"))
      .join(grams.select(col("doc_id").as("d2"), col("g")), Seq("g"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct().count()
    assert(cand.size < allShared,
      s"no pruning: ${cand.size} candidates vs $allShared shared-gram pairs")
  }
}
