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
  // prefix, all tokens unique to the pair → J = (k-2)/(80-(k-2))
  private def corpus = (0 until NPairs).flatMap { i =>
    val k = 29 + (i % 3)
    val a = (1 to M).map(j => s"p${i}a$j")
    val b = a.take(k) ++ (1 to (M - k)).map(j => s"p${i}b$j")
    Seq((i.toLong * 2, a.mkString(" ")), (i.toLong * 2 + 1, b.mkString(" ")))
  }

  test("prefix filter keeps every exact pair LSH would band-miss") {
    val docs = DedupOps.shingleDocs(corpus.toDF("doc_id", "text"))
    val exact = DedupOps.exactJaccardPairs(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.size == NPairs, s"expected $NPairs seeded pairs, got ${exact.size}")

    // re-run the registered query's plan over this corpus by
    // replicating its stages on the seeded shingle frame
    val grams = docs.select(col("doc_id"), explode(col("sh")).as("g"))
    val freq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("g"))
    val sized = grams.join(freq, "g")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val pre = sized.filter(col("rn") <= expr("n - (n + 1) div 2 + 1"))
    // the registered query's full candidate stage: size filter AND
    // the positional (PPJoin) filter — both must be lossless
    val cand = pre.select(col("doc_id").as("d1"), col("g"),
        col("n").as("na"), col("rn").as("ra"))
      .join(pre.select(col("doc_id").as("d2"), col("g"),
        col("n").as("nb"), col("rn").as("rb")), Seq("g"))
      .filter(col("d1") < col("d2") &&
        col("na") <= col("nb") * 2 && col("nb") <= col("na") * 2 &&
        lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
          expr("(na + nb + 2) div 3"))
      .select("d1", "d2").distinct()
      .as[(Long, Long)].collect().toSet

    val missed = exact -- cand
    assert(missed.isEmpty, s"prefix filter dropped true pairs: $missed")

    // and the filter actually prunes: prefixes carry roughly half the
    // gram rows, never all of them
    val nGrams = grams.count()
    val nPre = pre.count()
    assert(nPre < nGrams * 6 / 10, s"no pruning: $nPre of $nGrams")
  }
}
