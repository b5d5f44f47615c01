package graft.ops

import org.apache.spark.sql.functions._

import graft.{Registry, SparkTestBase}

/** The leakage-safe split's contract (d_leakage_split): near-duplicate
  * documents must never straddle train/val/test — the invariant is
  * structural (split is a pure function of the dedup cluster id), so
  * the test closes the loop on the REAL pair set: every LSH-verified
  * near-dup pair's two docs carry the same split label.
  */
class LeakageSplitSpec extends SparkTestBase {

  test("no verified near-dup pair straddles splits; every cluster is " +
      "split-atomic; all three splits are populated") {
    val split = Registry.byName("d_leakage_split").run(spark, sf001)
      .cache()
    try {
      // the real near-dup edges (same generator the CC labels consume)
      val pairs = DedupOps.verifiedMinhashPairs(spark, sf001)
        .select(col("d1"), col("d2"))
      val straddling = pairs
        .join(split.select(col("doc_id").as("d1"),
          col("split").as("s1")), "d1")
        .join(split.select(col("doc_id").as("d2"),
          col("split").as("s2")), "d2")
        .filter(col("s1") =!= col("s2"))
      assert(straddling.count() == 0L,
        "a near-dup pair crossing splits leaks val/test into train")

      // cluster-atomicity (the structural invariant, pinned)
      val mixed = split.groupBy("cluster_id")
        .agg(countDistinct(col("split")).as("n"))
        .filter(col("n") > 1)
      assert(mixed.count() == 0L)

      // deterministic hash split actually spreads mass: all three
      // splits non-empty, train the largest (80/10/10 target)
      val bySplit = split.groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySplit.keySet == Set("train", "val", "test"), bySplit)
      assert(bySplit("train") > bySplit("val") &&
        bySplit("train") > bySplit("test"), bySplit)
    } finally split.unpersist()
  }
}
