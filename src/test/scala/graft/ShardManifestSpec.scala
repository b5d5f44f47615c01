package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The physical half of `t_shard_manifest`: the manifest query is the
  * integrity artifact, this spec exercises the shard WRITE it
  * describes — `repartition(n, shard)` → `sortWithinPartitions` →
  * partitioned parquet — then re-derives the manifest from the files
  * on disk and asserts it is byte-identical to the query's answer.
  * That closes the loop a streaming loader relies on: if the writer
  * dropped, duplicated, or cross-assigned a row, some shard's count /
  * char-mass / xor checksum would disagree.
  */
class ShardManifestSpec extends SparkTestBase {

  test("written shards reproduce the manifest bit-for-bit") {
    val manifest = ops.TextOps.shardManifest.run(spark, sf001)
      .collect().map(r => (r.getLong(0), r.toSeq.toVector)).toMap
    assert(manifest.nonEmpty)

    val out = Files.createTempDirectory("graft-shards").toString + "/shards"
    val h = expr("(doc_id * 1103515245L + 12345L) % 2147483648L")
    val sharded = core.t(spark, sf001, "documents")
      .withColumn("h", h)
      .withColumn("shard", col("h") % 64)
    sharded
      .repartition(8, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.partitionBy("shard").parquet(out)

    // re-derive the manifest FROM THE WRITTEN FILES: shard comes from
    // the directory key, everything else from the row payloads
    val words = filter(split(col("text"), " "), w => w =!= "")
    val reread = spark.read.parquet(out)
      .withColumn("fp", (col("h") * 31L + col("n_chars")) % 2147483648L)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(words).cast("long")).as("total_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        expr("bit_xor(fp)").as("checksum"))
      .collect().map(r => (r.getLong(0), r.toSeq.toVector)).toMap

    assert(reread.keySet === manifest.keySet)
    for ((shard, row) <- manifest)
      assert(reread(shard) === row, s"shard $shard manifest mismatch")

    // within-shard order survives the write: doc_ids are nondecreasing
    // in each shard's file read back in file order
    val shard0 = spark.read.parquet(s"$out/shard=0")
      .select("doc_id").collect().map(_.getLong(0))
    assert(shard0.sameElements(shard0.sorted))
  }
}
