package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Transient probe: candidate/gram cardinalities of the prefix join
  * on a scaled corpus (diagnosing the 100x shuffle-row record). */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100x")
    val spark = SparkSession.builder().master("local[32]")
      .appName("cand-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ops.DedupOps.shingleDocs(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"))
    val grams = docs.select(col("doc_id"), explode(col("sh")).as("g"))
    println(s"CAND_PROBE grams=${grams.count()}")
    val cand = graft.ops.DedupOps.prefixCandidates(docs)
    println(s"CAND_PROBE pairs=${cand.count()}")
    spark.stop()
  }
}
