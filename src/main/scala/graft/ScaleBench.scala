package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-scaling measurement: run the heaviest queries at the base SF
  * and at a synthetic 10× corpus, and report sec ratios — the
  * "would it survive 100×?" question answered with data (round-5
  * advice item 5). Results are recorded in BASELINE.md.
  *
  * The 10× corpus is 10 copies of the base documents with ids offset
  * and every token suffixed `_k` in copy k>0: WITHIN-copy near-dup
  * structure is preserved exactly (token-relative shingles are
  * unchanged), while CROSS-copy similarity is zero — so pair counts,
  * cluster sizes, and bucket populations scale linearly, which is the
  * honest scaling model (naive duplication would make every document
  * 9 mutual near-dups and measure an artificial quadratic blowup).
  * Embeddings get id offsets (bucket populations scale linearly).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<base> runMain graft.ScaleBench
  * (writes/reuses the scaled corpus under /tmp/graft_scale10x).
  */
object ScaleBench {

  val Queries = Seq("d_ngram_jaccard", "m_snippet_match",
    "x5_halohash_match", "d_dedup_clusters", "s_cosine_ann_ivf",
    "d_minhash_lsh", "d_cluster_keeper", "mm_feature_extract",
    "t_bpe_encode", "d_decontaminate")

  def buildScaled(spark: SparkSession, base: String, out: String,
      factor: Int): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + k * nDoc).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"_$k"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select((col("vec_id") + k * nVec).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val out = "/tmp/graft_scale10x"
    val factor = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalebench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/documents.parquet")))
      buildScaled(spark, base, out, factor)

    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // JIT/codegen warmup on the smallest SF
    Queries.foreach { q =>
      Registry.byName(q).run(spark, "/root/testdata/sf0.001").count()
      release()
    }

    def time(q: String, dir: String): (Double, Long) = {
      // min of two runs: scaling ratios want the contention-free floor
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = Registry.byName(q).run(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        release()
        (dt, rows)
      }
      (samples.map(_._1).min, samples.head._2)
    }

    val entries = Queries.map { q =>
      val (b, bRows) = time(q, base)
      val (x, xRows) = time(q, out)
      val line = f""""$q":{"base_sec":$b%.3f,"x10_sec":$x%.3f,""" +
        f""""ratio":${x / b}%.2f,"base_rows":$bRows,"x10_rows":$xRows}"""
      System.err.println(s"[scale] $line")
      line
    }
    println(entries.mkString(
      s"""{"metric":"scale10x","factor":$factor,"base":"$base","queries":{""",
      ",", "}}"))
    spark.stop()
  }
}
