package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{IvfIndexStore, SimilarityOps}

/** Amortization measurement for the persisted IVF index
  * ([[graft.ops.IvfIndexStore]]): the `s_ann_increment` bench query
  * must rebuild the corpus index inside its own plan (a registered
  * query owns no cross-run artifacts), so its scale points carry the
  * k ∝ corpus rebuild term. This probe measures what a DEPLOYMENT
  * pays once the index is an on-disk artifact: per corpus size
  * (base/10×/100× replicated embeddings),
  *
  *   - `build_s`   — train + save, the cost paid ONCE per index
  *     generation (amortized across every shard it ingests);
  *   - `append`    — a FIXED 100-vector shard assigned on the frozen
  *     centroids: wall + task-input bytes. The append reads the
  *     k-sized centroid frame (≈ corpus/64 vectors — 64× fewer
  *     bytes than the inverted lists) and writes only the shard's
  *     rows; the corpus lists are never opened;
  *   - `probe10`   — a 10-query shortlist through the bucket-pruned
  *     scan vs the same candidate join UNPRUNED
  *     ([[SimilarityOps.ivfCandidates]], the in-plan shape): the
  *     pruned read touches only the ≤ q·nprobe probed buckets of the
  *     P = k/16 on-disk buckets, so its bytes track the PROBED cells
  *     while the unpruned read tracks the CORPUS.
  *
  * Usage: sbt "runMain graft.IvfProbe [factors]" (default 1,10,100;
  * scaled embedding dirs cache under /tmp/ivfprobe_emb<f>x).
  */
object IvfProbe {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-ivfprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val readBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            readBytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      })
    def measure[A](f: => A): (A, Double, Double) = {
      readBytes.set(0L)
      val (a, s) = timed(f)
      Thread.sleep(400) // listener events are async; settle
      (a, s, readBytes.get() / 1e6)
    }

    println("| factor | corpus | k | P | build_s | append_s | " +
      "append_read_MB | probe10_pruned_s/MB | probe10_full_s/MB |")
    println("|---|---|---|---|---|---|---|---|---|")

    factors.foreach { f =>
      val dir =
        if (f == 1) base
        else {
          val out = s"/tmp/ivfprobe_emb${f}x"
          if (!Files.exists(java.nio.file.Paths.get(
              s"$out/embeddings.parquet"))) {
            val emb = spark.read.parquet(s"$base/embeddings.parquet")
            val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
            (0 until f).map { i =>
              if (i == 0) emb
              else emb.select((col("vec_id") + i * nVec).as("vec_id"),
                col("embedding"), col("label"))
            }.reduce(_ unionByName _)
              .write.mode("overwrite")
              .parquet(s"$out/embeddings.parquet")
          }
          out
        }
      val emb = SimilarityOps.quantized(spark, dir)
      val n = emb.count()
      val k = math.max(32L, n / 64L).toInt
      val buckets = IvfIndexStore.defaultBuckets(k)
      // fixed-size shard regardless of corpus: base vectors 0..99
      // re-keyed past the corpus max (new arrivals, same geometry —
      // max+1, not count: a sparse id space would otherwise collide
      // shard ids with live corpus ids and corrupt the measurement)
      val off = emb.agg(max("vec_id")).head().getLong(0) + 1
      val baseEmb = SimilarityOps.quantized(spark, base)
      def shard(sz: Int): DataFrame = baseEmb
        .filter(col("vec_id") < sz)
        .select((col("vec_id") + lit(off)).as("vec_id"),
          col("v"), col("n2"))

      val root = Files.createTempDirectory(s"ivfprobe_${f}x").toString
      val (_, buildS) = timed(IvfIndexStore.save(root, emb, k))
      val (_, appendS, appendMB) =
        measure(IvfIndexStore.append(spark, root, shard(100)))

      val idx = IvfIndexStore.loadAt(spark, root, 1L) // corpus-only lists
      val q10 = shard(10)
      val (nPruned, prunedS, prunedMB) = measure(
        IvfIndexStore.shortlist(idx, q10, nprobe = 4, topK = 3).count())
      SimilarityOps.releaseCaches()
      // the unpruned twin: identical candidate semantics, no bucket
      // filter — what the scan costs without the partition column
      val (nFull, fullS, fullMB) = measure {
        val cand = SimilarityOps.ivfCandidates(
          q10, idx.cells, idx.centroids, nprobe = 4)
        val pairs = cand
          .withColumn("dp",
            graft.functions.GraftFunctions.dot_long(col("qv"), col("v")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(desc("dp"), col("vec_id"))
        pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).count()
      }
      require(nPruned == nFull,
        s"pruned/unpruned cardinality drift: $nPruned vs $nFull")
      println(f"| ${f}x | $n | $k | $buckets | $buildS%.1f | " +
        f"$appendS%.1f | $appendMB%.2f | $prunedS%.1f/$prunedMB%.2f | " +
        f"$fullS%.1f/$fullMB%.2f |")

      // takedown cost (VERDICT r12 #2): tombstone a fixed 100-id set
      // — expected FLAT across corpus size (the delete writes the id
      // set and reads nothing but the head record; the lists are
      // never opened), with the post-delete pruned probe unchanged in
      // read shape and the deleted ids gone from its candidates
      val delIds = emb.filter(col("vec_id") < 100)
        .select("vec_id")
      val (_, delS, delMB) = measure(
        IvfIndexStore.delete(spark, root, delIds))
      val postIdx = IvfIndexStore.load(spark, root)
      val (nPost, postS, postMB) = measure(
        IvfIndexStore.shortlist(postIdx, q10, nprobe = 4, topK = 3)
          .filter(col("nid") < 100).count())
      SimilarityOps.releaseCaches()
      require(nPost == 0, s"deleted ids leaked into the probe: $nPost")
      println(f"DELETE ${f}x: delete100 $delS%.1f s/$delMB%.2f MB, " +
        f"post-delete probe10 $postS%.1f s/$postMB%.2f MB")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
