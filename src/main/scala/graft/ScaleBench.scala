package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-scaling measurement: run the heaviest queries at the base SF
  * and at synthetic 10×/100× corpora, and report wall-clock ratios AND
  * per-query shuffle telemetry (rows/bytes shuffled, stage count, CC
  * round/edge counts) — the "would it survive 100×?" question answered
  * with data. Results are recorded in BASELINE.md.
  *
  * The scaled corpus is `factor` copies of the base documents with ids
  * offset and every token suffixed `_k` in copy k>0: WITHIN-copy
  * near-dup structure is preserved exactly (token-relative shingles
  * are unchanged), while CROSS-copy similarity is zero — so pair
  * counts, cluster sizes, and bucket populations scale linearly, which
  * is the honest scaling model (naive duplication would make every
  * document `factor-1` mutual near-dups and measure an artificial
  * quadratic blowup). Embeddings get id offsets (bucket populations
  * scale linearly).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<base> [SPARK_GRAFT_SCALE_FACTORS=10,100]
  * [SPARK_GRAFT_SCALE_ONLY=q1,q2] runMain graft.ScaleBench
  * (writes/reuses the scaled corpora under /tmp/graft_scale<f>x).
  */
object ScaleBench {

  val Queries = Seq("d_ngram_jaccard", "m_snippet_match",
    "x5_halohash_match", "d_dedup_clusters", "s_cosine_ann_ivf",
    "d_minhash_lsh", "d_cluster_keeper", "mm_feature_extract",
    "t_bpe_encode", "d_decontaminate",
    // round-7 additions: the recall gate's exact side (quadratic in
    // per-shingle collision groups BY DESIGN — watch it), sequence
    // packing's two-phase prefix sum, and the AVI demux path
    "d_lsh_recall", "t_seq_pack", "mm_video_frames")

  /** Shuffle totals accumulated across the stages of one query run.
    * Listener events arrive asynchronously; callers drain with a short
    * sleep after the action (measurement harness, not product code). */
  final class ShuffleListener extends SparkListener {
    private val lock = new Object
    private var readRecs, readBytes, writeRecs, writeBytes, maxWrite = 0L
    private var nStages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      lock.synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics
          val w = m.shuffleWriteMetrics
          readRecs += r.recordsRead
          readBytes += r.remoteBytesRead + r.localBytesRead
          writeRecs += w.recordsWritten
          writeBytes += w.bytesWritten
          maxWrite = math.max(maxWrite, w.recordsWritten)
          nStages += 1
        }
      }
    def reset(): Unit = lock.synchronized {
      readRecs = 0; readBytes = 0; writeRecs = 0; writeBytes = 0
      maxWrite = 0; nStages = 0
    }
    /** (readRecs, readBytes, writeRecs, writeBytes, maxStageWriteRecs,
      * stages) */
    def snapshot: (Long, Long, Long, Long, Long, Int) = lock.synchronized {
      (readRecs, readBytes, writeRecs, writeBytes, maxWrite, nStages)
    }
  }

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
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "10,100")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- Queries.toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_SCALE_ONLY names not in ScaleBench.Queries: " +
          s"${unknown.mkString(", ")}")
    }
    val queries = only match {
      case Some(names) => Queries.filter(names.contains)
      case None        => Queries
    }
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
    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    val dirs: Seq[(String, String)] =
      ("base" -> base) +: factors.map { f =>
        val out = s"/tmp/graft_scale${f}x"
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$out/documents.parquet")))
          buildScaled(spark, base, out, f)
        s"x$f" -> out
      }

    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // JIT/codegen warmup on the smallest SF
    queries.foreach { q =>
      Registry.byName(q).run(spark, "/root/testdata/sf0.001").count()
      release()
    }

    /** (minSec, rows, shuffle snapshot, cc edge counts) — snapshot
      * and CC telemetry are captured PER SAMPLE and the reported ones
      * come from the min-time sample, so the telemetry always
      * corresponds to the reported seconds (the two samples can
      * differ when the first pays a memo/cache build the second
      * reuses). */
    def time(q: String, dir: String)
        : (Double, Long, (Long, Long, Long, Long, Long, Int), Seq[Long]) = {
      // min of two runs: scaling ratios want the contention-free floor
      val samples = (1 to 2).map { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        val rows = Registry.byName(q).run(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus DETERMINISTICALLY: poll until
        // the snapshot is stable across two reads (a fixed sleep
        // undercounts telemetry exactly on the big runs it exists to
        // measure); cap at 10 s as a hang backstop
        var prev = listener.snapshot
        var stable = false
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (!stable && System.nanoTime() < deadline) {
          Thread.sleep(200)
          val cur = listener.snapshot
          stable = cur == prev
          prev = cur
        }
        val snap = listener.snapshot
        val cc =
          if (q == "d_dedup_clusters" || q == "d_cluster_keeper")
            graft.ops.ConnectedComponents.lastRunEdgeCounts
          else Seq.empty[Long]
        release()
        (dt, rows, snap, cc)
      }
      val best = samples.minBy(_._1)
      (best._1, best._2, best._3, best._4)
    }

    val entries = queries.map { q =>
      val scales = dirs.map { case (tag, dir) =>
        val (sec, rows, (rr, rb, wr, wb, mw, st), cc) = time(q, dir)
        val ccPart =
          if (cc.nonEmpty)
            s""","cc_rounds":${cc.length - 1},"cc_edges":[${cc.mkString(",")}]"""
          else ""
        f""""$tag":{"sec":$sec%.3f,"rows":$rows,""" +
          f""""sh_write_rows":$wr,"sh_write_mb":${wb / 1048576.0}%.1f,""" +
          f""""sh_read_rows":$rr,"sh_read_mb":${rb / 1048576.0}%.1f,""" +
          f""""max_stage_write_rows":$mw,"stages":$st$ccPart}"""
      }
      val line = s""""$q":{${scales.mkString(",")}}"""
      System.err.println(s"[scale] $line")
      line
    }
    println(entries.mkString(
      s"""{"metric":"scale","factors":"${factors.mkString(",")}","base":"$base","queries":{""",
      ",", "}}"))
    spark.stop()
  }
}
