package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, MinhashIndexStore}

/** Amortization measurement for the persisted MinHash dedup index
  * ([[graft.ops.MinhashIndexStore]]) — the dedup mirror of
  * graft.IvfProbe: per corpus size (base/10×/100× replicated
  * documents),
  *
  *   - `build_s`   — shingle + band + save, the once-per-generation
  *     cost a deployment amortizes across every shard it ingests
  *     (the `d_incremental_dedup` bench query pays it in-plan);
  *   - `ingest`    — a FIXED 50-doc shard's [[MinhashIndexStore
  *     .verdicts]] with the pruned probes (band buckets for
  *     candidates, shingle buckets for witness content) vs the same
  *     verdicts UNPRUNED (`prune = false` — full band table + full
  *     shingle table scans): the pruned read tracks the shard's
  *     touched buckets, the unpruned read tracks the corpus.
  *
  * Usage: sbt "runMain graft.DedupIndexProbe [factors]" (default
  * 1,10,100; scaled document dirs cache under /tmp/dedupprobe_docs<f>x).
  */
object DedupIndexProbe {

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
      .appName("graft-dedupindexprobe")
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

    println("| factor | corpus_docs | P=Q | build_s | " +
      "ingest50 pruned s/MB | ingest50 full s/MB | " +
      "labeled_build_s | labeled_ingest50 s/MB |")
    println("|---|---|---|---|---|---|---|---|")

    factors.foreach { f =>
      val dir =
        if (f == 1) base
        else {
          val out = s"/tmp/dedupprobe_docs${f}x"
          if (!Files.exists(java.nio.file.Paths.get(
              s"$out/documents.parquet"))) {
            val docs = spark.read.parquet(s"$base/documents.parquet")
            val nDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
            // replicas get DISJOINT token vocabularies (every token
            // prefixed r<i>_): a real corpus grows with NEW content,
            // so a shard doc's near-dup witnesses don't multiply with
            // corpus size — verbatim replication (ScaleBench's
            // deliberate linear-cohort model for the dedup BENCH
            // queries) would give every shard doc 100× witnesses and
            // measure cohort growth, not ingest cost
            (0 until f).map { i =>
              if (i == 0) docs
              else docs
                .withColumn("doc_id", col("doc_id") + i * nDoc)
                .withColumn("text", concat_ws(" ",
                  transform(split(col("text"), " "),
                    w => concat(lit(s"r${i}_"), w))))
            }.reduce(_ unionByName _)
              .write.mode("overwrite")
              .parquet(s"$out/documents.parquet")
          }
          out
        }
      val corpus = DedupOps.shingleDocs(
        graft.core.par(graft.core.t(spark, dir, "documents")))
      val n = corpus.count()
      // fixed-size shard regardless of corpus: base docs 0..49
      // re-keyed past the corpus max (new arrivals, same content
      // distribution — some are near-dups of corpus docs, some not;
      // max+1, not count: a sparse id space would otherwise collide
      // shard ids with live corpus ids and corrupt the measurement)
      val off = corpus.agg(max("doc_id")).head().getLong(0) + 1
      def shard: DataFrame = DedupOps.shingleDocs(
        graft.core.t(spark, base, "documents")
          .filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + lit(off)))

      val root = Files.createTempDirectory(s"dedupprobe_${f}x").toString
      val (_, buildS) = timed(MinhashIndexStore.save(root, corpus))
      val idx = MinhashIndexStore.load(spark, root)

      val (nP, prunedS, prunedMB) = measure(
        MinhashIndexStore.verdicts(idx, shard).count())
      DedupOps.releaseCaches()
      val (nF, fullS, fullMB) = measure(
        MinhashIndexStore.verdicts(idx, shard, prune = false).count())
      DedupOps.releaseCaches()
      require(nP == nF, s"pruned/unpruned verdict drift: $nP vs $nF")

      // the labeled twin: corpus CC computed once at save (the
      // amortized generation cost), then the shard's incremental CC
      // runs on the CONTRACTED subgraph — its cost should track the
      // shard and its witnesses, not the corpus
      val rootL = Files.createTempDirectory(s"dedupprobeL_${f}x").toString
      val (_, labBuildS) = timed {
        val corpusLabels = graft.ops.ConnectedComponents.labels(
          corpus.select("doc_id"),
          DedupOps.lshVerifiedPairs(corpus)
            .select(col("d1").as("u"), col("d2").as("v")))
        MinhashIndexStore.save(rootL, corpus, Some(corpusLabels))
      }
      DedupOps.releaseCaches()
      val (_, labIngestS, labIngestMB) = measure(
        MinhashIndexStore.ingestLabeled(spark, rootL, shard))
      DedupOps.releaseCaches()

      println(f"| ${f}x | $n | ${idx.bandBuckets} | $buildS%.1f | " +
        f"$prunedS%.1f/$prunedMB%.2f | $fullS%.1f/$fullMB%.2f | " +
        f"$labBuildS%.1f | $labIngestS%.1f/$labIngestMB%.2f |")

      // takedown cost on the LABELED index (VERDICT r12 #2): delete
      // 10 of the just-ingested shard docs — the touched-cluster
      // member lookup, witness-shingle fetch, and subgraph CC are all
      // bucket-pruned, so the read should track the touched clusters
      // across corpus factors, never the corpus
      val delIds = spark.range(10)
        .select((col("id") + lit(off)).as("doc_id"))
      val (_, delS, delMB) = measure(
        MinhashIndexStore.delete(spark, rootL, delIds))
      DedupOps.releaseCaches()
      println(f"DELETE ${f}x: labeled delete10 $delS%.1f s/$delMB%.2f MB")

      // forwarding-map resolve-cost curve (VERDICT r12 #8): resolve
      // wall vs forwarding-map depth. Entries accrete one per merge
      // until compact flushes them; the resolve is one broadcast hash
      // join either way, so the curve should be FLAT in map size
      // until the map outgrows a broadcast — the compaction policy is
      // therefore manifest hygiene (dir-list length), not resolve
      // speed (see MinhashIndexStore.compact's scaladoc).
      val fwdSizes = Seq(0, 1000, 100000)
      val curve = fwdSizes.map { fs =>
        val idxL = MinhashIndexStore.load(spark, rootL)
        val fwd =
          if (fs == 0) idxL.forward.get
          else idxL.forward.get.unionByName(
            // synthetic single-hop entries on ids OUTSIDE the corpus
            // id space: same join width, no semantic interference
            spark.range(fs)
              .select((col("id") + lit(10L * off)).as("cid_from"),
                (col("id") + lit(11L * off)).as("cid_to")))
        val padded = idxL.copy(forward = Some(fwd))
        val (nR, rs) = timed(
          MinhashIndexStore.resolvedLabels(padded).count())
        require(nR > 0)
        fs -> rs
      }
      println(curve.map { case (fs, s) => f"fwd=$fs resolve=$s%.1fs" }
        .mkString(s"FWD_CURVE ${f}x: ", ", ", ""))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
