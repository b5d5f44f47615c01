package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{IvfIndexStore, SimilarityOps}

/** Read-byte measurement for the persisted IVF-PQ layer
  * ([[graft.ops.IvfIndexStore.savePq]]): the reason PQ is the
  * billion-vector standard is that candidate scoring reads the packed
  * CODE table (m small ints + a cell id per vector) instead of the
  * raw-vector inverted lists (dim × 8 B per vector) — ~30× fewer
  * candidate bytes at m=4 × 64 dims, 64× at FAISS-typical
  * m=16 × 768 float dims — and the raw vectors are touched only by
  * the ≤ L×|queries| re-rank point fetch (IVFADC+R). This probe puts
  * that claim on the record: per corpus size (base/10×/100×
  * replicated embeddings),
  *
  *   - `build_s`      — coarse + PQ train + encode + save, paid once
  *     per index generation;
  *   - `append`       — a FIXED 100-vector shard through
  *     [[IvfIndexStore.appendPq]] (frozen centroids + frozen
  *     codebooks): wall + read bytes, expected FLAT across corpus
  *     size (reads = k centroids + m×ksub book rows);
  *   - `adc10`        — a 10-query IVFADC probe
  *     ([[IvfIndexStore.adcShortlist]], nprobe=4, L=10, top-3):
  *     bucket-pruned CODE scan + id-pushed re-rank fetch;
  *   - `flat10`       — the same 10 queries through the IVF-Flat
  *     [[IvfIndexStore.shortlist]] (bucket-pruned VECTOR scan) — the
  *     bytes-per-candidate twin the PQ layer displaces.
  *
  * Usage: sbt "runMain graft.PqProbe [factors]" (default 1,10,100;
  * scaled embedding dirs cache under /tmp/pqprobe_emb<f>x — NOT
  * shared with graft.IvfProbe's verbatim replicas: this probe's
  * replicas are content-shifted so vector bytes measure scan width,
  * not dictionary compression).
  */
object PqProbe {

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
      .appName("graft-pqprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the re-rank pushes In(vec_id, ≤L×q ids); above this threshold
      // Spark collapses an In pushdown to a min/max RANGE, which the
      // shortlist's id spread makes vacuous — raise it so row-group
      // stats see the actual id set (deployment knob, documented on
      // adcShortlist)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // IO accounting: /proc/self/io `rchar` — bytes REQUESTED via read
    // syscalls by this JVM (driver + local executor threads), i.e.
    // what an object store would be asked to serve, page-cache hits
    // included. The SparkListener inputMetrics counter is NOT usable
    // for cross-table byte claims: it under-reports parquet scans by
    // a per-table factor (measured 1/78 on the cells table vs 1/12 on
    // the codes table for FULL scans of known on-disk size), so it
    // only ever supported same-table ratio claims. rchar includes
    // shuffle files — small at probe sizes — so it is an honest upper
    // bound on the data read.
    def rchar(): Long = {
      val s = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/self/io"))
      "rchar:\\s*(\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
    }
    def measure[A](f: => A): (A, Double, Double) = {
      val r0 = rchar()
      val (a, s) = timed(f)
      (a, s, (rchar() - r0) / 1e6)
    }
    def dirMB(p: String): Double = {
      val d = java.nio.file.Paths.get(p)
      if (!Files.exists(d)) return 0.0
      val st = java.nio.file.Files.walk(d)
      try st.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum() / 1e6
      finally st.close()
    }

    println("| factor | corpus | k | P | build_s | cells_MB | " +
      "codes_MB | append_s/MB | adcscan10 s/MB | flatscan10 s/MB | " +
      "adcR10 s/MB | adcR10_rg64k s/MB | recall@3 |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|---|")

    factors.foreach { f =>
      // disjoint-CONTENT replicas (each shifted by a per-replica
      // constant): verbatim replication dictionary-compresses the
      // raw-vector column ~f× and the byte comparison measures
      // compression, not scan width — the DedupIndexProbe lesson
      // (BASELINE.md round-12 addendum 4) applied to vectors
      val dir =
        if (f == 1) base
        else {
          val out = s"/tmp/pqprobe_emb${f}x"
          if (!Files.exists(java.nio.file.Paths.get(
              s"$out/embeddings.parquet"))) {
            val emb = spark.read.parquet(s"$base/embeddings.parquet")
            val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
            (0 until f).map { i =>
              if (i == 0) emb
              else emb.select((col("vec_id") + i * nVec).as("vec_id"),
                expr(s"transform(embedding, " +
                  s"x -> x + CAST($i AS FLOAT) * CAST(0.001 AS FLOAT))")
                  .as("embedding"),
                col("label"))
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
      // fixed-size shard re-keyed past the corpus max (new arrivals,
      // same geometry — see graft.IvfProbe's sparse-id note)
      val off = emb.agg(max("vec_id")).head().getLong(0) + 1
      val baseEmb = SimilarityOps.quantized(spark, base)
      def shard(sz: Int): DataFrame = baseEmb
        .filter(col("vec_id") < sz)
        .select((col("vec_id") + lit(off)).as("vec_id"),
          col("v"), col("n2"))

      val root = Files.createTempDirectory(s"pqprobe_${f}x").toString
      val (_, buildS) = timed(
        IvfIndexStore.savePq(root, emb, k, m = 4, ksub = 16))
      val v1dir = {
        val l = Files.list(java.nio.file.Paths.get(root, "data"))
        try { val it = l.iterator(); it.next().getFileName.toString }
        finally l.close()
      }
      val cellsMB = dirMB(s"$root/data/$v1dir/cells")
      val codesMB = dirMB(s"$root/data/$v1dir/codes")
      val (_, appendS, appendMB) =
        measure(IvfIndexStore.appendPq(spark, root, shard(100)))

      val idx = IvfIndexStore.loadPqAt(spark, root, 1L) // corpus-only
      val q10 = shard(10)
      // candidate SCORING in isolation — the scan PQ displaces:
      // ADC reads the probed buckets' packed codes; the flat twin
      // reads the same probed buckets' raw vectors (its rank window
      // adds no IO). The e2e adcR run adds the exact re-rank's
      // vector fetch, which is bounded by the TOUCHED BUCKET FILES
      // (each ~one row group here), not by L — the +R point fetch
      // only beats a bucket sweep once files carry multiple
      // row groups / pages (a storage knob, noted in BASELINE.md).
      val (nScan, scanS, scanMB) = measure(
        IvfIndexStore.adcCandidates(idx, q10, nprobe = 4)._1.count())
      SimilarityOps.releaseCaches()
      val (nFlat, flatS, flatMB) = measure(
        IvfIndexStore.shortlist(idx.flat, q10, nprobe = 4,
          topK = 3).count())
      SimilarityOps.releaseCaches()
      val (adcRows, adcS, adcMB) = measure(
        IvfIndexStore.adcShortlist(idx, q10, nprobe = 4,
          shortlistL = 10, topK = 3)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
      val nAdc = adcRows.size
      SimilarityOps.releaseCaches()
      // answer quality: recall@3 of the IVFADC+R probe against the
      // exact integer-L2 top-3 over the whole corpus (same metric +
      // tie order, so the gap is purely coarse-probe + shortlist
      // truncation, never arithmetic)
      val exact = {
        val qv = broadcast(q10.select(col("vec_id").as("qid"),
          col("v").as("qv"), col("n2").as("qn2")))
        val d = qv.join(emb, col("vec_id") =!= col("qid"))
          .withColumn("dp", graft.functions.GraftFunctions
            .dot_long(col("qv"), col("v")))
          .select(col("qid"), col("vec_id").as("nid"),
            (col("qn2") + col("n2") - lit(2L) * col("dp")).as("d2"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("d2"), col("nid"))
        d.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = adcRows.intersect(exact).size.toDouble / exact.size
      require(nAdc == 30 && nFlat == 30 && nScan > 0,
        s"probe cardinality drift: adc=$nAdc flat=$nFlat scan=$nScan")
      // recall GATE, not just a report (ADVICE r12): cardinality
      // alone passes a probe returning 30 WRONG neighbors. The floor
      // binds where the committed record is 1.00 (10×/100×); the 1×
      // geometry legitimately dips (~0.70 — non-residual PQ over
      // wide cells, see IvfIndexStore.adcShortlist's scaladoc) so it
      // gets a looser floor that still catches a broken shortlist
      // (a random 10-of-64-per-cell shortlist lands near 0.15).
      val floor = if (f >= 10) 0.9 else 0.5
      require(recall >= floor,
        f"IVFADC recall@3 regression at ${f}x: $recall%.2f < $floor " +
          "(committed records: 0.70 at 1x, 1.00 at 10x/100x)")
      // rg A/B: the same index written with 64 KB row groups — the
      // re-rank's In(vec_id) pushdown gets row-group stats to skip
      // against instead of one whole-file group per bucket
      val rootRg = Files.createTempDirectory(s"pqprobe_rg_${f}x").toString
      IvfIndexStore.savePq(rootRg, emb, k, m = 4, ksub = 16,
        rowGroupBytes = 64 * 1024)
      val idxRg = IvfIndexStore.loadPqAt(spark, rootRg, 1L)
      val (nRg, rgS, rgMB) = measure(
        IvfIndexStore.adcShortlist(idxRg, q10, nprobe = 4,
          shortlistL = 10, topK = 3).count())
      SimilarityOps.releaseCaches()
      require(nRg == 30, s"rg-leg cardinality drift: $nRg")
      println(f"| ${f}x | $n | $k | $buckets | $buildS%.1f | " +
        f"$cellsMB%.1f | $codesMB%.1f | " +
        f"$appendS%.1f/$appendMB%.2f | $scanS%.1f/$scanMB%.2f | " +
        f"$flatS%.1f/$flatMB%.2f | $adcS%.1f/$adcMB%.2f | " +
        f"$rgS%.1f/$rgMB%.2f | $recall%.2f |")

      // nprobe → recall operating curve (VERDICT r12 #6): the grid a
      // deployment picks its point from. Same exact top-3 ground
      // truth; only the coarse probe width varies — so the curve
      // isolates coarse-probe truncation (cells the query's true
      // neighbors live in but the probe never opens) from PQ
      // shortlist error (fixed at L=10 here).
      val grid = Seq(1, 2, 4, 8).map { np =>
        val got = IvfIndexStore.adcShortlist(idx, q10, nprobe = np,
            shortlistL = 10, topK = 3)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        SimilarityOps.releaseCaches()
        np -> got.intersect(exact).size.toDouble / exact.size
      }
      println(grid.map { case (np, r) => f"nprobe=$np r@3=$r%.2f" }
        .mkString(s"NPROBE_GRID ${f}x: ", ", ", ""))

      // residual-PQ leg (by_residual=true): same geometry, codebooks
      // trained on x − c(cell) — the published IVFADC fix for the
      // wide-cell recall dip the non-residual 1× row shows. Recall
      // only (the IO story is identical: same code-table shape, same
      // bucket pruning).
      val rootRes = Files.createTempDirectory(s"pqprobe_res_${f}x")
        .toString
      val (_, resBuildS) = timed(IvfIndexStore.savePq(
        rootRes, emb, k, m = 4, ksub = 16, residual = true))
      val idxRes = IvfIndexStore.loadPqAt(spark, rootRes, 1L)
      val resGrid = Seq(1, 4).map { np =>
        val got = IvfIndexStore.adcShortlist(idxRes, q10, nprobe = np,
            shortlistL = 10, topK = 3)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        SimilarityOps.releaseCaches()
        np -> got.intersect(exact).size.toDouble / exact.size
      }
      println(resGrid.map { case (np, r) => f"nprobe=$np r@3=$r%.2f" }
        .mkString(f"RESIDUAL ${f}x (build $resBuildS%.1f s): ", ", ", ""))

      // shortlist-L leg: the 1× grid shows recall FALLING as nprobe
      // grows at fixed L — the signature of shortlist-precision
      // truncation (more candidates compete for the same L ADC slots
      // and coarse codes mis-rank them), not coarse-probe coverage.
      // If that reading is right, recall at nprobe=4 should climb
      // with L while the nprobe curve stays flat-to-falling.
      val lGrid = Seq(10, 30, 100).map { l =>
        val got = IvfIndexStore.adcShortlist(idx, q10, nprobe = 4,
            shortlistL = l, topK = 3)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        SimilarityOps.releaseCaches()
        l -> got.intersect(exact).size.toDouble / exact.size
      }
      println(lGrid.map { case (l, r) => f"L=$l r@3=$r%.2f" }
        .mkString(s"L_GRID ${f}x (nprobe=4): ", ", ", ""))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
