package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ops.{IvfIndexStore, SimilarityOps}

/** Distribution-drift measurement for the persisted IVF index
  * ([[graft.ops.IvfIndexStore]]): appends assign on FROZEN centroids
  * — that is what makes them O(increment) — and the price is that a
  * shifting distribution crowds its mass into the few cells nearest
  * the new region, degrading the index's probe cost back toward a
  * corpus scan. This probe measures the whole operational arc a
  * deployment monitors with [[IvfIndexStore.cellStats]] and answers
  * with [[IvfIndexStore.retrain]]:
  *
  *   1. `base`        — corpus-trained index, in-distribution
  *     queries: the healthy reference point;
  *   2. `drifted`     — 2× the corpus appended from a CONCENTRATED
  *     new regime (every component shifted by a large constant: a
  *     tight directional cluster, the "new modality / new upstream
  *     embedding model" drift shape), drifted-regime queries: the
  *     whole drifted mass lands in the one frozen cell nearest the
  *     new direction, so imbalance and candidates/query blow up
  *     while RECALL stays high — the crowded cell contains
  *     everything, the index silently pays brute-force cost, which
  *     is exactly why recall alone is the wrong drift monitor;
  *   3. `retrain low-id` — [[IvfIndexStore.retrain]] with
  *     `reseed = false` ([[SimilarityOps.ivfCentroids]]' default
  *     `vec_id < k` seeding): k re-sizes, but every seed is a BASE
  *     vector (the drifted ids are high by arrival), k-means never
  *     places a centroid inside the new cluster, and the crowded
  *     cell survives retraining intact — the measured argument that
  *     retrain must re-seed from the current corpus;
  *   4. `retrain hash` — the default hash-sampled reseed at 1 and 3
  *     Lloyd iterations: seeds land in the drifted cluster in
  *     proportion to its mass, the cluster splits, and
  *     candidates/query returns to the healthy ~nprobe × mean-cell
  *     band.
  *
  * Metrics per stage: trained cells k, imbalance (max/mean cell),
  * empty-cell fraction, candidates per query at nprobe=4 (the probe
  * cost), recall@3 of the bucket-pruned shortlist vs the exact
  * brute-force top-3 over the same index content, and shortlist wall.
  *
  * Usage: sbt "runMain graft.DriftProbe" (SPARK_GRAFT_SF_DIR selects
  * the base corpus, default sf0.1).
  */
object DriftProbe {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Exact brute-force top-3 (qid, nid) pairs over the index
    * content — the recall denominator. Same cosine arithmetic and
    * tie-break as the shortlist. */
  private def exactTop3(queries: DataFrame, cells: DataFrame)
      : Set[(Long, Long)] = {
    val q = queries.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("n2").as("qn2"))
    val c = cells.select(col("vec_id").as("nid"), col("v").as("nv"),
      col("n2").as("nn2"))
    val pairs = q.crossJoin(c).filter(col("nid") =!= col("qid"))
      .withColumn("cosine",
        graft.core.asDouble(GraftFunctions.dot_long(col("qv"), col("nv"))) /
          (sqrt(graft.core.asDouble(col("qn2"))) *
            sqrt(graft.core.asDouble(col("nn2")))))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("cosine"), col("nid"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def stageRow(spark: SparkSession, label: String,
      root: String, queries: DataFrame): Unit = {
    val idx = IvfIndexStore.load(spark, root)
    val s = IvfIndexStore.driftStats(idx)
    val cand = SimilarityOps.ivfCandidates(
      queries, idx.cells, idx.centroids, nprobe = 4).count()
    SimilarityOps.releaseCaches()
    val (got, wall) = timed(
      IvfIndexStore.shortlist(idx, queries, nprobe = 4, topK = 3)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    SimilarityOps.releaseCaches()
    val exact = exactTop3(queries, idx.cells)
    val recall =
      if (exact.isEmpty) 1.0
      else got.intersect(exact).size.toDouble / exact.size
    val nq = queries.count()
    println(f"| $label | ${s.vectors} | ${s.cells} | " +
      f"${s.imbalance}%.1f | ${s.emptyCells.toDouble / s.cells}%.2f | " +
      f"${cand.toDouble / nq}%.0f | $recall%.2f | $wall%.1f |")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-driftprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = SimilarityOps.quantized(spark, base).cache()
    val n = emb.count()
    val k = math.max(32L, n / 64L).toInt
    val off = n // base ids are dense 0..n-1

    // the drifted regime: a CONCENTRATED directional cluster — every
    // component shifted by a large constant, so the common direction
    // dominates and all drifted vectors are cosine-near each other
    // (and cosine-far from the base cloud), with the original
    // per-vector variation retained as within-cluster structure a
    // reseeded retrain can split on; a per-replica nudge on
    // component 0 keeps the shards distinct content, not copies
    def drifted(replica: Int): DataFrame = {
      val v = expr(s"transform(v, (x, i) -> " +
        s"IF(i = 0, x + 1500000 + ${replica * 7919L}, x + 1500000))")
      emb.select(
        (col("vec_id") + lit(off + replica * n)).as("vec_id"),
        v.as("v"))
        .withColumn("n2", GraftFunctions.dot_long(col("v"), col("v")))
    }
    // queries live OUTSIDE the index id space
    val qoff = off + 8L * n
    val baseQ = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + lit(qoff)).as("vec_id"), col("v"),
        col("n2"))
    val driftQ = drifted(0).filter(col("vec_id") >= off + 10 &&
        col("vec_id") < off + 20)
      .select((col("vec_id") + lit(qoff)).as("vec_id"), col("v"),
        col("n2"))

    println("| stage | n | k | imbalance | empty_frac | cand/query | " +
      "recall@3 | shortlist_s |")
    println("|---|---|---|---|---|---|---|---|")

    val root = Files.createTempDirectory("driftprobe").toString
    val (_, buildS) = timed(IvfIndexStore.save(root, emb, k))
    stageRow(spark, "base", root, baseQ)

    val (_, appendS) = timed {
      IvfIndexStore.append(spark, root, drifted(0))
      IvfIndexStore.append(spark, root, drifted(1))
    }
    stageRow(spark, "drifted 2x", root, driftQ)
    val triggered = IvfIndexStore.needsRetrain(
      IvfIndexStore.driftStats(IvfIndexStore.load(spark, root)))

    val (_, retrainLowS) = timed(
      IvfIndexStore.retrain(spark, root, reseed = false))
    stageRow(spark, "retrain low-id i=1", root, driftQ)

    val (_, retrain1S) = timed(IvfIndexStore.retrain(spark, root))
    stageRow(spark, "retrain hash i=1", root, driftQ)

    val (_, retrain3S) = timed(
      IvfIndexStore.retrain(spark, root, iters = 3))
    stageRow(spark, "retrain hash i=3", root, driftQ)

    println(f"%nbuild ${buildS}%.1f s; drifted appends ${appendS}%.1f s; " +
      f"retrain low-id ${retrainLowS}%.1f s; " +
      f"retrain hash i=1 ${retrain1S}%.1f s; hash i=3 ${retrain3S}%.1f s; " +
      s"needsRetrain(default thresholds) fired after drift: $triggered")
    spark.stop()
  }
}
