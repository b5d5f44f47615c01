package graft

import org.apache.spark.sql.SparkSession

/** ANN-kNN recall/cost sweep over the (nprobe, hops, cprobe) knobs of
  * the constant-cell two-level IVF + NN-descent candidate generator
  * (graft.ops.SimilarityOps.annKnn) — the measurement behind the
  * round-10 centroid-policy retune. With k = n/64 cells the probed
  * window is nprobe·64 vectors, a shrinking FRACTION of a growing
  * corpus, so past the window recall must come from NN-descent
  * iterations (each hop is n·8²-bounded and n-independent) rather
  * than probe width. This main prints the measured trade-off table
  * recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *   sbt "runMain graft.KnnProbe [nprobe,hops,cprobe ...]"
  *
  * SPARK_GRAFT_KNN_SCALE=f measures recall at an f×-scaled corpus
  * where the constant-cell policy is ENGAGED (k = n/64 past the
  * 32-cell floor the sf gates sit on): copies carry a deterministic
  * ±2% multiplicative per-component jitter, so vectors are distinct
  * (unlike ScaleBench's exact id-offset copies, which would make
  * recall trivially 1.0 — identical vectors share a cell) and the
  * near-twin structure stresses exactly the IVF failure mode, nearest
  * neighbors straddling a cell boundary. The exact all-pairs side
  * makes this a measurement main, never a bench query.
  */
object KnnProbe {

  /** Materialize (once) the jittered f× corpus; returns its dir. The
    * cache key carries the base table's size+mtime fingerprint so a
    * regenerated testdata corpus never serves a stale scaled copy
    * (the SourceOps.cacheKey lesson, ADVICE r9). */
  private def scaledDir(spark: SparkSession, base: String, f: Int)
      : String = {
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Paths.get(base, "embeddings.parquet")
    val fp = java.lang.Long.toHexString(
      java.nio.file.Files.getLastModifiedTime(src).toMillis ^
        31L * (if (java.nio.file.Files.isRegularFile(src))
          java.nio.file.Files.size(src) else 0L))
    val out = s"/tmp/graft_knn_scale${f}x_$fp"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, "embeddings.parquet", "_SUCCESS"))) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
      (0 until f).map { k =>
        if (k == 0) emb
        else emb.select(
          (col("vec_id") + lit(k.toLong * nVec)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x * (lit(1.0) +
              (pmod(xxhash64(col("vec_id"), i, lit(k)), lit(41L)) -
                lit(20L)).cast("double") / lit(1000.0))).cast("float"))
            .as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    out
  }

  /** Materialize (once) a fully synthetic label-structured corpus of
    * n vectors: 64 hash-derived latent centroids, each vector its
    * label's centroid plus deterministic per-component noise at ~30%
    * of the centroid scale — so a vector's true neighbors are
    * same-label STRANGERS (~n/64 candidates each), not jittered
    * twins. The diverse-structure complement to [[scaledDir]]:
    * co-assignment can't carry recall here, the probe set and the
    * hop have to. */
  private def synthDir(spark: SparkSession, n: Long, noise: Double)
      : String = {
    import org.apache.spark.sql.functions._
    val out = s"/tmp/graft_knn_synth${n}_n$noise"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, "embeddings.parquet", "_SUCCESS"))) {
      def h01(cols: org.apache.spark.sql.Column*) =
        pmod(xxhash64(cols: _*), lit(2001L)).cast("double") / 1000.0 - 1.0
      spark.range(n).toDF("vec_id")
        .repartition(32)
        .withColumn("label", (col("vec_id") % 64).cast("int"))
        .withColumn("embedding", transform(sequence(lit(0), lit(63)),
          i => (h01(lit("c"), col("label"), i) +
            h01(lit("n"), col("vec_id"), i) * noise).cast("float")))
        .select("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val baseDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-knnprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_KNN_LEVELS=3 engages the L-level hierRanked pass
    sys.env.get("SPARK_GRAFT_KNN_LEVELS")
      .foreach(v => spark.conf.set("spark.graft.ann.levels", v))
    // SPARK_GRAFT_KNN_SYNTH=n[:noise] — noise is the per-component
    // amplitude relative to the centroid scale (0.3 = tight clusters,
    // 1.5 = structure mostly dissolved into the noise floor)
    val dir = (sys.env.get("SPARK_GRAFT_KNN_SYNTH"),
        sys.env.get("SPARK_GRAFT_KNN_SCALE")) match {
      case (Some(spec), _) =>
        val parts = spec.split(":")
        synthDir(spark, parts(0).toLong,
          parts.lift(1).map(_.toDouble).getOrElse(0.3))
      case (_, Some(f)) => scaledDir(spark, baseDir, f.toInt)
      case _            => baseDir
    }
    val configs: Seq[(Int, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(np, h, cp) = a.split(",").map(_.trim.toInt)
        (np, h, cp)
      }
      else Seq((8, 1, 6), (12, 1, 6), (16, 1, 6), (8, 2, 6), (12, 2, 6),
        (8, 3, 6), (8, 2, 8))
    println(f"${"nprobe"}%7s ${"hops"}%5s ${"cprobe"}%7s ${"n_exact"}%8s " +
      f"${"n_ann"}%7s ${"common"}%7s ${"recall"}%7s ${"sec"}%7s")
    configs.foreach { case (np, h, cp) =>
      val t0 = System.nanoTime()
      val (ne, na, nc) = graft.ops.SimilarityOps
        .annRecallProbe(spark, dir, np, h, cp)
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = if (ne == 0) 1.0 else nc.toDouble / ne
      println(f"$np%7d $h%5d $cp%7d $ne%8d $na%7d $nc%7d $recall%7.4f $dt%7.1f")
    }
    spark.stop()
  }
}
