package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{IvfIndexStore, SimilarityOps}

/** Strategy measurement for FILTERED vector search (the
  * `s_ann_filtered_*` queries' scale story): per corpus factor and
  * predicate selectivity, the three production strategies over the
  * persisted index —
  *
  *   - `inprobe`  — [[IvfIndexStore.shortlist]] with `pred`: the
  *     allowed set semi-joins the probed cells' members BELOW the
  *     distance math. Reads the probed buckets + the attr sidecar's
  *     predicate columns.
  *   - `postfilter` — plain shortlist with over-fetch
  *     (topK ⌈/ selectivity⌉, capped), filtered AFTER scoring: the
  *     strategy a store without attr pushdown is forced into; pays
  *     distance math on every probed candidate and still underfills
  *     when the over-fetch guess is short.
  *   - `exact` — pre-filter brute force over the filtered corpus:
  *     O(s·n) per query but EXACT; the crossover winner at low
  *     selectivity (and the recall oracle for the other two).
  *
  * Expected shape (recorded in BASELINE.md): the attr-predicate read
  * is orders of magnitude under the vector read (bytes column);
  * in-probe ≤ post-filter in both wall and read at every point;
  * recall@k of both ANN strategies FALLS as selectivity falls at
  * fixed nprobe (the filtered-ANN recall cliff) — which is exactly
  * the regime where `exact`'s candidate count s·n collapses and the
  * adaptive fallback (`s_ann_filtered_adaptive`) switches to it.
  *
  * Usage: sbt "runMain graft.FilteredAnnProbe [factors]"
  * (default 1,10; scaled dirs cache under /tmp/ivfprobe_emb<f>x,
  * shared with graft.IvfProbe).
  */
object FilteredAnnProbe {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-fannprobe")
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

    val preds: Seq[(String, org.apache.spark.sql.Column, Double)] = Seq(
      ("label%2=0", col("label") % 2 === 0, 0.5),
      ("label=3", col("label") === 3, 0.1),
      ("label=3&id%7=0", col("label") === 3 && col("vec_id") % 7 === 0,
        0.014))

    println("| factor | sel | pred_read_MB | inprobe s/MB/rec | " +
      "postfilter s/MB/rec | exact s/MB | underfilled(in/post) |")
    println("|---|---|---|---|---|---|---|")

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
      val attrs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("label"))
      val n = emb.count()
      val k = math.max(32L, n / 64L).toInt
      val root = Files.createTempDirectory(s"fannprobe_${f}x").toString
      IvfIndexStore.save(root, emb, k, attrs = Some(attrs))
      val idx = IvfIndexStore.load(spark, root)
      val queries = emb.filter(col("vec_id") < 10)
        .select("vec_id", "v", "n2")

      preds.foreach { case (name, pred, sel) =>
        // the predicate read alone: vec_id + label columns, filter
        // pushed — the cost of knowing the allowed set
        val (_, _, predMB) = measure(
          idx.attrs.get.filter(pred).count())

        def topSet(df: DataFrame): Map[Long, Seq[Long]] = df
          .select("qid", "nid", "rn").collect()
          .groupBy(_.getLong(0))
          .map { case (q, rs) =>
            q -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }

        // exact pre-filter brute force (also the recall oracle)
        val allowedIds = idx.attrs.get.filter(pred).select("vec_id")
        val ((exact, nEx), exS, exMB) = measure {
          val fcorpus = idx.cells.join(allowedIds, Seq("vec_id"),
            "left_semi")
          val pairs = broadcast(queries
            .select(col("vec_id").as("qid"), col("v").as("qv"),
              col("n2").as("qn2")))
            .join(fcorpus, col("vec_id") =!= col("qid"))
            .withColumn("dp", graft.functions.GraftFunctions
              .dot_long(col("qv"), col("v")))
            .withColumn("cosine", col("dp").cast("double") /
              (sqrt(col("qn2").cast("double")) *
                sqrt(col("n2").cast("double"))))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid"))
            .orderBy(desc("cosine"), col("vec_id"))
          val top = pairs.withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 3)
            .select(col("qid"), col("vec_id").as("nid"), col("rn"))
          val ts = topSet(top)
          (ts, ts.values.map(_.size).sum)
        }
        SimilarityOps.releaseCaches()

        // in-probe filtered shortlist
        val ((gotIn, underIn), inS, inMB) = measure {
          val ts = topSet(IvfIndexStore.shortlist(idx, queries,
            nprobe = 4, topK = 3, pred = Some(pred)))
          (ts, 10 - ts.count(_._2.size >= 3))
        }
        SimilarityOps.releaseCaches()

        // post-filter with over-fetch k/sel (capped at 512)
        val overK = math.min(512, math.ceil(3 / sel).toInt)
        val ((gotPost, underPost), postS, postMB) = measure {
          val over = IvfIndexStore.shortlist(idx, queries,
            nprobe = 4, topK = overK)
          val filtered = over.join(
            attrs.filter(pred).select(col("vec_id").as("nid")),
            Seq("nid"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid")).orderBy(col("rn"))
          val ts = topSet(filtered
            .withColumn("rn2", row_number().over(w))
            .filter(col("rn2") <= 3)
            .select(col("qid"), col("nid"), col("rn2").as("rn")))
          (ts, 10 - ts.count(_._2.size >= 3))
        }
        SimilarityOps.releaseCaches()

        def recall(got: Map[Long, Seq[Long]]): Double = {
          val hits = exact.map { case (q, ex) =>
            got.getOrElse(q, Seq.empty).toSet
              .intersect(ex.toSet).size }.sum
          if (nEx == 0) 1.0 else hits.toDouble / nEx
        }
        println(f"| ${f}x | $name | $predMB%.2f | " +
          f"$inS%.1f/$inMB%.2f/${recall(gotIn)}%.2f | " +
          f"$postS%.1f/$postMB%.2f/${recall(gotPost)}%.2f | " +
          f"$exS%.1f/$exMB%.2f | $underIn/$underPost |")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
