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
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
