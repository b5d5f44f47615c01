package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit

import graft.streaming.{Frontier, FrontierStream}

/** Sustained-cycle measurement of the streaming mining loop
  * (streaming/FrontierStream.scala): drives N visit→map→merge
  * micro-batches through [[FrontierStream.processBatch]] directly
  * (the streaming wrapper's replay/commit mechanics are proven in
  * FrontierStreamSpec; the probe measures the batch BODY) against a
  * self-sustaining synthetic registry — every index page links the
  * next index plus `fanout` leaf artifacts, so the frontier and the
  * delta catalog grow every cycle while the per-cycle work stays
  * batch-bounded. Reports per-batch wall with the growing state/
  * catalog sizes; the O(delta) TxLog merge and the claim-bounded
  * visit keep the trend flat, and the one O(state) term — the
  * frontier state rewrite, the piece a 100 TB deployment hands to a
  * transactional table format per the FrontierStream scaladoc — is
  * measured separately so its share is on the record.
  *
  * Usage: sbt "runMain graft.FrontierProbe [nBatches] [fanout]"
  */
object FrontierProbe {
  /** The visitor captures `fanout` BY VALUE — closure-serializable to
    * real executors, no driver-local mutable state. */
  private def mkVisitor(fanout: Int): Frontier.Visitor = uri => {
    val m = "page-(\\d+)/index$".r.findFirstMatchIn(uri)
    m match {
      case Some(g) =>
        val n = g.group(1).toInt
        val base = uri.stripSuffix(s"page-$n/index")
        (s"${base}page-${n + 1}/index") +:
          (0 until fanout).map(i => s"${base}page-$n/art-$i")
      case None => Seq.empty
    }
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(60)
    val fanout = args.lift(1).map(_.toInt).getOrElse(100)
    val visitor = mkVisitor(fanout)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-frontierprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val stateRoot = Files.createTempDirectory("fprobe_state").toString
    val catRoot = Files.createTempDirectory("fprobe_cat").toString
    def emptyCatalog = Seq.empty[graft.catalog.PackageRow].toDF()
    val sink = FrontierStream.CatalogSink(
      catRoot,
      df => df.select("uri", "package_data").as[(String, String)]
        .map { case (uri, pd) =>
          graft.catalog.PackageRow.minimal(uri, "maven",
            pd.stripPrefix("pkg::"), Some("1.0"), miningLevel = 50)
        }
        .toDF().withColumn("visit_level", lit(50)),
      () => emptyCatalog,
      // always-on retention: vacuum rides the loop (probe owns the
      // root exclusively, so the grace window is waived)
      vacuumEvery = 8, vacuumGraceMs = 0L)
    val mapper: String => Seq[String] = uri => Seq("pkg::" + uri)

    def countIn(dir: String, pred: String => Boolean): Long = {
      val p = java.nio.file.Paths.get(dir)
      if (!Files.exists(p)) return 0L
      val l = Files.list(p)
      try {
        var n = 0L
        l.forEach(f => if (pred(f.getFileName.toString)) n += 1)
        n
      } finally l.close()
    }
    println(f"${"batch"}%6s ${"wall_s"}%7s ${"frontier"}%9s " +
      f"${"catalog"}%8s ${"commits"}%8s ${"data_dirs"}%10s " +
      f"${"state_write_s"}%14s")
    var b = 0L
    while (b < nBatches) {
      val seedBatch =
        (if (b == 0L) Seq("https://reg.example/page-0/index")
         else Seq("tick")).toDF("value")
      val t0 = System.nanoTime()
      FrontierStream.processBatch(spark, seedBatch, b, stateRoot,
        visitor, batchSize = fanout + 20, mapper = Some(mapper),
        catalog = Some(sink))
      val wall = (System.nanoTime() - t0) / 1e9
      if (b % 10 == 0 || b == nBatches - 1) {
        val frontier = FrontierStream.currentFrontier(spark, stateRoot)
        val nF = frontier.count()
        val nC = graft.catalog.TxLog
          .readDelta(spark, catRoot, emptyCatalog)._2.count()
        // isolate the O(state) term: one extra write of the current
        // frontier, the piece a table format absorbs at 100 TB
        val t1 = System.nanoTime()
        frontier.write.mode("overwrite")
          .parquet(s"$stateRoot/probe-rewrite")
        val sw = (System.nanoTime() - t1) / 1e9
        val nCommits = countIn(s"$catRoot/_commits", _.startsWith("v"))
        val nDirs = countIn(s"$catRoot/data", _ => true)
        println(f"$b%6d $wall%7.2f $nF%9d $nC%8d $nCommits%8d " +
          f"$nDirs%10d $sw%14.2f")
      }
      b += 1
    }
    spark.stop()
  }
}
