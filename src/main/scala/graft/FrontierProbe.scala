package graft

import java.nio.file.{Files, Path}

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
  * catalog sizes, the BYTES the batch actually staged for the
  * frontier state (`staged_MB`: the touched partitions only — the
  * round-10 layout rewrote the whole frontier per batch, the loop's
  * one O(state) term, closed by the round-11 partitioned manifests;
  * flat staged bytes while the frontier grows is the contract), and
  * the mapped-packages inbox directory count (`pkg_dirs`: bounded by
  * the compaction cadence, not the stream lifetime).
  *
  * Usage: sbt "runMain graft.FrontierProbe [nBatches] [fanout]
  * [statePartitions] [seedRows]" — statePartitions defaults to 2048,
  * the deployment shape (partition count >> batch key spread; at the
  * library default 64 a ~340-key batch touches every partition and
  * the write degenerates to a partitioned full rewrite). A batch's
  * staged bytes are touched_partitions × partition_size, so FLAT
  * staged bytes against a GROWING frontier additionally need the
  * sized-partition policy (partitions ≈ state_rows / target_rows,
  * fixed at root creation — the same rule TxProbe demonstrates for
  * the catalog): pass seedRows > 0 to bulk-seed an N-row frontier in
  * batch 0 and measure steady-state tick batches; running the pair
  * (seedRows=20000, P=640) vs (seedRows=200000, P=6400) shows
  * per-batch staged bytes CONSTANT across a 10× frontier (table in
  * BASELINE.md) where the round-10 full rewrite paid 10×.
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

  private def dirBytes(p: Path): Long = {
    if (!Files.exists(p)) return 0L
    val s = Files.walk(p)
    try {
      var bytes = 0L
      s.forEach(f => if (Files.isRegularFile(f)) bytes += Files.size(f))
      bytes
    } finally s.close()
  }

  private def subdirs(p: Path): Set[String] = {
    if (!Files.exists(p)) return Set.empty
    val l = Files.list(p)
    try {
      val b = scala.collection.mutable.Set.empty[String]
      l.forEach(f => b += f.getFileName.toString)
      b.toSet
    } finally l.close()
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(60)
    val fanout = args.lift(1).map(_.toInt).getOrElse(100)
    val stateParts = args.lift(2).map(_.toInt).getOrElse(2048)
    val seedRows = args.lift(3).map(_.toInt).getOrElse(0)
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

    // per-batch INPUT bytes (parquet scans) — the round-11 verdict's
    // claim-read metric: with the visitable/map heads, a steady-state
    // tick batch reads the heads + its touched partitions, never the
    // whole frontier, so this column stays flat while the frontier
    // grows (rebuild batches at the head horizon are the amortized
    // exception). Listener events are async; the probe drains with a
    // short settle sleep before sampling on reporting batches.
    val readBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            readBytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      })

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
      // always-on retention: vacuum + inbox compaction ride the loop
      // (probe owns the root exclusively, so the grace is waived)
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
    val sdata = java.nio.file.Paths.get(stateRoot, "sdata")
    println(f"${"batch"}%6s ${"wall_s"}%7s ${"frontier"}%9s " +
      f"${"catalog"}%8s ${"commits"}%8s ${"data_dirs"}%10s " +
      f"${"staged_MB"}%10s ${"read_MB"}%8s ${"man_B"}%7s " +
      f"${"sv_recs"}%8s ${"pkg_dirs"}%9s")
    var b = 0L
    while (b < nBatches) {
      val seedBatch =
        (if (b == 0L)
          ("https://reg.example/page-0/index" +:
            (0 until seedRows).map(i => s"https://bulk.example/art-$i"))
         else Seq("tick")).toDF("value")
      val before = subdirs(sdata)
      readBytes.set(0L)
      val t0 = System.nanoTime()
      FrontierStream.processBatch(spark, seedBatch, b, stateRoot,
        visitor, batchSize = fanout + 20, mapper = Some(mapper),
        catalog = Some(sink), statePartitions = stateParts)
      val wall = (System.nanoTime() - t0) / 1e9
      val reporting = b % 10 == 0 || b == nBatches - 1
      // listener settle before sampling read bytes (reporting only)
      val batchRead =
        if (reporting) { Thread.sleep(150); readBytes.get } else 0L
      if (reporting) {
        // the batch's staged state bytes: its newly-written sdata dirs
        // (retention leaves only live dirs; the new one is live)
        val staged = (subdirs(sdata) -- before)
          .map(d => dirBytes(sdata.resolve(d))).sum
        val frontier = FrontierStream.currentFrontier(spark, stateRoot)
        val nF = frontier.count()
        val nC = graft.catalog.TxLog
          .readDelta(spark, catRoot, emptyCatalog)._2.count()
        val nCommits = countIn(s"$catRoot/_commits", _.startsWith("v"))
        val nDirs = countIn(s"$catRoot/data", _ => true)
        val nPkg = countIn(s"$stateRoot/packages", _ => true) +
          countIn(s"$stateRoot/pkgdata", _ => true)
        // the batch's manifest RECORD bytes (O(touched) deltas with
        // periodic checkpoints) and the retained chain length
        // (bounded by the checkpoint cadence, not stream lifetime)
        val manB = Files.size(java.nio.file.Paths.get(stateRoot, s"sv=$b"))
        val nSv = countIn(stateRoot, _.startsWith("sv="))
        println(f"$b%6d $wall%7.2f $nF%9d $nC%8d $nCommits%8d " +
          f"$nDirs%10d ${staged / 1e6}%10.2f ${batchRead / 1e6}%8.2f " +
          f"$manB%7d $nSv%8d $nPkg%9d")
      }
      b += 1
    }
    spark.stop()
  }
}
