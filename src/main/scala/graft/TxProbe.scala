package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{PackageRow, TxLog}

/** Measurement behind the O(delta) catalog-commit claim
  * (catalog/TxLog.scala `mergeCommitDelta`): a small priority merge
  * into a growing catalog must cost the DELTA, not the table. For
  * each catalog size this main bulk-loads N packages once, then
  * times a 10-row merge under both commit strategies and reports the
  * wall plus the bytes/files actually staged by that commit — the
  * full-rewrite `mergeCommit` re-stages the whole table (its bytes
  * grow with N), the partitioned `mergeCommitDelta` stages only the
  * hash partitions the 10 keys land in (bytes ~flat in N). The
  * reference pays per-row Postgres upserts for the same reason
  * (minecode/model_utils.py:231-449); table recorded in BASELINE.md.
  *
  * Round 11 adds the commit-RECORD bytes (`rec_B`): a delta commit
  * writes a `#delta` record naming only its touched partitions —
  * O(touched), constant in both catalog size AND partition count —
  * where the pre-r11 format wrote the full per-partition manifest
  * every commit (O(partitions): multi-MB per 10-key commit at the
  * 10⁵-partition 100 TB sizing in the TxLog scaladoc).
  *
  * Usage: sbt "runMain graft.TxProbe [n1,n2,...]"  (default
  * 100000,1000000)
  */
object TxProbe {
  private val NOW = "2026-08-15T00:00:00Z"

  /** Size of the newest commit record under `root/_commits`. */
  private def newestRecordBytes(root: String): Long = {
    val l = Files.list(java.nio.file.Paths.get(root, "_commits"))
    try {
      var best = ""
      var bytes = 0L
      l.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v") && n > best) { best = n; bytes = Files.size(p) }
      }
      bytes
    } finally l.close()
  }

  private def dirBytesFiles(p: Path): (Long, Long) = {
    if (!Files.exists(p)) return (0L, 0L)
    val s = Files.walk(p)
    try {
      var bytes = 0L
      var files = 0L
      s.forEach { f =>
        if (Files.isRegularFile(f)) { bytes += Files.size(f); files += 1 }
      }
      (bytes, files)
    } finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("100000,1000000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-txprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def emptyCatalog: DataFrame = Seq.empty[PackageRow].toDF()
    def bulk(n: Int): DataFrame = spark.range(n.toLong)
      .as[Long]
      .map(i => PackageRow.minimal(s"http://probe/pkg-$i.jar", "maven",
        s"pkg-$i", Some("1.0"), miningLevel = 50))
      .toDF().withColumn("visit_level", lit(50))
    // 10 updated packages spread across existing keys (a priority
    // re-mine of known packages — the reference's common delta shape)
    def delta(n: Int): DataFrame = spark.range(10L)
      .as[Long]
      .map { j =>
        val i = j * (n / 10L).max(1L)
        PackageRow.minimal(s"http://probe/pkg-$i.jar", "maven",
          s"pkg-$i", Some("1.1"), miningLevel = 60)
          .copy(description = Some("re-mined"))
      }
      .toDF().withColumn("visit_level", lit(60))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println(f"${"n"}%9s ${"strategy"}%9s ${"bulk_s"}%8s ${"commit_s"}%9s " +
      f"${"staged_MB"}%10s ${"staged_files"}%13s ${"rec_B"}%7s")
    sizes.foreach { n =>
      // full-rewrite strategy
      val rootF = Files.createTempDirectory("txprobe_full")
      val (_, bulkF) = time {
        TxLog.mergeCommit(spark, rootF.toString, bulk(n), NOW, emptyCatalog)
      }
      val before = dirBytesFiles(rootF.resolve("data"))
      val (_, wallF) = time {
        TxLog.mergeCommit(spark, rootF.toString, delta(n), NOW, emptyCatalog)
      }
      val after = dirBytesFiles(rootF.resolve("data"))
      println(f"$n%9d ${"full"}%9s $bulkF%8.1f $wallF%9.2f " +
        f"${(after._1 - before._1) / 1e6}%10.1f ${after._2 - before._2}%13d " +
        f"${newestRecordBytes(rootF.toString)}%7d")

      // O(delta) partitioned strategy
      val rootD = Files.createTempDirectory("txprobe_delta")
      val (_, bulkD) = time {
        TxLog.mergeCommitDelta(spark, rootD.toString, bulk(n), NOW,
          emptyCatalog)
      }
      val beforeD = dirBytesFiles(rootD.resolve("data"))
      val (_, wallD) = time {
        TxLog.mergeCommitDelta(spark, rootD.toString, delta(n), NOW,
          emptyCatalog)
      }
      val afterD = dirBytesFiles(rootD.resolve("data"))
      println(f"$n%9d ${"delta"}%9s $bulkD%8.1f $wallD%9.2f " +
        f"${(afterD._1 - beforeD._1) / 1e6}%10.1f ${afterD._2 - beforeD._2}%13d " +
        f"${newestRecordBytes(rootD.toString)}%7d")

      // delta with partitions sized to the table (the deployment
      // policy the scaladoc prescribes: partitions ≈ table_bytes /
      // target_file_bytes, fixed at root creation) — constant
      // rows-per-partition, so a 10-key commit stages ~constant bytes
      // REGARDLESS of catalog size
      val parts = math.max(64, n / 15625)
      val rootS = Files.createTempDirectory("txprobe_sized")
      val (_, bulkS) = time {
        TxLog.mergeCommitDelta(spark, rootS.toString, bulk(n), NOW,
          emptyCatalog, partitions = parts)
      }
      val beforeS = dirBytesFiles(rootS.resolve("data"))
      val (_, wallS) = time {
        TxLog.mergeCommitDelta(spark, rootS.toString, delta(n), NOW,
          emptyCatalog, partitions = parts)
      }
      val afterS = dirBytesFiles(rootS.resolve("data"))
      println(f"$n%9d ${s"delta/$parts"}%9s $bulkS%8.1f $wallS%9.2f " +
        f"${(afterS._1 - beforeS._1) / 1e6}%10.1f ${afterS._2 - beforeS._2}%13d " +
        f"${newestRecordBytes(rootS.toString)}%7d")
    }
    spark.stop()
  }
}
