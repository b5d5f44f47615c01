package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ScanQueue

/** State-store scaling probe for the scan-queue state machine (ST4,
  * streaming/ScanQueue.scala): drives 10⁵ synthetic scannables in
  * waves through the real `flatMapGroupsWithState` job — each wave a
  * mix of complete lifecycles (new→…→indexed), explicit failures, and
  * STALLED scans that never terminate and must be evicted by the
  * processing-time timeout (the reference's 1200 s RQ job timeout,
  * `minecode/models.py:806`; shortened here so waves outlive it) —
  * and reports the state store's row count per wave from the query's
  * progress events. The contract an always-on deployment needs:
  * terminal states remove their key immediately and stalls evict one
  * timeout later, so the store holds ~the in-flight window (flat),
  * never the stream's cumulative history. Table in BASELINE.md.
  *
  * Usage: sbt "runMain graft.ScanProbe [waves] [uuidsPerWave]
  * [stallPct] [timeoutMs]"
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val waves = args.headOption.map(_.toInt).getOrElse(10)
    val perWave = args.lift(1).map(_.toInt).getOrElse(10000)
    val stallPct = args.lift(2).map(_.toInt).getOrElse(20)
    val timeoutMs = args.lift(3).map(_.toLong).getOrElse(2000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scanprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val in = MemoryStream[ScanQueue.ScanEvent]
    val q = ScanQueue.run(spark, in.toDS(), withTimeouts = true,
      timeoutMs = timeoutMs)
      .writeStream
      .outputMode("append")
      .format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("scanprobe_chk").toString)
      .start()

    /** One scannable's event sequence by its per-uuid die roll:
      * stalled scans stop after `start` (timeout eviction is their
      * only exit); 1-in-10 fails mid-flight (terminal, immediate
      * removal); the rest run the full indexed lifecycle. */
    def eventsFor(uuid: String, roll: Int): Seq[ScanQueue.ScanEvent] = {
      def ev(e: String) = ScanQueue.ScanEvent(uuid, e, s"w-$e")
      if (roll < stallPct) Seq(ev("submit"), ev("start"))
      else if (roll < stallPct + 10) Seq(ev("submit"), ev("start"), ev("fail"))
      else Seq(ev("submit"), ev("start"), ev("scan_done"), ev("index_done"))
    }

    println(f"${"wave"}%5s ${"scans_in"}%9s ${"events_in"}%10s " +
      f"${"state_rows"}%11s ${"wall_s"}%7s")
    var totalScans = 0L
    var totalEvents = 0L
    (0 until waves).foreach { w =>
      val t0 = System.nanoTime()
      val batch = (0 until perWave).flatMap { i =>
        val uuid = s"scan-$w-$i"
        eventsFor(uuid, (uuid.hashCode & 0x7fffffff) % 100)
      }
      in.addData(batch)
      q.processAllAvailable()
      // let the stalled keys' timeout expire, then run an empty-ish
      // trigger so the store evicts them (timeouts fire on the NEXT
      // batch after expiry — the production stream always has one)
      Thread.sleep(timeoutMs + 200)
      in.addData(Seq(ScanQueue.ScanEvent(s"heartbeat-$w", "submit", ""),
        ScanQueue.ScanEvent(s"heartbeat-$w", "fail", "")))
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      totalScans += perWave
      totalEvents += batch.size
      val stateRows = Option(q.lastProgress)
        .flatMap(p => p.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      println(f"$w%5d $totalScans%9d $totalEvents%10d " +
        f"$stateRows%11d $wall%7.2f")
    }
    q.stop()
    spark.stop()
  }
}
