package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener

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
    // The 100 TB state lever: the default HDFS-backed store keeps
    // every partition's state map ON HEAP (fine for the bounded
    // in-flight window this probe demonstrates; fatal when a
    // deployment's window outgrows executor memory); RocksDB spills
    // to local disk with the same exactly-once contract. Both are
    // probed and recorded in BASELINE.md.
    val provider = sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "hdfs")
    val providerClass = provider match {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider"
      case _ =>
        "org.apache.spark.sql.execution.streaming.state." +
          "HDFSBackedStateStoreProvider"
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scanprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        providerClass)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // With ProcessingTimeTimeout armed the query constructs batches
    // CONTINUOUSLY (each batch re-arms timers, so the engine always
    // "requires another batch") — `processAllAvailable` never returns
    // on such a stream (measured: the probe's input was fully
    // processed while the call parked forever). The probe instead
    // counts consumed rows through a listener and waits for each
    // wave's events to be absorbed.
    val consumed = new AtomicLong(0)
    // max numRowsTotal seen across ALL progress events, not a point
    // read of lastProgress (ADVICE r11: the continuous empty batches
    // race a point read — a wave whose processing outruns timeoutMs
    // can have its stalled keys evicted by an empty batch before the
    // probe samples, underreporting the in-flight peak)
    val peakRows = new AtomicLong(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        consumed.addAndGet(e.progress.numInputRows)
        e.progress.stateOperators.headOption.foreach { s =>
          peakRows.getAndAccumulate(s.numRowsTotal, Math.max(_, _))
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    def awaitConsumed(target: Long): Unit = {
      val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
      while (consumed.get < target && System.nanoTime() < deadline)
        Thread.sleep(100)
      require(consumed.get >= target,
        s"stream consumed ${consumed.get} of $target events within 300 s")
    }

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

    def stateRows(): Long = Option(q.lastProgress)
      .flatMap(p => p.stateOperators.headOption)
      .map(_.numRowsTotal).getOrElse(-1L)

    println(s"state store: $provider ($providerClass)")
    println(f"${"wave"}%5s ${"scans_in"}%9s ${"events_in"}%10s " +
      f"${"state_peak"}%11s ${"state_after"}%12s ${"wall_s"}%7s")
    var totalScans = 0L
    var totalEvents = 0L
    var expected = 0L // includes the per-wave heartbeat events
    (0 until waves).foreach { w =>
      val t0 = System.nanoTime()
      peakRows.set(math.max(stateRows(), 0L)) // per-wave peak baseline
      val batch = (0 until perWave).flatMap { i =>
        val uuid = s"scan-$w-$i"
        eventsFor(uuid, (uuid.hashCode & 0x7fffffff) % 100)
      }
      in.addData(batch)
      expected += batch.size
      awaitConsumed(expected)
      // in-flight window: the stalled keys awaiting their timeout
      // (terminal lifecycles already removed their state in-batch);
      // listener-tracked max, immune to an early eviction racing
      // this sample
      val peak = peakRows.get
      // let the stalled keys' timeout expire, then feed a heartbeat
      // so the store evicts them (timeouts fire on the NEXT batch
      // after expiry — the production stream always has one)
      Thread.sleep(timeoutMs + 200)
      in.addData(Seq(ScanQueue.ScanEvent(s"heartbeat-$w", "submit", ""),
        ScanQueue.ScanEvent(s"heartbeat-$w", "fail", "")))
      expected += 2
      awaitConsumed(expected)
      val wall = (System.nanoTime() - t0) / 1e9
      totalScans += perWave
      totalEvents += batch.size
      println(f"$w%5d $totalScans%9d $totalEvents%10d " +
        f"$peak%11d ${stateRows()}%12d $wall%7.2f")
    }
    q.stop()
    spark.stop()
  }
}
