package graft

import java.sql.Timestamp

import graft.streaming._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def frontier0 = Seq(
    Frontier.UriRow("http://a.io/root", "http://a.io/root", "a.io", 10,
      None, None, None, None),
    Frontier.UriRow("http://b.io/root", "http://b.io/root", "b.io", 5,
      None, None, None, None),
    Frontier.UriRow("http://a.io/old", "http://a.io/old", "a.io", 1,
      Some(ts("2020-01-01 00:00:00")), None, None, None)).toDF()

  test("frontier: claim order, child insertion, revisit-dedup") {
    val now = ts("2026-08-12 00:00:00")
    val visitor: Frontier.Visitor = {
      case u if u.endsWith("/root") => Seq(s"$u/child1", s"$u/child2")
      case _                        => Seq.empty
    }
    val f1 = Frontier.visitCycle(spark, frontier0, visitor, now,
      batchSize = 2)
    // highest priorities (a.io/root=10, b.io/root=5) visited; old one too
    // old because 2020 visit is past the 240h revisit horizon... claim
    // takes top-2 by priority so 'old' (priority 1) is NOT claimed
    val visited = f1.filter(col("last_visit_date") === lit(now))
      .select("uri").as[String].collect().toSet
    assert(visited == Set("http://a.io/root", "http://b.io/root"))
    // four children inserted as pending
    val pending = f1.filter(col("last_visit_date").isNull)
      .select("uri").as[String].collect().toSet
    assert(pending == Set("http://a.io/root/child1", "http://a.io/root/child2",
      "http://b.io/root/child1", "http://b.io/root/child2"))

    // cycle 2: claiming again must not re-insert existing pending children
    val f2 = Frontier.visitCycle(spark, f1, visitor, now, batchSize = 1)
    assert(f2.count() == f1.count()) // 'old' claimed (visited), children dedup'd
    assert(f2.filter(col("uri") === "http://a.io/old" &&
      col("last_visit_date") === lit(now)).count() == 1)
  }

  test("frontier: revisit horizon gates visitables") {
    val now = ts("2026-08-12 00:00:00")
    val recent = Seq(Frontier.UriRow("http://a.io/r", "http://a.io/r", "a.io",
      1, Some(ts("2026-08-11 23:00:00")), None, None, None)).toDF()
    assert(Frontier.visitables(recent, now).count() == 0)
    val stale = Seq(Frontier.UriRow("http://a.io/r", "http://a.io/r", "a.io",
      1, Some(ts("2026-07-01 00:00:00")), None, None, None)).toDF()
    assert(Frontier.visitables(stale, now).count() == 1)
  }

  test("get_visitables: full composition with eligibility excludes") {
    // one row per branch (minecode/models.py:241-273); now - 240h
    // = 2026-08-03 00:00:00
    val now = ts("2026-08-13 00:00:00")
    val rows = Seq(
      // (uri, lvd, lmd, wip, is_visitable, is_mappable, expected-in)
      ("nv-ok", None, None, None, true, false, true), // never visited
      ("nv-unvisitable", None, None, None, false, false, false),
      ("nv-wip", None, None, Some(ts("2026-08-12 00:00:00")), true,
        false, false), // in-flight
      ("rv-ok", Some(ts("2026-07-01 00:00:00")), None, None, true,
        false, true), // stale, not mappable
      ("rv-fresh", Some(ts("2026-08-10 00:00:00")), None, None, true,
        false, false), // inside horizon
      ("rv-map-pending", Some(ts("2026-07-01 00:00:00")), None, None,
        true, true, false), // mappable but never mapped → map first
      ("rv-mapped", Some(ts("2026-07-01 00:00:00")),
        Some(ts("2026-07-02 00:00:00")), None, true, true,
        true), // mappable AND mapped → revisitable
      ("rv-unvisitable", Some(ts("2026-07-01 00:00:00")), None, None,
        false, false, false))
    val f = rows.map { case (u, lvd, lmd, wip, iv, im, _) =>
      (u, 0, lvd, lmd, wip, iv, im)
    }.toDF("uri", "priority", "last_visit_date", "last_map_date",
      "wip_date", "is_visitable", "is_mappable")
    val got = Frontier.getVisitables(f, now).select("uri")
      .as[String].collect().toSet
    val want = rows.filter(_._7).map(_._1).toSet
    assert(got == want)
  }

  test("map_uri outcome branches (run_map.py:104-182)") {
    assert(Frontier.mapUriOutcome(Right(Seq("p1", "p2"))) == (2, None))
    assert(Frontier.mapUriOutcome(Right(Seq.empty)) ==
      (0, Some("No visited scanned packages returned.")))
    val (n, err) = Frontier.mapUriOutcome(Left("boom"))
    assert(n == 0 &&
      err.contains("Error: Failed to map while processing ResourceURI: boom"))
  }

  test("frontier: map cycle marks mapped and yields package data") {
    val now = ts("2026-08-12 00:00:00")
    val visited = Seq(Frontier.UriRow("http://a.io/pkg", "http://a.io/pkg",
      "a.io", 1, Some(now), None, None, None)).toDF()
    val (next, pkgs) = Frontier.mapCycle(spark, visited,
      u => Seq(s"pkg-from:$u"), now)
    assert(pkgs.select("package_data").as[String].collect().toSeq ==
      Seq("pkg-from:http://a.io/pkg"))
    assert(next.filter(col("last_map_date").isNotNull).count() == 1)
    assert(Frontier.mappables(next).count() == 0)
  }

  test("get_status counters come from one aggregation pass") {
    val now = ts("2026-08-12 00:00:00")
    val frontier = Seq(
      Frontier.UriRow("http://h/1", "http://h/1", "h", 0,
        Some(now), Some(now), None, None),          // visited + mapped
      Frontier.UriRow("http://h/2", "http://h/2", "h", 0,
        Some(now), None, None, None),               // visited, mappable
      Frontier.UriRow("http://h/3", "http://h/3", "h", 0,
        Some(now), None, None, Some("boom")),       // visit error
      Frontier.UriRow("http://h/4", "http://h/4", "h", 0,
        None, None, Some(now), None),               // in-flight
      Frontier.UriRow("http://h/5", "http://h/5", "h", 0,
        None, None, None, None)).toDF()             // never visited
    val pkgs = Seq(graft.catalog.PackageRow.minimal("u", "maven", "a")).toDF()
    val s = Frontier.status(frontier, pkgs, now).toMap
    assert(s("total_packages") == 1 && s("total_uri") == 5 &&
      s("unique_uri") == 5)
    assert(s("visited") == 3 && s("successfully_visited") == 2 &&
      s("unsuccessfully_visited") == 1)
    // never_visited requires wip_date IS NULL (minecode/models.py:224):
    // the in-flight row counts ONLY in visit_in_progress
    assert(s("never_visited") == 1 && s("visit_in_progress") == 1)
    assert(s("mappables") == 1 && s("mapped") == 1 &&
      s("successfully_mapped") == 1)
    assert(s("unsuccessfully_mapped") == 0 && s("never_mapped") == 1)
    assert(s("visitables") == 1) // only the idle never-visited row
  }

  test("bloom-prefiltered insert equals the plain anti-join insert") {
    val now = ts("2026-08-12 00:00:00")
    val frontier = (1 to 200).map(i =>
      Frontier.UriRow(s"http://h/$i", s"http://h/$i", "h", 0,
        if (i % 2 == 0) Some(now) else None, None, None, None)).toDF()
    // candidates: half collide with pending rows, half are new
    val candidates = (150 to 250).map(i =>
      Frontier.UriRow(s"http://h/$i", s"http://h/$i", "h", 0,
        None, None, None, None)).toDF()
    val plain = candidates
      .join(frontier.filter(col("last_visit_date").isNull)
          .select(col("canonical").as("existing_canonical")),
        col("canonical") === col("existing_canonical"), "left_anti")
      .select("uri").as[String].collect().toSet
    val bloomed = Frontier.insertIfAbsentWithBloom(frontier, candidates)
      .select("uri").as[String].collect().toSet
    assert(bloomed == plain) // no false negatives, exact same inserts
    // pending odd rows 151..199 collide; evens + 201..250 survive
    assert(plain.contains("http://h/250") && !plain.contains("http://h/151"))
  }

  test("two interleaved bloom inserts on one session stay independent") {
    // regression: a session-global registered UDF name would make the
    // second call's bloom filter silently replace the first's before
    // the first result was evaluated
    val now = ts("2026-08-12 00:00:00")
    def mk(prefix: String, pending: Range, candidates: Range) = {
      val f = pending.map(i =>
        Frontier.UriRow(s"$prefix/$i", s"$prefix/$i", "h", 0,
          None, None, None, None)).toDF()
      val c = candidates.map(i =>
        Frontier.UriRow(s"$prefix/$i", s"$prefix/$i", "h", 0,
          None, None, None, None)).toDF()
      (f, c)
    }
    val (fa, ca) = mk("http://a", 1 to 100, 50 to 150)
    val (fb, cb) = mk("http://b", 1 to 100, 90 to 190)
    // build both lazy results BEFORE evaluating either
    val ra = Frontier.insertIfAbsentWithBloom(fa, ca)
    val rb = Frontier.insertIfAbsentWithBloom(fb, cb)
    val gotA = ra.select("uri").as[String].collect().toSet
    val gotB = rb.select("uri").as[String].collect().toSet
    assert(gotA == (101 to 150).map(i => s"http://a/$i").toSet)
    assert(gotB == (101 to 190).map(i => s"http://b/$i").toSet)
  }

  test("crash-replay: re-applied visit micro-batch stays exactly-once") {
    // ST9: a micro-batch that fails between the frontier claim and the
    // visited-status merge leaves either (a) nothing applied or (b)
    // only the child inserts applied. Replaying the SAME batch from
    // either state must converge to the same frontier, with the
    // pending-row identity (canonical, last_visit_date) unique —
    // minecode/models.py:450's unique_together, which is what makes
    // re-application idempotent in the reference too.
    val now = ts("2026-08-12 00:00:00")
    val f0 = (1 to 5).map(i => Frontier.UriRow(s"http://h/p$i",
      s"http://h/p$i", "h", 5, None, None, None, None)).toDF().cache()
    val visitor: Frontier.Visitor = u => Seq(s"$u/c1", s"$u/c2")

    val f1 = Frontier.visitCycle(spark, f0, visitor, now, batchSize = 5)
    val rows1 = f1.as[Frontier.UriRow].collect().toSet
    assert(rows1.size == 15) // 5 visited seeds + 10 pending children
    assert(rows1.groupBy(r => (r.canonical, r.last_visit_date))
      .forall(_._2.size == 1), "pending-row identity must be unique")

    // crash case (a): nothing was written — the replay re-derives the
    // exact same next state
    val replayed = Frontier.visitCycle(spark, f0, visitor, now, 5)
      .as[Frontier.UriRow].collect().toSet
    assert(replayed == rows1)

    // crash case (b): children were inserted, the visited merge was
    // not. Replaying on the half-applied state re-claims the seeds
    // (higher priority than the pending children), the re-yielded
    // children all hit the (canonical, last_visit_date IS NULL)
    // anti-join, and the final frontier is identical — no duplicates
    val half = f0.unionByName(f1.filter(col("last_visit_date").isNull))
    val replayedHalf = Frontier.visitCycle(spark, half, visitor, now, 5)
      .as[Frontier.UriRow].collect().toSet
    assert(replayedHalf == rows1)
  }

  test("remap clears map state for registry prefixes and maven/npm URIs") {
    // minecode/management/commands/remap.py: prefix-matched
    // successfully-mapped rows are cleared, then uri__contains maven /
    // npm rows get last_map_date cleared too. A mapped row has
    // wip_date reset already (models.py lifecycle), so rows still
    // in-flight are untouched.
    val now = ts("2026-08-12 00:00:00")
    def row(uri: String, mapped: Boolean, err: Option[String] = None) =
      Frontier.UriRow(uri, uri, "h", 1, Some(now),
        if (mapped) Some(now) else None, None, err)
    val frontier = Seq(
      row("https://repo1.maven.org/maven2/a", mapped = true),
      row("maven-index://repo1.maven.org/b", mapped = true),
      row("https://example.com/c", mapped = true),        // no match at all
      row("https://registry.npmjs.org/d", mapped = false), // never mapped
      row("https://replicate.npmjs.com/e", mapped = true,
        err = Some("boom")),                               // errored
      // prefix miss but uri CONTAINS "maven": the reference's second
      // UPDATE clears last_map_date for it
      row("https://other.example/maven/artifact", mapped = true)).toDF()
    val out = Frontier.remap(frontier)
    val cleared = out.filter(col("last_map_date").isNull)
      .select("uri").as[String].collect().toSet
    assert(cleared == Set(
      "https://repo1.maven.org/maven2/a",
      "maven-index://repo1.maven.org/b",
      "https://registry.npmjs.org/d",
      "https://other.example/maven/artifact"))
    assert(out.filter(col("uri") === "https://example.com/c")
      .filter(col("last_map_date").isNotNull).count() == 1)
    assert(out.filter(col("uri") === "https://replicate.npmjs.com/e")
      .filter(col("last_map_date").isNotNull).count() == 1)
    // remapped rows become mappable again
    assert(Frontier.mappables(out).count() == 4)
  }

  test("scan queue: full happy path and guarded transitions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScanQueue.ScanEvent]
    val states = ScanQueue.run(spark, input.toDS(), withTimeouts = false)
    val q = states.writeStream.format("memory").queryName("scan_states")
      .outputMode("append").start()
    try {
      input.addData(
        ScanQueue.ScanEvent("u1", "submit", ""),
        ScanQueue.ScanEvent("u1", "start", ""),
        ScanQueue.ScanEvent("u1", "scan_done", "ok"),
        ScanQueue.ScanEvent("u1", "index_done", "indexed"),
        ScanQueue.ScanEvent("u2", "submit", ""),
        ScanQueue.ScanEvent("u2", "index_done", "ILLEGAL"), // not legal from submitted
        ScanQueue.ScanEvent("u3", "submit", ""),
        ScanQueue.ScanEvent("u3", "start", ""),
        ScanQueue.ScanEvent("u3", "fail", "boom"))
      q.processAllAvailable()
      val rows = spark.table("scan_states")
        .select("uuid", "status").as[(String, Int)].collect().toSet
      // u1 walks all four states; u2 only reaches submitted; u3 fails
      assert(rows == Set(("u1", 1), ("u1", 2), ("u1", 3), ("u1", 4),
        ("u2", 1), ("u3", 1), ("u3", 2), ("u3", 5)))
    } finally q.stop()
  }

  test("scan queue feeds the indexing flow end-to-end") {
    // the minecode lifecycle glue: a scan reaching SCAN_COMPLETED
    // (status 3) carries its scan data; each micro-batch runs
    // index_package over the completed scans (`indexing.py:199-253`)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScanQueue.ScanEvent]
    val states = ScanQueue.run(spark, input.toDS(), withTimeouts = false)
    val indexed = scala.collection.mutable.Set.empty[(String, String)]
    val scanJson = """{"files": [
      {"path": "a.txt", "type": "file", "name": "a.txt", "sha1": "aa"},
      {"path": "b.txt", "type": "file", "name": "b.txt", "sha1": "bb"}]}"""
    val q = states.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[ScanQueue.ScanState], _: Long) =>
        val scans = batch.filter(_.status == 3).toDF()
          .select(col("uuid").as("download_url"),
            col("detail").as("scan_json"))
        val idx = graft.matching.Indexing.exactFileIndex(
          graft.matching.Indexing.resources(
            graft.matching.Indexing.scanResources(scans)))
        val rows = idx.collect()
        indexed.synchronized {
          rows.foreach(r => indexed += ((r.getString(0), r.getString(1))))
        }
        ()
      }.start()
    try {
      input.addData(
        ScanQueue.ScanEvent("http://p1", "submit", ""),
        ScanQueue.ScanEvent("http://p1", "start", ""),
        ScanQueue.ScanEvent("http://p1", "scan_done", scanJson),
        ScanQueue.ScanEvent("http://p2", "submit", "")) // not completed
      q.processAllAvailable()
      assert(indexed.synchronized(indexed.toSet) ===
        Set(("aa", "http://p1"), ("bb", "http://p1")))
    } finally q.stop()
  }

  test("event stream: windowed counts equal the batch plan") {
    // the streaming file source wants a directory of parquet files
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.hourlyCounts(spark, dir.toString, "stream_hourly")
    try {
      q.processAllAvailable()
      val streamRows = spark.table("stream_hourly")
        .select("ws", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      val batchRows = EventStream.hourlyCountsBatch(spark,
        s"$sf001/events.parquet")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamRows == batchRows)
      assert(streamRows.nonEmpty)
    } finally q.stop()
  }

  test("streaming sliding windows equal the st_sliding_window batch " +
      "plan") {
    val dir = java.nio.file.Files.createTempDirectory("events-slide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.slidingCounts(spark, dir.toString, "stream_sliding")
    try {
      q.processAllAvailable()
      val streamRows = spark.table("stream_sliding")
        .as[(Timestamp, String, Long)].collect().toSet
      val batchRows = Registry.byName("st_sliding_window")
        .run(spark, sf001)
        .select("ws", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamRows == batchRows)
      assert(streamRows.nonEmpty)
    } finally q.stop()
  }

  test("streaming session windows equal the st_session_window batch " +
      "plan") {
    val dir = java.nio.file.Files.createTempDirectory("events-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.sessionSpend(spark, dir.toString, "stream_sessions")
    try {
      q.processAllAvailable()
      val streamRows = spark.table("stream_sessions")
        .as[(Long, Timestamp, Long, Long)].collect().toSet
      val batchRows = Registry.byName("st_session_window")
        .run(spark, sf001)
        .select("user_id", "session_start", "n_events", "spend_cents")
        .as[(Long, Timestamp, Long, Long)].collect().toSet
      assert(streamRows == batchRows)
      assert(streamRows.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within 30 minutes") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[StreamingSpec.Imp]
    val clicks = MemoryStream[StreamingSpec.Click]
    val joined = EventStream.attributeClicks(
      imps.toDS().toDF(), clicks.toDS().toDF())
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      imps.addData(
        StreamingSpec.Imp(1L, 10L, ts("2026-01-01 10:00:00")),
        StreamingSpec.Imp(1L, 11L, ts("2026-01-01 12:00:00")),
        StreamingSpec.Imp(2L, 20L, ts("2026-01-01 10:00:00")))
      clicks.addData(
        // in window for imp 10 (+10 min)
        StreamingSpec.Click(1L, 100L, ts("2026-01-01 10:10:00")),
        // out of window for imp 10 (+40 min), before imp 11
        StreamingSpec.Click(1L, 101L, ts("2026-01-01 10:40:00")),
        // BEFORE any impression of user 2 → no match
        StreamingSpec.Click(2L, 200L, ts("2026-01-01 09:50:00")),
        // exactly on the 30-minute boundary of imp 11 (inclusive)
        StreamingSpec.Click(1L, 102L, ts("2026-01-01 12:30:00")))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 100L), (11L, 102L)),
        s"interval bounds violated: $got")
      // watermark housekeeping: a much later pair still matches after
      // old state ages out
      imps.addData(StreamingSpec.Imp(3L, 30L, ts("2026-01-02 10:00:00")))
      clicks.addData(StreamingSpec.Click(3L, 300L, ts("2026-01-02 10:05:00")))
      q.processAllAvailable()
      val got2 = spark.table("attrib")
        .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got2 == got + ((30L, 300L)))
    } finally q.stop()
  }

  test("file-sink streaming restarts from its checkpoint exactly-once") {
    // the operational contract a 100 TB ingest pipeline leans on: a
    // stopped query restarted on the SAME checkpoint neither re-emits
    // processed input (the sink's commit log skips batch re-writes)
    // nor loses input that arrived while it was down
    val src = java.nio.file.Files.createTempDirectory("gr-src").toString
    val out = java.nio.file.Files.createTempDirectory("gr-out").toString
    val chk = java.nio.file.Files.createTempDirectory("gr-chk").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING")
    def start() = spark.readStream.schema(schema).parquet(src)
      .withColumn("doubled", col("id") * 2)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()

    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // input lands while the query is DOWN
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out)
      .select("id", "doubled").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L), (2L, 4L), (3L, 6L)),
      s"exactly-once violated: $got")
  }
}

object StreamingSpec {
  final case class Imp(iuser: Long, imp_id: Long, its: Timestamp)
  final case class Click(cuser: Long, click_id: Long, cts: Timestamp)
}
