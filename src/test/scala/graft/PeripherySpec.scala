package graft

import java.sql.Timestamp

import graft.matching.{Fingerprints, HaloHash, Matching}
import graft.miners.{ArtifactBuilder, HttpVisitor, Seeds, Transport}
import graft.sources.Robots
import graft.streaming.Queues
import org.apache.spark.sql.functions._

class PeripherySpec extends SparkTestBase {
  import spark.implicits._

  test("halohash: majority-bit semantics, merge associativity, format") {
    // identical sets → identical fingerprints
    val a = (1 to 100).map(i => s"el$i")
    assert(HaloHash.of(a) == HaloHash.of(a.reverse))
    // count prefix is the %08x element count
    val fp = HaloHash.of(a)
    assert(fp.length == 40)
    assert(Integer.parseInt(fp.take(8), 16) == 100)
    // small perturbation → small hamming; disjoint set → large hamming
    def hd(x: String, y: String) = {
      val bx = x.drop(8).grouped(2).map(Integer.parseInt(_, 16)).toArray
      val by = y.drop(8).grouped(2).map(Integer.parseInt(_, 16)).toArray
      bx.zip(by).map { case (p, q) => Integer.bitCount(p ^ q) }.sum
    }
    val near = HaloHash.of(a.drop(3))
    val far = HaloHash.of((1 to 100).map(i => s"other$i"))
    assert(hd(fp, near) < hd(fp, far))
    // distributed aggregation equals the sequential computation
    val viaSpark = a.toDF("el").repartition(7)
      .agg(HaloHash.halohash(col("el"))).collect().head.getString(0)
    assert(viaSpark == fp)
    // parses with the Fingerprints codec
    val parsed = Seq(fp).toDF("fingerprint")
      .select(Fingerprints.elementsCount(col("fingerprint")).as("cnt"))
      .collect().head.getInt(0)
    assert(parsed == 100)
  }

  test("j11: source-map sha1s widen the exact-match key set") {
    val queries = Seq(
      ("app/bundle.js.map", null, Seq("sha_src1", "sha_src2")),
      ("app/plain.js", "sha_plain", null))
      .toDF("path", "sha1", "source_map_sha1s")
    val index = Seq(
      ("sha_src2", "http://p/lib.jar", "src/b.js"),
      ("sha_plain", "http://p/app.jar", "src/plain.js"))
      .toDF("sha1", "download_url", "path")
    val out = Matching.exactMatchWithSourceMaps(queries, index)
      .select("q_path", "download_url").as[(String, String)].collect().toSet
    assert(out == Set(
      ("app/bundle.js.map", "http://p/lib.jar"),
      ("app/plain.js", "http://p/app.jar")))
  }

  test("st5: priority requests insert-if-absent and FIFO claim") {
    val pending = Seq(
      ("u1", Timestamp.valueOf("2026-01-01 00:00:00"), null, null))
      .toDF("uri", "request_date", "wip_date", "processed_date")
      .select(col("uri"), col("request_date"),
        col("wip_date").cast("timestamp"),
        col("processed_date").cast("timestamp"))
    val requests = Seq(
      ("u1", Timestamp.valueOf("2026-01-02 00:00:00"), null, null),
      ("u2", Timestamp.valueOf("2026-01-03 00:00:00"), null, null))
      .toDF("uri", "request_date", "wip_date", "processed_date")
      .select(col("uri"), col("request_date"),
        col("wip_date").cast("timestamp"),
        col("processed_date").cast("timestamp"))
    val merged = Queues.insertPriorityRequests(pending, requests)
    assert(merged.count() == 2) // duplicate pending u1 not re-inserted
    val claimed = Queues.claimPriorityRequests(merged, 1)
      .select("uri").as[String].collect()
    assert(claimed.toSeq == Seq("u1")) // oldest first
  }

  test("st6: watch due-filter honors interval clamp") {
    val now = Timestamp.valueOf("2026-08-12 00:00:00")
    val watches = Seq(
      ("pkg:npm/a", true, 7, Timestamp.valueOf("2026-08-01 00:00:00")),
      ("pkg:npm/b", true, 7, Timestamp.valueOf("2026-08-10 00:00:00")),
      ("pkg:npm/c", false, 7, Timestamp.valueOf("2026-01-01 00:00:00")),
      ("pkg:npm/d", true, 9999, Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("package_url", "is_active", "watch_interval", "last_watch_date")
    val due = Queues.dueWatches(watches, now)
      .select("package_url").as[String].collect().toSet
    // a: 11 days > 7 → due; b: 2 days → not; c inactive; d: interval
    // clamped to 365, last watch 2020 → due
    assert(due == Set("pkg:npm/a", "pkg:npm/d"))
  }

  test("watch cycle: new registry versions become priority requests") {
    // packagedb/tests/test_tasks.py: three fetched versions, one known
    // locally → two new priority requests; unknown ecosystem errors
    val now = Timestamp.valueOf("2026-08-12 00:00:00")
    val watches = Seq(
      ("pkg:maven/org.test/test-package2", "maven", "org.test",
        "test-package2", true, 7, null: Timestamp),
      ("pkg:unknown/org.test/test-package3", "unknown", "org.test",
        "test-package3", true, 7, null: Timestamp),
      ("pkg:npm/fresh", "npm", null: String, "fresh", true, 7,
        Timestamp.valueOf("2026-08-11 00:00:00"))) // not due
      .toDF("package_url", "ptype", "namespace", "name", "is_active",
        "watch_interval", "last_watch_date")
    val packages = Seq(("maven", "org.test", "test-package2", "v1.0.1"))
      .toDF("ptype", "namespace", "name", "version")
    val fetched = Seq(
      ("maven", "org.test", "test-package2", "v1.0.1"),
      ("maven", "org.test", "test-package2", "v1.2.1"),
      ("maven", "org.test", "test-package2", "v3.0.1"),
      ("unknown", "org.test", "test-package3", "v9"), // unsupported
      ("npm", null: String, "fresh", "2.0.0")) // watch not due
      .toDF("ptype", "namespace", "name", "version")
    val pending = Seq.empty[(String, Timestamp, Timestamp, Timestamp)]
      .toDF("uri", "request_date", "wip_date", "processed_date")

    val (outWatches, outPending) =
      Queues.watchCycle(watches, packages, fetched, pending, now)
    assert(outPending.select("uri").as[String].collect().toSet === Set(
      "pkg:maven/org.test/test-package2@v1.2.1",
      "pkg:maven/org.test/test-package2@v3.0.1"))

    val byUrl = outWatches.collect()
      .map(r => r.getAs[String]("package_url") -> r).toMap
    assert(byUrl("pkg:maven/org.test/test-package2")
      .getAs[Timestamp]("last_watch_date") === now)
    assert(byUrl("pkg:maven/org.test/test-package2")
      .getAs[String]("watch_error") === null)
    assert(byUrl("pkg:unknown/org.test/test-package3")
      .getAs[String]("watch_error") ===
      "`unknown` ecosystem is not supported by the collect flow")
    // a supported-by-fetch but non-priority-queue ecosystem errors at
    // the queue layer (packagedb/tasks.py:93-96 ordering)
    val gemErr = Queues.watchCycle(
      Seq(("pkg:gem/rails", "gem", null: String, "rails", true, 7,
        null: Timestamp))
        .toDF("package_url", "ptype", "namespace", "name", "is_active",
          "watch_interval", "last_watch_date"),
      packages, fetched, pending, now)._1
      .collect()(0).getAs[String]("watch_error")
    assert(gemErr === "`gem` ecosystem is not supported by the priority queue")
    // not-due watch untouched
    assert(byUrl("pkg:npm/fresh").getAs[String]("watch_error") === null)
    assert(byUrl("pkg:npm/fresh").getAs[Timestamp]("last_watch_date") ===
      Timestamp.valueOf("2026-08-11 00:00:00"))
  }

  test("priority queue batch: claim, collect, merge, mark processed") {
    // minecode/tests/test_priority_queue.py test_process_request: a
    // queued purl collects packages into the catalog and is marked
    // processed; an unroutable purl records its error but is equally
    // marked processed (the loop's finally block)
    import graft.miners.Transport
    val now = Timestamp.valueOf("2026-08-12 00:00:00")
    val transport = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = uri match {
        case u if u.contains("repo1.maven.org") &&
            u.endsWith("maven-metadata.xml") =>
          Right("""<metadata><versioning><versions>
            <version>0.12.0</version>
            </versions></versioning></metadata>""".getBytes)
        case u => Left(s"unexpected fetch: $u")
      }
    }
    val pending = Seq(
      ("pkg:maven/org.apache.twill/twill-core",
        Timestamp.valueOf("2026-01-01 00:00:00"), null, null),
      ("pkg:doesnotexist/nope",
        Timestamp.valueOf("2026-01-02 00:00:00"), null, null),
      ("pkg:maven/late/later",
        Timestamp.valueOf("2026-01-03 00:00:00"), null, null))
      .toDF("uri", "request_date", "wip_date", "processed_date")
      .select(col("uri"), col("request_date"),
        col("wip_date").cast("timestamp"),
        col("processed_date").cast("timestamp"))
    val catalog = Seq.empty[graft.catalog.PackageRow].toDF()

    val (pending2, catalog2) = Queues.processPriorityRequests(
      spark, pending, catalog, transport, now, batchSize = 2)

    val rows = pending2.collect()
      .map(r => r.getAs[String]("uri") -> r).toMap
    val done = rows("pkg:maven/org.apache.twill/twill-core")
    assert(done.getAs[Timestamp]("processed_date") === now)
    assert(done.getAs[String]("processing_error") === null)
    val bad = rows("pkg:doesnotexist/nope")
    assert(bad.getAs[Timestamp]("processed_date") === now)
    // the router resolves before any collect: NoRouteAvailable is the
    // reference's verbatim error (priority_queue.py:124-125)
    assert(bad.getAs[String]("processing_error") ===
      "No route available for pkg:doesnotexist/nope")
    // the third request was beyond the batch and stays claimable
    assert(rows("pkg:maven/late/later")
      .getAs[Timestamp]("processed_date") === null)

    val pkgs = catalog2.select("download_url").as[String].collect()
    assert(pkgs.toSeq === Seq("https://repo1.maven.org/maven2/" +
      "org/apache/twill/twill-core/0.12.0/twill-core-0.12.0.jar"))
  }

  test("stale-scan sweep times out 2h+ submitted/in-progress scans") {
    // manage_scans.py:149-176 — only long-running submitted/in-progress
    // scans flip to timeout (wip cleared); completed/failed and recent
    // rows pass through untouched
    val now = Timestamp.valueOf("2026-08-12 12:00:00")
    val wip = Timestamp.valueOf("2026-08-12 11:30:00")
    val rows = Seq(
      ("u1", "submitted", Timestamp.valueOf("2026-08-12 09:00:00"), wip),
      ("u2", "in_progress", Timestamp.valueOf("2026-08-12 11:00:00"), wip),
      ("u3", "completed", Timestamp.valueOf("2026-08-12 08:00:00"), null),
      ("u4", "submitted", null, wip))
      .toDF("uri", "scan_status", "scan_date", "wip_date")
    val out = Queues.sweepStaleScans(rows, now)
      .select("uri", "scan_status", "wip_date")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.get(2) == null))).toMap
    assert(out("u1") == (("timeout", true)))  // 3h old -> swept
    assert(out("u2") == (("in_progress", false))) // 1h -> untouched
    assert(out("u3") == (("completed", true)))
    assert(out("u4") == (("submitted", false))) // no scan_date
  }

  test("watch next-execution matches the reference's scheduler") {
    // packagedb/tests/test_schedules.py:test_get_next_execution
    val now = Timestamp.valueOf("2024-01-01 00:00:00")
    assert(Queues.nextExecution(2, None, now) === now)
    assert(Queues.nextExecution(2, Some(now), now) ===
      Timestamp.valueOf("2024-01-03 00:00:00"))
    // a stale last watch schedules immediately
    assert(Queues.nextExecution(2,
      Some(Timestamp.valueOf("2023-01-01 00:00:00")), now) === now)
  }

  test("st8: inbox appends only non-empty create activities") {
    // packagedb/api.py:1400: `if content and activity_type.lower() ==
    // "create"` — empty content is rejected even with a matching type
    val inbox = Seq.empty[(String, String, Timestamp)]
      .toDF("actor", "payload", "received_date")
    val events = Seq(
      ("alice", "{}", Timestamp.valueOf("2026-01-01 00:00:00"), "Create"),
      ("bob", "{}", Timestamp.valueOf("2026-01-01 00:00:00"), "delete"),
      ("carol", "", Timestamp.valueOf("2026-01-01 00:00:00"), "create"),
      ("dave", null, Timestamp.valueOf("2026-01-01 00:00:00"), "CREATE"))
      .toDF("actor", "payload", "received_date", "activity_type")
    val out = Queues.appendActivities(inbox, events)
    assert(out.select("actor").as[String].collect().toSeq == Seq("alice"))
  }

  test("s2: http visitor honors robots and reports errors in-band") {
    val transport = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] =
        if (uri.contains("boom")) Left("connection refused")
        else Right(s"""<a href="$uri/child">x</a>""".getBytes("UTF-8"))
    }
    val rules = Map("site.io" -> Robots.parse(
      "User-agent: *\nDisallow: /private/"))
    val visitor = new HttpVisitor(transport,
      bytes => "href=\"([^\"]+)\"".r
        .findAllMatchIn(new String(bytes, "UTF-8")).map(_.group(1)).toSeq,
      rules)
    val ok = visitor.visit("http://site.io/pub/x")
    assert(ok.uris == Seq("http://site.io/pub/x/child") && ok.error.isEmpty)
    val blocked = visitor.visit("http://site.io/private/y")
    assert(blocked.error.exists(_.contains("robots")))
    val err = visitor.visit("http://site.io/boom")
    assert(err.error.contains("connection refused"))
  }

  test("s12/x7: seeds and maven artifact builder") {
    assert(Seeds.all.nonEmpty)
    val pkg = ArtifactBuilder.mavenPackage(Map(
      "groupId" -> "org.apache.spark", "artifactId" -> "spark-core",
      "version" -> "3.5.0", "classifier" -> "tests")).get
    assert(pkg.download_url ==
      "https://repo1.maven.org/maven2/org/apache/spark/spark-core/3.5.0/spark-core-3.5.0-tests.jar")
    assert(pkg.namespace.contains("org.apache.spark"))
    assert(pkg.qualifiers.contains("classifier=tests"))
    assert(ArtifactBuilder.mavenPackage(Map("groupId" -> "g")).isEmpty)
  }

  test("make_scannableuris inserts only missing packages; priority bump is iregex") {
    import graft.streaming.Queues
    val scannables = Seq(("http://a/1.jar", 0)).toDF("uri", "priority")
    val packages = Seq(
      graft.catalog.PackageRow.minimal("http://a/1.jar", "maven", "a"),
      graft.catalog.PackageRow.minimal("http://b/2.jar", "maven", "b")).toDF()
    val made = Queues.makeScannableUris(scannables, packages)
    assert(made.count() == 2) // existing kept once, new inserted at 0
    assert(made.filter($"uri" === "http://b/2.jar")
      .select("priority").as[Int].collect().head == 0)
    // increase_scannableuri_priority.py:27 — matching rows jump to 100
    val bumped = Queues.increaseScannablePriority(made, ".*B/2.*")
    val byUri = bumped.select("uri", "priority").as[(String, Int)]
      .collect().toMap
    assert(byUri("http://b/2.jar") == 100) // case-insensitive match
    assert(byUri("http://a/1.jar") == 0)
  }
}
