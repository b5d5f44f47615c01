package graft

import java.sql.Timestamp

import graft.matching.{MatchService, Matching}
import org.apache.spark.sql.functions._

/** End-to-end matching-service lifecycle golden: request create
  * (`matchcode/api.py:425-446`) → run-state transitions (scanpipe Run
  * semantics) → the staged matching pipeline over the reference's own
  * abbot scan fixture in the `matching` pipeline's stage order
  * (`matchcode/pipelines/matching.py:47-63`: archive/file exact →
  * directory match → file approximate → snippets → best-match
  * post-process) → serializer summaries (`matchcode/api.py:380-421`).
  * The pieces are individually tested elsewhere; this spec asserts
  * statuses, stage gating, and final match rows TOGETHER.
  */
class MatchLifecycleSpec extends SparkTestBase {
  import spark.implicits._

  private def available = AbbotFixture.available

  /** (path, name, is_file, size, sha1, dir_fp, file_fp) per resource. */
  private lazy val fixtureRows = AbbotFixture.rows

  private val Pkg = "http://repo1.maven.org/maven2/abbot/abbot/0.12.3/abbot-0.12.3.jar"
  private val Extract = "abbot-0.12.3.jar-extract"

  /** Dir subtrees the simulated PurlDB indexes (their fingerprints). */
  private val IndexedDirs = Set(
    s"$Extract/junit", s"$Extract/junit/extensions",
    s"$Extract/junit/extensions/abbot",
    s"$Extract/abbot/finder", s"$Extract/abbot/finder/matchers",
    s"$Extract/abbot/script", s"$Extract/abbot/script/parsers",
    s"$Extract/abbot/tester", s"$Extract/abbot/util",
    s"$Extract/abbot/i18n")

  test("matching request lifecycle: create → run → match → summaries") {
    assume(available)
    val now = Timestamp.valueOf("2026-08-13 00:00:00")

    // -- create (api.py:425-446): fetch up front, queue the matching run
    val project = MatchService.createMatching("proj-1", now, None,
      Seq("http://files.example/scans/scancodeio_abbot-0.12.3.json"), None,
      u => Right(u.split('/').last)).fold(e => fail(e), identity)
    assert(project.inputSources.map(_.filename) ==
      Seq("scancodeio_abbot-0.12.3.json"))
    assert(project.runs.map(_.pipeline) == Seq("matching"))
    assert(project.runs.head.status == "queued")

    // -- the worker picks the run up
    val running = project.runs.head.copy(taskStartDate = Some(now))
    assert(running.status == "running")

    // -- pipeline stages over the fixture codebase.
    val resources = fixtureRows.toDF("path", "name", "is_file", "size",
      "sha1", "dir_fingerprint", "file_fingerprint")
    // simulated PurlDB content for the abbot package: the archive sha1 +
    // every sha1 under the editor/ subtree (exact index), ten directory
    // fingerprints (approx dir index), and all halo1 file fingerprints
    // (approx file index)
    val exactPaths = fixtureRows.collect {
      case (p, _, true, _, Some(_), _, _)
        if p == "abbot-0.12.3.jar" || p.startsWith(s"$Extract/abbot/editor/")
        => p
    }.toSet
    val exactIndex = fixtureRows.collect {
      case (p, _, true, _, Some(sha1), _, _) if exactPaths(p) =>
        (sha1, Pkg, p)
    }.toDF("sha1", "download_url", "path")
    val dirIndex = fixtureRows.collect {
      case (p, n, false, sz, _, Some(fp), _) if IndexedDirs(p) =>
        (Pkg, p, n, sz, false, fp)
    }.toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val fileIndex = fixtureRows.collect {
      case (p, n, true, sz, _, _, Some(fp)) => (Pkg, p, n, sz, true, fp)
    }.toDF("download_url", "path", "name", "size", "is_file", "fingerprint")
    val noSnippets = Seq.empty[(String, Array[Byte], Long)]
      .toDF("q_path", "fingerprint", "position")
    val noSnippetIndex = Seq.empty[(Array[Byte], String, String, Long)]
      .toDF("fingerprint", "download_url", "path", "position")

    val matches = Matching.matchCodebase(resources, exactIndex, dirIndex,
      fileIndex, noSnippets, noSnippetIndex).cache()
    val byType = matches.collect().groupBy(_.getString(2))
      .map { case (k, v) => k -> v.map(_.getString(0)).toSet }

    // post-process kept ONE best package row per resource (A5)
    assert(matches.count() == matches.select("path").distinct().count())
    // stage 1: every indexed sha1 exact-matched, nothing else
    assert(byType("exact_file") == exactPaths)
    // stage 2: exactly the ten indexed directories matched (hamming 0
    // self-match wins the (hd, size_diff, name_diff) rank)
    assert(byType("approx_directory") == IndexedDirs)
    // stage 3 GATING: the ten i18n StringsBundle files sit under a
    // MATCHED directory, so they are excluded from the approximate
    // file stage even though their halo1 fps are in the index; only
    // the two fingerprinted files outside matched subtrees remain
    assert(byType("approx_file") ==
      Set(s"$Extract/abbot/abbot.xsd", s"$Extract/META-INF/MANIFEST.MF"))
    assert(!byType.values.flatten.toSet
      .contains(s"$Extract/abbot/i18n/StringsBundle.properties"))

    // -- the run finishes; scanpipe Run status semantics
    val done = running.copy(taskEndDate = Some(now), taskExitcode = Some(0))
    assert(done.status == "success")
    assert(running.copy(taskEndDate = Some(now), taskExitcode = Some(1))
      .status == "failure")

    // -- serializer summaries over the pipeline outputs
    //    (matchcode/api.py:380-421)
    val statuses = resources.join(
        matches.select(col("path"), col("match_type")), Seq("path"), "left")
      .select(coalesce(col("match_type"), lit("no-match")).as("status"))
    val resSummary = MatchService.resourcesSummary(statuses)
    assert(resSummary("exact_file") == exactPaths.size.toLong)
    assert(resSummary("approx_directory") == IndexedDirs.size.toLong)
    assert(resSummary("approx_file") == 2L)
    assert(resSummary.values.sum == fixtureRows.size.toLong)

    // discovered-packages summary: the one matched package, complete
    val pkgs = Seq((Pkg, Seq.empty[String], Seq.empty[String]))
      .toDF("purl", "missing_resources", "modified_resources")
    assert(MatchService.packagesSummary(pkgs) ==
      Map("total" -> 1L, "with_missing_resources" -> 0L,
        "with_modified_resources" -> 0L))
  }
}
