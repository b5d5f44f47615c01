package graft

import java.sql.Timestamp

import graft.matching.MatchService
import org.apache.spark.sql.functions._

/** The matching/D2D orchestration shell (`matchcode/api.py:337-686`):
  * create validation, the D2D URL-splitting quirks, run lifecycle, and
  * the serializer summaries. */
class MatchServiceSpec extends SparkTestBase {
  import spark.implicits._

  private val now = Timestamp.valueOf("2026-08-13 00:00:00")

  test("matching create: any fetch failure fails the whole request") {
    val fetch = (u: String) =>
      if (u.contains("bad")) Left("boom") else Right(u.split('/').last)
    val err = MatchService.createMatching("u1", now, None,
      Seq("http://ok/a.json", "http://bad/b.json", "http://bad/c.json"),
      None, fetch)
    assert(err == Left("Could not fetch: http://bad/b.json\nhttp://bad/c.json"))

    val ok = MatchService.createMatching("u1", now, Some("upload.json"),
      Seq("http://ok/a.json"), Some("http://hook"), fetch)
      .fold(e => fail(e), identity)
    assert(ok.inputSources.map(_.filename) == Seq("upload.json", "a.json"))
    assert(ok.inputSources.map(_.isUploaded) == Seq(true, false))
    assert(ok.runs.map(_.pipeline) == Seq("matching"))
    assert(ok.runs.head.status == "queued")
    assert(ok.webhookUrl.contains("http://hook"))
  }

  test("matching create splits whitespace-joined URLs per entry") {
    // validate_input_urls (matchcode/api.py:422-425): each entry is
    // split on whitespace into multiple URLs before fetching
    val fetch = (u: String) => Right(u.split('/').last): Either[String, String]
    val ok = MatchService.createMatching("u1", now, None,
      Seq("http://h/a.json  http://h/b.json\nhttp://h/c.json",
        " http://h/d.json "), None, fetch)
      .fold(e => fail(e), identity)
    assert(ok.inputSources.map(_.filename) ==
      Seq("a.json", "b.json", "c.json", "d.json"))
    assert(ok.inputSources.flatMap(_.downloadUrl) ==
      Seq("http://h/a.json", "http://h/b.json", "http://h/c.json",
        "http://h/d.json"))
  }

  test("d2d url list preserves the reference's first-element re-split quirk") {
    // plain entries strip + drop empties
    assert(MatchService.d2dUrlList(Seq(" http://a ", "", "http://b")) ==
      Seq("http://a", "http://b"))
    // a newline ANYWHERE re-splits the FIRST element
    assert(MatchService.d2dUrlList(Seq("http://a\nhttp://b", "http://c")) ==
      Seq("http://a", "http://b", "http://c"))
    // second newline entry splits the first LINE of the first split
    // (the reference rebinds input_urls mid-loop)
    assert(MatchService.d2dUrlList(
      Seq("http://a\nhttp://b", "http://x\nhttp://y")) ==
      Seq("http://a", "http://b", "http://a"))
  }

  test("d2d create queues the d2d pipeline with the four groups") {
    val p = MatchService.createD2d("u2", now,
      Seq("https://registry.npmjs.com/asdf/-/asdf-1.0.2.tgz"), _ => true)
      .fold(e => fail(e), identity)
    assert(p.runs.map(_.pipeline) == Seq("d2d"))
    assert(p.runs.head.selectedGroups ==
      Seq("Java", "Javascript", "Elf", "Go"))
    assert(p.inputSources.map(_.filename) == Seq("asdf-1.0.2.tgz"))
    assert(MatchService.createD2d("u2", now, Seq("http://gone"),
      _ => false) == Left("Could not fetch: http://gone"))
  }

  test("run lifecycle: not_started → queued → running → success/failure") {
    val r = MatchService.Run("matching")
    assert(r.status == "not_started")
    assert(r.copy(taskId = Some("t")).status == "queued")
    assert(r.copy(taskId = Some("t"),
      taskStartDate = Some(now)).status == "running")
    assert(r.copy(taskId = Some("t"), taskStartDate = Some(now),
      taskEndDate = Some(now), taskExitcode = Some(0)).status == "success")
    assert(r.copy(taskId = Some("t"), taskStartDate = Some(now),
      taskEndDate = Some(now), taskExitcode = Some(1)).status == "failure")
  }

  test("serializer summaries aggregate in one pass each") {
    val resources = Seq("matched", "matched", "requires-review", "new")
      .toDF("status")
    assert(MatchService.resourcesSummary(resources) ==
      Map("matched" -> 2L, "requires-review" -> 1L, "new" -> 1L))
    assert(MatchService.discrepancies(resources) == Map("total" -> 1L))

    val packages = Seq(
      (Seq("a"), Seq.empty[String]),
      (Seq.empty[String], Seq("m")),
      (Seq.empty[String], Seq.empty[String]))
      .toDF("missing_resources", "modified_resources")
    assert(MatchService.packagesSummary(packages) == Map(
      "total" -> 3L, "with_missing_resources" -> 1L,
      "with_modified_resources" -> 1L))

    val deps = Seq((true, false, true), (false, false, true),
      (true, true, false)).toDF("is_runtime", "is_optional", "is_pinned")
    assert(MatchService.dependenciesSummary(deps) == Map(
      "total" -> 3L, "is_runtime" -> 2L, "is_optional" -> 1L,
      "is_pinned" -> 2L))

    val rels = Seq("java_to_class", "java_to_class", "path")
      .toDF("map_type")
    assert(MatchService.relationsSummary(rels) ==
      Map("java_to_class" -> 2L, "path" -> 1L))
  }
}
