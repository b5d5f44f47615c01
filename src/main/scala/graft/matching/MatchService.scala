package graft.matching

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The matching/D2D request-orchestration shell
  * (`matchcode/api.py:337-686`): Project + Run bookkeeping around the
  * in-engine pipelines ([[Matching.matchCodebase]] et al.), and the
  * per-project result summaries the serializers expose. The pipelines
  * themselves run elsewhere (the reference delegates to scancode.io);
  * this is the request/run state machine and the summary queries —
  * each summary ONE aggregation pass over its frame.
  */
object MatchService {

  final case class InputSource(filename: String,
      downloadUrl: Option[String], isUploaded: Boolean)

  /** Run lifecycle mirror (scanpipe Run.status semantics): SUCCESS =
    * exited 0, FAILURE = exited non-zero, RUNNING = started not ended,
    * QUEUED = has a task id, else NOT_STARTED. */
  final case class Run(pipeline: String,
      selectedGroups: Seq[String] = Seq.empty,
      taskId: Option[String] = None,
      taskStartDate: Option[Timestamp] = None,
      taskEndDate: Option[Timestamp] = None,
      taskExitcode: Option[Int] = None) {
    def status: String =
      if (taskExitcode.contains(0) && taskEndDate.nonEmpty) "success"
      else if (taskEndDate.nonEmpty) "failure"
      else if (taskStartDate.nonEmpty) "running"
      else if (taskId.nonEmpty) "queued"
      else "not_started"
  }

  final case class Project(uuid: String, name: String,
      createdDate: Timestamp, inputSources: Seq[InputSource],
      runs: Seq[Run], webhookUrl: Option[String] = None)

  /** D2D's selected pipeline groups (`matchcode/api.py:564-568`). */
  val D2dGroups: Seq[String] = Seq("Java", "Javascript", "Elf", "Go")

  /** The matching-project create (`matchcode/api.py:425-446`): split
    * each input entry on whitespace into individual URLs
    * (`validate_input_urls`, `matchcode/api.py:422-425`), fetch every
    * URL up front, fail the WHOLE request with the reference's
    * verbatim message when any fetch errors, then attach
    * uploads/downloads/webhook and queue the `matching` pipeline. */
  def createMatching(uuid: String, now: Timestamp,
      uploadFile: Option[String], inputUrls: Seq[String],
      webhookUrl: Option[String],
      fetch: String => Either[String, String])
      : Either[String, Project] = {
    val urls = inputUrls.flatMap(_.split("\\s+")).filter(_.nonEmpty)
    val results = urls.map(u => u -> fetch(u))
    val errors = results.collect { case (u, Left(_)) => u }
    if (errors.nonEmpty)
      Left("Could not fetch: " + errors.mkString("\n"))
    else {
      val sources =
        uploadFile.map(f => InputSource(f, None, isUploaded = true)).toSeq ++
          results.collect { case (u, Right(name)) =>
            InputSource(name, Some(u), isUploaded = false)
          }
      Right(Project(uuid, uuid, now, sources,
        Seq(Run("matching", taskId = Some(uuid))), webhookUrl))
    }
  }

  /** The D2D input-URL normalization (`matchcode/api.py:548-562`),
    * quirks preserved: a newline inside ANY entry re-splits the
    * CURRENT list's FIRST element (the loop rebinds `input_urls`, so a
    * second newline-carrying entry splits the first LINE of the first
    * split), while plain entries are stripped and kept if non-empty. */
  def d2dUrlList(inputUrls: Seq[String]): Seq[String] = {
    var current = inputUrls
    val urls = Seq.newBuilder[String]
    inputUrls.foreach { url =>
      if (url.contains("\n")) {
        current = current.head.split("\n").toSeq
          .map(_.trim).filter(_.nonEmpty)
        urls ++= current
      } else {
        val v = url.trim
        if (v.nonEmpty) urls += v
      }
    }
    urls.result()
  }

  /** The D2D create (`matchcode/api.py:535-570`): availability-check
    * all URLs (same verbatim error), normalize via [[d2dUrlList]],
    * one input source per URL, queue the `d2d` pipeline with the
    * Java/Javascript/Elf/Go groups. */
  def createD2d(uuid: String, now: Timestamp, inputUrls: Seq[String],
      available: String => Boolean): Either[String, Project] = {
    val errors = inputUrls.filterNot(available)
    if (errors.nonEmpty)
      Left("Could not fetch: " + errors.mkString("\n"))
    else {
      val urls = d2dUrlList(inputUrls)
      val sources = urls.map(u =>
        InputSource(u.substring(u.lastIndexOf('/') + 1), Some(u),
          isUploaded = false))
      Right(Project(uuid, uuid, now, sources,
        Seq(Run("d2d", D2dGroups, taskId = Some(uuid)))))
    }
  }

  /** codebase_resources_summary: status → count (count_group_by). */
  def resourcesSummary(resources: DataFrame): Map[String, Long] =
    resources.groupBy("status").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** discovered_packages_summary: total / with_missing_resources /
    * with_modified_resources, one aggregation pass. */
  def packagesSummary(packages: DataFrame): Map[String, Long] = {
    val r = packages.agg(
      count(lit(1)).as("total"),
      count(when(size(col("missing_resources")) > 0, 1))
        .as("with_missing_resources"),
      count(when(size(col("modified_resources")) > 0, 1))
        .as("with_modified_resources")).head()
    Seq("total", "with_missing_resources", "with_modified_resources")
      .map(k => k -> r.getAs[Long](k)).toMap
  }

  /** discovered_dependencies_summary: total / is_runtime / is_optional
    * / is_pinned, one aggregation pass. */
  def dependenciesSummary(deps: DataFrame): Map[String, Long] = {
    val r = deps.agg(
      count(lit(1)).as("total"),
      count(when(col("is_runtime"), 1)).as("is_runtime"),
      count(when(col("is_optional"), 1)).as("is_optional"),
      count(when(col("is_pinned"), 1)).as("is_pinned")).head()
    Seq("total", "is_runtime", "is_optional", "is_pinned")
      .map(k => k -> r.getAs[Long](k)).toMap
  }

  /** codebase_relations_summary: map_type → count. */
  def relationsSummary(relations: DataFrame): Map[String, Long] =
    relations.groupBy("map_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** D2D codebase_resources_discrepancies: requires-review count. */
  def discrepancies(resources: DataFrame): Map[String, Long] =
    Map("total" ->
      resources.filter(col("status") === "requires-review").count())
}
