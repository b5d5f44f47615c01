package graft.miners

import java.sql.Timestamp

import graft.catalog.PackageRow

/** Maven repository directory crawl + import queue
  * (`minecode/collectors/maven.py:576-845`,
  * `minecode/management/commands/import_queue.py:109-170`): parse the
  * four directory-listing HTML flavors (repo1/apache, jboss nexus,
  * spring, gradle-plugins), filter version directories vs artifact
  * files, resolve classifiers and .sha1 side files, and map one
  * package page into catalog rows — one per (version, artifact).
  *
  * Pure per-page parsing (executor closures); the crawl frontier and
  * the import queue are the Spark side ([[graft.streaming.Frontier]] /
  * [[graft.streaming.Queues]]).
  */
object MavenCrawl {

  // the four listing formats, tried in order (`maven.py:676-728`)
  private val ApachePattern =
    """<a href="([^"]+)"[^>]*>[^<]*</a>\s+(\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}|-)""".r
  private val JbossApachePattern =
    ("""<a href="([^"]+)"[^>]*>[^<]*</a></td>\s*<td>\s*((?:[A-Z][a-z]{2}\s+""" +
      """[A-Z][a-z]{2}\s+\d{1,2}\s+\d{2}:\d{2}:\d{2}\s+(?:UTC|Z)\s+\d{4})""" +
      """|&nbsp;)\s*</td>""").r
  private val SpringPattern =
    """<a href="([^"]+)"[^>]*>[^<]*</a>\s+(\d{2}-[A-Z][a-z]{2}-\d{4}\s+\d{2}:\d{2})""".r
  private val GradlePattern =
    """<pre><a href="([^"]+)"[^>]*>[^<]*</a></pre>""".r

  /** All link hrefs + timestamps from a listing page, first matching
    * format wins (`collect_links_and_artifact_timestamps`). */
  def collectLinksAndTimestamps(text: String): Seq[(String, String)] = {
    val apache = ApachePattern.findAllMatchIn(text)
      .map(m => (m.group(1), m.group(2))).toSeq
    if (apache.nonEmpty) return apache
    val jboss = JbossApachePattern.findAllMatchIn(text)
      .map(m => (m.group(1),
        if (m.group(2) == "&nbsp;") "" else m.group(2))).toSeq
    if (jboss.nonEmpty) return jboss
    val spring = SpringPattern.findAllMatchIn(text)
      .map(m => (m.group(1), m.group(2))).toSeq
    if (spring.nonEmpty) return spring
    GradlePattern.findAllMatchIn(text).map(_.group(1))
      .filter(h => h != "../" && !h.startsWith(".."))
      .map(h => (h, "")).toSeq
  }

  /** Keep only directory links (trailing "/", not the parent). */
  def filterOnlyDirectories(links: Seq[(String, String)])
      : Seq[(String, String)] =
    links.filter { case (l, _) => l != "../" && l.endsWith("/") }

  /** Extensions that are installable artifacts (`maven.py:628-645`;
    * poms deliberately excluded). */
  val ValidArtifactExtensions: Seq[String] = Seq("ejb3", "ear", "aar",
    "apk", "gem", "jar", "nar", "so", "swc", "tar", "tar.gz", "war",
    "xar", "zip")

  /** Keep only artifact links whose extension is installable. */
  def filterForArtifacts(links: Seq[(String, String)])
      : Seq[(String, String)] =
    links.filter { case (l, _) =>
      ValidArtifactExtensions.exists(ext => l.endsWith(ext))
    }

  /** Parse + filter + normalize ("-" timestamps → empty), preserving
    * page order (`collect_links_from_text`). */
  def collectLinksFromText(text: String,
      filter: Seq[(String, String)] => Seq[(String, String)])
      : Seq[(String, String)] =
    filter(collectLinksAndTimestamps(text).map { case (l, t) =>
      (l, if (t == "-") "" else t)
    })

  /** Rebase relative links onto the page URL
    * (`create_absolute_urls_for_links`). */
  def absoluteUrls(text: String, url: String,
      filter: Seq[(String, String)] => Seq[(String, String)])
      : Seq[(String, String)] = {
    val base = url.stripSuffix("/")
    collectLinksFromText(text, filter).map { case (l, t) =>
      val abs =
        if (l.startsWith("http:") || l.startsWith("https:")) l
        else s"$base/$l"
      (abs, t)
    }
  }

  /** Classifier from an artifact filename
    * (`get_classifier_from_artifact_url`): whatever sits between
    * "{name}-{version}" and the extension, sans the leading dash. */
  def classifierFromArtifactUrl(artifactUrl: String, name: String,
      version: String): Option[String] = {
    val filename = artifactUrl.split('/').last
    val remaining = filename.replace(s"$name-$version", "")
    remaining.split('.').headOption.filter(_.nonEmpty)
      .map(_.stripPrefix("-")).filter(_.nonEmpty)
  }

  /** Fetch + validate an artifact's .sha1 side file
    * (`get_artifact_sha1`). */
  def artifactSha1(artifactUrl: String,
      transport: Transport): Option[String] =
    transport.fetch(s"$artifactUrl.sha1").toOption.flatMap { b =>
      new String(b, "UTF-8").trim.split("\\s+").headOption
        .map(_.toLowerCase)
        .filter(_.matches("[0-9a-f]{40}"))
    }

  /** Namespace/name/version from a repo URL
    * (`determine_namespace_name_version_from_url`): walk the path
    * segments below the root; the injected `pageKind` classifies each
    * prefix as "package", "version", or namespace (the reference
    * fetches each prefix page to decide). */
  def determineNamespaceNameVersion(url: String, rootUrl: String,
      pageKind: String => String): (String, String, String) = {
    val remaining = url.split(java.util.regex.Pattern.quote(rootUrl), 2)
      .last.split("/").filter(_.nonEmpty)
    var name = ""
    var version = ""
    val namespace = Seq.newBuilder[String]
    var i = 0
    while (i < remaining.length) {
      val prefix = s"$rootUrl/${remaining.take(i + 1).mkString("/")}"
      pageKind(prefix) match {
        case "package" => name = remaining(i)
        case "version" => version = remaining(i)
        case _         => namespace += remaining(i)
      }
      i += 1
    }
    (namespace.result().mkString("."), name, version)
  }

  private val ListingTs =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
  private val SpringTs = java.time.format.DateTimeFormatter
    .ofPattern("dd-MMM-yyyy HH:mm", java.util.Locale.ENGLISH)
  private val NexusTs = java.time.format.DateTimeFormatter
    .ofPattern("EEE MMM d HH:mm:ss zzz yyyy", java.util.Locale.ENGLISH)

  /** Lenient parse of the three listing timestamp formats. */
  def parseListingTimestamp(s: String): Option[Timestamp] = {
    val t = s.trim
    if (t.isEmpty) return None
    def attempt(f: => Timestamp): Option[Timestamp] =
      try Some(f) catch { case _: Exception => None }
    attempt(Timestamp.valueOf(
        java.time.LocalDateTime.parse(t, ListingTs)))
      .orElse(attempt(Timestamp.valueOf(
        java.time.LocalDateTime.parse(t, SpringTs))))
      .orElse(attempt(Timestamp.from(java.time.ZonedDateTime
        .parse(t.replace(" Z ", " UTC "), NexusTs).toInstant)))
  }

  /** `import_queue.process_request`: one package page → catalog rows.
    * The page's directory links are version directories; each version
    * page's artifact links become one PackageRow each, with classifier
    * qualifiers and the .sha1 side file. */
  def importPackagePage(uri: String, data: String, namespace: String,
      name: String, transport: Transport)
      : Either[String, Seq[PackageRow]] = {
    val pageUrl = uri.stripSuffix("/")
    val versions = collectLinksFromText(data, filterOnlyDirectories)
    val rows = Seq.newBuilder[PackageRow]
    versions.foreach { case (dirLink, _) =>
      val version = dirLink.stripSuffix("/")
      val versionUrl = s"$pageUrl/$version"
      transport.fetch(versionUrl) match {
        case Left(e) => return Left(s"$versionUrl: $e")
        case Right(bytes) =>
          val artifacts = absoluteUrls(new String(bytes, "UTF-8"),
            versionUrl, filterForArtifacts)
          artifacts.foreach { case (artifactUrl, ts) =>
            val classifier =
              classifierFromArtifactUrl(artifactUrl, name, version)
            rows += PackageRow.minimal(artifactUrl, "maven", name,
              Some(version), CollectFlow.CollectMiningLevel)
              .copy(
                namespace = Some(namespace).filter(_.nonEmpty),
                qualifiers = classifier.map(c => s"classifier=$c"),
                sha1 = artifactSha1(artifactUrl, transport),
                release_date = parseListingTimestamp(ts))
          }
      }
    }
    Right(rows.result())
  }
}
