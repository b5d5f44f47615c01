package graft.miners

import java.sql.Timestamp

import graft.catalog.PackageRow

/** One sha1-index action for [[MavenCrawl.fixPurlValues]] — top-level
  * (not nested in the object) so the Dataset encoder's generated code
  * compiles: Janino's method resolution fails on `Outer$Inner` class
  * names and silently drops the whole stage to interpreted mode. */
private[miners] final case class FixAction(kind: String, pkgUrl: String,
    sha1: String, artNs: String, artName: String, artVer: String,
    artQ: String, artUrl: String, artDate: Option[Timestamp])

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

  /** `get_maven_release_dates` (`minecode/management/commands/
    * get_maven_release_dates.py`): for maven packages missing a
    * release_date whose download lives under repo1.maven.org, fetch
    * the version-directory listing, read the artifact link's listing
    * timestamp, and fill the date in.
    *
    * Scale notes: the reference fetches one page per PACKAGE; this
    * fetches each distinct version directory once inside
    * `mapPartitions` (executor-side transport, like CollectFlow) and
    * joins the (download_url → timestamp) frame back — one shuffle on
    * the page URL, one on download_url. */
  def fillReleaseDates(packages: org.apache.spark.sql.DataFrame,
      transport: Transport): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = packages.sparkSession
    import spark.implicits._

    val target = packages.filter(
      col("ptype") === "maven" && col("release_date").isNull &&
        col("download_url").startsWith("https://repo1.maven.org/maven2"))
    val pages = target
      .select(expr("substring_index(download_url, '/', " +
        "size(split(download_url, '/')) - 1)").as("page_url"))
      .distinct()
    val stamped = pages.as[String].mapPartitions { urls =>
      urls.flatMap { pageUrl =>
        transport.fetch(pageUrl).toOption.toSeq.flatMap { bytes =>
          collectLinksFromText(new String(bytes, "UTF-8"),
            filterForArtifacts)
            .flatMap { case (link, ts) =>
              parseListingTimestamp(ts).map(t => (s"$pageUrl/$link", t))
            }
        }
      }
    }.toDF("download_url", "listing_ts").dropDuplicates("download_url")
    packages.join(stamped, Seq("download_url"), "left")
      .withColumn("release_date",
        when(col("ptype") === "maven" && col("release_date").isNull,
          col("listing_ts")).otherwise(col("release_date")))
      .drop("listing_ts")
  }

  /** `update_maven_package_data` (`minecode/management/commands/
    * update_maven_package_data.py:200-363`) as one distributed diff
    * between the catalog and the freshly-read index packages. Per
    * index artifact, mirroring `update_maven_packages`' control flow
    * exactly:
    *
    *   1. among catalog rows with the same purl coordinates (exact,
    *      then lowercased), IF one carries the index's download_url
    *      it is refreshed (release_date; plus canonicalized
    *      coordinates in the lowercased pass) and its wrong-URL
    *      coordinate-duplicates are deleted;
    *   2. when no coordinate match carries the index URL, the matches
    *      are left untouched (the reference's matcher returns None
    *      and its collected duplicates are discarded);
    *   3. with `createMissing`, an index package whose download_url
    *      exists nowhere in the catalog is created.
    *
    * Scale notes: two coordinate equi-joins with a per-key window
    * flag + one URL anti-join, all hash-partitioned — the reference's
    * row-at-a-time loop with 2000-row flush becomes three shuffles
    * regardless of index size.
    */
  final case class IndexSync(packages: org.apache.spark.sql.DataFrame,
      deleted: org.apache.spark.sql.DataFrame)

  def updateFromIndex(catalog: org.apache.spark.sql.DataFrame,
      index: org.apache.spark.sql.DataFrame,
      createMissing: Boolean): IndexSync = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def key(df: org.apache.spark.sql.DataFrame, lower: Boolean) = {
      def k(c: String) = {
        val v = coalesce(col(c), lit(""))
        if (lower) org.apache.spark.sql.functions.lower(v) else v
      }
      df.withColumn("k_ns", k("namespace")).withColumn("k_name", k("name"))
        .withColumn("k_ver", k("version")).withColumn("k_q", k("qualifiers"))
    }
    val keyCols = Seq("k_ns", "k_name", "k_ver", "k_q")
    def idxSide(lower: Boolean) = key(index, lower).select(
      (keyCols.map(col) :+ col("download_url").as("idx_url") :+
        col("release_date").as("idx_date")) ++
        (if (lower) Seq(col("namespace").as("idx_ns"),
          col("name").as("idx_name"), col("version").as("idx_ver"),
          col("qualifiers").as("idx_q"))
        else Seq.empty): _*)
    val keyWindow = Window.partitionBy(keyCols.map(col): _*)
    val urlHit = col("idx_url").isNotNull &&
      col("download_url") === col("idx_url")
    def withUrlFlag(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("has_url_match",
        max(when(urlHit, 1).otherwise(0)).over(keyWindow))

    val cat = key(catalog.filter(col("ptype") === "maven"), lower = false)
    val nonMaven = catalog.filter(col("ptype") =!= "maven")

    // pass 1: exact coordinates; a group only acts when it contains
    // the index URL
    val j1 = withUrlFlag(cat.join(idxSide(lower = false), keyCols, "left"))
    val exactDeleted = j1.filter(col("has_url_match") === 1 && !urlHit &&
      col("idx_url").isNotNull)
    val exactUpdated = j1.filter(urlHit)
      .withColumn("release_date",
        coalesce(col("idx_date"), col("release_date")))
    val exactCarried = j1.filter(col("idx_url").isNull ||
      col("has_url_match") === 0)
    def dropExact(df: org.apache.spark.sql.DataFrame) =
      df.drop("has_url_match", "idx_url", "idx_date").drop(keyCols: _*)

    // pass 2: lowercased coordinates, only for rows pass 1 did not act
    // on (the reference falls through to the lowercased matcher)
    val j2 = withUrlFlag(key(dropExact(exactCarried), lower = true)
      .join(idxSide(lower = true), keyCols, "left"))
    val lcDeleted = j2.filter(col("has_url_match") === 1 && !urlHit &&
      col("idx_url").isNotNull)
    val lcUpdated = j2.filter(urlHit)
      .withColumn("namespace", col("idx_ns"))
      .withColumn("name", col("idx_name"))
      .withColumn("version", col("idx_ver"))
      .withColumn("qualifiers", col("idx_q"))
      .withColumn("release_date",
        coalesce(col("idx_date"), col("release_date")))
    val lcCarried = j2.filter(col("idx_url").isNull ||
      col("has_url_match") === 0)
    def dropLc(df: org.apache.spark.sql.DataFrame) =
      df.drop("has_url_match", "idx_url", "idx_date", "idx_ns",
        "idx_name", "idx_ver", "idx_q").drop(keyCols: _*)

    val survivors = dropExact(exactUpdated)
      .unionByName(dropLc(lcUpdated))
      .unionByName(dropLc(lcCarried))
      .unionByName(nonMaven)

    // pass 3: creations — an index URL absent from the whole catalog
    // (a same-URL coordinate match would be in the catalog, so the
    // reference's "already exists" skip is the same anti-join)
    val created =
      if (!createMissing) survivors.limit(0)
      else index.join(catalog.select(col("download_url")),
        Seq("download_url"), "left_anti")

    IndexSync(
      if (createMissing)
        survivors.unionByName(created, allowMissingColumns = true)
      else survivors,
      dropExact(exactDeleted).unionByName(dropLc(lcDeleted)))
  }

  /** One sha1-index hit for [[fixPurlValues]] — the fields of the
    * reference's MavenArtifact the repair consumes
    * (`fix_purl_values.py:54-96`; download_url from packagedcode
    * get_urls, release_date from the version-directory listing — both
    * computed by the injected lookup, which is where the reference's
    * live solr/HEAD HTTP lives). */
  final case class FixArtifact(namespace: String, name: String,
      version: String, qualifiers: String, downloadUrl: String,
      releaseDate: Option[Timestamp])

  /** `fix_purl_values` (`packagedb/management/commands/
    * fix_purl_values.py:147-204`) as one distributed pass: repair
    * maven rows against a sha1-keyed index lookup.
    *
    *  - a sha1 with NO index hit deletes its package
    *    (`:158-160`);
    *  - a hit matching the package's own coordinates re-points
    *    download_url/release_date only when the current URL no longer
    *    resolves (`:176-189`);
    *  - a hit matching a maven row CASE-INSENSITIVELY canonicalizes
    *    that row's coordinates and URL and copies the sha1
    *    (`:190-204`; the reference's lookup spells the qualifiers
    *    field `artifact_qualifiers__iexact` — a nonexistent field —
    *    so the intent, qualifiers iexact, is what runs here; the
    *    repository_* url fields it also sets have no counterpart in
    *    this schema).
    *
    * The reference's per-row loop saves as it goes; the batch applies
    * deletes, then self-fixes, then canonicalizations. Lookups and
    * the liveness probe run on executors. Returns
    * (repaired catalog, deleted rows). */
  def fixPurlValues(catalog: org.apache.spark.sql.DataFrame,
      sha1Lookup: String => Seq[FixArtifact],
      urlResolves: String => Boolean)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    val spark = catalog.sparkSession
    import spark.implicits._

    val actions = catalog
      .filter(col("ptype") === "maven" && col("sha1").isNotNull)
      .select("download_url", "sha1", "namespace", "name", "version",
        "qualifiers")
      .as[(String, String, Option[String], String, Option[String],
        Option[String])]
      .mapPartitions(_.flatMap { case (url, sha1, ns, name, ver, q) =>
        val arts = sha1Lookup(sha1)
        if (arts.isEmpty)
          Iterator(FixAction("delete", url, sha1, null, null, null, null,
            null, None))
        else arts.iterator.flatMap { a =>
          val self = ns.getOrElse("") == a.namespace && name == a.name &&
            ver.getOrElse("") == a.version &&
            q.getOrElse("") == a.qualifiers
          if (self) {
            if (urlResolves(url)) None
            else Some(FixAction("self", url, sha1, a.namespace, a.name,
              a.version, a.qualifiers, a.downloadUrl, a.releaseDate))
          } else Some(FixAction("canon", url, sha1, a.namespace, a.name,
            a.version, a.qualifiers, a.downloadUrl, a.releaseDate))
        }
      }).toDF()
      // external lookups must not replay on lineage re-evaluation
      .localCheckpoint(true)

    val deletes = actions.filter(col("kind") === "delete")
      .select(col("pkgUrl").as("download_url"))
    val deletedRows = catalog.join(deletes, Seq("download_url"), "left_semi")
    val afterDelete = catalog.join(deletes, Seq("download_url"), "left_anti")

    val selfFix = actions.filter(col("kind") === "self")
      .select(col("pkgUrl").as("sf_url"), col("artUrl").as("sf_new_url"),
        col("artDate").as("sf_date"))
      .dropDuplicates("sf_url")
    val afterSelf = afterDelete
      .join(selfFix, col("download_url") === col("sf_url"), "left")
      .withColumn("release_date",
        when(col("sf_url").isNotNull,
          coalesce(col("sf_date"), col("release_date")))
          .otherwise(col("release_date")))
      .withColumn("download_url",
        when(col("sf_url").isNotNull, col("sf_new_url"))
          .otherwise(col("download_url")))
      .drop("sf_url", "sf_new_url", "sf_date")

    // one canonicalization per case-insensitive coordinate key (first
    // artifact by URL wins, deterministically)
    import org.apache.spark.sql.expressions.Window
    def lk(c: org.apache.spark.sql.Column) = lower(coalesce(c, lit("")))
    val canon = actions.filter(col("kind") === "canon")
      .withColumn("c_ns", lk(col("artNs"))).withColumn("c_n", lk(col("artName")))
      .withColumn("c_v", lk(col("artVer"))).withColumn("c_q", lk(col("artQ")))
      .withColumn("rn", row_number().over(Window
        .partitionBy("c_ns", "c_n", "c_v", "c_q").orderBy("artUrl", "pkgUrl")))
      .filter(col("rn") === 1)
      .select(col("c_ns"), col("c_n"), col("c_v"), col("c_q"),
        col("artNs"), col("artName"), col("artVer"), col("artQ"),
        col("artUrl"), col("artDate"), col("sha1").as("src_sha1"))
    val repaired = afterSelf
      .withColumn("c_ns", when(col("ptype") === "maven",
        lk(col("namespace"))))
      .withColumn("c_n", when(col("ptype") === "maven", lk(col("name"))))
      .withColumn("c_v", when(col("ptype") === "maven", lk(col("version"))))
      .withColumn("c_q", when(col("ptype") === "maven",
        lk(col("qualifiers"))))
      .join(canon, Seq("c_ns", "c_n", "c_v", "c_q"), "left")
      .withColumn("namespace",
        when(col("artUrl").isNotNull, col("artNs"))
          .otherwise(col("namespace")))
      .withColumn("name",
        when(col("artUrl").isNotNull, col("artName")).otherwise(col("name")))
      .withColumn("version",
        when(col("artUrl").isNotNull, col("artVer"))
          .otherwise(col("version")))
      .withColumn("qualifiers",
        when(col("artUrl").isNotNull, col("artQ"))
          .otherwise(col("qualifiers")))
      .withColumn("release_date",
        when(col("artUrl").isNotNull,
          coalesce(col("artDate"), col("release_date")))
          .otherwise(col("release_date")))
      .withColumn("sha1",
        when(col("artUrl").isNotNull, col("src_sha1"))
          .otherwise(col("sha1")))
      .withColumn("download_url",
        when(col("artUrl").isNotNull, col("artUrl"))
          .otherwise(col("download_url")))
      .drop("c_ns", "c_n", "c_v", "c_q", "artNs", "artName", "artVer",
        "artQ", "artUrl", "artDate", "src_sha1")
    (repaired, deletedRows)
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
