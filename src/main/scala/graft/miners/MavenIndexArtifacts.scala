package graft.miners

import graft.sources.NexusIndexReader

/** Maven nexus-index artifact classification — the reference's
  * `build_artifact` / `is_worthy_artifact` / `get_artifacts`
  * (`minecode/miners/maven.py:388-707`) over the entries produced by
  * [[NexusIndexReader]]. Validated field-for-field against the
  * reference's seven `expected_artifacts*.json` goldens (full,
  * increment and buggy indexes, base and extended field sets).
  *
  * Executor-safe pure functions: the index splits into per-chunk
  * entry streams and these run inside `mapPartitions` on the miners'
  * visit path — no driver-side loops.
  */
object MavenIndexArtifacts {

  final case class Artifact(
      groupId: String, artifactId: String, version: String,
      packaging: Option[String], classifier: Option[String],
      extension: Option[String], lastModified: Option[String],
      size: Option[Long], sha1: Option[String], name: Option[String],
      description: Option[String], srcExist: Boolean, jdocExist: Boolean,
      sigExist: Boolean,
      // extended fields (include_all)
      sha256: Option[String] = None,
      osgi: Map[String, String] = Map.empty,
      classes: Seq[String] = Seq.empty,
      extended: Boolean = false)

  /** Default field set (the reference's `ENTRY_FIELDS`). */
  val entryFields: Set[String] = Set("u", "i", "1", "m", "n", "d")

  /** Optional + ignored fields, for include_all runs. */
  val entryFieldsAll: Set[String] = entryFields ++ Set(
    "c", "sha256", "Bundle-SymbolicName", "Bundle-Version",
    "Bundle-Description", "Bundle-Name", "Bundle-License",
    "Bundle-DocURL", "Require-Bundle",
    "IDXINFO", "DESCRIPTOR", "allGroups", "allGroupsList", "rootGroups",
    "rootGroupsList", "del", "Export-Package", "Export-Service",
    "Import-Package", "px", "gx")

  /** `java_time_ts` (maven.py:529-536): Java epoch-millis → ISO-8601
    * UTC with a `+00:00` offset; fractional seconds only when the
    * millis don't land on a whole second (arrow isoformat behavior,
    * microsecond precision). */
  def javaTimeTs(millis: Long): String = {
    val secs = Math.floorDiv(millis, 1000L)
    val ms = Math.floorMod(millis, 1000L)
    val dt = java.time.LocalDateTime.ofEpochSecond(
      secs, 0, java.time.ZoneOffset.UTC)
    val base = f"${dt.getYear}%04d-${dt.getMonthValue}%02d-" +
      f"${dt.getDayOfMonth}%02d" +
      f"T${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
    val frac = if (ms == 0) "" else f".${ms * 1000}%06d"
    s"$base$frac+00:00"
  }

  private val NA = "NA"
  private val NULL = "null"
  private val PRESENT = "1"

  /** `build_artifact` (maven.py:569-707). */
  def buildArtifact(entry: Map[String, String],
      includeAll: Boolean = false): Option[Artifact] =
    entry.get("u").filter(_.nonEmpty).map { u =>
      val uinfo = u.split("\\|", -1)
      val gid = uinfo(0)
      val aid = uinfo(1)
      val version = uinfo(2)
      val classifier =
        if (uinfo.length > 3 && uinfo(3) != NA) Some(uinfo(3)) else None
      var extension: Option[String] =
        if (uinfo.length > 4) Some(uinfo(4)) else None

      var packaging: Option[String] = None
      var size: Option[Long] = Some(0L) // Python `size = 0` default
      var lastModified: Option[String] = None
      var srcExist = false
      var jdocExist = false
      var sigExist = false

      entry.get("i").filter(_.nonEmpty).foreach { i =>
        val info = i.split("\\|", -1)
        packaging = Some(info(0)).filterNot(p => p == NA || p == NULL)
        val lm = info(1)
        if (lm.nonEmpty && lm.forall(_.isDigit) && lm != "0")
          lastModified = Some(javaTimeTs(lm.toLong))
        size = Some(info(2)).filter(s => s.nonEmpty && s.forall(_.isDigit))
          .map(_.toLong)
        srcExist = info(3) == PRESENT
        jdocExist = info(4) == PRESENT
        extension =
          if (info.length > 6) Some(info(6))
          else if (classifier.isDefined ||
            packaging.exists(Seq("pom", "war", "ear").contains)) packaging
          else Some("jar")
        sigExist = info(5) == PRESENT
      }

      val base = Artifact(gid, aid, version, packaging, classifier,
        extension, lastModified, size, entry.get("1"), entry.get("n"),
        entry.get("d"), srcExist, jdocExist, sigExist)
      if (!includeAll) base
      else base.copy(
        sha256 = entry.get("sha256"),
        osgi = entry.collect {
          case (k, v) if k.startsWith("Bundle-") && v.nonEmpty =>
            k -> v.trim
        },
        classes = entry.get("c").filter(_.nonEmpty)
          .map(_.linesIterator.toSeq).getOrElse(Seq.empty),
        extended = true)
    }

  /** The 13 worthy (packaging, classifier, extension) shapes
    * (maven.py:418-434). */
  private val worthyExtPack: Set[(Option[String], Option[String], Option[String])] =
    Set(
      (Some("jar"), Some("sources"), Some("jar")),
      (Some("jar"), None, Some("jar")),
      (Some("bundle"), None, Some("jar")),
      (Some("war"), None, Some("war")),
      (Some("zip"), Some("source-release"), Some("zip")),
      (Some("maven-plugin"), None, Some("jar")),
      (Some("aar"), None, Some("aar")),
      (Some("jar"), Some("sources-commercial"), Some("jar")),
      (Some("zip"), Some("src"), Some("zip")),
      (Some("tar.gz"), Some("src"), Some("tar.gz")),
      (Some("jar"), None, Some("zip")),
      (Some("zip"), Some("project-src"), Some("zip")),
      (Some("jar"), Some("src"), Some("jar")))

  /** `is_worthy_artifact` (maven.py:388-441). */
  def isWorthyArtifact(a: Artifact): Boolean =
    a.version != "archetypes" &&
      worthyExtPack.contains((a.packaging, a.classifier, a.extension))

  /** `is_source` (maven.py:444-446). */
  def isSource(classifier: Option[String]): Boolean =
    classifier.exists(c => c.contains("source") || c.contains("src"))

  /** `get_artifacts` (maven.py:514-529) over a gzipped index. */
  def getArtifacts(gzBytes: Array[Byte],
      fields: Set[String] = entryFields,
      worthiness: Artifact => Boolean = isWorthyArtifact,
      includeAll: Boolean = false): Iterator[Artifact] =
    NexusIndexReader.readGzippedEntries(gzBytes, fields)
      .flatMap(buildArtifact(_, includeAll))
      .filter(worthiness)

  /** `build_url_and_filename` (maven.py:540-566): the canonical repo1
    * download URL + file name for an artifact's coordinates. */
  def buildUrlAndFilename(groupId: String, artifactId: String,
      version: String, extension: String, classifier: Option[String],
      baseRepoUrl: String = "https://repo1.maven.org/maven2")
      : (String, String) = {
    val fileName =
      s"$artifactId-$version${classifier.fold("")("-" + _)}.$extension"
    val gPath = groupId.replace('.', '/')
    (s"$baseRepoUrl/$gPath/$artifactId/$version/$fileName", fileName)
  }

  /** `build_maven_xml_url` (maven.py:568-576). */
  def buildMavenXmlUrl(groupId: String, artifactId: String): String = {
    val gPath = groupId.replace('.', '/')
    s"https://repo1.maven.org/maven2/$gPath/$artifactId/maven-metadata.xml"
  }

  /** purl qualifiers for an index artifact (maven.py:172-180): a
    * non-jar extension becomes `type`, a classifier stays
    * `classifier`; rendered sorted like normalize_qualifiers. */
  def purlQualifiers(a: Artifact): Option[String] = {
    val quals =
      a.extension.filter(_ != "jar").map("type" -> _).toSeq ++
        a.classifier.map("classifier" -> _).toSeq
    if (quals.isEmpty) None
    else Some(quals.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("&"))
  }

  /** `get_mini_package` (maven.py:989-1032): the minimal catalog row
    * an index artifact carries — coordinates, description, download
    * URL, release date, size, sha1. */
  def miniPackageWithUrl(a: Artifact, downloadUrl: String)
      : graft.catalog.PackageRow =
    graft.catalog.PackageRow.minimal(downloadUrl, "maven",
      a.artifactId, Some(a.version))
      .copy(
        namespace = Some(a.groupId),
        qualifiers = purlQualifiers(a),
        description = a.description,
        size = a.size,
        sha1 = a.sha1,
        release_date = a.lastModified.flatMap(lm =>
          scala.util.Try(java.sql.Timestamp.valueOf(
            lm.take(10) + " 00:00:00")).toOption))

  def miniPackage(a: Artifact): Option[graft.catalog.PackageRow] =
    a.extension.map { ext =>
      val (downloadUrl, _) = buildUrlAndFilename(
        a.groupId, a.artifactId, a.version, ext, a.classifier)
      miniPackageWithUrl(a, downloadUrl)
    }

  /** `MavenNexusIndexVisitor.get_uris` (maven.py:144-255, goldens
    * `maven/index/expected_uris.json` + increment/buggy): per worthy
    * artifact, the pre-visited `maven-index://` URI carrying the
    * serialized artifact + its real download URL, then the to-visit
    * POM URI at mining level 20. */
  def nexusIndexUris(gzBytes: Array[Byte], sourceUri: String)
      : Iterator[graft.miners.RegistryVisitors.VisitedUri] = {
    import graft.miners.RegistryVisitors.VisitedUri
    import org.json4s._
    getArtifacts(gzBytes)
      .filter(a => a.groupId.nonEmpty && a.artifactId.nonEmpty &&
        a.version.nonEmpty && a.extension.nonEmpty)
      .flatMap { a =>
        val ext = a.extension.get
        val purlQuals = purlQualifiers(a).fold("")("?" + _)
        val purl =
          s"pkg:maven/${a.groupId}/${a.artifactId}@${a.version}$purlQuals"
        val purlPlain = s"pkg:maven/${a.groupId}/${a.artifactId}@${a.version}"
        val (jarUrl, fileName) = buildUrlAndFilename(
          a.groupId, a.artifactId, a.version, ext, a.classifier)
        val gPath = a.groupId.replace('.', '/')
        val mockUri = "maven-index://repo1.maven.org/" +
          s"$gPath/${a.artifactId}/${a.version}/$fileName"
        def js(v: Option[String]): JValue = v.map(JString).getOrElse(JNull)
        // the reference's artifact.to_dict() key order + download_url
        val data = org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(JObject(List(
            "group_id" -> JString(a.groupId),
            "artifact_id" -> JString(a.artifactId),
            "version" -> JString(a.version),
            "packaging" -> js(a.packaging),
            "classifier" -> js(a.classifier),
            "extension" -> js(a.extension),
            "last_modified" -> js(a.lastModified),
            "size" -> a.size.map(s => JInt(BigInt(s)): JValue)
              .getOrElse(JNull),
            "sha1" -> js(a.sha1),
            "name" -> js(a.name),
            "description" -> js(a.description),
            "src_exist" -> JBool(a.srcExist),
            "jdoc_exist" -> JBool(a.jdocExist),
            "sig_exist" -> JBool(a.sigExist),
            "download_url" -> JString(jarUrl)))))
        val (pomUrl, pomName) = buildUrlAndFilename(
          a.groupId, a.artifactId, a.version, "pom", None)
        Iterator(
          VisitedUri(uri = mockUri, sourceUri = sourceUri,
            packageUrl = Some(purl), data = Some(data), visited = true,
            fileName = Some(fileName), size = a.size, sha1 = a.sha1,
            date = a.lastModified),
          VisitedUri(uri = pomUrl, sourceUri = sourceUri,
            packageUrl = Some(purlPlain), fileName = Some(pomName),
            size = Some(0L), date = a.lastModified))
      }
  }

  /** An index artifact round-tripped through the frontier's
    * `maven-index://` URI data payload (maven.py:989-1005: the
    * serialized artifact dict plus its `download_url`). */
  def miniPackageFromIndexData(json: String)
      : Option[graft.catalog.PackageRow] = {
    import org.json4s._
    val root = org.json4s.jackson.JsonMethods.parse(json)
    def s(f: String): Option[String] = root \ f match {
      case JString(v) => Some(v); case _ => None
    }
    for {
      g <- s("group_id"); a <- s("artifact_id"); v <- s("version")
      url <- s("download_url")
    } yield miniPackageWithUrl(
      Artifact(g, a, v, s("packaging"), s("classifier"), s("extension"),
        s("last_modified"),
        root \ "size" match { case JInt(n) => Some(n.toLong); case _ => None },
        s("sha1"), s("name"), s("description"),
        (root \ "src_exist") == JBool(true),
        (root \ "jdoc_exist") == JBool(true),
        (root \ "sig_exist") == JBool(true)),
      url)
  }

  /** The index visit+map flow end-to-end
    * (`test_MavenNexusIndexVisitor_with_run_visit_then_map_end2end`,
    * golden `maven/end2end/expected_mapped_packages.json`): worthy
    * artifacts with full coordinates become mini packages. */
  def indexPackages(gzBytes: Array[Byte])
      : Iterator[graft.catalog.PackageRow] =
    getArtifacts(gzBytes)
      .filter(a => a.groupId.nonEmpty && a.artifactId.nonEmpty &&
        a.version.nonEmpty && a.extension.nonEmpty)
      .flatMap(miniPackage)
}
