package graft.miners

import graft.catalog.{HistoryEntry, PackageRow}

/** S7/X7 — Maven POM → PackageData with parent-ancestry merge
  * (`minecode/collectors/maven.py:136-260`): parse a POM, fetch its
  * parent chain through the injected transport, and fill empty
  * metadata fields from ancestors (oldest first), recording each fill
  * in the package history — the reference's
  * `get_merged_ancestor_package_from_maven_package` flow.
  *
  * Parsing covers the fields the collector consumes (coordinates,
  * parent ref, name, description, url, licenses, organization,
  * properties with `${...}` interpolation); it is not a full Maven
  * model implementation.
  */
object MavenPom {

  val MavenBaseUrl = "https://repo1.maven.org/maven2"

  final case class PomRef(groupId: String, artifactId: String,
      version: String)

  /** `<license>` entry: name, url, comments. */
  final case class PomLicense(name: Option[String], url: Option[String],
      comments: Option[String])

  /** `<scm>` block: connection, developerConnection, url. */
  final case class PomScm(connection: Option[String],
      developerConnection: Option[String], url: Option[String])

  /** `<dependency>` entry: coordinates plus scope (default compile). */
  final case class PomDep(groupId: String, artifactId: String,
      version: Option[String], scope: String)

  final case class Pom(
      groupId: Option[String], artifactId: Option[String],
      version: Option[String], parent: Option[PomRef],
      name: Option[String], description: Option[String],
      url: Option[String], licenses: Seq[(Option[String], Option[String])],
      organizationUrl: Option[String],
      properties: Map[String, String],
      licenseComments: Seq[Option[String]] = Seq.empty,
      scm: Option[PomScm] = None,
      dependencies: Seq[PomDep] = Seq.empty) {
    /** Effective coordinates: missing groupId/version inherit from the
      * parent ref (standard Maven resolution). */
    def effectiveGroupId: Option[String] =
      groupId.orElse(parent.map(_.groupId))
    def effectiveVersion: Option[String] =
      version.orElse(parent.map(_.version))
  }

  private def textOf(n: scala.xml.NodeSeq): Option[String] = {
    val t = n.text.trim
    if (t.isEmpty) None else Some(t)
  }

  def parse(pomText: String): Option[Pom] =
    try {
      val root = scala.xml.XML.loadString(pomText)
      val parent = (root \ "parent") match {
        case p if p.nonEmpty =>
          for {
            g <- textOf(p \ "groupId")
            a <- textOf(p \ "artifactId")
            v <- textOf(p \ "version")
          } yield PomRef(g, a, v)
        case _ => None
      }
      val props = (root \ "properties" \ "_").map { n =>
        n.label -> n.text.trim
      }.toMap
      val pom = Pom(
        groupId = textOf(root \ "groupId"),
        artifactId = textOf(root \ "artifactId"),
        version = textOf(root \ "version"),
        parent = parent,
        name = textOf(root \ "name"),
        description = textOf(root \ "description"),
        url = textOf(root \ "url"),
        licenses = (root \ "licenses" \ "license").map { l =>
          (textOf(l \ "name"), textOf(l \ "url"))
        },
        organizationUrl = textOf(root \ "organization" \ "url"),
        properties = props,
        licenseComments = (root \ "licenses" \ "license").map(l =>
          textOf(l \ "comments")),
        scm = (root \ "scm") match {
          case s if s.nonEmpty => Some(PomScm(
            textOf(s \ "connection"),
            textOf(s \ "developerConnection"),
            textOf(s \ "url")))
          case _ => None
        },
        dependencies = (root \ "dependencies" \ "dependency").flatMap { d =>
          for {
            g <- textOf(d \ "groupId")
            a <- textOf(d \ "artifactId")
          } yield PomDep(g, a, textOf(d \ "version"),
            textOf(d \ "scope").getOrElse("compile"))
        })
      Some(interpolated(pom))
    } catch { case _: Exception => None }

  /** `${property}` interpolation over the string fields, resolving
    * user properties plus the standard project.* / pom.* built-ins. */
  private def interpolated(pom: Pom): Pom = {
    val builtins = Seq(
      "project.groupId" -> pom.effectiveGroupId,
      "pom.groupId" -> pom.effectiveGroupId,
      "groupId" -> pom.effectiveGroupId,
      "project.artifactId" -> pom.artifactId,
      "pom.artifactId" -> pom.artifactId,
      "project.version" -> pom.effectiveVersion,
      "pom.version" -> pom.effectiveVersion,
      "version" -> pom.effectiveVersion,
      "parent.version" -> pom.parent.map(_.version),
      "project.parent.version" -> pom.parent.map(_.version))
      .collect { case (k, Some(v)) => k -> v }
    val table = pom.properties ++ builtins
    def sub(s: String): String =
      "\\$\\{([^}]+)\\}".r.replaceAllIn(s, m =>
        scala.util.matching.Regex.quoteReplacement(
          table.getOrElse(m.group(1), m.matched)))
    def subO(o: Option[String]) = o.map(sub)
    pom.copy(
      groupId = subO(pom.groupId), version = subO(pom.version),
      name = subO(pom.name), description = subO(pom.description),
      url = subO(pom.url),
      licenses = pom.licenses.map { case (n, u) => (subO(n), subO(u)) })
  }

  /** Normalize a POM license (name, url) to a license expression —
    * a small battery over the common public license declarations (the
    * reference delegates full detection to its scan toolchain). */
  def licenseExpression(name: Option[String], url: Option[String])
      : Option[String] = {
    val hay = (name.getOrElse("") + " " + url.getOrElse("")).toLowerCase
    val mapped =
      if (hay.contains("apache") &&
        (hay.contains("2.0") || hay.contains("2,") || hay.contains("v2")))
        Some("apache-2.0")
      else if (hay.contains("license-2.0")) Some("apache-2.0")
      else if (hay.contains("apache")) Some("apache-1.1")
      else if (hay.contains("mit ") || hay.endsWith("mit") ||
        hay.contains("mit license")) Some("mit")
      else if (hay.contains("bsd")) Some("bsd-new")
      else if (hay.contains("lgpl")) Some("lgpl-2.1")
      else if (hay.contains("gpl")) Some("gpl-2.0")
      else if (hay.contains("epl") || hay.contains("eclipse"))
        Some("epl-1.0")
      else if (hay.contains("mpl") || hay.contains("mozilla"))
        Some("mpl-2.0")
      else None
    mapped.orElse(name.map(_.toLowerCase.replaceAll("[^a-z0-9.+-]+", "-")))
  }

  /** POM → PackageRow. Mirrors the parse the reference runs before
    * merging (scancode maven datasource): description is
    * name + "\n" + description when both are present. */
  def toPackage(pomText: String, downloadUrl: Option[String] = None)
      : Option[PackageRow] =
    parse(pomText).flatMap { pom =>
      for {
        g <- pom.effectiveGroupId
        a <- pom.artifactId
        v <- pom.effectiveVersion
      } yield {
        val desc = (pom.name, pom.description) match {
          case (Some(n), Some(d)) => Some(n + "\n" + d)
          case (n, d)             => n.orElse(d)
        }
        val lic = graft.functions.LicenseExpressions.combine(
          pom.licenses.flatMap { case (n, u) => licenseExpression(n, u) })
        PackageRow.minimal(
          downloadUrl.getOrElse(
            s"$MavenBaseUrl/${g.replace('.', '/')}/$a/$v/$a-$v.pom"),
          "maven", a, Some(v))
          .copy(namespace = Some(g),
            primary_language = Some("Java"),
            description = desc,
            homepage_url = pom.url,
            declared_license_expression = lic)
      }
    }

  /** `scm:<tool>:<rest>` connection → SPDX-style vcs URL
    * (`git@host:path` rewritten to https), e.g.
    * `scm:svn:http://svn...` → `svn+http://svn...`. */
  def scmToVcsUrl(connection: String): Option[String] =
    connection.split(":", 3) match {
      case Array("scm", tool, rest0) =>
        val rest =
          if (tool == "git" && rest0.startsWith("git@"))
            "https://" + rest0.stripPrefix("git@").replaceFirst(":", "/")
          else rest0
        Some(s"$tool+$rest")
      case _ => None
    }

  /** POM → full mapped package, the shape the reference's
    * `maven.get_package` produces (pinned by the five
    * `maven/mapper` pom.package.json fixtures): scm-derived
    * vcs/code-view URLs, YAML-rendered license statement with
    * literal-block comments, scoped dependencies, and the
    * sources-classifier source package. */
  def pomPackage(pomText: String): Option[Mappers.MappedPackage] =
    parse(pomText).flatMap { pom =>
      for {
        g <- pom.effectiveGroupId
        a <- pom.artifactId
        v <- pom.effectiveVersion
      } yield {
        val row = toPackage(pomText).get
        val licStmt = {
          val entries = pom.licenses.zipAll(pom.licenseComments, (None, None),
            None).map { case ((n, u), c) =>
            val sb = new StringBuilder("- license:\n")
            n.foreach(x => sb ++= s"    name: $x\n")
            u.foreach(x => sb ++= s"    url: $x\n")
            c.foreach { x =>
              if (x.contains("\n")) {
                sb ++= "    comments: |\n"
                x.linesIterator.foreach(l => sb ++= s"      ${l.trim}\n")
              } else sb ++= s"    comments: $x\n"
            }
            sb.result()
          }
          if (entries.isEmpty) None else Some(entries.mkString)
        }
        val vcs = pom.scm.flatMap(s =>
          s.connection.flatMap(scmToVcsUrl).orElse(s.url))
        // grouped by scope in first-appearance order (the reference
        // keys dependencies by scope), document order within a scope
        val scopeOrder = pom.dependencies.map(_.scope).distinct
        val deps = scopeOrder.flatMap(sc =>
          pom.dependencies.filter(_.scope == sc)).map { d =>
          val (runtime, optional) = d.scope match {
            case "runtime" | "provided" => (true, false)
            case _                      => (false, true)
          }
          graft.catalog.DependencyRow("",
            s"pkg:maven/${d.groupId}/${d.artifactId}" +
              d.version.map("@" + _).getOrElse(""),
            d.version, Some(d.scope), is_runtime = runtime,
            is_optional = optional, is_pinned = d.version.isDefined)
        }
        Mappers.MappedPackage(
          row.copy(declared_license_expression = licStmt),
          Seq.empty, vcs,
          codeViewUrl = pom.scm.flatMap(_.url),
          dependencies = deps,
          sourcePackages = Seq(s"pkg:maven/$g/$a@$v?classifier=sources"))
      }
    }

  /** Fetch the parent POM text, or None when there is no parent
    * (`minecode/collectors/maven.py:162-183`). */
  def fetchParent(pomText: String, transport: Transport,
      baseUrl: String = MavenBaseUrl): Option[String] =
    parse(pomText).flatMap(_.parent).flatMap { p =>
      val gPath = p.groupId.replace('.', '/')
      transport.fetch(
        s"$baseUrl/$gPath/${p.artifactId}/${p.version}/${p.artifactId}-${p.version}.pom")
        .toOption.map(new String(_, "UTF-8"))
    }

  /** The ancestor POM texts of `pomText`, oldest first
    * (`minecode/collectors/maven.py:186-200`). Cyclic parent refs
    * (A⇄B or self-parent in malformed POMs) terminate the walk instead
    * of spinning an executor task forever: already-visited parent
    * coordinates stop the loop, as does a depth cap. */
  def getAncestry(pomText: String, transport: Transport,
      baseUrl: String = MavenBaseUrl): Seq[String] = {
    val MaxDepth = 64
    var ancestors = List.empty[String]
    var cur = pomText
    var continue = true
    val seen = scala.collection.mutable.Set.empty[(String, String, String)]
    parse(cur).flatMap(_.parent).foreach(p =>
      seen += ((p.groupId, p.artifactId, p.version)))
    while (continue && ancestors.length < MaxDepth) {
      fetchParent(cur, transport, baseUrl) match {
        case Some(parentText) =>
          ancestors = parentText :: ancestors // prepend → oldest first
          cur = parentText
          parse(cur).flatMap(_.parent) match {
            case Some(p) =>
              val coords = (p.groupId, p.artifactId, p.version)
              if (seen.contains(coords)) continue = false
              else seen += coords
            case None => continue = false
          }
        case None => continue = false
      }
    }
    ancestors
  }

  /** Merge-able fields from a parent package: fill only when empty on
    * the child, and record the fill in history
    * (`minecode/collectors/maven.py:221-241`). */
  def mergeParent(pkg: PackageRow, parent: PackageRow): PackageRow = {
    var out = pkg
    def note(field: String, from: PackageRow): HistoryEntry =
      HistoryEntry("", s"Field `$field` has been updated using values " +
        s"obtained from the parent POM " +
        s"pkg:maven/${from.namespace.getOrElse("")}/${from.name}@${from.version.getOrElse("")}")
    if (out.declared_license_expression.forall(_.isEmpty) &&
      parent.declared_license_expression.exists(_.nonEmpty))
      out = out.copy(
        declared_license_expression = parent.declared_license_expression,
        history = out.history :+ note("declared_license_expression", parent))
    if (out.homepage_url.forall(_.isEmpty) &&
      parent.homepage_url.exists(_.nonEmpty))
      out = out.copy(homepage_url = parent.homepage_url,
        history = out.history :+ note("homepage_url", parent))
    out
  }

  /** Merge ancestor POMs (oldest first) into the package
    * (`minecode/collectors/maven.py:244-260`). */
  def mergeAncestors(ancestorPomTexts: Seq[String],
      pkg: PackageRow): PackageRow =
    ancestorPomTexts.foldLeft(pkg) { (p, text) =>
      toPackage(text).map(ancestor => mergeParent(p, ancestor)).getOrElse(p)
    }

  /** End-to-end: fetch the package's own POM, walk the ancestry, and
    * return the merged package
    * (`minecode/collectors/maven.py:200-218`). */
  def mergedAncestorPackage(pkg: PackageRow, transport: Transport,
      baseUrl: String = MavenBaseUrl): PackageRow = {
    val g = pkg.namespace.getOrElse(return pkg)
    val v = pkg.version.getOrElse(return pkg)
    val gPath = g.replace('.', '/')
    transport.fetch(
      s"$baseUrl/$gPath/${pkg.name}/$v/${pkg.name}-$v.pom") match {
      case Right(bytes) =>
        val pomText = new String(bytes, "UTF-8")
        mergeAncestors(getAncestry(pomText, transport, baseUrl), pkg)
      case Left(_) => pkg
    }
  }
}
