package graft.miners

import graft.catalog.{DependencyRow, PackageRow, PartyRow}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Package mappers — the map side of the reference's miners: a
  * visited payload (registry JSON / package page HTML) becomes full
  * package records. Mirrors `minecode/miners/packagist.py` and
  * `minecode/miners/cran.py` build_packages, golden-tested against
  * their `mapper_*_expected.json` fixtures.
  */
object Mappers {

  /** A mapped package: the catalog row plus its parties and the VCS
    * url (carried separately — the catalog schema keeps parties in
    * their own table and has no vcs column). */
  final case class MappedPackage(row: PackageRow, parties: Seq[PartyRow],
      vcsUrl: Option[String],
      codeViewUrl: Option[String] = None,
      bugTrackingUrl: Option[String] = None,
      dependencies: Seq[DependencyRow] = Seq.empty,
      sourcePackages: Seq[String] = Seq.empty)

  /** Dependency with the reference DependentPackage defaults
    * (runtime, non-optional, unpinned). */
  private[miners] def dep(purl: String,
      requirement: Option[String] = None,
      scope: Option[String] = None): DependencyRow =
    DependencyRow("", purl, requirement, scope,
      is_runtime = true, is_optional = false, is_pinned = false)

  private def str(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s)
    case _                        => None
  }

  // ----------------------------------------------------------- packagist

  /** Packagist `p/{vendor}/{package}.json`
    * (`minecode/miners/packagist.py:80-140`): one package per version
    * with dist url+sha1, git source as vcs, authors as parties, and
    * the license union. The composer `name` keeps its vendor prefix. */
  def packagistPackages(json: String): Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    (root \ "package") match {
      case pkg: JObject =>
        val language = str(pkg \ "language")
        (pkg \ "versions") match {
          case JObject(versions) => versions.map { case (_, v) =>
            val name = str(v \ "name").getOrElse("")
            val downloadUrl = str(v \ "dist" \ "url")
            val sha1 = str(v \ "dist" \ "shasum")
            val vcs = (str(v \ "source" \ "type"), str(v \ "source" \ "url")) match {
              case (Some("git"), Some(u)) => Some(s"git+$u")
              case _                      => None
            }
            val keywords = (v \ "keywords") match {
              case JArray(ks) => ks.flatMap(str)
              case _          => Seq.empty
            }
            val licenses = (v \ "license") match {
              case JArray(ls) => ls.flatMap(str).distinct
              case _          => Seq.empty
            }
            val parties = (v \ "authors") match {
              case JArray(as) => as.map { a =>
                PartyRow(downloadUrl.getOrElse(""), "person", Some("author"),
                  str(a \ "name"), str(a \ "email"), str(a \ "homepage"))
              }
              case _ => Seq.empty
            }
            MappedPackage(
              PackageRow.minimal(downloadUrl.getOrElse(""), "composer", name,
                str(v \ "version"))
                .copy(
                  description = str(v \ "description"),
                  primary_language = language,
                  keywords = keywords,
                  homepage_url = str(v \ "homepage"),
                  declared_license_expression =
                    if (licenses.isEmpty) None else Some(licenses.mkString("\n")),
                  sha1 = sha1),
              parties, vcs)
          }
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
  }

  // -------------------------------------------------------------- github

  /** GitHub repo record (as the single-repo visitor dumps it) →
    * packages (`minecode/miners/github.py:214-295`): one per download,
    * per tag tarball AND zipball, and per branch download URL. The
    * reference wraps `git_url` in a 1-tuple before formatting, so its
    * expected vcs_url reads `git+('<url>',)` — reproduced verbatim
    * since its own fixtures assert it. */
  def githubPackages(json: String): Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    val fullName = str(root \ "full_name").getOrElse("")
    val (namespace, name) = fullName.split("/", 2) match {
      case Array(ns, n) => (Some(ns), n)
      case _            => (None, fullName)
    }
    val vcs = Some(s"git+('${str(root \ "git_url").getOrElse("")}',)")
    val owner = str(root \ "owner").map(o =>
      PartyRow("", "person", Some("owner"), Some(o), None, None))
    def base(downloadUrl: String): PackageRow =
      PackageRow.minimal(downloadUrl, "github", name)
        .copy(namespace = namespace,
          description = str(root \ "description"),
          primary_language = str(root \ "language"),
          homepage_url = str(root \ "html_url"),
          size = (root \ "size") match {
            case JInt(n) => Some(n.toLong); case _ => None
          })
    val downloads = (root \ "downloads") match {
      case JArray(ds) => ds.flatMap { d =>
        str(d \ "html_url").map { u =>
          MappedPackage(base(u).copy(
            size = (d \ "size") match {
              case JInt(n) => Some(n.toLong); case _ => None
            },
            release_date = str(d \ "created_at").flatMap(s =>
              scala.util.Try(java.sql.Timestamp.valueOf(
                s.replace("T", " ").take(19))).toOption)),
            owner.toSeq, vcs)
        }
      }
      case _ => Seq.empty
    }
    val tags = (root \ "tags") match {
      case JArray(ts) => ts.flatMap { t =>
        val version = str(t \ "name")
        val sha1 = str(t \ "sha1")
        Seq("tarball_url", "zipball_url").flatMap(k =>
          str(t \ k).map(u =>
            MappedPackage(base(u).copy(version = version, sha1 = sha1),
              owner.toSeq, vcs)))
      }
      case _ => Seq.empty
    }
    val branches = (root \ "branches_download_urls") match {
      case JArray(bs) => bs.flatMap(str).map(u =>
        MappedPackage(base(u), owner.toSeq, vcs))
      case _ => Seq.empty
    }
    downloads ++ tags ++ branches
  }

  // -------------------------------------------------------------- golang

  /** godoc record + purl → one package
    * (`minecode/miners/golang.py:222-240`): homepage from the import
    * path, vcs from the purl's `vcs_repository` qualifier (git-tagged
    * only for github namespaces), synopsis as description. */
  def golangPackage(recordJson: String, purl: String): Option[MappedPackage] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) None
    else {
      val (ptype, namespace, name) = (parsed(0), Option(parsed(1)), parsed(2))
      val qualifiers = graft.functions.PurlParse.parseQualifiers(purl)
      val vcsRepo = qualifiers.get("vcs_repository")
      val vcs =
        if (namespace.exists(_.contains("github.com")))
          vcsRepo.map(u => s"git+$u")
        else vcsRepo
      val record = JsonMethods.parse(recordJson)
      Some(MappedPackage(
        PackageRow.minimal("", ptype, name)
          .copy(namespace = namespace,
            primary_language = Some("Go"),
            description = str(record \ "synopsis"),
            homepage_url = Some(
              "https://" + (namespace.toSeq :+ name).mkString("/"))),
        Seq.empty, vcs))
    }
  }

  // --------------------------------------------------------------- nuget

  /** NuGet package-page HTML → one package per listed version
    * (`minecode/miners/nuget.py:267-328`, golden
    * `nuget/nuget_mapper_log4net_expected.json`): name from the h1
    * text node, license from the outbound-license-url anchor text,
    * copyright from the paragraph after the Copyright h2, description
    * from the og:description meta, one version per anchor inside the
    * no-border version-history tbodys, download at the v2 package
    * endpoint, homepage = the page URI. */
  def nugetHtmlPackages(html: String, uri: String): Seq[MappedPackage] = {
    val H1Rx = "(?s)<h1[^>]*>\\s*([^<]*?)\\s*<".r
    val LicRx =
      "(?s)<a\\b[^>]*data-track=\"outbound-license-url\"[^>]*>\\s*([^<]*?)\\s*</a>".r
    val CopyRx = "(?s)<h2>Copyright</h2>\\s*<p>([^<]*)</p>".r
    val DescRx = "property=\"og:description\" content=\"([^\"]*)\"".r
    val TbodyRx = "(?s)<tbody class=\"no-border[^\"]*\"[^>]*>(.*?)</tbody>".r
    val VerRx = "(?s)<a [^>]*>\\s*([^<\\s][^<]*?)\\s*</a>".r

    H1Rx.findFirstMatchIn(html).map(_.group(1)).filter(_.nonEmpty)
      .toSeq.flatMap { name =>
        val license = LicRx.findAllMatchIn(html).toSeq.lastOption
          .map(_.group(1)).filter(_.nonEmpty)
        val copyright = CopyRx.findFirstMatchIn(html).map(_.group(1).trim)
        val description = DescRx.findFirstMatchIn(html)
          .map(m => decodeEntities(m.group(1)))
        TbodyRx.findAllMatchIn(html).flatMap(tb =>
          VerRx.findAllMatchIn(tb.group(1)).map(_.group(1))).toSeq
          .map { version =>
            MappedPackage(
              PackageRow.minimal(
                s"https://www.nuget.org/api/v2/package/$name/$version",
                "nuget", name, Some(version))
                .copy(
                  description = description,
                  homepage_url = Some(uri),
                  declared_license_expression = license,
                  copyright = copyright),
              Seq.empty, vcsUrl = None)
          }
      }
  }

  /** Bower bower.json → one package
    * (`minecode/miners/bower.py:105-198`, goldens
    * `bower/expected_28msec_bower.json`,
    * `expected_mapper_example1_bower.json`): a scalar `author` or
    * "label: name" entries in `authors` become author parties, the
    * repository type+url joins as the SPDX-style vcs URL, `licenses`
    * serialize as the "- X\n" statement list. Bare dependency names
    * are not valid purls and are dropped, exactly as the reference's
    * goldens record empty dependency lists. */
  def bowerPackages(json: String, uri: String): Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    str(root \ "name").toSeq.map { name =>
      val vcs = (str(root \ "repository" \ "type"),
        str(root \ "repository" \ "url")) match {
        case (Some(t), Some(u)) => Some(s"$t+$u")
        case _                  => None
      }
      val licenseStmt = ((root \ "licenses") match {
        case JArray(ls) => ls.flatMap(str)
        case JString(l) => Seq(l)
        case _          => Seq.empty
      }) match {
        case Seq()   => None
        case entries => Some(entries.map(l => s"- $l\n").mkString)
      }
      val parties = str(root \ "author") match {
        case Some(author) =>
          Seq(PartyRow("", "person", Some("author"), Some(author), None, None))
        case None => (root \ "authors") match {
          case JArray(as) => as.flatMap(str).flatMap { a =>
            a.split(":").toSeq match {
              case parts if parts.size > 1 =>
                Some(PartyRow("", "person", Some("author"),
                  Some(parts(1).trim), None, None))
              case _ => None
            }
          }
          case _ => Seq.empty
        }
      }
      val keywords = (root \ "keywords") match {
        case JArray(ks) => ks.flatMap(str); case _ => Seq.empty
      }
      MappedPackage(
        PackageRow.minimal("", "bower", name, str(root \ "version"))
          .copy(
            description = str(root \ "description"),
            homepage_url = str(root \ "homepage"),
            declared_license_expression = licenseStmt,
            keywords = keywords),
        parties, vcsUrl = vcs)
    }
  }

  /** NuGet catalog-entry JSON → one package
    * (`minecode/miners/nuget.py:183-225`): summary+description joined
    * (suppressed when identical), comma-split authors, tags as
    * keywords, licenseUrl as the license statement, copyright kept. */
  def nugetPackage(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "id").map { id =>
      val shortDesc = str(m \ "summary")
      val longDesc0 = str(m \ "description")
      val longDesc = if (longDesc0 == shortDesc) None else longDesc0
      val description = Seq(shortDesc, longDesc).flatten
        .map(_.trim).filter(_.nonEmpty)
      val downloadUrl = str(m \ "packageContent")
      val parties = str(m \ "authors").toSeq.flatMap(_.split(",").toSeq)
        .map(n => PartyRow(downloadUrl.getOrElse(""), "person",
          Some("author"), Some(n.trim), None, None))
      val keywords = (m \ "tags") match {
        case JArray(ts) => ts.flatMap(str)
        case JString(t) => Seq(t)
        case _          => Seq.empty
      }
      MappedPackage(
        PackageRow.minimal(downloadUrl.getOrElse(""), "nuget", id,
          str(m \ "version"))
          .copy(
            description =
              if (description.isEmpty) None else Some(description.mkString("\n")),
            homepage_url = str(m \ "projectUrl"),
            declared_license_expression = str(m \ "licenseExpression")
              .orElse(str(m \ "licenseUrl")),
            copyright = str(m \ "copyright"),
            keywords = keywords),
        parties, None)
    }
  }

  // ---------------------------------------------------------------- cran

  private val CranUrl = "https://cloud.r-project.org/"

  /** Decode the HTML entities CRAN pages use (hex/decimal numeric
    * references plus the handful of named ones in the fixtures). */
  private[miners] def decodeEntities(s: String): String = {
    val numeric = """&#x([0-9a-fA-F]+);|&#(\d+);""".r
    val afterNumeric = numeric.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        Option(m.group(1)).map(h => Integer.parseInt(h, 16))
          .getOrElse(m.group(2).toInt).toChar.toString))
    afterNumeric
      .replace("&nbsp;", " ").replace("&ge;", "≥")
      .replace("&le;", "≤")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      // `&amp;` decodes LAST: doing it earlier would turn already-escaped
      // text like `&amp;lt;` into `&lt;` and then into `<`, double-decoding
      // what the page encoded as the literal string "&lt;".
      .replace("&amp;", "&")
  }

  private val TrRx = """(?s)<tr>\s*(.*?)\s*</tr>""".r
  private val TdRx = """(?s)<td[^>]*>(.*?)</td>""".r
  private val ARx = """(?s)<a\s+href="([^"]+)"[^>]*>""".r
  private val TagRx = """(?s)<[^>]+>""".r
  private val PRx = """(?s)<p>\s*(.*?)\s*</p>""".r

  private def cellText(cell: String): String =
    decodeEntities(TagRx.replaceAllIn(cell, "")).trim

  /** CRAN package page HTML → packages, one per download location
    * (`minecode/miners/cran.py:92-210`): version/license/URL/author/
    * maintainer/published from the summary table, downloads from the
    * "source"/"binaries" rows (hrefs rebased onto the CRAN root), a
    * trailing row for the archive link. */
  def cranPackagesFromHtml(html: String, uri: String): Seq[MappedPackage] = {
    val name = {
      val parent = uri.substring(0, uri.lastIndexOf('/'))
      parent.substring(parent.lastIndexOf('/') + 1)
    }
    val description = PRx.findFirstMatchIn(html).map(m => cellText(m.group(1)))
    var version: Option[String] = None
    var homepage: Option[String] = None
    var releaseDate: Option[java.sql.Timestamp] = None
    val licenses = Seq.newBuilder[String]
    val parties = Seq.newBuilder[PartyRow]
    val downloads = Seq.newBuilder[String]
    TrRx.findAllMatchIn(html).foreach { tr =>
      val cells = TdRx.findAllMatchIn(tr.group(1)).map(_.group(1)).toSeq
      if (cells.size >= 2) {
        val key = cellText(cells.head).replace(' ', ' ')
        val value = cellText(cells(1))
        val hrefs = ARx.findAllMatchIn(cells(1)).map(_.group(1).trim).toSeq
        key match {
          case "Version:" => version = Some(value)
          case "URL:" =>
            homepage = if (hrefs.nonEmpty) Some(hrefs.mkString("\n"))
              else Some(value)
          case "License:" => licenses ++= hrefs
          case "Author:" =>
            parties += PartyRow("", "person", Some("author"), Some(value),
              None, None)
          case "Maintainer:" =>
            value.split("<").toSeq match {
              case Seq(n, e) =>
                parties += PartyRow("", "person", Some("maintainer"),
                  Some(n.trim),
                  Some(e.replace(">", "").replace(" at ", "@").trim), None)
              case _ =>
            }
          case "Published:" =>
            releaseDate = scala.util.Try(
              java.sql.Timestamp.valueOf(s"$value 00:00:00")).toOption
          case k if k.contains("source") || k.contains("binaries") =>
            downloads ++= hrefs.map(_.replace("../../../", CranUrl))
          case _ =>
        }
      }
    }
    val licenseExpr = {
      val ls = licenses.result()
      if (ls.isEmpty) None else Some(ls.mkString("\n"))
    }
    downloads.result().map { dl =>
      MappedPackage(
        PackageRow.minimal(dl, "cran", name, version)
          .copy(description = description, homepage_url = homepage,
            declared_license_expression = licenseExpr,
            release_date = releaseDate),
        parties.result().map(_.copy(download_url = dl)), None)
    }
  }

  /** `Name <email>` split (reference `minecode/debutils.py`
    * parse_email). */
  private[miners] def parseEmail(s: String): (Option[String], Option[String]) = {
    val m = """^([^<]*)<([^>]*)>""".r.findFirstMatchIn(s)
    m match {
      case Some(g) =>
        (Some(g.group(1).trim).filter(_.nonEmpty),
          Some(g.group(2).trim).filter(_.nonEmpty))
      case None => (Some(s.trim).filter(_.nonEmpty), None)
    }
  }

  // ------------------------------------------------------------- freebsd

  /** packagesite.yaml content — one JSON object per line
    * (`minecode/miners/freebsd.py:97-120` feeding packagedcode's
    * CompactManifestHandler): name/version/arch/origin, categories as
    * keywords, maintainer party, `www` homepage; download under
    * `https://pkg.freebsd.org/{arch}/latest/{path}`, ports svnweb as
    * code view, and the license dict rendered Python-repr style, as
    * the reference fixtures pin it. */
  def freebsdIndexPackages(indexText: String): Seq[MappedPackage] =
    indexText.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && l != "{" && l != "}")
      .flatMap { line =>
        scala.util.Try(JsonMethods.parse(line)).toOption
      }
      .collect { case m: JObject if str(m \ "name").isDefined =>
        val name = str(m \ "name").get
        val version = str(m \ "version")
        val arch = str(m \ "arch")
        val origin = str(m \ "origin")
        val quals = (arch.map("arch=" + _).toSeq ++
          origin.map("origin=" + _).toSeq).mkString("&")
        val path = str(m \ "path").getOrElse(
          s"All/$name-${version.getOrElse("")}.txz")
        val downloadUrl = arch
          .map(a => s"https://pkg.freebsd.org/$a/latest/$path")
          .getOrElse("")
        val licenses = (m \ "licenses") match {
          case JArray(ls) => ls.flatMap(str)
          case _          => Seq.empty
        }
        val licenseStmt =
          if (licenses.isEmpty) None
          else {
            val lics = licenses.map(l => s"'$l'").mkString(", ")
            val logic = str(m \ "licenselogic")
              .map(lg => s", 'licenselogic': '$lg'").getOrElse("")
            Some(s"{'licenses': [$lics]$logic}")
          }
        val keywords = (m \ "categories") match {
          case JArray(cs) => cs.flatMap(str)
          case _          => Seq.empty
        }
        MappedPackage(
          PackageRow.minimal(downloadUrl, "freebsd", name, version)
            .copy(
              qualifiers = Some(quals).filter(_.nonEmpty),
              description = str(m \ "desc"),
              keywords = keywords,
              homepage_url = str(m \ "www"),
              declared_license_expression = licenseStmt),
          str(m \ "maintainer").toSeq.map(e =>
            PartyRow(downloadUrl, "person", Some("maintainer"), None,
              Some(e), None)),
          None,
          codeViewUrl = origin.map(o =>
            s"https://svnweb.freebsd.org/ports/head/$o"))
      }
      .toSeq

  // ------------------------------------------------------------- openwrt

  /** ipk control paragraph → one package
    * (`minecode/miners/openwrt.py:119-171`): Section+Architecture as
    * keywords, Depends as bare-name dependencies, maintainer split
    * into name/email. */
  def openwrtIpkPackage(control: Seq[(String, String)],
      downloadUrl: String): Option[MappedPackage] = {
    val m = control.toMap
    m.get("Package").map { name =>
      val parties = m.get("Maintainer").toSeq.flatMap { raw =>
        val (n, e) = parseEmail(raw)
        if (n.isDefined) Seq(PartyRow(downloadUrl, "person",
          Some("maintainer"), n, e, None))
        else Seq.empty
      }
      MappedPackage(
        PackageRow.minimal(downloadUrl, "openwrt", name, m.get("Version"))
          .copy(
            description = m.get("Description"),
            size = m.get("Installed-Size").flatMap(_.toLongOption),
            declared_license_expression = m.get("License"),
            keywords = m.get("Section").toSeq ++ m.get("Architecture").toSeq),
        parties, None,
        dependencies = m.get("Depends").toSeq
          .flatMap(_.split(",").toSeq).map(_.trim).filter(_.nonEmpty)
          .map(dep(_)))
    }
  }

  // ----------------------------------------------------------- gstreamer

  /** Download URL → package (`minecode/miners/gstreamer.py:88-121`):
    * name/"version" split on the LAST `-` of the file name — the
    * version keeps the archive extension, as the reference's expected
    * fixture pins (`gst-openmax@0.10.0.2.tar.bz2`). */
  def gstreamerUrlPackage(uri: String): Option[MappedPackage] = {
    val fileName = uri.substring(uri.lastIndexOf('/') + 1)
    val stripped = Seq(".tar.bz2", ".tar.gz", ".tar.xz")
      .foldLeft(fileName)((n, ext) => n.replace(ext, ""))
    if (!stripped.contains("-")) None
    else {
      val cut = fileName.lastIndexOf('-')
      Some(MappedPackage(
        PackageRow.minimal(uri, "gstreamer", fileName.substring(0, cut),
          Some(fileName.substring(cut + 1)))
          .copy(homepage_url = Some("https://gstreamer.freedesktop.org")),
        Seq.empty, None))
    }
  }

  // --------------------------------------------------------- freedesktop

  /** Project wiki page → package
    * (`minecode/miners/freedesktop.py:68-98`): h1 as description,
    * freedesktop.org release/dist links as download, buglist.cgi as
    * bug tracker, cgit tree links as code view, `git://` list items as
    * vcs. */
  def freedesktopProject(html: String, pageUri: String,
      purl: String): Option[MappedPackage] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) None
    else {
      val name = parsed(2)
      val version = Option(parsed(3))
      val description = """(?s)<h1[^>]*>\s*(.*?)\s*</h1>""".r
        .findFirstMatchIn(html).map(m =>
          decodeEntities("""(?s)<[^>]+>""".r.replaceAllIn(m.group(1), ""))
            .trim)
        .filter(_.nonEmpty)
      var downloadUrl: Option[String] = None
      var bugTracking: Option[String] = None
      var codeView: Option[String] = None
      """<a[^>]*href="([^"]+)"""".r.findAllMatchIn(html)
        .map(m => decodeEntities(m.group(1)))
        .filter(_.contains("freedesktop.org"))
        .foreach { link =>
          if (link.contains("/releases/") || link.contains("/dist/"))
            downloadUrl = Some(link)
          if (link.contains("https://bugs.freedesktop.org/buglist.cgi"))
            bugTracking = Some(link)
          if (link.contains("http://cgit.freedesktop.org/") &&
            link.contains("tree/"))
            codeView = Some(link)
        }
      val vcs = """(?s)<li[^>]*>\s*(git://[^<\s]+)""".r
        .findFirstMatchIn(html).map(m => s"git+${m.group(1)}")
      Some(MappedPackage(
        PackageRow.minimal(downloadUrl.getOrElse(""), "freedesktop", name,
          version)
          .copy(description = description, homepage_url = Some(pageUri)),
        Seq.empty, vcs,
        codeViewUrl = codeView, bugTrackingUrl = bugTracking))
    }
  }

  // ---------------------------------------------------------- googlecode

  /** v2 project.json → package
    * (`minecode/miners/googlecode.py:192-229`): summary+description
    * joined, license as the extracted statement, labels as keywords. */
  def googlecodeProjectV2(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "name").map { name =>
      val description = Seq(str(m \ "summary"), str(m \ "description"))
        .flatten.map(_.trim).filter(_.nonEmpty)
      MappedPackage(
        PackageRow.minimal("", "googlecode", name)
          .copy(
            description =
              if (description.isEmpty) None
              else Some(description.mkString("\n")),
            declared_license_expression = str(m \ "license"),
            keywords = labelKeywords(m)),
        Seq.empty, None)
    }
  }

  /** v1 project.json (googleapis storage) → package
    * (`minecode/miners/googlecode.py:246-286`): adds the archived
    * domain as namespace and ancestorRepo as vcs. */
  def googlecodeProjectV1(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "name").map { name =>
      MappedPackage(
        PackageRow.minimal("", "googlecode", name)
          .copy(
            namespace = str(m \ "domain"),
            description = str(m \ "description"),
            declared_license_expression = str(m \ "license"),
            keywords = labelKeywords(m)),
        Seq.empty, str(m \ "ancestorRepo"))
    }
  }

  private def labelKeywords(m: JValue): Seq[String] = (m \ "labels") match {
    case JArray(ls) => ls.flatMap(str).map(_.trim).filter(_.nonEmpty)
    case _          => Seq.empty
  }

  // ---------------------------------------------------------------- alpm

  /** Extracted `.PKGINFO` + `.BUILDINFO` → one package
    * (`minecode/miners/alpm.py:17-69`): desc/version/licenses/url/size
    * from PKGINFO, packager party and pkgbuild sha256 from BUILDINFO,
    * depends as `pkg:alpm/{name}` purls; the license list renders
    * YAML-style (`- GPL3\n- LGPL3\n`) as the reference fixture pins. */
  def alpmPackage(pkginfoText: String, buildinfoText: String,
      purl: String, downloadUrl: String): Option[MappedPackage] = {
    val info = graft.sources.EcosystemParsers.pkginfo(pkginfoText)
    val build = graft.sources.EcosystemParsers.pkginfo(buildinfoText)
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) None
    else {
      def one(m: Map[String, Seq[String]], k: String): Option[String] =
        m.get(k).flatMap(_.headOption)
      val parties = one(build, "packager").toSeq.flatMap { raw =>
        val (n, e) = parseEmail(raw)
        if (n.isDefined)
          Seq(PartyRow(downloadUrl, "person", Some("maintainer"), n, e, None))
        else Seq.empty
      }
      val licenses = info.getOrElse("license", Seq.empty)
      Some(MappedPackage(
        PackageRow.minimal(downloadUrl, "alpm", parsed(2),
          one(info, "pkgver"))
          .copy(
            qualifiers = Option(parsed(4)),
            description = one(info, "pkgdesc"),
            homepage_url = one(info, "url"),
            size = one(info, "size").flatMap(_.toLongOption),
            sha256 = one(build, "pkgbuild_sha256sum"),
            declared_license_expression =
              if (licenses.isEmpty) None
              else Some(licenses.map(l => s"- $l\n").mkString)),
        parties, None,
        dependencies = info.getOrElse("depend", Seq.empty)
          .map(d => dep(s"pkg:alpm/$d"))))
    }
  }

  // ------------------------------------------------------------- eclipse

  /** Eclipse projects API JSON → one package per download page
    * (`minecode/miners/eclipse.py:187-233`). */
  def eclipseJsonPackages(json: String): Seq[MappedPackage] =
    (JsonMethods.parse(json) \ "projects") match {
      case JObject(projects) => projects.flatMap { case (project, m) =>
        val description = (m \ "description") match {
          case JArray(d :: _) => str(d \ "value")
          case _              => str(m \ "title")
        }
        val homepage = (m \ "website_url") match {
          case JArray(u :: _) => str(u \ "url")
          case _              => None
        }
        val bugTracking = (m \ "bugzilla") match {
          case JArray(b :: _) => str(b \ "query_url")
          case _              => None
        }
        val licenses = (m \ "licenses") match {
          case JArray(ls) => ls.flatMap(l => str(l \ "name"))
          case _          => Seq.empty
        }
        val downloads = (m \ "download_url") match {
          case JArray(ds) => ds.flatMap(d => str(d \ "url"))
          case _          => Seq.empty
        }
        downloads.map { durl =>
          MappedPackage(
            PackageRow.minimal(durl, "eclipse", project)
              .copy(description = description, homepage_url = homepage,
                declared_license_expression = yamlLicenseList(licenses)),
            Seq.empty, None, bugTrackingUrl = bugTracking)
        }
      }
      case _ => Seq.empty
    }

  /** Eclipse project HTML page → one package per Downloads link
    * (`minecode/miners/eclipse.py:248-298`): dcterms meta tags carry
    * name/description, the project-licenses block carries license
    * links, `Website`/`Downloads` anchors carry the URLs. */
  def eclipseHtmlPackages(html: String): Seq[MappedPackage] = {
    def metaContent(key: String): Option[String] =
      (s"""<meta[^>]*name="[^"]*$key[^"]*"[^>]*content="([^"]*)"""").r
        .findFirstMatchIn(html).map(m => decodeEntities(m.group(1)))
        .filter(_.nonEmpty)
    val name = metaContent("dcterms.title")
    val description = metaContent("dcterms.description")
    val licenses = """(?s)field-name-field-project-licenses(.*?)field-name-field-""".r
      .findFirstMatchIn(html).toSeq.flatMap(block =>
      """<a[^>]*>([^<]+)</a>""".r.findAllMatchIn(block.group(1))
        .map(m => decodeEntities(m.group(1))))
    def anchorByText(text: String): Seq[String] =
      ("""<a[^>]*href="([^"]+)"[^>]*>\s*""" + text + """\s*<""").r
        .findAllMatchIn(html).map(m => decodeEntities(m.group(1))).toSeq
    val homepage = anchorByText("Website").headOption
    def base(durl: String, version: Option[String]): MappedPackage =
      MappedPackage(
        PackageRow.minimal(durl, "eclipse", name.getOrElse(""), version)
          .copy(description = description, homepage_url = homepage,
            declared_license_expression = yamlLicenseList(licenses)),
        Seq.empty, None)
    val downloads = anchorByText("Downloads").map(base(_, None))
    // latest-releases table: one package per row, class-less anchors
    // carry version text + release URL
    val releases = """(?s)field-name-field-latest-releases.*?<tbody>(.*?)</tbody>""".r
      .findFirstMatchIn(html).toSeq.flatMap { tbody =>
        """<td[^>]*>\s*<a href="([^"]+)">([^<]+)<""".r
          .findAllMatchIn(tbody.group(1))
          .map(m => base(decodeEntities(m.group(1)),
            Some(decodeEntities(m.group(2)))))
      }
    downloads ++ releases
  }

  // -------------------------------------------------------------- fdroid

  /** F-Droid per-package index-v2 record → one source + one apk
    * package per version (`minecode/miners/fdroid.py:115-240`). */
  def fdroidPackages(purl: String, json: String): Seq[MappedPackage] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) return Seq.empty
    val name = parsed(2)
    val root = JsonMethods.parse(json)
    val m = root \ "metadata"
    def localized(key: String): Option[String] =
      str(m \ key \ "en-US")
    // name/summary/description, each dropped when the next one
    // already starts with it (`build_description`)
    val description = {
      val n0 = localized("name")
      val s0 = localized("summary")
      val d = localized("description")
      val n = if (n0.isDefined && s0.exists(_.startsWith(n0.get))) None else n0
      val s = if (s0.isDefined && d.exists(_.startsWith(s0.get))) None else s0
      val parts = Seq(n, s, d).flatten
      if (parts.isEmpty) None else Some(parts.mkString("\n"))
    }
    val keywords = (m \ "categories") match {
      case JArray(cs) => cs.flatMap(str); case _ => Seq.empty
    }
    val parties = {
      val an = str(m \ "authorName")
      val ae = str(m \ "authorEmail")
      val au = str(m \ "authorWebSite")
      if (an.isEmpty && ae.isEmpty && au.isEmpty) Seq.empty
      else Seq(PartyRow("", "person", Some("author"), an, ae, au))
    }
    def base(downloadUrl: String, version: String, sha256: Option[String],
        size: Option[Long]): PackageRow =
      PackageRow.minimal(downloadUrl, parsed(0), name, Some(version))
        .copy(
          description = description,
          keywords = keywords,
          homepage_url = str(m \ "webSite"),
          sha256 = sha256,
          size = size,
          declared_license_expression = str(m \ "license"))
    (root \ "versions") match {
      case JObject(versions) => versions.flatMap { case (_, v) =>
        val versionCode = (v \ "manifest" \ "versionCode") match {
          case JInt(n) => n.toString; case JString(s) => s; case _ => ""
        }
        def fileOf(key: String): Option[(String, Option[String], Option[Long])] =
          str(v \ key \ "name").map { n =>
            (s"https://f-droid.org/repo/${n.dropWhile(_ == '/')}",
              str(v \ key \ "sha256"),
              (v \ key \ "size") match {
                case JInt(x) => Some(x.toLong); case _ => None
              })
          }
        val srcPkg = fileOf("src").map { case (durl, sha, size) =>
          MappedPackage(base(durl, versionCode, sha, size), parties,
            str(m \ "sourceCode"),
            bugTrackingUrl = str(m \ "issueTracker"))
        }
        val apkPkg = fileOf("file").map { case (durl, sha, size) =>
          MappedPackage(base(durl, versionCode, sha, size), parties,
            str(m \ "sourceCode"),
            bugTrackingUrl = str(m \ "issueTracker"),
            sourcePackages = fileOf("src").toSeq.map { case (srcUrl, _, _) =>
              s"pkg:${parsed(0)}/$name@$versionCode?download_url=$srcUrl"
            })
        }
        srcPkg.toSeq ++ apkPkg.toSeq
      }
      case _ => Seq.empty
    }
  }

  // --------------------------------------------------------- sourceforge

  /** SourceForge project API record → one package
    * (`minecode/miners/sourceforge.py:105-174`). */
  def sourceforgePackage(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "shortname").orElse(str(m \ "name")).map { name =>
      val description = joinDescriptions(str(m \ "summary"),
        str(m \ "short_description"))
      val parties = (m \ "developers") match {
        case JArray(ds) => ds.flatMap { d =>
          str(d \ "name").map(n => PartyRow("", "person",
            Some("contributor"), Some(n), None, str(d \ "url")))
        }
        case _ => Seq.empty
      }
      val categories = m \ "categories"
      val languages = (categories \ "language") match {
        case JArray(ls) => ls.flatMap(l => str(l \ "shortname"))
        case _          => Seq.empty
      }
      val licenses = (categories \ "license") match {
        case JArray(ls) => ls.flatMap { l =>
          // shortname then fullname, both gated on fullname presence
          str(l \ "fullname").toSeq.flatMap(full =>
            str(l \ "shortname").toSeq :+ full)
        }
        case _ => Seq.empty
      }
      val keywords = (categories \ "topic") match {
        case JArray(ts) => ts.flatMap(t => str(t \ "shortname"))
        case _          => Seq.empty
      }
      MappedPackage(
        PackageRow.minimal("", "sourceforge", name)
          .copy(
            description = description,
            // dict.get(key, default) semantics: the url fallback only
            // applies when external_homepage is ABSENT, not empty
            homepage_url = (m \ "external_homepage") match {
              case JNothing => str(m \ "url")
              case v        => str(v)
            },
            primary_language =
              if (languages.isEmpty) None else Some(languages.mkString(", ")),
            keywords = keywords,
            declared_license_expression = yamlLicenseList(licenses)),
        parties, None)
    }
  }

  // -------------------------------------------------------------- apache

  /** Apache dist download URL → name/version package
    * (`minecode/miners/apache.py:533-592`): the name comes from the
    * purl; the version is the first digits-and-dots segment of the
    * file base name joined with every later segment. */
  def apacheDownloadPackage(uri: String, purl: String): Option[MappedPackage] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) return None
    val path = uri.split("apache\\.org/dist/", 2) match {
      case Array(_, p) => p; case _ => uri
    }
    val fileName = path.substring(path.lastIndexOf('/') + 1)
    val baseName = fileName.lastIndexOf('.') match {
      case -1 => fileName
      case i  => fileName.substring(0, i)
    }
    var version: Option[String] = None
    baseName.split("-").foreach { seg =>
      version match {
        case Some(v) => version = Some(s"$v-$seg")
        case None =>
          if (seg.nonEmpty && seg.split("\\.").forall(p =>
            p.nonEmpty && p.forall(_.isDigit)))
            version = Some(seg)
      }
    }
    Some(MappedPackage(
      PackageRow.minimal(uri, "apache", parsed(2), version)
        .copy(namespace = Option(parsed(1))),
      Seq.empty, None))
  }

  /** Apache projects.json → one package per project release (or one
    * per project when it lists none)
    * (`minecode/miners/apache.py:389-483`): the doap license URL is
    * the extracted statement, category splits into keywords. */
  def apacheProjectsPackages(json: String): Seq[MappedPackage] =
    JsonMethods.parse(json) match {
      case JObject(projects) => projects.flatMap { case (projectName, m) =>
        val parties = (m \ "maintainer") match {
          case JArray(ms) => ms.map { p =>
            PartyRow("", "person", Some("maintainer"), str(p \ "name"),
              str(p \ "mbox").map(_.replace("mailto:", "")), None)
          }
          case _ => Seq.empty
        }
        val codeView = (m \ "repository") match {
          case JArray(r :: _) => r match {
            case JString(u) => Some(u); case _ => None
          }
          case _ => None
        }
        val keywords = str(m \ "category").toSeq
          .flatMap(_.split(",").toSeq).map(_.trim).filter(_.nonEmpty)
        def base(version: Option[String],
            releaseDate: Option[java.sql.Timestamp]): MappedPackage =
          MappedPackage(
            PackageRow.minimal(str(m \ "download-page").getOrElse(""),
              "apache", projectName, version)
              .copy(
                description = joinDescriptions(str(m \ "shortdesc"),
                  str(m \ "description")),
                homepage_url = str(m \ "homepage"),
                keywords = keywords,
                release_date = releaseDate,
                primary_language = str(m \ "programming-language"),
                declared_license_expression = str(m \ "license")),
            parties, None,
            codeViewUrl = codeView,
            bugTrackingUrl = str(m \ "bug-database"))
        (m \ "release") match {
          case JArray(releases) if releases.nonEmpty => releases.map { r =>
            base(str(r \ "revision"),
              str(r \ "created").filter(_.length == 10).flatMap(dateOnlyTs))
          }
          case _ => Seq(base(None, None))
        }
      }
      case _ => Seq.empty
    }

  /** Apache podling record → one package
    * (`minecode/miners/apache.py:493-509`). */
  def apachePodlingPackage(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "name").map { name =>
      MappedPackage(
        PackageRow.minimal("", "apache-podling", name)
          .copy(description = str(m \ "description"),
            homepage_url = str(m \ "homepage")),
        Seq.empty, None)
    }
  }

  // ----------------------------------------------------------- dockerhub

  /** Docker Hub library record → one package
    * (`minecode/miners/dockerhub.py:174-197`). */
  def dockerhubJsonPackage(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "name").map { name =>
      MappedPackage(
        PackageRow.minimal("", "docker", name)
          .copy(
            description = joinDescriptions(str(m \ "description"),
              str(m \ "full_description")),
            homepage_url = Some(s"https://hub.docker.com/_/$name")),
        Seq.empty, None)
    }
  }

  // -------------------------------------------------------------- gitlab

  /** GitLab project record → one package
    * (`minecode/miners/gitlab.py:113-137`). */
  def gitlabProjectPackage(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "name").map { name =>
      val vcs = str(m \ "http_url_to_repo").map(u => s"git+$u")
      MappedPackage(
        PackageRow.minimal("", "gitlab", name)
          .copy(
            description = str(m \ "description"),
            homepage_url = str(m \ "web_url"),
            release_date = str(m \ "created_at").flatMap(dateOnlyTs)),
        Seq.empty, vcs, codeViewUrl = vcs)
    }
  }

  // ------------------------------------------------------------- openssl

  /** OpenSSL snapshot/source URL → one generic package
    * (`minecode/miners/openssl.py:118-157`): fixed project metadata,
    * version from the file name with archive/checksum extensions
    * stripped. */
  def opensslPackage(uri: String, size: Option[Long],
      lastModified: Option[java.sql.Timestamp]): MappedPackage = {
    val fileName = uri.substring(uri.lastIndexOf('/') + 1)
    val version = fileName.replace(".tar.gz", "").replace("openssl-", "")
      .replace(".asc", "").replace(".md5", "")
      .replace(".sha1", "").replace(".sha256", "")
    MappedPackage(
      PackageRow.minimal(uri, "generic", fileName, Some(version))
        .copy(
          description = Some("The OpenSSL Project is a collaborative " +
            "effort to develop a robust, commercial-grade, fully " +
            "featured, and Open Source toolkit implementing the " +
            "Transport Layer Security (TLS) protocols (including SSLv3) " +
            "as well as a full-strength general purpose cryptographic " +
            "library."),
          size = size,
          release_date = lastModified,
          declared_license_expression = Some("OpenSSL License"),
          homepage_url = Some("https://www.openssl.org/"),
          copyright = Some("Copyright (c) 1998-2018 The OpenSSL Project\n" +
            "Copyright (c) 1995-1998 Eric A. Young, Tim J. Hudson\n" +
            "All rights reserved.")),
      Seq.empty, Some("git+https://github.com/openssl/openssl.git"),
      codeViewUrl = Some("https://github.com/openssl/openssl"),
      bugTrackingUrl = Some("https://github.com/openssl/openssl/issues"))
  }

  // ----------------------------------------------------------- bitbucket

  /** Bitbucket repo record + purl → package template
    * (`minecode/miners/bitbucket.py:264-303`). */
  def bitbucketRepoPackage(json: String, purl: String): Option[MappedPackage] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) return None
    val (namespace, name) = (Option(parsed(1)), parsed(2))
    val m = JsonMethods.parse(json)
    val protocol = str(m \ "scm").getOrElse("git")
    val bbUrl =
      s"$protocol+https://bitbucket.org/${namespace.getOrElse("")}/$name"
    val owner = (m \ "owner") match {
      case o: JObject => Seq(PartyRow("", "person", Some("owner"),
        str(o \ "username"), None, str(o \ "links" \ "html" \ "href")))
      case _ => Seq.empty
    }
    Some(MappedPackage(
      PackageRow.minimal("", "bitbucket", name)
        .copy(
          namespace = namespace,
          description = str(m \ "description"),
          primary_language = str(m \ "language"),
          homepage_url = str(m \ "website").orElse(Some(bbUrl))),
      owner, Some(bbUrl),
      codeViewUrl = Some(bbUrl + "/src"),
      bugTrackingUrl =
        if ((m \ "has_issues") == JBool(true)) Some(bbUrl + "/issues")
        else None))
  }

  /** Bitbucket downloads payload + purl → one package
    * (`minecode/miners/bitbucket.py:214-238`): the reference passes
    * the whole paginated response as a single download record (its
    * own expected fixtures pin one package with a null download URL
    * and the page-level `size`), so this takes the record as-is. */
  def bitbucketDownloadPackage(download: JValue, purl: String)
      : Option[MappedPackage] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) return None
    Some(MappedPackage(
      PackageRow.minimal(
        str(download \ "links" \ "self" \ "href").getOrElse(""),
        "bitbucket", parsed(2), Option(parsed(3)))
        .copy(
          namespace = Option(parsed(1)),
          size = (download \ "size") match {
            case JInt(n) => Some(n.toLong); case _ => None
          }),
      Seq.empty, None))
  }

  // ---------------------------------------------------------------- pypi

  /** PyPI JSON API record → one package per download
    * (`minecode/miners/pypi.py:158-292`): one row for an off-PyPI
    * `download_url`, then one per `urls[]` entry with size/md5/sha256
    * and upload date; the license falls back to `License ::`
    * classifiers when the license field is empty or UNKNOWN. */
  def pypiPackages(json: String): Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    val info = root \ "info"
    val name = str(info \ "name").getOrElse(return Seq.empty)
    val version = str(info \ "version")
    val description = joinDescriptions(str(info \ "summary"),
      str(info \ "description"))
    val parties = Seq(
      ("author", "author_email", "author"),
      ("maintainer", "maintainer_email", "maintainer")).flatMap {
      case (nameKey, emailKey, role) =>
        val n = str(info \ nameKey)
        val e = str(info \ emailKey)
        if (n.isEmpty && e.isEmpty) None
        else Some(PartyRow("", "person", Some(role), n, e, None))
    }
    val licenses = {
      val lic = str(info \ "license").filter(_ != "UNKNOWN").toSeq
      if (lic.nonEmpty) lic
      else (info \ "classifiers") match {
        case JArray(cs) =>
          cs.flatMap(str).filter(_.toLowerCase.startsWith("license"))
        case _ => Seq.empty
      }
    }
    // saneyaml single-quotes scalars containing ": " (the classifier
    // form) — the reference fixtures pin that rendering
    val licenseStmt =
      if (licenses.isEmpty) None
      else Some(licenses.map { l =>
        val rendered = if (l.contains(": ")) s"'$l'" else l
        s"- $rendered\n"
      }.mkString)
    val keywords = str(info \ "keywords").toSeq
      .flatMap(_.split(",").toSeq).map(_.trim).filter(_.nonEmpty)
    def base(downloadUrl: String): PackageRow =
      PackageRow.minimal(downloadUrl, "pypi", name, version)
        .copy(
          description = description,
          homepage_url = str(info \ "home_page"),
          keywords = keywords,
          declared_license_expression = licenseStmt)
    val offPypi = str(info \ "download_url").filter(_ != "UNKNOWN")
      .map(u => MappedPackage(base(u), parties, None,
        bugTrackingUrl = str(info \ "bugtrack_url")))
      .toSeq
    val downloads = (root \ "urls") match {
      case JArray(urls) => urls.flatMap { d =>
        str(d \ "url").map { u =>
          MappedPackage(
            base(u).copy(
              size = (d \ "size") match {
                case JInt(n) => Some(n.toLong); case _ => None
              },
              md5 = str(d \ "md5_digest"),
              sha256 = str(d \ "digests" \ "sha256"),
              release_date = str(d \ "upload_time").flatMap(s =>
                scala.util.Try(java.sql.Timestamp.valueOf(
                  s.take(10) + " 00:00:00")).toOption)),
            parties, None,
            bugTrackingUrl = str(info \ "bugtrack_url"))
        }
      }
      case _ => Seq.empty
    }
    offPypi ++ downloads
  }

  // ----------------------------------------------------------------- npm

  /** `Name <email> (url)` split — the npm package.json person string
    * convention. */
  private def npmPerson(s: String): (Option[String], Option[String], Option[String]) = {
    val email = """<([^>]+)>""".r.findFirstMatchIn(s).map(_.group(1).trim)
    val url = """\(([^)]+)\)""".r.findFirstMatchIn(s).map(_.group(1).trim)
    val name = s.replaceAll("""<[^>]*>""", "").replaceAll("""\([^)]*\)""", "")
      .trim
    (Some(name).filter(_.nonEmpty), email, url)
  }

  private def npmParty(v: JValue, role: String, downloadUrl: String)
      : Option[PartyRow] = v match {
    case JString(s) =>
      val (n, e, u) = npmPerson(s)
      if (n.isEmpty && e.isEmpty) None
      else Some(PartyRow(downloadUrl, "person", Some(role), n, e, u))
    case o: JObject =>
      val n = str(o \ "name")
      if (n.isEmpty) None
      else Some(PartyRow(downloadUrl, "person", Some(role), n,
        str(o \ "email"), str(o \ "url")))
    case _ => None
  }

  /** npm registry document → one package per version
    * (`minecode/miners/npm.py:121-134`, behavior pinned by the
    * reference's seven expected fixtures): canonical registry tarball
    * URL, dist shasum, repository normalized with a `git+` prefix and
    * the version's gitHead, legacy `licenses` dicts rendered
    * YAML-style, author/contributors/maintainers parties, and
    * dependencies per scope. */
  def npmVersionPackages(json: String): Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    (root \ "versions") match {
      case JObject(versions) => versions.flatMap { case (_, v) =>
        str(v \ "name").map(name => npmOnePackage(name, v))
      }
      case _ => Seq.empty
    }
  }

  /** haxelib package.json → one package
    * (`minecode/miners/haxe.py:106-111` via the haxelib handler,
    * golden `haxe/project_package.json-expected`): contributors
    * become contributor parties with lib.haxe.org profile URLs, the
    * canonical download lives at `/p/<name>/<version>/download/`, and
    * dependency versions are percent-encoded into pinned haxe purls.
    * package.json-only fields (keywords, homepage, bugs, repository)
    * are NOT mapped — the handler reads the haxelib field set. */
  def haxePackages(json: String): Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    str(root \ "name").toSeq.map { name =>
      val version = str(root \ "version")
      val downloadUrl = version match {
        case Some(v) => s"https://lib.haxe.org/p/$name/$v/download/"
        case None    => s"https://lib.haxe.org/p/$name"
      }
      val parties = (root \ "contributors") match {
        case JArray(cs) => cs.collect { case JString(c) =>
          PartyRow(downloadUrl, "person", Some("contributor"), Some(c),
            None, Some(s"https://lib.haxe.org/u/$c"))
        }
        case _ => Seq.empty
      }
      val deps = (root \ "dependencies") match {
        case JObject(ds) => ds.map { case (depName, depVer) =>
          val v = (depVer match {
            case JString(s) => Some(s); case _ => None
          }).filter(_.nonEmpty)
          val encoded = v.map(s =>
            java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20"))
          DependencyRow("",
            encoded.fold(s"pkg:haxe/$depName")(e => s"pkg:haxe/$depName@$e"),
            None, None, is_runtime = true, is_optional = false,
            is_pinned = v.isDefined)
        }
        case _ => Seq.empty
      }
      MappedPackage(
        graft.catalog.PackageRow.minimal(downloadUrl, "haxe", name, version)
          .copy(
            primary_language = Some("Haxe"),
            description = str(root \ "description"),
            declared_license_expression = str(root \ "license")),
        parties, vcsUrl = None, dependencies = deps)
    }
  }

  /** One-version npm registry document (the
    * `registry.npmjs.org/<name>/<version>` endpoint the reference's
    * collector fetches, `collectors/npm.py:30-47`) → one package. */
  def npmSingleVersionPackage(json: String): Option[MappedPackage] = {
    val root = JsonMethods.parse(json)
    str(root \ "name").map(name => npmOnePackage(name, root))
  }

  private def npmOnePackage(name: String, v: JValue): MappedPackage = {
    val version = str(v \ "version").getOrElse("")
    // canonical registry tarball: scoped names keep the scope in the
    // path but not in the file name
    val fileName = name.split("/").last
    val downloadUrl =
      s"https://registry.npmjs.org/$name/-/$fileName-$version.tgz"
    val licenseStmt = {
      val entries: Seq[String] = (v \ "license") match {
        case JString(l) if l.nonEmpty => Seq(s"- $l\n")
        case o: JObject => Seq(licenseDictYaml(o))
        case _ => (v \ "licenses") match {
          case JArray(ls) => ls.collect { case o: JObject => licenseDictYaml(o) }
          case o: JObject => Seq(licenseDictYaml(o))
          case _          => Seq.empty
        }
      }
      if (entries.isEmpty) None else Some(entries.mkString)
    }
    val vcs = ((v \ "repository") match {
      case JString(u)     => Some(u)
      case o: JObject     => str(o \ "url")
      case JArray(r :: _) => r match {
        case JString(u) => Some(u)
        case o: JObject => str(o \ "url")
        case _          => None
      }
      case _ => None
    }).map { u0 =>
      val u = if (u0.startsWith("git")) u0 else s"git+$u0"
      str(v \ "gitHead") match {
        case Some(head) => s"$u@$head"
        case None       => u
      }
    }
    val parties =
      npmParty(v \ "author", "author", downloadUrl).toSeq ++
        ((v \ "contributors") match {
          case JArray(cs) => cs.flatMap(npmParty(_, "contributor", downloadUrl))
          case other      => npmParty(other, "contributor", downloadUrl).toSeq
        }) ++
        ((v \ "maintainers") match {
          case JArray(ms) => ms.flatMap(npmParty(_, "maintainer", downloadUrl))
          case other      => npmParty(other, "maintainer", downloadUrl).toSeq
        })
    def depsOf(scope: String, runtime: Boolean, optional: Boolean)
        : Seq[DependencyRow] = (v \ scope) match {
      case JObject(ds) => ds.collect {
        // a bare scope with no package name ("@angular") is not a
        // valid npm name and cannot form a purl — skipped, which is
        // exactly the reference's ticket-439 behavior
        // (npm/expected_ticket_439.json drops that dependency)
        case (depName, req)
            if !(depName.startsWith("@") && !depName.contains("/")) =>
          // packageurl percent-encodes '@' in scoped namespaces
          DependencyRow("", s"pkg:npm/${depName.replace("@", "%40")}",
            (req match { case JString(r) => Some(r); case _ => None })
              .filter(_.nonEmpty),
            Some(scope), is_runtime = runtime, is_optional = optional,
            is_pinned = false)
      }
      case _ => Seq.empty
    }
    val bugs = (v \ "bugs") match {
      case JString(u) => Some(u)
      case o: JObject => str(o \ "url")
      case _          => None
    }
    MappedPackage(
      PackageRow.minimal(downloadUrl, "npm", name, Some(version))
        .copy(
          primary_language = Some("JavaScript"),
          description = str(v \ "description"),
          keywords = (v \ "keywords") match {
            case JArray(ks) => ks.flatMap(str)
            case JString(k) => Seq(k)
            case _          => Seq.empty
          },
          homepage_url = str(v \ "homepage"),
          sha1 = str(v \ "dist" \ "shasum"),
          declared_license_expression = licenseStmt),
      parties, vcs,
      bugTrackingUrl = bugs,
      dependencies =
        depsOf("dependencies", runtime = true, optional = false) ++
          depsOf("devDependencies", runtime = false, optional = true))
  }

  /** Legacy `{type, url}` license dict rendered as a YAML list item
    * (what the reference's saneyaml dump produces, empty url kept). */
  /** Lift GemYaml's untyped parse into a JValue tree. */
  private def anyToJValue(v: Any): JValue = v match {
    case m: Map[_, _] => JObject(m.toList.map {
      case (k, value) => k.toString -> anyToJValue(value)
    })
    case l: List[_]  => JArray(l.map(anyToJValue))
    case s: String   => JString(s)
    case i: Int      => JInt(i)
    case i: Long     => JInt(i)
    case b: Boolean  => JBool(b)
    case null        => JNull
    case other       => JString(other.toString)
  }

  /** CPAN META.yml / META.json → one package
    * (`minecode/miners/cpan.py:325-393`, goldens
    * `cpan/expected_yaml_cpanmapper.json`,
    * `expected_json_cpanmapper.json`). Reference quirks kept:
    * `uri.replace(".meta", ".tar.gz")` turns the test's `.metadata`
    * suffix into `.tar.gzdata`, and only `git:`-prefixed
    * `resources.repository` URLs become `git+` vcs URLs. */
  def cpanMetaPackages(metadata: String, uri: String): Seq[MappedPackage] = {
    val root: JValue =
      try JsonMethods.parse(metadata)
      catch {
        case _: Exception =>
          anyToJValue(graft.sources.GemYaml.parse(metadata))
      }
    str(root \ "name").toSeq.map { name =>
      val licenses = (root \ "license") match {
        case JArray(ls) => ls.flatMap(str)
        case JString(l) => Seq(l)
        case _          => Seq.empty
      }
      val vcs = str(root \ "resources" \ "repository")
        .orElse(str(root \ "resources" \ "repository" \ "url"))
        .filter(_.startsWith("git:")).map(u => s"git+$u")
      val parties = (root \ "author") match {
        case JArray(as) => as.flatMap(str).map { a =>
          val (n, e) =
            if (a.contains("<")) {
              val Array(n0, e0) = a.split("<", 2)
              (n0.reverse.dropWhile(_ == ' ').reverse,
                e0.stripSuffix(">"))
            } else (a, "")
          PartyRow("", "person", Some("author"), Some(n), Some(e), None)
        }
        case _ => Seq.empty
      }
      MappedPackage(
        PackageRow.minimal(uri.replace(".meta", ".tar.gz"), "cpan", name,
          str(root \ "version").orElse((root \ "version") match {
            case JInt(n) => Some(n.toString); case _ => None
          }))
          .copy(
            description = str(root \ "abstract").orElse(Some(name)),
            declared_license_expression =
              if (licenses.isEmpty) None
              else Some(licenses.map(l => s"- $l\n").mkString),
            keywords = (root \ "keywords") match {
              case JArray(ks) => ks.flatMap(str); case _ => Seq.empty
            }),
        parties, vcsUrl = vcs)
    }
  }

  /** CPAN readme sections → one package
    * (`minecode/miners/cpan.py:427-478`, goldens
    * `cpan/expected_json_readmefile_cpanmapper{,2}.json`). Reference
    * quirks kept: the whole NAME section is the package name, the
    * AUTHOR section is iterated character-by-character so each `<`
    * yields one empty-name/empty-email party, and a DEVELOPMENT
    * section's `<git url>` becomes the vcs URL. */
  def cpanReadmePackages(sections: Seq[(String, String)], uri: String)
      : Seq[MappedPackage] = {
    val content = sections.toMap
    content.get("NAME").filter(_.nonEmpty).toSeq.map { name =>
      val vcs = content.get("DEVELOPMENT").flatMap { repo =>
        val lt = repo.indexOf('<')
        val gt = repo.indexOf('>')
        if (lt >= 0 && gt > lt && repo.contains("git:"))
          Some("git+" + repo.substring(lt + 1, gt))
        else None
      }
      val parties = content.getOrElse("AUTHOR", "").toSeq
        .filter(_ == '<')
        .map(_ => PartyRow("", "person", Some("author"), Some(""),
          Some(""), None))
      MappedPackage(
        PackageRow.minimal(uri.replace(".meta", ".tar.gz"), "cpan", name,
          content.get("VERSION"))
          .copy(
            description = content.get("ABSTRACT").orElse(Some(name)),
            copyright = content.get("COPYRIGHT and LICENSE"),
            keywords = content.get("KEYWORDS").toSeq),
        parties, vcsUrl = vcs)
    }
  }

  private def licenseDictYaml(o: JObject): String = {
    val t = str(o \ "type").getOrElse("")
    val u = str(o \ "url").getOrElse("")
    val urlLine = if (u.isEmpty) "  url:\n" else s"  url: $u\n"
    s"- type: $t\n$urlLine"
  }

  // ---------------------------------------------------------------- cpan

  /** MetaCPAN release search page → packages
    * (`minecode/miners/cpan.py:211-296`): abstract as description,
    * root licenses plus resources license URLs joined YAML-style,
    * repository url git-tagged when it reads like git, bugtracker web
    * link, uppercase author id as the author party. */
  def cpanReleaseSearchPackages(json: String): Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    (root \ "hits" \ "hits") match {
      case JArray(hits) => hits.flatMap { hit =>
        val release = hit \ "_source"
        str(release \ "name").map { name =>
          val licensesRoot = (release \ "license") match {
            case JArray(ls) => ls.flatMap(str).filter(_.trim.nonEmpty)
            case _          => Seq.empty
          }
          val resources = release \ "resources"
          val licenseUrls = (resources \ "license") match {
            case JArray(ls) => ls.flatMap(str).filter(_.trim.nonEmpty)
            case _          => Seq.empty
          }
          val licenses = licensesRoot ++ licenseUrls
          val repoUrl = str(resources \ "repository" \ "url")
          val vcs = repoUrl.map(u =>
            if (u.contains(".git")) s"git+$u" else u)
          val downloadUrl = str(release \ "download_url").getOrElse("")
          MappedPackage(
            PackageRow.minimal(downloadUrl, "cpan", name,
              str(release \ "version"))
              .copy(
                description = str(release \ "abstract"),
                homepage_url = str(resources \ "homepage"),
                release_date = str(release \ "date").flatMap(s =>
                  scala.util.Try(java.sql.Timestamp.valueOf(
                    s.take(10) + " 00:00:00")).toOption),
                declared_license_expression =
                  if (licenses.isEmpty) None
                  else Some(licenses.map(l => s"- $l\n").mkString)),
            str(release \ "author").toSeq.map(a => PartyRow(downloadUrl,
              "person", Some("author"), Some(a), None, None)),
            vcs,
            bugTrackingUrl = str(resources \ "bugtracker" \ "web"))
        }
      }
      case _ => Seq.empty
    }
  }

  // ----------------------------------------------------------------- apk

  /** APKINDEX text + purl → one package
    * (`minecode/miners/alpine.py:16-64`): the purl-named paragraph
    * supplies description (T), version (V), license (L), maintainer
    * (m, split name/email), url (U), size (S), and the `Q1`-prefixed
    * base64 checksum (C) decoded to its sha1 hex digest. */
  def apkPackage(apkIndex: String, purl: String,
      downloadUrl: String): Option[MappedPackage] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) return None
    val name = parsed(2)
    graft.sources.EcosystemParsers.apkIndexFields(apkIndex)
      .find(_.get("P").contains(name))
      .map { m =>
        val parties = m.get("m").toSeq.flatMap { raw =>
          val (n, e) = parseEmail(raw)
          if (n.isDefined) Seq(PartyRow(downloadUrl, "person",
            Some("maintainer"), n, e, None))
          else Seq.empty
        }
        val sha1 = m.get("C").filter(_.startsWith("Q1")).flatMap { c =>
          scala.util.Try(java.util.Base64.getDecoder.decode(c.substring(2))
            .map("%02x".format(_)).mkString).toOption
        }
        MappedPackage(
          PackageRow.minimal(downloadUrl, "apk", name, m.get("V"))
            .copy(
              qualifiers = Option(parsed(4)),
              description = m.get("T"),
              homepage_url = m.get("U"),
              declared_license_expression = m.get("L"),
              size = m.get("S").flatMap(_.toLongOption),
              sha1 = sha1),
          parties, None)
      }
  }

  // --------------------------------------------------------------- cargo

  /** crates.io API record → one package per version
    * (`minecode/miners/cargo.py:14-89`): a versioned purl selects its
    * version, `UNKNOWN` licenses are dropped, keywords come from the
    * crate summary, the author is published_by name-or-login, and the
    * download URL joins the version's dl_path onto crates.io. */
  def cargoPackages(json: String, purlVersion: Option[String])
      : Seq[MappedPackage] = {
    val root = JsonMethods.parse(json)
    val keywords = (root \ "crate" \ "keywords") match {
      case JArray(ks) => ks.flatMap(str); case _ => Seq.empty
    }
    (root \ "versions") match {
      case JArray(versions) => versions.flatMap { v =>
        val version = str(v \ "num")
        if (purlVersion.isDefined && version != purlVersion) None
        else {
          val downloadUrl = str(v \ "dl_path")
            .map("https://crates.io" + _).getOrElse("")
          val licenses = str(v \ "license").filter(_ != "UNKNOWN").toSeq
          val author = (v \ "published_by") match {
            case o: JObject => str(o \ "name").orElse(str(o \ "login"))
            case _          => None
          }
          Some(MappedPackage(
            PackageRow.minimal(downloadUrl, "cargo",
              str(v \ "crate").getOrElse(""), version)
              .copy(
                description = str(v \ "description"),
                homepage_url = str(v \ "homepage"),
                keywords = keywords,
                size = (v \ "crate_size") match {
                  case JInt(n) => Some(n.toLong); case _ => None
                },
                sha256 = str(v \ "checksum"),
                declared_license_expression =
                  if (licenses.isEmpty) None
                  else Some(licenses.map(l => s"- $l\n").mkString)),
            author.toSeq.map(a => PartyRow(downloadUrl, "person",
              Some("author"), Some(a), None, None)),
            None))
        }
      }
      case _ => Seq.empty
    }
  }

  // ----------------------------------------------------------------- gem

  private def yamlLicenseList(licenses: Seq[String]): Option[String] =
    if (licenses.isEmpty) None
    else Some(licenses.map(l => s"- $l\n").mkString)

  /** `"\n".join` of the non-blank parts, untrimmed (the reference
    * keeps original whitespace and only filters blank parts). */
  private def joinDescriptions(short: Option[String], long: Option[String])
      : Option[String] = {
    val parts = Seq(short, long).flatten.filter(_.trim.nonEmpty)
    if (parts.isEmpty) None else Some(parts.mkString("\n"))
  }

  /** Like [[joinDescriptions]] but suppressing a long description
    * identical to the summary (the gem/nuget rule). */
  private def summaryAndLong(short: Option[String], long0: Option[String])
      : Option[String] =
    joinDescriptions(short, if (long0 == short) None else long0)

  private def dateOnlyTs(s: String): Option[java.sql.Timestamp] =
    scala.util.Try(java.sql.Timestamp.valueOf(
      s.take(10) + " 00:00:00")).toOption

  /** RubyGems versions API v1 (`minecode/miners/rubygems.py:162-207`):
    * one package per version entry — summary+description join, sha as
    * sha256, created_at date, single author party, license list. */
  def gemApiPackages(json: String, name: String): Seq[MappedPackage] =
    JsonMethods.parse(json) match {
      case JArray(versions) => versions.map { v =>
        val licenses = (v \ "licenses") match {
          case JArray(ls) => ls.flatMap(str); case _ => Seq.empty
        }
        MappedPackage(
          PackageRow.minimal("", "gem", name, str(v \ "number"))
            .copy(
              description = summaryAndLong(str(v \ "summary"),
                str(v \ "description")),
              sha256 = str(v \ "sha"),
              release_date = str(v \ "created_at").flatMap(dateOnlyTs),
              declared_license_expression = yamlLicenseList(licenses)),
          str(v \ "authors").toSeq.map(a =>
            PartyRow("", "person", Some("author"), Some(a), None, None)),
          None)
      }
      case _ => Seq.empty
    }

  /** RubyGems API v2 single-gem record
    * (`minecode/miners/rubygems.py:210-258`). */
  def gemApiV2Package(json: String): Option[MappedPackage] = {
    val m = JsonMethods.parse(json)
    str(m \ "name").map { name =>
      val downloadUrl = str(m \ "gem_uri").getOrElse("")
      val licenses = (m \ "licenses") match {
        case JArray(ls) => ls.flatMap(str); case _ => Seq.empty
      }
      MappedPackage(
        PackageRow.minimal(downloadUrl, "gem", name, str(m \ "version"))
          .copy(
            description = str(m \ "description"),
            homepage_url = str(m \ "homepage_uri"),
            sha256 = str(m \ "sha"),
            release_date = str(m \ "version_created_at").flatMap(s =>
              scala.util.Try(java.sql.Timestamp.from(
                java.time.Instant.parse(s))).toOption),
            declared_license_expression = yamlLicenseList(licenses)),
        str(m \ "authors").toSeq.map(a =>
          PartyRow(downloadUrl, "person", Some("author"), Some(a), None, None)),
        None)
    }
  }

  /** Gem archive `metadata` YAML → one package
    * (`minecode/miners/rubygems.py:271-375`): nested version object,
    * authors list, gem licenses, date split, and dependencies with
    * the `>= 0` unconstrained requirement elided. */
  def gemMetadataPackage(yaml: String, downloadUrl: Option[String])
      : Option[MappedPackage] = {
    import graft.sources.GemYaml
    val root = GemYaml.map(GemYaml.parse(yaml))
    GemYaml.str(root.get("name").orNull).map { name =>
      val version = GemYaml.str(
        GemYaml.map(root.get("version").orNull).get("version").orNull)
      val licenses = GemYaml.list(root.get("licenses").orNull)
        .flatMap(GemYaml.str)
      val deps = GemYaml.list(root.get("dependencies").orNull).flatMap { d0 =>
        val d = GemYaml.map(d0)
        GemYaml.str(d.get("name").orNull).map { depName =>
          val constraints = GemYaml.list(
            GemYaml.map(d.get("requirement").orNull)
              .get("requirements").orNull)
            .flatMap { pair =>
              GemYaml.list(pair) match {
                case List(c, v) =>
                  val cs = GemYaml.str(c)
                  val vs = GemYaml.str(GemYaml.map(v).get("version").orNull)
                  (cs, vs) match {
                    // >= 0 is the same as unconstrained: elided
                    case (Some(">="), Some("0")) => None
                    case (Some(c1), Some(v1))    => Some(s"$c1 $v1")
                    case _                       => None
                  }
                case _ => None
              }
            }
          dep(depName,
            requirement =
              if (constraints.isEmpty) None else Some(constraints.mkString(", ")),
            scope = GemYaml.str(d.get("type").orNull)
              .map(_.replaceAll("^:+", "")))
        }
      }
      MappedPackage(
        PackageRow.minimal(downloadUrl.getOrElse(""), "gem", name, version)
          .copy(
            description = summaryAndLong(
              GemYaml.str(root.get("summary").orNull),
              GemYaml.str(root.get("description").orNull)),
            homepage_url = GemYaml.str(root.get("homepage").orNull),
            release_date = GemYaml.str(root.get("date").orNull)
              .flatMap(s => dateOnlyTs(s.split(" ").head)),
            declared_license_expression = yamlLicenseList(licenses)),
        GemYaml.list(root.get("authors").orNull).flatMap(GemYaml.str)
          .map(a => PartyRow(downloadUrl.getOrElse(""), "person",
            Some("author"), Some(a), None, None)),
        None,
        dependencies = deps)
    }
  }
}
