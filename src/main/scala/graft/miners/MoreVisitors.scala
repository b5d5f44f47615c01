package graft.miners

import org.json4s._
import org.json4s.jackson.JsonMethods

import RegistryVisitors.VisitedUri

/** X1/S2 — the frontier visitors for the next tier of registries:
  * Packagist, Bower, F-Droid, Apache podlings, Haxe, and the godoc
  * search API. Each is a pure payload→URI-list function matching the
  * reference's `get_uris` behavior, golden-tested against the
  * reference's own `*_expected_uris` fixtures where they exist.
  */
object MoreVisitors {

  private def compact(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  /** Packagist package list (`minecode/miners/packagist.py:27-50`):
    * `packageNames[]` entries of the form `vendor/package` become
    * per-package metadata URIs; entries without a vendor separator are
    * skipped (the reference's FIXME-marked guard). */
  def packagistListUris(json: String, sourceUri: String): Seq[VisitedUri] =
    (JsonMethods.parse(json) \ "packageNames") match {
      case JArray(names) => names.flatMap {
        case JString(full) if full.contains("/") =>
          val Array(vendor, pkg) = full.split("/", 2)
          Some(VisitedUri(
            uri = s"https://packagist.org/p/$vendor/$pkg.json",
            sourceUri = sourceUri,
            packageUrl = Some(s"pkg:composer/$pkg")))
        case _ => None
      }
      case _ => Seq.empty
    }

  /** Bower registry top list (`minecode/miners/bower.py:21-66`): each
    * {name, url} entry resolves to the raw `bower.json` location on
    * its known hoster. (The reference's own visitor is dead code on
    * Python 3 — `dict.iteritems` — so its checked-in expected fixture
    * is empty; this implements the documented behavior.) */
  def bowerPackagesUris(json: String, sourceUri: String): Seq[VisitedUri] = {
    val hostMap = Seq(
      "https://github.com/" ->
        "https://raw.githubusercontent.com/%s/%s/master/bower.json",
      "https://lolg.it/" -> "https://lolg.it/%s/%s/raw/master/bower.json",
      "https://gitcafe.com/" ->
        "https://coding.net/u/%s/p/%s/git/raw/master/bower.json",
      "https://bitbucket.org/" ->
        "https://bitbucket.org/%s/%s/raw/master/bower.json")
    JsonMethods.parse(json) match {
      case JArray(entries) => entries.flatMap { e =>
        (e \ "name", e \ "url") match {
          case (JString(name), JString(url)) if url.contains(name) =>
            // owner = first path segment after the host (indexOf(name)
            // is unsafe: with the common owner==name layout, or a name
            // that happens to occur inside the host, it lands before
            // the path start)
            hostMap.collectFirst {
              case (host, template) if url.startsWith(host) &&
                  url.stripPrefix(host).takeWhile(_ != '/').nonEmpty &&
                  url.stripPrefix(host).contains('/') =>
                val owner = url.stripPrefix(host).takeWhile(_ != '/')
                VisitedUri(
                  uri = template.format(owner, name),
                  sourceUri = sourceUri,
                  packageUrl = Some(s"pkg:bower/$name"))
            }
          case _ => None
        }
      }
      case _ => Seq.empty
    }
  }

  /** F-Droid index-v2 (`minecode/miners/fdroid.py:66-100`): one
    * pre-visited URI per package, the purl doubling as the URI and the
    * package record carried as the mapping payload (compact JSON). */
  def fdroidIndexUris(json: String, sourceUri: String): Seq[VisitedUri] =
    (JsonMethods.parse(json) \ "packages") match {
      case JObject(packages) => packages.map { case (packageId, packageData) =>
        val purl = s"pkg:fdroid/$packageId"
        VisitedUri(
          uri = purl,
          sourceUri = sourceUri,
          packageUrl = Some(purl),
          data = Some(compact(packageData)),
          visited = true)
      }
      case _ => Seq.empty
    }

  /** Apache podlings (`minecode/miners/apache.py:330-358`): incubator
    * projects with a homepage become pre-visited URIs under the
    * `apache/incubator` namespace, metadata as payload. */
  def apachePodlingsUris(json: String, sourceUri: String): Seq[VisitedUri] =
    JsonMethods.parse(json) match {
      case JObject(projects) => projects.flatMap { case (name, meta) =>
        (meta \ "homepage") match {
          case JString(homepage) =>
            Some(VisitedUri(
              uri = homepage,
              sourceUri = sourceUri,
              packageUrl = Some(s"pkg:apache/incubator/$name"),
              data = Some(compact(meta)),
              visited = true))
          case _ => None
        }
      }
      case _ => Seq.empty
    }

  private val HrefRx = """href="([^"]+)"""".r

  /** Haxe all-projects page (`minecode/miners/haxe.py:24-46`): every
    * `/p/{project}/` link yields that project's versions URL. The
    * project name reproduces the reference's replace-ALL semantics
    * (`href.replace("/p", "")`) verbatim — a project starting with
    * "p" loses that letter too (`/p/promhx/` → `romhx`), as the
    * reference's own expected fixture records. */
  def haxeProjectsUris(html: String, sourceUri: String): Seq[VisitedUri] =
    HrefRx.findAllMatchIn(html).map(_.group(1)).collect {
      case href if href.startsWith("/p/") =>
        val name = href.replace("/p", "")
          .reverse.dropWhile(_ == '/').reverse.dropWhile(_ == '/')
        VisitedUri(
          uri = s"https://lib.haxe.org${href}versions",
          sourceUri = sourceUri,
          packageUrl = Some(s"pkg:haxe/$name"))
    }.toSeq

  /** Haxe per-project versions page (`minecode/miners/haxe.py:49-80`):
    * `/p/{project}/{version}/` links yield the versioned haxelib
    * `package.json` location. */
  def haxeVersionsUris(html: String, sourceUri: String): Seq[VisitedUri] =
    HrefRx.findAllMatchIn(html).map(_.group(1)).collect {
      case href if href.startsWith("/p/") && href.endsWith("/") &&
          href.stripPrefix("/p/").stripSuffix("/").split("/").length == 2 =>
        val Array(project, version) =
          href.stripPrefix("/p/").stripSuffix("/").split("/")
        VisitedUri(
          uri = s"https://lib.haxe.org/p/$project/$version/raw-files/$project/package.json",
          sourceUri = sourceUri,
          packageUrl = Some(s"pkg:haxe/$project@$version"))
    }.toSeq

  /** MetaCPAN author email search (`minecode/miners/cpan.py:63-85`,
    * golden `cpan/expected_search_email_a.json`): one release-search
    * URI per author `_id` hit. */
  def cpanAuthorSearchUris(json: String, sourceUri: String): Seq[VisitedUri] =
    (JsonMethods.parse(json) \ "hits" \ "hits") match {
      case JArray(hits) => hits.flatMap { h =>
        (h \ "_id") match {
          case JString(id) if id.nonEmpty => Some(VisitedUri(
            uri = "https://fastapi.metacpan.org/release/_search" +
              s"?q=author:$id&size=5000",
            sourceUri = sourceUri))
          case _ => None
        }
      }
      case _ => Seq.empty
    }

  /** CPAN modules index page (`cpan.py:100-124`, golden
    * `cpan/expected_html_modules.json`): every `../authors` link that
    * is not an archive, re-rooted at www.cpan.org. */
  def cpanModulesIndexUris(html: String, sourceUri: String): Seq[VisitedUri] =
    HrefRx.findAllMatchIn(html).map(_.group(1)).collect {
      case url if url.startsWith("../authors") &&
          !url.endsWith(".zip") && !url.endsWith(".tar.gz") =>
        VisitedUri(uri = s"http://www.cpan.org/${url.drop(3)}",
          sourceUri = sourceUri)
    }.toSeq

  /** CPAN author directory page (`cpan.py:128-164`, golden
    * `cpan/expected_html_files.json`): one URI per listed file with a
    * purl from the name-version split. The reference strips the
    * literal "tar.gz" (not ".tar.gz"), so archive purls keep a
    * trailing dot in the version — the golden records
    * `pkg:cpan/AWS-Signature4@1.00.` and this reproduces it. */
  def cpanAuthorDirUris(html: String, sourceUri: String): Seq[VisitedUri] = {
    val base = if (sourceUri.endsWith("/")) sourceUri else sourceUri + "/"
    HrefRx.findAllMatchIn(html).map(_.group(1)).collect {
      case url if url.nonEmpty && !url.startsWith("/") && !url.startsWith("?") =>
        val name0 = url.replace("tar.gz", "")
          .replace(".readme", "").replace(".meta", "")
        val idx = name0.lastIndexOf('-')
        val (name, version) =
          if (idx < 0) ("", name0) else (name0.take(idx), name0.drop(idx + 1))
        val purl =
          if (name.nonEmpty && version.nonEmpty)
            Some(s"pkg:cpan/$name@$version")
          else None
        VisitedUri(uri = base + url, sourceUri = sourceUri,
          packageUrl = purl)
    }.toSeq
  }

  /** CPAN readme → JSON (`cpan.py:179-200`, golden
    * `cpan/expected_readme.json`): ALL-CAPS lines open sections,
    * stripped body lines join under the previous header. The
    * reference only flushes a section when the NEXT header appears,
    * so the final section is dropped — reproduced as-is. */
  def cpanReadmeSections(readme: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var head: Option[String] = None
    var body = List.newBuilder[String]
    readme.linesIterator.foreach { line =>
      val isUpper = line.exists(_.isLetter) &&
        line.forall(c => !c.isLetter || c.isUpper)
      if (line.length > 1 && isUpper && !line.startsWith(" ")) {
        head.foreach { h =>
          out += h -> body.result().mkString("\n")
            .dropWhile(_ == '\n').reverse.dropWhile(_ == '\n').reverse
        }
        head = Some(line)
        body = List.newBuilder[String]
      } else body += line.trim
    }
    out.toSeq
  }

  /** RubyGems specs index (`minecode/miners/rubygems.py:56-86`,
    * golden `rubygems/index/latest_specs.4.8.gz.expected.json`): for
    * each `[name, version, platform]` Marshal triple, the versions
    * API URI, then the .gem download URI (platform suffixed unless
    * "ruby"). */
  def rubyGemsIndexUris(specsGzBytes: Array[Byte], sourceUri: String)
      : Iterator[VisitedUri] =
    graft.sources.RubyMarshal
      .gemSpecs(graft.sources.GzipTolerant.readAll(specsGzBytes))
      .flatMap { case (name, version, platform) =>
        val download =
          if (platform != "ruby")
            s"https://rubygems.org/downloads/$name-$version-$platform.gem"
          else s"https://rubygems.org/downloads/$name-$version.gem"
        Iterator(
          VisitedUri(
            uri = s"https://rubygems.org/api/v1/versions/$name.json",
            sourceUri = sourceUri,
            packageUrl = Some(s"pkg:gem/$name")),
          VisitedUri(
            uri = download,
            sourceUri = sourceUri,
            packageUrl = Some(s"pkg:gem/$name@$version")))
      }

  /** NuGet search query root (`minecode/miners/nuget.py:44-56`):
    * `totalHits` paginates into skip=0,20,40,… query URIs. */
  def nugetQueryUris(json: String, sourceUri: String): Seq[VisitedUri] = {
    val total = (JsonMethods.parse(json) \ "totalHits") match {
      case JInt(n) => n.toLong; case _ => 0L
    }
    (0L until total by 20L).map(count =>
      VisitedUri(uri = s"https://api-v2v3search-0.nuget.org/query?skip=$count",
        sourceUri = sourceUri)).toSeq
  }

  /** NuGet packages HTML listing (`minecode/miners/nuget.py:131-152`,
    * golden `nuget/packages.html.expected.json`): one package-page
    * URI per `package-title` anchor, then the next ?page= URI when
    * the page listed any package. */
  def nugetHtmlPageUris(html: String, sourceUri: String): Seq[VisitedUri] = {
    val ARx =
      "(?s)<a\\b[^>]*class=\"[^\"]*package-title[^\"]*\"[^>]*href=\"([^\"]*)\"|<a\\b[^>]*href=\"([^\"]*)\"[^>]*class=\"[^\"]*package-title[^\"]*\"".r
    val names = ARx.findAllMatchIn(html).toSeq
      .map(m => Option(m.group(1)).getOrElse(m.group(2)))
      .map(_.stripPrefix("/").stripSuffix("/"))
      .map(h => h.split("/", 2).toSeq match {
        case Seq(_, name) => name; case _ => ""
      })
      .filter(_.nonEmpty)
    val pages = names.map(name => VisitedUri(
      uri = s"https://www.nuget.org/packages/$name", sourceUri = sourceUri))
    if (pages.isEmpty) pages
    else {
      val pageId = sourceUri
        .replace("https://www.nuget.org/packages?page=", "").stripSuffix("/")
      pages :+ VisitedUri(
        uri = s"https://www.nuget.org/packages?page=${pageId.toInt + 1}",
        sourceUri = sourceUri)
    }
  }

  /** NuGet search results page (`minecode/miners/nuget.py:59-88`):
    * per package-version registration URIs (fixing the registry's
    * stray trailing `.0` version segment), then the alternate
    * registration0/registration1 form of each. */
  def nugetPageUris(json: String, sourceUri: String): Seq[VisitedUri] =
    (JsonMethods.parse(json) \ "data") match {
      case JArray(packages) => packages.flatMap { p =>
        (p \ "versions") match {
          case JArray(versions) => versions.flatMap { v =>
            (v \ "version", v \ "@id") match {
              case (JString(ver), JString(id0)) =>
                val name = id0
                  .replace("https://api.nuget.org/v3/registration1/", "")
                  .split("/")(0)
                val versionName = s"$ver.0.json"
                val id = if (id0.contains(versionName))
                  id0.replace(versionName, s"$ver.json") else id0
                val first = VisitedUri(uri = id, sourceUri = sourceUri,
                  packageUrl = Some(s"pkg:nuget/$name@$ver"))
                val alternate =
                  if (id.contains("/registration0/"))
                    Some(VisitedUri(
                      uri = id.replace("/registration0/", "/registration1/"),
                      sourceUri = sourceUri))
                  else if (id.contains("/registration1/"))
                    Some(VisitedUri(
                      uri = id.replace("/registration1/", "/registration0/"),
                      sourceUri = sourceUri))
                  else None
                first +: alternate.toSeq
              case _ => Seq.empty
            }
          }
          case _ => Seq.empty
        }
      }
      case _ => Seq.empty
    }

  /** NuGet registration leaf (`minecode/miners/nuget.py:92-127`): the
    * nupkg `packageContent` (purl from its file name) and the
    * `catalogEntry` URI. */
  def nugetDownloadUris(json: String, sourceUri: String): Seq[VisitedUri] = {
    val root = JsonMethods.parse(json)
    val content = (root \ "packageContent") match {
      case JString(u) =>
        val fileName = u.substring(u.lastIndexOf('/') + 1)
        val stem = fileName.replace(".nupkg", "")
        val i = stem.indexOf('.')
        val (name, version) =
          if (i < 0) (stem, None) else (stem.substring(0, i),
            Some(stem.substring(i + 1)))
        Seq(VisitedUri(uri = u, sourceUri = sourceUri,
          packageUrl = Some(s"pkg:nuget/$name" +
            version.map("@" + _).getOrElse(""))))
      case _ => Seq.empty
    }
    val catalog = (root \ "catalogEntry") match {
      case JString(u) => Seq(VisitedUri(uri = u, sourceUri = sourceUri))
      case _          => Seq.empty
    }
    content ++ catalog
  }

  /** GitLab projects API page (`minecode/miners/gitlab.py:58-96`):
    * each project's `web_url` becomes a URI named after the project's
    * last path segment, carrying the record as payload. */
  def gitlabProjectsUris(json: String, sourceUri: String): Seq[VisitedUri] =
    JsonMethods.parse(json) match {
      case JArray(projects) => projects.flatMap { p =>
        (p \ "web_url") match {
          case JString(url) =>
            // gitlab purl names are case-insensitive → lowercased
            // (packageurl-python type normalization)
            val name = url.substring(url.lastIndexOf('/') + 1).toLowerCase
            Some(VisitedUri(uri = url, sourceUri = sourceUri,
              packageUrl = Some(s"pkg:gitlab/$name"),
              data = Some(compact(p))))
          case _ => None
        }
      }
      case _ => Seq.empty
    }

  /** Bitbucket repository index page
    * (`minecode/miners/bitbucket.py:74-87`): only the `next` link is a
    * new URI — each page's repo records flow to the mapper. */
  /** Apache foundation projects.json (`minecode/miners/apache.py:
    * 273-313`, golden `apache/projects_uris-expected.json`): one
    * per-project JSON URI per entry, dated from `created` — no
    * source_uri, matching the reference's URI construction. */
  def apacheProjectsUris(json: String): Seq[VisitedUri] =
    (JsonMethods.parse(json): @unchecked) match {
      case JObject(projects) => projects.map { case (name, meta) =>
        VisitedUri(
          uri = s"https://projects.apache.org/json/projects/$name.json",
          sourceUri = null,
          packageUrl = Some(s"pkg:apache/$name"),
          date = (meta \ "created") match {
            case JString(d) if d.nonEmpty => Some(d); case _ => None
          })
      }
    }

  /** Paginated bitbucket details (`minecode/miners/bitbucket.py:
    * 104-111`, golden `paginated_tags_expected_uris.json`): follow
    * the payload's `next` link with the repo purl derived from the
    * page URI. */
  def bitbucketPaginatedUris(json: String, pageUri: String)
      : Seq[VisitedUri] =
    (JsonMethods.parse(json) \ "next") match {
      case JString(next) if next.nonEmpty =>
        val purl = "/repositories/([^/]+)/([^/?]+)".r
          .findFirstMatchIn(pageUri)
          .map(m => s"pkg:bitbucket/${m.group(1)}/${m.group(2)}")
        Seq(VisitedUri(uri = next, sourceUri = pageUri, packageUrl = purl))
      case _ => Seq.empty
    }

  /** Maven nexus index properties (`minecode/miners/maven.py:
    * 114-136`, golden `expected_properties_uris.json`): each
    * `nexus.index.incremental-N=526` row points at one increment
    * index fragment. */
  def mavenIndexPropertiesUris(properties: String, sourceUri: String)
      : Seq[VisitedUri] =
    properties.linesIterator
      .map(_.trim)
      .filter(l => l.startsWith("nexus.index.incremental") && l.contains("="))
      .map { l =>
        val value = l.split("=", 2)(1).trim
        VisitedUri(
          uri = "https://repo1.maven.org/maven2/.index/" +
            s"nexus-maven-repository-index.$value.gz",
          sourceUri = sourceUri)
      }.toSeq

  def bitbucketIndexUris(json: String, sourceUri: String): Seq[VisitedUri] =
    (JsonMethods.parse(json) \ "next") match {
      case JString(next) => Seq(VisitedUri(uri = next, sourceUri = sourceUri))
      case _             => Seq.empty
    }

  /** Single Bitbucket repo record → detail URIs
    * (`minecode/miners/bitbucket.py:170-198`): latest commit
    * (pagelen=1), fork/watcher counts (fields=size), and the paginated
    * tags/downloads when the record links them. */
  def bitbucketRepoUris(json: String, sourceUri: String): Seq[VisitedUri] = {
    val root = JsonMethods.parse(json)
    val fullName = (root \ "full_name") match {
      case JString(s) => s.trim; case _ => ""
    }
    val purl = Some(s"pkg:bitbucket/$fullName")
    def link(name: String): Option[String] =
      (root \ "links" \ name \ "href") match {
        case JString(h) => Some(h); case _ => None
      }
    link("commits").map(u => VisitedUri(uri = u + "?pagelen=1",
      sourceUri = sourceUri, packageUrl = purl)).toSeq ++
      Seq("forks", "watchers").flatMap(l => link(l).map(u =>
        VisitedUri(uri = u + "?pagelen=1&fields=size",
          sourceUri = sourceUri, packageUrl = purl))) ++
      Seq("refs/tags", "downloads").flatMap(l => link(l).map(u =>
        VisitedUri(uri = u + "?pagelen=100",
          sourceUri = sourceUri, packageUrl = purl)))
  }

  private val ApacheArchiveExts = Seq(
    ".jar", ".zip", ".tar.gz", ".tgz", ".tar.bz2", ".war", ".tar.xz",
    ".tar", ".whl", ".gem", ".nupkg")

  private val ApacheChecksumExts = Seq(".sha256", ".sha512", ".md5", ".sha", ".sha1")

  private val ApacheIgnoredPathContains = Seq(
    "META/", "/documentation/", "/doc/", "-doc.", "-doc-", "/docs/",
    "-docs.", "-docs-", "javadoc", "fulldoc", "apidoc", "-manual.",
    "-asdocs.", "updatesite/", "eclipse-update-site", "update/eclipse",
    "sling/eclipse", "eclipse.site-", "-distro.", "-bin-withdeps.",
    "-bin-with-deps", "apache-airavata-distribution",
    "apache-airavata-server", "apache-mahout-distribution",
    "/syncope-standalone-", "binaries/conda", "perl/contrib", "zzz",
    "ant/manual")

  /** Apache purl from a dist path (`minecode/miners/apache.py:224-249`):
    * name = first segment; the version segment is only trusted for
    * `/distribution/` and `/sources/` layouts. */
  def apachePurl(path: String): String = {
    val segments = path.split("/").filter(_.nonEmpty)
    val version =
      if (segments.length > 1 &&
        (path.contains("/distribution/") || path.contains("/sources/")))
        Some(segments(1))
      else None
    s"pkg:apache/${segments.head}" + version.map("@" + _).getOrElse("")
  }

  /** Apache dist `find -ls` index (`minecode/miners/apache.py:184-221`):
    * archive + archive-checksum files (screened against the ignore
    * list) become dist URIs; archives are pre-visited (they go
    * straight to scanning), checksum files need a further visit. */
  def apacheFindLsUris(listing: String, sourceUri: String): Seq[VisitedUri] = {
    val kept = ApacheArchiveExts ++
      (for (ae <- ApacheArchiveExts; ce <- ApacheChecksumExts) yield ae + ce)
    listing.linesIterator.flatMap { line =>
      val fields = line.trim.split("\\s+", 11)
      if (fields.length < 11) None
      else {
        val perms = fields(2)
        val size = fields(6).toLongOption
        val path = fields(10).stripPrefix("./")
        if (!perms.startsWith("-")) None
        else if (!kept.exists(path.endsWith) ||
          ApacheIgnoredPathContains.exists(path.contains)) None
        else Some(VisitedUri(
          uri = s"https://apache.org/dist/$path",
          sourceUri = sourceUri,
          packageUrl = Some(apachePurl(path)),
          size = size,
          visited = !ApacheChecksumExts.exists(path.endsWith)))
      }
    }.toSeq
  }

  private val ApacheRowRx =
    ("""<a href="([^"]+)"[^>]*>[^<]*</a></td>\s*""" +
      """<td[^>]*>([^<]*)</td>\s*<td[^>]*>([^<]*)</td>""").r

  private val DateMinuteRx = """\d{4}-\d{2}-\d{2} \d{2}:\d{2}""".r

  /** OpenSSL ftp directory listing (`minecode/miners/openssl.py:31-97`):
    * every row link (skipping sort/parent links) becomes a URI with
    * the listing's last-modified date and size; sizes are kilobytes
    * unless suffixed M/G; files get a `pkg:generic/openssl` purl with
    * the version cut out of `openssl-{v}.tar.gz*` names. */
  def opensslIndexUris(html: String, sourceUri: String): Seq[VisitedUri] =
    ApacheRowRx.findAllMatchIn(html).flatMap { m =>
      val href = m.group(1)
      if (href.startsWith("?") || href.startsWith("/")) None
      else {
        val url = sourceUri + href
        val date = DateMinuteRx.findFirstIn(m.group(2).trim).map(_ + ":00")
        val rawSize = m.group(3).trim
        val size: Option[Long] =
          if (rawSize.forall(_.isDigit) && rawSize.nonEmpty)
            Some(rawSize.toLong * 1024L)
          else if (rawSize.toLowerCase.endsWith("m"))
            rawSize.dropRight(1).toDoubleOption.map(d => (d * 1024 * 1024).toLong)
          else if (rawSize.toLowerCase.endsWith("g"))
            rawSize.dropRight(1).toDoubleOption.map(d => (d * 1024 * 1024 * 1024).toLong)
          else None
        if (url.endsWith("/"))
          Some(VisitedUri(uri = url, sourceUri = sourceUri, date = date,
            size = size))
        else {
          val fileName = url.substring(url.lastIndexOf('/') + 1)
          val version =
            if (fileName.contains("tar.gz"))
              Some(fileName.replace("openssl-", "").split("\\.tar\\.gz")(0))
            else None
          Some(VisitedUri(
            uri = url, sourceUri = sourceUri,
            packageUrl = Some("pkg:generic/openssl" +
              version.map("@" + _).getOrElse("")),
            fileName = Some(fileName), date = date, size = size))
        }
      }
    }.toSeq

  private val SublevelRepoRx =
    """class=["']sublevel-repo["'][^>]*>\s*<a[^>]*href="([^"]+)"[^>]*>([^<]+)<""".r

  /** Eclipse Git repository index (`minecode/miners/eclipse.py:55-70`):
    * each `td.sublevel-repo` link is one repository URI with a
    * `pkg:eclipse` purl named after the repo. */
  /** Maven/jcenter HTML directory page
    * (`minecode/miners/maven.py:257-283`, goldens
    * `maven/html/visitor_expected_*.json`): every `<pre>` anchor
    * appended to the page URI; a leading `:` is a bintray special
    * char and is stripped; files (non-`/` suffix) carry file_name. */
  def mavenHtmlPageUris(html: String, pageUri: String): Seq[VisitedUri] = {
    val PreRx = "(?s)<pre[^>]*>(.*?)</pre>".r
    val ARx = """<a\b[^>]*href="([^"]*)"""".r
    PreRx.findAllMatchIn(html).flatMap(pre =>
      ARx.findAllMatchIn(pre.group(1)).map(_.group(1))).collect {
      case href if href.nonEmpty =>
        val url = if (href.startsWith(":")) href.drop(1) else href
        VisitedUri(uri = pageUri + url, sourceUri = pageUri,
          fileName = if (url.endsWith("/")) None else Some(url))
    }.toSeq
  }

  /** maven-metadata.xml (`minecode/miners/maven.py:288-345`, golden
    * `maven/maven-metadata/expected_maven_xml.json`): per version,
    * the pre-visited jar and sources-jar URIs and the to-visit POM
    * URI. */
  def mavenMetadataXmlUris(xml: String, pageUri: String): Seq[VisitedUri] = {
    val TagRx = "(?s)<(groupId|artifactId|version)>\\s*([^<]*?)\\s*</\\1>".r
    val tags = TagRx.findAllMatchIn(xml)
      .map(m => m.group(1) -> m.group(2)).toSeq
    val groupId = tags.collectFirst { case ("groupId", v) => v }
    val artifactId = tags.collectFirst { case ("artifactId", v) => v }
    (groupId, artifactId) match {
      case (Some(g), Some(a)) =>
        val base = pageUri.split("maven-metadata\\.xml")(0)
        tags.collect { case ("version", v) => v }.flatMap { v =>
          val purl = Some(s"pkg:maven/$g/$a@$v")
          Seq(
            VisitedUri(uri = s"$base$v/$a-$v.jar", sourceUri = pageUri,
              packageUrl = purl, visited = true),
            VisitedUri(uri = s"$base$v/$a-$v-sources.jar",
              sourceUri = pageUri, packageUrl = purl, visited = true),
            VisitedUri(uri = s"$base$v/$a-$v.pom", sourceUri = pageUri,
              packageUrl = purl))
        }
      case _ => Seq.empty
    }
  }

  /** Eclipse list-of-projects page (`minecode/miners/eclipse.py:32-45`,
    * golden `eclipse/eclipse_projects_expected`): one URI per
    * projects.eclipse.org project link. */
  def eclipseProjectsListUris(html: String, sourceUri: String)
      : Seq[VisitedUri] = {
    val AnyHrefRx = """<a\b[^>]*href="([^"]+)"""".r
    AnyHrefRx.findAllMatchIn(html).map(_.group(1)).collect {
      case href if href.startsWith("https://projects.eclipse.org/projects/") =>
        val project =
          href.replace("https://projects.eclipse.org/projects/", "")
        VisitedUri(uri = href, sourceUri = sourceUri,
          packageUrl = Some(s"pkg:eclipse/$project"))
    }.toSeq
  }

  def eclipseGitRepoUris(html: String, sourceUri: String): Seq[VisitedUri] =
    SublevelRepoRx.findAllMatchIn(html).map { m =>
      VisitedUri(uri = m.group(1), sourceUri = sourceUri,
        packageUrl = Some(s"pkg:eclipse/${purlName(m.group(2))}"))
    }.toSeq

  private val FieldContentRx =
    """class=["']field-content["'][^>]*>\s*<a[^>]*href="([^"]+)"[^>]*>([^<][^<]*)<""".r

  /** Eclipse all-packages page (`minecode/miners/eclipse.py:73-96`):
    * `span.field-content` links to release pages; anchors whose first
    * child is markup rather than text are skipped like the
    * reference's isinstance(str) guard. */
  def eclipsePackagesUris(html: String, sourceUri: String): Seq[VisitedUri] =
    FieldContentRx.findAllMatchIn(html).map { m =>
      VisitedUri(uri = m.group(1), sourceUri = sourceUri,
        packageUrl = Some(s"pkg:eclipse/${purlName(m.group(2))}"))
    }.toSeq

  private val EclipseReleaseSuffixes = Seq(
    "-win32.zip", "-win64.exe", "-win32-x86_64.zip",
    "-linux-gtk-x86_64.tar.gz", "-macosx-cocoa-x86_64.tar.gz",
    "-linux-gtk.tar.gz", "-x86_64.tar.gz")

  private val EclipseDivOrLinkRx =
    """(?i)<div\b|</div\s*>|<a\b[^>]*href="([^"]*download\.php\?file=[^"]*)"""".r

  /** Eclipse release page (`minecode/miners/eclipse.py:98-129`):
    * every `download.php?file=` link is a distribution artifact; the
    * platform suffix strips off the file name to form the purl.
    * The reference iterates every `<div>` and re-yields the links of
    * its whole SUBTREE, so a link appears once per ancestor div — its
    * expected fixture (337 rows, 27 unique links) depends on that
    * multiplicity, reproduced here with a div-interval scan. */
  def eclipseReleaseUris(html: String, sourceUri: String): Seq[VisitedUri] = {
    val divs = Seq.newBuilder[(Int, Int)]
    var stack = List.empty[Int]
    val links = Seq.newBuilder[(Int, String)]
    EclipseDivOrLinkRx.findAllMatchIn(html).foreach { m =>
      val tok = m.matched.toLowerCase
      if (tok.startsWith("<div")) stack ::= m.start
      else if (tok.startsWith("</div")) stack match {
        case s :: rest => divs += ((s, m.start)); stack = rest
        case Nil       =>
      }
      else links += ((m.start, m.group(1)))
    }
    stack.foreach(s => divs += ((s, html.length))) // unclosed divs
    val allLinks = links.result()
    divs.result().sortBy(_._1).flatMap { case (s, e) =>
      allLinks.collect { case (pos, url) if pos > s && pos < e =>
        val fileName = url.substring(url.lastIndexOf('/') + 1)
        val name = EclipseReleaseSuffixes.foldLeft(fileName)(
          (n, suf) => n.replace(suf, ""))
        VisitedUri(uri = url, sourceUri = sourceUri,
          packageUrl = Some(s"pkg:eclipse/${purlName(name)}"),
          fileName = Some(fileName))
      }
    }
  }

  /** purl name segment encoding as packageurl-python emits it for
    * these visitors (space → %20; other characters in the fixtures
    * are purl-safe). */
  private def purlName(name: String): String =
    name.trim.replace(" ", "%20")

  private val RepoHosters = Seq("bitbucket.org/", "github.com/", "gitlab.com/")

  /** Go standard-library prefix screen
    * (`minecode/miners/golang.py:115-176`). The reference's check is
    * `startswith` over this tuple, so e.g. `gopkg.in/...` (prefix
    * "go") is also screened out — reproduced verbatim, its expected
    * fixtures depend on it. */
  private val GoStandardPrefixes = Seq(
    "archive", "bufio", "builtin", "bytes", "compress", "container",
    "context", "crypto", "database", "debug", "encoding", "expvar",
    "flag", "fmt", "go", "hash", "html", "image", "index", "io", "log",
    "math", "mime", "net", "os", "path", "plugin", "reflect", "regexp",
    "runtime", "sort", "strconv", "strings", "sync", "syscall",
    "testing", "text", "time", "unsafe", "golang.org/x/benchmarks",
    "golang.org/x/blog", "golang.org/x/build", "golang.org/x/crypto",
    "golang.org/x/debug", "golang.org/x/image", "golang.org/x/mobile",
    "golang.org/x/net", "golang.org/x/perf", "golang.org/x/review",
    "golang.org/x/sync", "golang.org/x/sys", "golang.org/x/text",
    "golang.org/x/time", "golang.org/x/tools", "golang.org/x/tour",
    "golang.org/x/exp")

  def isStandardGoImport(path: String): Boolean =
    GoStandardPrefixes.exists(path.startsWith)

  /** Go import path → (purl, canonical path)
    * (`minecode/miners/golang.py:179-212`): well-known-hoster paths
    * truncate to 3 segments and carry the repo as a `vcs_repository`
    * qualifier; namespace is every segment but the last. */
  def parseGoPackagePath(path: String): (String, String) = {
    val isHosted = RepoHosters.exists(path.startsWith)
    val segments0 = path.split("/").toSeq
    val segments = if (isHosted) segments0.take(3) else segments0
    val canonical = segments.mkString("/")
    val name = segments.last
    val namespace =
      if (segments.length > 1) Some(segments.dropRight(1).mkString("/")) else None
    val base = s"pkg:golang/${namespace.map(_ + "/").getOrElse("")}$name"
    val purl =
      if (isHosted) s"$base?vcs_repository=https://$canonical" else base
    (purl, canonical)
  }

  private val DebArchiveSuffixes = Seq(
    ".deb", ".udeb", ".tar.gz", ".tar.xz", ".tar.bz2", ".tar.lzma")

  /** `name_version_arch.deb` → (name, version, arch) after stripping
    * the archive suffix (debian_inspector `get_nva` behavior consumed
    * by `minecode/miners/debian.py:131-139`). */
  def debNva(fileName: String): (String, Option[String], Option[String]) = {
    val stem = DebArchiveSuffixes.find(fileName.endsWith)
      .map(s => fileName.dropRight(s.length)).getOrElse(fileName)
    stem.split("_").toSeq match {
      case Seq(n, v, a) => (n, Some(v), Some(a))
      case Seq(n, v)    => (n, Some(v), None)
      case _            => (stem, None, None)
    }
  }

  /** A Debian-archive file worth collecting
    * (`minecode/miners/debian.py:68-87`): package indexes, Release
    * files, Contents indexes, and the .deb/.dsc artifacts. */
  def isDebCollectible(fileName: String): Boolean =
    Seq("Packages.gz", "Release", "Sources.gz").contains(fileName) ||
      fileName.endsWith(".deb") || fileName.endsWith(".dsc") ||
      (fileName.startsWith("Contents-") && fileName.endsWith(".gz"))

  /** Debian/Ubuntu `ls-lR.gz` directory-index visitor
    * (`minecode/miners/debian.py:104-151`): every collectible FILE
    * entry becomes a pool URI; binary artifacts carry a versioned
    * `pkg:deb` purl with the arch qualifier. */
  def debianLsLrUris(listing: String, sourceUri: String): Seq[VisitedUri] = {
    val namespace =
      if (sourceUri.contains("debian.org")) Some("debian")
      else if (sourceUri.contains("ubuntu")) Some("ubuntu")
      else None
    namespace.toSeq.flatMap { ns =>
      LsParser.parse(listing).filter(_.isFile).flatMap { e =>
        val path = e.path.dropWhile(_ == '/')
        val fileName = path.substring(path.lastIndexOf('/') + 1)
        if (!isDebCollectible(fileName)) None
        else {
          val purl =
            if (DebArchiveSuffixes.exists(fileName.endsWith)) {
              val (n, v, a) = debNva(fileName)
              Some(s"pkg:deb/$ns/$n" + v.map("@" + _).getOrElse("") +
                a.map("?arch=" + _).getOrElse(""))
            } else None
          Some(VisitedUri(
            uri = sourceUri.replace("ls-lR.gz", path),
            sourceUri = sourceUri,
            packageUrl = purl,
            fileName = Some(fileName),
            size = e.size,
            date = e.date))
        }
      }
    }
  }

  private val LocRx = """<loc>\s*([^<]+?)\s*</loc>""".r

  /** SourceForge master sitemap (`minecode/miners/sourceforge.py:31-48`):
    * one URI per sub-sitemap `<loc>`. */
  def sourceforgeSitemapIndexUris(xml: String, sourceUri: String)
      : Seq[VisitedUri] =
    LocRx.findAllMatchIn(xml).map(m =>
      VisitedUri(uri = m.group(1), sourceUri = sourceUri)).toSeq

  private val SfProjectRx =
    """^https?://sourceforge.net/projects/[a-z0-9.-]+/?$""".r

  /** SourceForge sub-sitemap (`minecode/miners/sourceforge.py:51-68`):
    * project page `<loc>`s become project-JSON API URIs with a
    * `pkg:sourceforge` purl. */
  def sourceforgeSitemapPageUris(xml: String, sourceUri: String)
      : Seq[VisitedUri] =
    LocRx.findAllMatchIn(xml).map(_.group(1)).collect {
      case loc if SfProjectRx.findFirstIn(loc).isDefined =>
        val name = loc.split("https?://sourceforge.net/projects/").last
          .reverse.dropWhile(_ == '/').reverse
        VisitedUri(
          uri = s"https://sourceforge.net/api/project/name/$name/json",
          sourceUri = sourceUri,
          packageUrl = Some(s"pkg:sourceforge/$name"))
    }.toSeq

  /** godoc search API (`minecode/miners/golang.py:63-84`): one
    * pre-visited purl-as-URI per distinct canonical package path, the
    * result record (popcounts + synopsis) as payload. */
  def godocSearchUris(json: String, sourceUri: String): Seq[VisitedUri] =
    (JsonMethods.parse(json) \ "results") match {
      case JArray(results) =>
        val seen = scala.collection.mutable.Set.empty[String]
        results.flatMap { r =>
          (r \ "path") match {
            case JString(path) if !isStandardGoImport(path) =>
              val (purl, canonical) = parseGoPackagePath(path)
              if (seen.add(canonical))
                Some(VisitedUri(
                  uri = purl,
                  sourceUri = sourceUri,
                  packageUrl = Some(purl),
                  data = Some(compact(r)),
                  visited = true))
              else None
            case _ => None
          }
        }
      case _ => Seq.empty
    }
}
