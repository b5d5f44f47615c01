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
            hostMap.collectFirst {
              case (host, template) if url.startsWith(host) =>
                val owner = url.substring(host.length, url.indexOf(name) - 1)
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
