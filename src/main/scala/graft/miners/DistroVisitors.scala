package graft.miners

import graft.miners.RegistryVisitors.VisitedUri
import graft.sources.{EcosystemParsers, GzipTolerant}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Frontier visitors for the distro / hosting-site miners: FreeBSD
  * pkg mirrors, OpenWrt download trees, gstreamer source listings,
  * freedesktop.org wiki, and the Google Code archive. Each is a pure
  * content→URIs function validated against the reference's own
  * `*_expected` fixtures; fetching happens through the injected
  * [[Transport]] on executors.
  */
object DistroVisitors {

  private val HrefRx = """<a href="([^"]+)"""".r
  private val HrefTitleRx = """<a href="([^"]+)"\s+title=""".r
  private val AnchorTextRx = """<a[^>]*href="([^"]+)"[^>]*>([^<]*)<""".r
  private val TdAnchorRx = """<td[^>]*>\s*<a href="([^"]+)"""".r

  /** Attribute values arrive entity-encoded in raw HTML; the reference
    * reads them through BeautifulSoup, which decodes them. */
  private def dec(s: String): String = Mappers.decodeEntities(s)

  // ------------------------------------------------------------- freebsd

  /** pkg.freebsd.org home (`minecode/miners/freebsd.py:39-53`): one
    * URI per `FreeBSD%3A...` repo link. */
  def freebsdBaseUris(html: String, sourceUri: String): Seq[VisitedUri] =
    HrefRx.findAllMatchIn(html).map(m => dec(m.group(1))).collect {
      case href if href.startsWith("FreeBSD%3A") =>
        VisitedUri(uri = s"https://pkg.freebsd.org/$href/",
          sourceUri = sourceUri)
    }.toSeq

  /** Repo sub-listing (`minecode/miners/freebsd.py:56-68`): anchors
    * carrying a `title` attribute (the parent link has none). */
  def freebsdSubUris(html: String, pageUri: String): Seq[VisitedUri] =
    HrefTitleRx.findAllMatchIn(html).map(m => dec(m.group(1))).map { href =>
      VisitedUri(uri = pageUri + href, sourceUri = pageUri)
    }.toSeq

  // ------------------------------------------------------------- openwrt

  /** downloads.openwrt.org listing pages
    * (`minecode/miners/openwrt.py:42-62`): first anchor of each table
    * cell; folders become openwrt purls, `Packages[.gz]` / `.ipk`
    * links pass through for the index/archive visitors. */
  def openwrtDownloadPageUris(html: String, pageUri: String): Seq[VisitedUri] =
    TdAnchorRx.findAllMatchIn(html).map(m => dec(m.group(1))).flatMap {
      case "../" => None
      case href if href.endsWith("/") =>
        Some(VisitedUri(uri = pageUri + href, sourceUri = pageUri,
          packageUrl = Some(s"pkg:openwrt/${href.replace("/", "")}")))
      case href if href.endsWith("Packages") || href.endsWith("Packages.gz") ||
          href.endsWith(".ipk") =>
        Some(VisitedUri(uri = pageUri + href, sourceUri = pageUri))
      case _ => None
    }.toSeq

  /** `Packages.gz` index (`minecode/miners/openwrt.py:65-95`): one URI
    * per control paragraph with a `Filename`, carrying the serialized
    * paragraph as data plus md5/sha256, purl from Package+Version. */
  def openwrtPackagesGzUris(gz: Array[Byte], indexUri: String): Seq[VisitedUri] = {
    val base = indexUri.replace("Packages.gz", "")
    EcosystemParsers.debParagraphs(new String(GzipTolerant.readAll(gz), "UTF-8"))
      .flatMap { para =>
        val m = para.toMap
        m.get("Filename").map { fileInfo =>
          val purl = for (n <- m.get("Package"); v <- m.get("Version"))
            yield s"pkg:openwrt/$n@$v"
          VisitedUri(
            uri = base + fileInfo.dropWhile(_ == '/'),
            sourceUri = indexUri,
            packageUrl = purl,
            data = Some(JsonMethods.compact(
              JString(EcosystemParsers.debSerialize(para)))),
            md5 = m.get("MD5Sum"),
            sha256 = m.get("SHA256sum"))
        }
      }
  }

  // ----------------------------------------------------------- gstreamer

  /** gstreamer.freedesktop.org/src listings
    * (`minecode/miners/gstreamer.py:32-72`): folders recurse; files
    * yield a purl split on the LAST `-` of the full file name (so the
    * "version" keeps its archive extension — the reference's checked-in
    * expected fixtures pin that quirk, e.g.
    * `pkg:gstreamer/gst-openmax@0.10.0.2.tar.bz2`). */
  def gstreamerSrcUris(html: String, pageUri: String): Seq[VisitedUri] =
    HrefRx.findAllMatchIn(html).map(m => dec(m.group(1))).flatMap {
      case href if href.startsWith("/") || href.startsWith("?") => None
      case href if href.endsWith("/") =>
        Some(VisitedUri(uri = pageUri + href, sourceUri = pageUri))
      case fileName =>
        val base = fileName.lastIndexOf('.') match {
          case -1 => fileName
          case i  => fileName.substring(0, i)
        }
        val purl =
          if (base.contains("-")) {
            val cut = fileName.lastIndexOf('-')
            s"pkg:gstreamer/${fileName.substring(0, cut)}@${fileName.substring(cut + 1)}"
          } else s"pkg:gstreamer/$fileName"
        Some(VisitedUri(uri = pageUri + fileName, sourceUri = pageUri,
          packageUrl = Some(purl), fileName = Some(fileName)))
    }.toSeq

  // --------------------------------------------------------- freedesktop

  /** freedesktop.org Software wiki (`minecode/miners/freedesktop.py:
    * 28-47`): `./Name` links become freedesktop purls. The reference
    * loops `find_all("div")` and then each div's descendant anchors,
    * so an anchor under N nested divs is yielded N times — its own
    * expected fixture pins the duplication (204 = 68 links × 3 divs);
    * reproduced by emitting one pass per nesting level. */
  def freedesktopSoftwareUris(html: String, sourceUri: String): Seq[VisitedUri] = {
    val token = """(?s)(<div\b|</div\s*>|<a href="([^"]+)")""".r
    var depth = 0
    val anchors = Vector.newBuilder[(Int, String)]
    token.findAllMatchIn(html).foreach { m =>
      m.group(1) match {
        case t if t.startsWith("<div")  => depth += 1
        case t if t.startsWith("</div") => depth = math.max(0, depth - 1)
        case _ =>
          val href = dec(m.group(2))
          if (href.startsWith("./")) anchors += depth -> href
      }
    }
    val all = anchors.result()
    val maxDepth = if (all.isEmpty) 0 else all.map(_._1).max
    (1 to maxDepth).flatMap { level =>
      all.collect { case (d, href) if d >= level =>
        val name = href.stripPrefix("./").stripSuffix("/")
        VisitedUri(
          uri = s"https://www.freedesktop.org/wiki/Software/$name",
          sourceUri = sourceUri,
          packageUrl = Some(s"pkg:freedesktop/$name"))
      }
    }
  }

  // ---------------------------------------------------------- googlecode

  /** google-code-archive.txt.zip (`minecode/miners/googlecode.py:
    * 35-73`): each `gs://google-code-archive/v2/.../project.json` line
    * becomes a googleapis storage URL + googlecode purl. */
  def googlecodeArchiveZipUris(zip: Array[Byte], sourceUri: String): Seq[VisitedUri] =
    EcosystemParsers.zipEntries(zip)
      .collectFirst { case (n, b) if n.endsWith(".txt") => new String(b, "UTF-8") }
      .toSeq.flatMap(_.linesIterator)
      .map(_.trim)
      .filter(l => l.startsWith("gs://google-code-archive/v2") &&
        l.endsWith("/project.json"))
      .map { line =>
        val path = line.stripPrefix("gs://google-code-archive/v2")
        val name = path.stripSuffix("/project.json").stripPrefix("/").stripSuffix("/")
        val enc = "google-code-archive/o/v2" + path.replace("/", "%2F")
        VisitedUri(
          uri = s"https://www.googleapis.com/storage/v1/b/$enc?alt=media",
          sourceUri = sourceUri,
          packageUrl = Some(s"pkg:googlecode/$name"))
      }

  /** Archive search pages (`minecode/miners/googlecode.py:86-110`):
    * project links → project.json storage URLs; the `Next` anchor
    * yields the next search page. */
  def googlecodeProjectPageUris(html: String, sourceUri: String): Seq[VisitedUri] =
    AnchorTextRx.findAllMatchIn(html).flatMap { m =>
      val (href, text) = (dec(m.group(1)), m.group(2).trim)
      if (href.contains("https://code.google.com/archive/p/")) {
        val name = href.replace("https://code.google.com/archive/p/", "")
        Some(VisitedUri(
          uri = s"https://storage.googleapis.com/google-code-archive/v2/code.google.com/$name/project.json",
          sourceUri = sourceUri,
          packageUrl = Some(s"pkg:googlecode/${name.stripSuffix("/")}")))
      } else if (text.startsWith("Next"))
        Some(VisitedUri(uri = href, sourceUri = sourceUri))
      else None
    }.toSeq

  /** project.json visitor (`minecode/miners/googlecode.py:113-120`):
    * the project's first downloads page. */
  def googlecodeProjectJsonUris(projectJsonUri: String): Seq[VisitedUri] =
    Seq(VisitedUri(
      uri = projectJsonUri.replace("project.json", "downloads-page-1.json"),
      sourceUri = projectJsonUri))

  /** downloads-page-N.json (`minecode/miners/googlecode.py:122-174`):
    * the next page while pages remain, then one URI per download with
    * `name_version.ext` purl split, release date, size, and sha1. */
  def googlecodeDownloadsPageUris(json: String, pageUri: String): Seq[VisitedUri] = {
    val root = JsonMethods.parse(json)
    def int(v: JValue): Option[Int] = v match {
      case JInt(n) => Some(n.toInt); case _ => None
    }
    def str(v: JValue): Option[String] = v match {
      case JString(s) if s.nonEmpty => Some(s); case _ => None
    }
    val pageNum = int(root \ "pageNumber").getOrElse(1)
    val totalPages = int(root \ "totalPages").getOrElse(1)
    val fileName = s"downloads-page-$pageNum.json"
    val next =
      if (pageNum < totalPages)
        Seq(VisitedUri(
          uri = pageUri.replace(fileName, s"downloads-page-${pageNum + 1}.json"),
          sourceUri = pageUri))
      else Seq.empty
    val base = pageUri.replace(fileName, "")
    val downloads = (root \ "downloads") match {
      case JArray(ds) => ds.flatMap { d =>
        str(d \ "filename").map { fn =>
          val purl =
            if (fn.contains("_") && fn.contains(".")) {
              val cut = fn.indexOf('_')
              val rest = fn.substring(cut + 1)
              // no '.' after the '_' (e.g. "v1.2_readme"): the
              // reference's rpartition yields an empty version
              val version = rest.lastIndexOf('.') match {
                case -1 => ""
                case i  => rest.substring(0, i)
              }
              s"pkg:googlecode/${fn.substring(0, cut)}" +
                (if (version.isEmpty) "" else s"@$version")
            } else s"pkg:googlecode/$fn"
          val date = (d \ "releaseDate") match {
            case JInt(ts) =>
              Some(java.time.LocalDateTime.ofEpochSecond(ts.toLong, 0,
                java.time.ZoneOffset.UTC)
                .format(java.time.format.DateTimeFormatter
                  .ofPattern("yyyy-MM-dd HH:mm:ss")))
            case _ => None
          }
          VisitedUri(uri = base + fn, sourceUri = pageUri,
            packageUrl = Some(purl), fileName = Some(fn), date = date,
            size = (d \ "fileSize") match {
              case JInt(n) => Some(n.toLong); case _ => None
            },
            sha1 = str(d \ "sha1Checksum"))
        }
      }
      case _ => Seq.empty
    }
    next ++ downloads
  }

  // ------------------------------------------------------------ dockerhub

  /** Two-character search query conditions
    * (`minecode/miners/dockerhub.py:26-45`, golden
    * `dockerhub/conditions_expected`): the hub search API needs at
    * least two characters, so seed every aa..99 pair. */
  def dockerhubSearchConditions: Seq[String] = {
    val chars = ('a' to 'z').map(_.toString) ++ (0 to 9).map(_.toString)
    for (a <- chars; b <- chars) yield a + b
  }

  /** Seed URIs (`dockerhub.py:48-55`, golden
    * `dockerhub/seeds_expected`). */
  def dockerhubSeeds: Seq[String] =
    "https://hub.docker.com/explore/?page=1" +:
      dockerhubSearchConditions.map(c =>
        s"https://index.docker.io/v1/search?q=$c&n=100&page=1")

  /** Explore page (`dockerhub.py:58-98`, golden
    * `dockerhub/visitor_explore_page1_expected`): each `/_/name`
    * library link yields the HTML page and the v2 REST API URIs, and
    * a legal page yields the next explore page. */
  def dockerhubExplorePageUris(html: String, pageUri: String)
      : Seq[VisitedUri] = {
    val AnyHrefRx = """<a\b[^>]*href="([^"]+)"""".r
    val projects = AnyHrefRx.findAllMatchIn(html).map(m => dec(m.group(1)))
      .filter(_.startsWith("/_/")).toSeq
    val uris = projects.flatMap { href =>
      val project = href.drop(1) // "_/elixir/"
      val name = project.replace("_/", "library/").stripSuffix("/")
      val purl = Some(s"pkg:docker/$name")
      val leaf = href.split("/_/", 2).last
      Seq(
        VisitedUri(uri = s"https://hub.docker.com/$project",
          sourceUri = pageUri, packageUrl = purl),
        VisitedUri(
          uri = s"https://registry.hub.docker.com/v2/repositories/library/$leaf",
          sourceUri = pageUri, packageUrl = purl))
    }
    if (uris.isEmpty) uris
    else {
      val page = pageUri.split("=").last
      uris :+ VisitedUri(
        uri = s"https://hub.docker.com/explore/?page=${page.toInt + 1}",
        sourceUri = pageUri)
    }
  }

  /** Search API page (`dockerhub.py:135-160`, golden
    * `dockerhub/visitor_search_expected`): the next search page while
    * pages remain, then one v2 repository URI per result. */
  def dockerhubSearchUris(json: String, pageUri: String): Seq[VisitedUri] = {
    val root = JsonMethods.parse(json)
    def int(v: JValue): Option[Int] = v match {
      case JInt(n) => Some(n.toInt); case JString(s) => s.toIntOption
      case _ => None
    }
    val next = (int(root \ "page"), int(root \ "num_pages")) match {
      case (Some(p), Some(n)) if p < n =>
        Seq(VisitedUri(
          uri = pageUri.substring(0, pageUri.lastIndexOf('=') + 1) + (p + 1),
          sourceUri = pageUri))
      case _ => Seq.empty
    }
    val repos = (root \ "results") match {
      case JArray(rs) => rs.flatMap { r =>
        (r \ "name") match {
          case JString(name) if name.nonEmpty => Some(VisitedUri(
            uri = s"https://hub.docker.com/v2/repositories/$name",
            sourceUri = pageUri,
            packageUrl = Some(s"pkg:docker/$name")))
          case _ => None
        }
      }
      case _ => Seq.empty
    }
    next ++ repos
  }

  /** Project page metadata (`dockerhub.py:101-124`, golden
    * `dockerhub/visitor_library_elixir_expected`): the short
    * description from the card after the "Short Description" header,
    * and the license text as the concatenation of the text nodes and
    * tag-free paragraphs following the License h1 — whitespace
    * between paragraphs included, link-bearing paragraphs skipped,
    * exactly like the reference's sibling walk. */
  def dockerhubProjectMeta(html: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    val sdIdx = html.indexOf(">Short Description<")
    if (sdIdx >= 0) {
      val SpanRx = "(?s)<span[^>]*>([^<]*)</span>".r
      // the card block after the header, up to the next card: spans
      // in order, last one wins (the reference's sibling-span loop)
      val cardEnd = html.indexOf("Card__card", sdIdx)
      val block = html.substring(sdIdx,
        if (cardEnd < 0) math.min(html.length, sdIdx + 4000) else cardEnd)
      SpanRx.findAllMatchIn(block).map(_.group(1)).toSeq.lastOption
        .filter(_.nonEmpty).foreach(s => out += "summary" -> dec(s))
    }
    val licIdx = html.indexOf("<h1>License</h1>")
    if (licIdx >= 0) {
      val start = licIdx + "<h1>License</h1>".length
      val end = html.indexOf("</div>", start)
      val segment = html.substring(start, if (end < 0) html.length else end)
      val PRx = "(?s)<p>(.*?)</p>".r
      val sb = new StringBuilder
      var pos = 0
      PRx.findAllMatchIn(segment).foreach { m =>
        sb.append(segment.substring(pos, m.start))
        val inner = m.group(1)
        if (!inner.contains('<')) sb.append(dec(inner))
        pos = m.end
      }
      sb.append(segment.substring(pos))
      if (sb.nonEmpty) out += "license_text" -> sb.toString
    }
    out.result()
  }
}
