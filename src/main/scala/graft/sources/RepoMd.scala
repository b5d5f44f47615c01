package graft.sources

import graft.catalog.PackageRow
import graft.miners.Transport

/** S2/S7 — yum/dnf repository metadata: `repomd.xml` locates the
  * repository's metadata files; `primary.xml(.gz)` carries one record
  * per RPM (name, EVR version, checksum, summary/description, url,
  * license, source rpm, location). The collect walk mirrors the
  * reference's repomd visitor (`minecode/miners/repomd.py:94-110`,
  * parsers `minecode/miners/repodata.py:163-238`), golden-tested
  * against its centos/opensuse fixtures and their expected.json.
  */
object RepoMd {

  final case class RpmInfo(
      name: String, arch: Option[String],
      epoch: Option[String], ver: Option[String], rel: Option[String],
      checksumType: Option[String], pkgid: Option[String],
      summary: Option[String], description: Option[String],
      url: Option[String], license: Option[String],
      sourceRpm: Option[String], href: Option[String],
      packageBytes: Option[Long])

  private def textOf(n: scala.xml.NodeSeq): Option[String] = {
    val t = n.text.trim
    if (t.isEmpty) None else Some(t)
  }

  /** `repomd.xml` → the location href of a data entry by type
    * (`minecode/miners/repodata.py:97-118`). */
  def urlForType(repomdXml: String, dataType: String): Option[String] = {
    val root = scala.xml.XML.loadString(repomdXml)
    (root \ "data")
      .find(d => (d \@ "type") == dataType)
      .flatMap(d => (d \ "location").headOption.map(_ \@ "href"))
      .filter(_.nonEmpty)
  }

  /** `primary.xml` → per-package records in document order. */
  def parsePrimary(xml: String): Seq[RpmInfo] = {
    val root = scala.xml.XML.loadString(xml)
    (root \ "package").flatMap { p =>
      textOf(p \ "name").map { name =>
        val version = (p \ "version").headOption
        def vAttr(a: String): Option[String] =
          version.map(_ \@ a).filter(_.nonEmpty)
        val checksum = (p \ "checksum").headOption
        val fmt = (p \ "format").headOption
        RpmInfo(
          name = name,
          arch = textOf(p \ "arch"),
          epoch = vAttr("epoch"), ver = vAttr("ver"), rel = vAttr("rel"),
          checksumType = checksum.map(_ \@ "type").filter(_.nonEmpty),
          pkgid = checksum.flatMap(c => textOf(c)),
          summary = textOf(p \ "summary"),
          description = textOf(p \ "description"),
          url = textOf(p \ "url"),
          license = fmt.flatMap(f => textOf(f \ "license")),
          sourceRpm = fmt.flatMap(f => textOf(f \ "sourcerpm")),
          href = (p \ "location").headOption.map(_ \@ "href")
            .filter(_.nonEmpty),
          packageBytes = (p \ "size").headOption.map(_ \@ "package")
            .filter(_.nonEmpty).flatMap(_.toLongOption))
      }
    }
  }

  // ====================================================================
  // Full three-file repodata parsing (`minecode/miners/repodata.py`):
  // primary.xml + other.xml + filelists.xml each yield one DICT per
  // package; dicts sharing a pkgid merge (later keys win), changelogs
  // and file lists included. RawRpmDict mirrors the reference's dict
  // shape: `scalars` holds key → maybe-text (a key can be present with
  // a None value, e.g. description when the tag is absent), list
  // fields exist only when their tag does.
  // ====================================================================

  final case class RawRpmDict(
      scalars: Map[String, Option[String]],
      requiredRpms: Option[Seq[Map[String, String]]],
      providedRpms: Option[Seq[Map[String, String]]],
      files: Option[Seq[String]],
      directories: Option[Seq[String]],
      changelogs: Option[Seq[Map[String, String]]]) {
    def pkgid: Option[String] = scalars.getOrElse("pkgid", None)
  }

  /** attrs of a tag as dict entries, keys suffixed `_name`
    * (`repodata.py:53-67` convert_tuples_to_dict). */
  private def suffixed(n: Option[scala.xml.Node], suffix: String)
      : Map[String, Option[String]] =
    n.map(_.attributes.asAttrMap.map { case (k, v) =>
      (if (suffix.isEmpty) k else s"${k}_$suffix") -> Option(v)
    }).getOrElse(Map.empty)

  private def attrsOf(n: scala.xml.Node): Map[String, Option[String]] =
    n.attributes.asAttrMap.map { case (k, v) => k -> Option(v) }

  /** primary.xml → one dict per package (`repodata.py:168-237`):
    * package/checksum/format scalar tags, attr dicts for packager/
    * size/time/location/header-range/vendor (attrs only — tag TEXT of
    * packager and vendor is dropped, as in the reference), plus
    * requires/provides entry dicts when present. */
  def parsePrimaryDicts(xml: String): Seq[RawRpmDict] = {
    val root = scala.xml.XML.loadString(xml)
    (root \ "package").map { p =>
      val fmt = (p \ "format").headOption
      def fmtText(tag: String): Option[String] =
        fmt.flatMap(f => (f \ tag).headOption.map(_.text))
      val scalars = attrsOf(p) ++
        Map(
          "description" -> (p \ "description").headOption.map(_.text),
          "summary" -> (p \ "summary").headOption.map(_.text),
          "url" -> (p \ "url").headOption.map(_.text),
          "checksum" -> (p \ "checksum").headOption.map(_.text),
          "pkgid" -> (p \ "checksum").headOption.map(_.text),
          "buildhost" -> fmtText("buildhost"),
          "group" -> fmtText("group"),
          "license" -> fmtText("license"),
          "sourcerpm" -> fmtText("sourcerpm")) ++
        suffixed((p \ "packager").headOption, "packager") ++
        suffixed((p \ "size").headOption, "size") ++
        suffixed((p \ "time").headOption, "time") ++
        suffixed((p \ "location").headOption, "") ++
        suffixed(fmt.flatMap(f => (f \ "header-range").headOption),
          "header_range") ++
        suffixed(fmt.flatMap(f => (f \ "vendor").headOption), "vendor")
      def entries(tag: String): Option[Seq[Map[String, String]]] =
        fmt.flatMap(f => (f \ tag).headOption)
          .map(_.child.collect {
            case e: scala.xml.Elem => e.attributes.asAttrMap
          }.toSeq)
      RawRpmDict(scalars, entries("requires"), entries("provides"),
        files = None, directories = None, changelogs = None)
    }
  }

  /** other.xml → package+version attrs and the changelog dicts
    * (author/date attrs + the entry text, `repodata.py:240-268`). */
  def parseOtherDicts(xml: String): Seq[RawRpmDict] = {
    val root = scala.xml.XML.loadString(xml)
    (root \ "package").map { p =>
      val scalars = attrsOf(p) ++
        (p \ "version").headOption.map(attrsOf).getOrElse(Map.empty)
      val changelogs = (p \ "changelog").map { c =>
        c.attributes.asAttrMap + ("changelog" -> c.text)
      }
      RawRpmDict(scalars, None, None, None, None, Some(changelogs))
    }
  }

  /** filelists.xml → package+version attrs and the file/directory
    * name lists (`repodata.py:127-165`: an attr-less file tag is a
    * file, `type="dir"` a directory, any other attributed tag — e.g.
    * ghost files — is dropped, as in the reference). */
  def parseFilelistsDicts(xml: String): Seq[RawRpmDict] = {
    val root = scala.xml.XML.loadString(xml)
    (root \ "package").map { p =>
      val scalars = attrsOf(p) ++
        (p \ "version").headOption.map(attrsOf).getOrElse(Map.empty)
      val entries = (p \ "file")
      val files = entries.filter(_.attributes.isEmpty).map(_.text)
      val dirs = entries
        .filter(e => e.attributes.asAttrMap.get("type").contains("dir"))
        .map(_.text)
      RawRpmDict(scalars, None, None, Some(files), Some(dirs), None)
    }
  }

  private def mergeDicts(a: RawRpmDict, b: RawRpmDict): RawRpmDict =
    RawRpmDict(
      a.scalars ++ b.scalars,
      b.requiredRpms.orElse(a.requiredRpms),
      b.providedRpms.orElse(a.providedRpms),
      b.files.orElse(a.files),
      b.directories.orElse(a.directories),
      b.changelogs.orElse(a.changelogs))

  /** `get_pkg_infos` (`repodata.py:271-277`): merge the three files'
    * dicts per pkgid — primary first, then other, then filelists
    * (later keys win) — one combined dict per distinct non-empty
    * pkgid, ordered by first occurrence. (The reference recombines
    * per occurrence and dedups; grouping once is the same result in
    * O(n) — and the per-pkgid groupBy is exactly the Spark shape this
    * takes at repository scale.) */
  def combinedPkgInfos(filelistsXml: String, primaryXml: String,
      otherXml: String): Seq[RawRpmDict] = {
    val all = parsePrimaryDicts(primaryXml) ++ parseOtherDicts(otherXml) ++
      parseFilelistsDicts(filelistsXml)
    val withId = all.flatMap(d => d.pkgid.filter(_.nonEmpty).map(_ -> d))
    val order = withId.map(_._1).distinct
    val grouped = withId.groupBy(_._1)
    order.map(pid => grouped(pid).map(_._2).reduce(mergeDicts))
  }

  /** EVR string as packagedcode renders it (`EVR.to_string`): epoch
    * prefixed with a colon whenever present — including "0" — then
    * `version-release`. */
  def evr(epoch: Option[String], ver: Option[String],
      rel: Option[String]): Option[String] =
    ver.map { v =>
      val vr = rel.map(r => s"$v-$r").getOrElse(v)
      epoch.filter(_.nonEmpty).map(e => s"$e:$vr").getOrElse(vr)
    }

  /** Absolute hrefs pass through; relative ones join the base
    * (`minecode/miners/repodata.py:145-160`). */
  def buildDownloadUrl(baseUrl: String, href: String): String =
    if (href.startsWith("http://") || href.startsWith("https://") ||
      href.startsWith("ftp://")) href
    else s"${baseUrl.stripSuffix("/")}/${href.dropWhile(_ == '/')}"

  /** Parent of the parent directory of the repomd.xml URI — the
    * repository base both the metadata hrefs and the rpm location
    * hrefs join against (`minecode/miners/repomd.py:96-101`). */
  def repoBase(repomdUri: String): String = {
    val parent = repomdUri.substring(0, repomdUri.lastIndexOf('/'))
    parent.substring(0, parent.lastIndexOf('/'))
  }

  /** Full collect walk: fetch repomd.xml, locate + fetch + gunzip
    * primary, build one PackageRow per RPM record. */
  def collectFromRepomd(repomdUri: String, transport: Transport,
      miningLevel: Int = 50): Either[String, Seq[PackageRow]] = {
    val base = repoBase(repomdUri)
    transport.fetch(repomdUri).flatMap { repomdBytes =>
      urlForType(new String(repomdBytes, "UTF-8"), "primary") match {
        case None => Left(s"no primary entry in $repomdUri")
        case Some(href) =>
          // absolute hrefs (mirrored repos) must pass through
          val url = buildDownloadUrl(base, href)
          transport.fetch(url).map { bytes =>
            val xml =
              if (href.endsWith(".gz"))
                new String(GzipTolerant.readAll(bytes), "UTF-8")
              else new String(bytes, "UTF-8")
            parsePrimary(xml).flatMap { info =>
              info.href.map { h =>
                PackageRow.minimal(buildDownloadUrl(base, h), "rpm",
                  info.name, evr(info.epoch, info.ver, info.rel),
                  miningLevel)
                  .copy(
                    description = info.description,
                    homepage_url = info.url,
                    declared_license_expression = info.license,
                    sha1 = info.pkgid.filter(_ =>
                      info.checksumType.contains("sha")),
                    sha256 = info.pkgid.filter(_ =>
                      info.checksumType.contains("sha256")),
                    size = info.packageBytes)
              }
            }
          }
      }
    }
  }
}
