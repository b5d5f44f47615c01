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
