package graft.sources

/** Registry/metadata parsers for the long tail of ecosystems served by
  * the reference's collect flow (the `minecode/collectors/` modules).
  * Each
  * parser is a pure text→data function — the fetch happens through the
  * injected [[graft.miners.Transport]] on executors — so every format
  * here is unit-testable against the reference's own fixture files and
  * safe inside Spark closures.
  *
  * Formats covered (reference file cited per function): crandb JSON,
  * hackage version maps, conda repodata, Alpine APKINDEX (+ a minimal
  * ustar reader), MetaCPAN release search, pub.dev, GitHub/GitLab/
  * Bitbucket tag APIs, Docker Hub tags, Hugging Face model API, Conan
  * center-index YAML (config.yml/conandata.yml via a small YAML-subset
  * reader), GNU/OpenSSL directory listings, and Arch `.PKGINFO`.
  */
object EcosystemParsers {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  import RegistryParsers.PackageVersion

  private def str(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s)
    case _                        => None
  }

  private def long(v: JValue): Option[Long] = v match {
    case JInt(n)     => Some(n.toLong)
    case JLong(n)    => Some(n)
    case JDouble(n)  => Some(n.toLong)
    case JDecimal(n) => Some(n.toLong)
    case _           => None
  }

  // ---------------------------------------------------------------- cran

  /** crandb `/{name}/all` (`minecode/collectors/cran.py:23-35`):
    * `versions{}` keyed by version; release dates live both in each
    * version object's `Date/Publication` and the top-level `timeline{}`
    * (timeline wins when present, matching the crandb canonical view). */
  def cranVersions(json: String): Seq[PackageVersion] = {
    val root = JsonMethods.parse(json)
    val timeline = (root \ "timeline") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _           => Map.empty[String, String]
    }
    (root \ "versions") match {
      case JObject(fields) => fields.map { case (ver, obj) =>
        val date = timeline.get(ver)
          .orElse(str(obj \ "Date/Publication"))
        PackageVersion(ver, date)
      }
      case _ => Seq.empty
    }
  }

  // ------------------------------------------------------------- hackage

  /** hackage `/{name}.json` (`minecode/collectors/hackage.py:24-36`):
    * a flat object keyed by version ("normal" / "deprecated" status);
    * deprecated versions are still real releases and are kept. */
  def hackageVersions(json: String): Seq[String] =
    JsonMethods.parse(json) match {
      case JObject(fields) => fields.map(_._1).filter(_.nonEmpty)
      case _               => Seq.empty
    }

  // --------------------------------------------------------------- conda

  final case class CondaMeta(
      sha256: Option[String], md5: Option[String], size: Option[Long],
      license: Option[String], depends: Seq[String])

  /** conda `repodata.json` (`minecode/miners/conda.py:20-28`): package
    * metadata lives under `packages{}` keyed by the artifact file name,
    * or `packages.conda{}` for `.conda`-format artifacts. */
  def condaRepodata(json: String, identifier: String): Option[CondaMeta] = {
    val root = JsonMethods.parse(json)
    val bucket = if (identifier.endsWith(".conda")) "packages.conda" else "packages"
    (root \ bucket \ identifier) match {
      case o: JObject =>
        val depends = (o \ "depends") match {
          case JArray(ds) => ds.flatMap(str)
          case _          => Seq.empty
        }
        Some(CondaMeta(str(o \ "sha256"), str(o \ "md5"), long(o \ "size"),
          str(o \ "license"), depends))
      case _ => None
    }
  }

  // -------------------------------------------------------------- alpine

  final case class ApkEntry(
      name: String, version: String, arch: Option[String],
      description: Option[String], license: Option[String],
      size: Option[Long], buildDate: Option[Long])

  /** Alpine APKINDEX text (`minecode/miners/alpine.py` build_packages
    * input): records are blank-line-separated blocks of single-letter
    * `K:value` lines — P name, V version, A arch, T description,
    * L license, S size, t build epoch. */
  def apkIndex(text: String): Seq[ApkEntry] = {
    val blocks = text.split("\n\\s*\n")
    blocks.toSeq.flatMap { block =>
      val kv = block.linesIterator.flatMap { line =>
        val i = line.indexOf(':')
        if (i <= 0) None else Some(line.substring(0, i) -> line.substring(i + 1))
      }.toMap
      for (name <- kv.get("P"); version <- kv.get("V"))
        yield ApkEntry(name, version, kv.get("A"), kv.get("T"), kv.get("L"),
          kv.get("S").flatMap(s => s.toLongOption),
          kv.get("t").flatMap(s => s.toLongOption))
    }
  }

  /** Raw single-letter field maps of an APKINDEX, one per
    * blank-line-separated paragraph (`minecode/miners/alpine.py:67-123`
    * parse_apkindex keeps the same shape under long names). */
  def apkIndexFields(text: String): Seq[Map[String, String]] =
    text.split("\n\\s*\n").toSeq.flatMap { block =>
      val kv = block.linesIterator.flatMap { line =>
        val i = line.indexOf(':')
        if (i <= 0) None else Some(line.substring(0, i).trim ->
          line.substring(i + 1).trim)
      }.toMap
      if (kv.isEmpty) None else Some(kv)
    }

  /** Minimal ustar reader: 512-byte headers, name at 0..100, octal size
    * at 124..136, type flag at 156; data padded to 512. Enough to pull
    * APKINDEX out of APKINDEX.tar.gz (reference extracts with
    * `minecode/utils.py` extract_file). Returns regular files only. */
  def tarEntries(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= bytes.length) {
      val name = new String(bytes, off, 100, "US-ASCII").takeWhile(_ != '\u0000')
      if (name.isEmpty) { off = bytes.length } // two zero blocks = end
      else {
        // POSIX allows leading spaces (and NULs) padding the octal
        // size field — strip them before reading digits
        val sizeStr = new String(bytes, off + 124, 12, "US-ASCII")
          .dropWhile(c => c == ' ' || c == '\u0000')
          .takeWhile(c => c >= '0' && c <= '7')
        val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
        val typeFlag = bytes(off + 156).toChar
        val dataStart = off + 512
        val dataEnd = math.min(dataStart + size, bytes.length.toLong).toInt
        if ((typeFlag == '0' || typeFlag == '\u0000') && size > 0)
          out += name -> java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        off = dataStart + (((size + 511) / 512) * 512).toInt
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------- cpan

  final case class CpanRelease(
      version: String, downloadUrl: Option[String], date: Option[String],
      abstractText: Option[String], licenses: Seq[String],
      sha256: Option[String], author: Option[String])

  /** MetaCPAN release search (`minecode/collectors/cpan.py:21-43`):
    * `hits.hits[0]._source` carries the release record — download_url,
    * version, date, abstract, license[], checksum_sha256, author. */
  def cpanRelease(json: String): Option[CpanRelease] = {
    val root = JsonMethods.parse(json)
    (root \ "hits" \ "hits") match {
      case JArray(hits) => hits.headOption.map { hit =>
        val src = hit \ "_source"
        val licenses = (src \ "license") match {
          case JArray(ls) => ls.flatMap(str)
          case JString(s) => Seq(s)
          case _          => Seq.empty
        }
        CpanRelease(
          str(src \ "version").getOrElse(""),
          str(src \ "download_url"), str(src \ "date"),
          str(src \ "abstract"), licenses,
          str(src \ "checksum_sha256"), str(src \ "author"))
      }
      case _ => None
    }
  }

  // ----------------------------------------------------------------- pub

  final case class PubVersion(
      version: String, description: Option[String], homepage: Option[String],
      published: Option[String])

  /** pub.dev package API (`minecode/miners/pub.py:7-70`): all-versions
    * responses carry `versions[]`, each with `version`, `published` and
    * a `pubspec{}`; a single-version response is the bare version
    * object. Both shapes are accepted. */
  def pubVersions(json: String): Seq[PubVersion] = {
    def one(v: JValue): Option[PubVersion] =
      str(v \ "version").map { ver =>
        val spec = v \ "pubspec"
        PubVersion(ver, str(spec \ "description"), str(spec \ "homepage"),
          str(v \ "published"))
      }
    val root = JsonMethods.parse(json)
    (root \ "versions") match {
      case JArray(vs) => vs.flatMap(one)
      case _          => one(root).toSeq
    }
  }

  // ------------------------------------------------- github / swift tags

  /** GitHub tags API page (`minecode/collectors/github.py:21-52`):
    * `[].name`; pagination is by page number, empty page = done. */
  def githubTags(json: String): Seq[String] =
    JsonMethods.parse(json) match {
      case JArray(tags) => tags.flatMap(t => str(t \ "name"))
      case _            => Seq.empty
    }

  final case class RepoTag(name: String, tarballUrl: Option[String],
      sha1: Option[String])

  /** GitHub single-repo record as the reference's swift collector
    * consumes it (`minecode/collectors/swift.py:18-31`,
    * fixture `swift/swift-ui-coordinator.json`): the repo JSON plus a
    * `tags[]` array of {name, sha1, tarball_url}. */
  def githubRepoTags(json: String): (Option[String], Seq[RepoTag]) = {
    val root = JsonMethods.parse(json)
    val tags = (root \ "tags") match {
      case JArray(ts) => ts.flatMap { t =>
        str(t \ "name").map(n =>
          RepoTag(n, str(t \ "tarball_url"), str(t \ "sha1")))
      }
      case _ => Seq.empty
    }
    (str(root \ "description"), tags)
  }

  // -------------------------------------------------------------- gitlab

  final case class GitTag(name: String, author: Option[String],
      email: Option[String], date: Option[String])

  /** GitLab repository tags API
    * (`minecode/collectors/gitlab.py:14-33`): `[].name` with
    * `commit.{author_name, author_email, created_at}`. */
  def gitlabTags(json: String): Seq[GitTag] =
    JsonMethods.parse(json) match {
      case JArray(tags) => tags.flatMap { t =>
        str(t \ "name").map { n =>
          val c = t \ "commit"
          GitTag(n, str(c \ "author_name"), str(c \ "author_email"),
            str(c \ "created_at"))
        }
      }
      case _ => Seq.empty
    }

  // ----------------------------------------------------------- bitbucket

  /** Bitbucket refs/tags page (`minecode/collectors/bitbucket.py:14-40`,
    * fixture `bitbucket/visit/paginated_tags.json`): `values[].name`
    * with the tagger/target author's display name; `next` paginates. */
  def bitbucketTags(json: String): (Seq[GitTag], Option[String]) = {
    val root = JsonMethods.parse(json)
    val tags = (root \ "values") match {
      case JArray(vs) => vs.flatMap { v =>
        str(v \ "name").map { n =>
          val author = str(v \ "target" \ "author" \ "user" \ "display_name")
            .orElse(str(v \ "target" \ "author" \ "raw"))
          GitTag(n, author, None, str(v \ "date").orElse(str(v \ "target" \ "date")))
        }
      }
      case _ => Seq.empty
    }
    (tags, str(root \ "next"))
  }

  // ------------------------------------------------------------- docker

  final case class DockerTag(name: String, digest: Option[String],
      size: Option[Long], lastPushed: Option[String],
      lastUpdater: Option[String])

  /** Docker Hub tags page (`minecode/collectors/dockerhub.py:64-110`,
    * fixture `dockerhub/nginx.json`): `results[]` with name, digest,
    * full_size, tag_last_pushed, last_updater_username; `next`
    * paginates, `count` bounds the walk. */
  def dockerhubTags(json: String): (Seq[DockerTag], Option[String]) = {
    val root = JsonMethods.parse(json)
    val arr = (root \ "results") match {
      case JArray(rs) => rs
      // the reference fixture wraps the page as {tags_metadata: [...]}
      case _ => (root \ "tags_metadata") match {
        case JArray(rs) => rs
        case _          => Nil
      }
    }
    val tags = arr.flatMap { r =>
      str(r \ "name").map { n =>
        DockerTag(n, str(r \ "digest"), long(r \ "full_size"),
          str(r \ "tag_last_pushed"), str(r \ "last_updater_username"))
      }
    }
    (tags, str(root \ "next"))
  }

  /** Docker Hub repository summary
    * (`minecode/collectors/dockerhub.py:17-33`,
    * `minecode/miners/dockerhub.py:200-217`): short + full description
    * joined with a newline when both are present. */
  def dockerhubDescription(json: String): Option[String] = {
    val root = JsonMethods.parse(json)
    val parts = Seq(str(root \ "description"), str(root \ "full_description"))
      .flatten.map(_.trim).filter(_.nonEmpty)
    if (parts.isEmpty) None else Some(parts.mkString("\n"))
  }

  // -------------------------------------------------------- hugging face

  final case class HfModel(sha: Option[String], author: Option[String],
      createdAt: Option[String], binFiles: Seq[String], license: Option[String])

  /** Hugging Face model API (`minecode/collectors/huggingface.py:18-60`):
    * `siblings[].rfilename` — model weight files are the `.bin`
    * entries; author + createdAt annotate every built package. */
  def huggingfaceModel(json: String): Option[HfModel] = {
    JsonMethods.parse(json) match {
      case root: JObject =>
        val siblings = (root \ "siblings") match {
          case JArray(ss) => ss.flatMap(s =>
            str(s \ "rfilename").orElse(str(s \ "filename")).orElse(str(s \ "name")))
          case _ => Seq.empty
        }
        Some(HfModel(str(root \ "sha"), str(root \ "author"),
          str(root \ "createdAt"), siblings.filter(_.endsWith(".bin")),
          str(root \ "cardData" \ "license")))
      case _ => None
    }
  }

  // --------------------------------------------------------------- conan

  /** Indentation-based reader for the two-to-three-level YAML maps used
    * by conan-center-index (`config.yml` / `conandata.yml`, fixtures at
    * `conan/zlib/manifest/`). Handles nested maps, quoted keys, scalar
    * values, and `- item` lists; not a general YAML parser. */
  def yamlSubset(text: String): Map[String, Any] = {
    final case class Frame(indent: Int, map: scala.collection.mutable.LinkedHashMap[String, Any])
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
        (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
      else t
    }
    val root = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var stack = List(Frame(-1, root))
    var pendingList: Option[(Frame, String, scala.collection.mutable.ListBuffer[String])] = None
    for (raw <- text.linesIterator if raw.trim.nonEmpty && !raw.trim.startsWith("#")) {
      val indent = raw.takeWhile(_ == ' ').length
      val line = raw.trim
      if (line.startsWith("- ")) {
        pendingList match {
          case Some((frame, key, buf)) =>
            buf += unquote(line.substring(2))
            frame.map(key) = buf.toList
          case None => // stray list item outside a key: ignore
        }
      } else {
        pendingList = None
        while (stack.nonEmpty && indent <= stack.head.indent) stack = stack.tail
        val frame = stack.head
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = unquote(line.substring(0, colon))
          val value = line.substring(colon + 1).trim
          if (value.isEmpty) {
            // either a nested map or a block list follows
            val child = scala.collection.mutable.LinkedHashMap.empty[String, Any]
            frame.map(key) = child
            stack = Frame(indent, child) :: stack
            pendingList = Some((frame, key, scala.collection.mutable.ListBuffer.empty[String]))
          } else frame.map(key) = unquote(value)
        }
      }
    }
    def freeze(m: scala.collection.mutable.LinkedHashMap[String, Any]): Map[String, Any] =
      m.map {
        case (k, v: scala.collection.mutable.LinkedHashMap[String @unchecked, Any @unchecked]) =>
          k -> freeze(v)
        case (k, v) => k -> v
      }.toMap
    freeze(root)
  }

  /** conan-center-index `config.yml`
    * (`minecode/collectors/conan.py:24-49`): `versions.{v}.folder`. */
  def conanVersionFolder(configYml: String, version: String): Option[String] =
    yamlSubset(configYml).get("versions") match {
      case Some(vs: Map[String @unchecked, Any @unchecked]) =>
        vs.get(version) match {
          case Some(m: Map[String @unchecked, Any @unchecked]) =>
            m.get("folder").collect { case s: String => s }
          case _ => None
        }
      case _ => None
    }

  /** conan-center-index `conandata.yml`
    * (`minecode/collectors/conan.py:60-71`): `sources.{v}.{url, sha256}`
    * where url may be a scalar or a mirror list (first mirror wins). */
  def conanSource(conandataYml: String, version: String)
      : Option[(String, Option[String])] =
    yamlSubset(conandataYml).get("sources") match {
      case Some(vs: Map[String @unchecked, Any @unchecked]) =>
        vs.get(version) match {
          case Some(m: Map[String @unchecked, Any @unchecked]) =>
            val url = m.get("url") match {
              case Some(s: String)          => Some(s)
              case Some(l: List[String @unchecked]) => l.headOption
              case _                        => None
            }
            url.map(u => (u, m.get("sha256").collect { case s: String => s }))
          case _ => None
        }
      case _ => None
    }

  // -------------------------------------------- gnu / openssl listings

  final case class DirEntry(file: String, version: String, date: Option[String])

  private val HrefRx = """href="([^"]+)"""".r

  /** Source-archive entries from an Apache-style directory index —
    * the GNU ftp mirror layout (`fixture gnu/glibc/index.html`) and
    * www.openssl.org/source (`fixture openssl/Indexof_source.html`).
    * Keeps `{name}-{version}.tar.{gz,xz,bz2}` links only (no .sig /
    * .asc / .sha256 / diffs / binaries), pairing each with the row's
    * last-modified date when the listing carries one. */
  def dirListingVersions(html: String, name: String): Seq[DirEntry] = {
    // versions are dotted numerics plus an optional letter suffix
    // (1.09.1, 2.0.6, 1.0.2o, 0.9.8zh) — the full-match guard keeps
    // platform binaries (glibc-2.0.1.bin.alpha-linux.tar.gz), diffs,
    // and signature files out
    val fileRx = (java.util.regex.Pattern.quote(name) +
      """-(\d[\d.]*[a-z]{0,2})\.tar\.(?:gz|xz|bz2)""").r
    val dateRx = """(\d{4}-\d{2}-\d{2})""".r
    html.linesIterator.flatMap { line =>
      HrefRx.findAllMatchIn(line).map(_.group(1)).flatMap { href =>
        val file = href.substring(href.lastIndexOf('/') + 1)
        fileRx.findFirstMatchIn(file) match {
          case Some(m) if m.matched == file =>
            Some(DirEntry(file, m.group(1), dateRx.findFirstIn(line)))
          case _ => None
        }
      }
    }.toSeq.distinct
  }

  // ----------------------------------------------------------------- nix

  final case class NixOutput(name: String, storePath: String)
  final case class NixPlatform(system: Option[String], date: Option[String],
      commit: Option[String], outputs: Seq[NixOutput])
  final case class NixRelease(version: String, platforms: Seq[NixPlatform])
  final case class NixPackage(summary: Option[String],
      homepage: Option[String], licenses: Seq[String],
      releases: Seq[NixRelease])

  /** Devbox search API package record
    * (`minecode/collectors/nix.py:47-56`,
    * `minecode/miners/nix.py:53-107`; fixture
    * `nix/SDL_mixer_package-expected.json`): releases → platforms →
    * store-path outputs. */
  def nixPackage(json: String): Option[NixPackage] =
    JsonMethods.parse(json) match {
      case root: JObject =>
        val licenses = (root \ "license") match {
          case JArray(ls) => ls.flatMap(str)
          case JString(l) => Seq(l)
          case _          => Seq.empty
        }
        val releases = (root \ "releases") match {
          case JArray(rs) => rs.flatMap { r =>
            str(r \ "version").map { v =>
              val platforms = (r \ "platforms") match {
                case JArray(ps) => ps.map { p =>
                  val outputs = (p \ "outputs") match {
                    case JArray(os) => os.flatMap { o =>
                      (str(o \ "name"), str(o \ "path")) match {
                        case (Some(n), Some(path)) => Some(NixOutput(n, path))
                        case _                     => None
                      }
                    }
                    case _ => Seq.empty
                  }
                  NixPlatform(str(p \ "system"), str(p \ "date"),
                    str(p \ "commit_hash"), outputs)
                }
                case _ => Seq.empty
              }
              NixRelease(v, platforms)
            }
          }
          case _ => Seq.empty
        }
        Some(NixPackage(str(root \ "summary"), str(root \ "homepage_url"),
          licenses, releases))
      case _ => None
    }

  /** `.narinfo` text (`minecode/miners/nix.py:16-50`): `Key: value`
    * lines; the `URL:` entry is the nar archive path under
    * cache.nixos.org. */
  def narinfoUrl(text: String): Option[String] =
    text.linesIterator
      .map(_.trim)
      .collectFirst { case l if l.startsWith("URL:") =>
        l.substring(4).trim }
      .filter(_.nonEmpty)

  // ---------------------------------------------------------------- alpm

  /** Arch `.PKGINFO` (`minecode/miners/alpm.py` build_packages input,
    * fixture `alpm/bemenu-ncurses/.PKGINFO`): `key = value` lines,
    * repeatable keys (license, depend), `#` comments. */
  def pkginfo(text: String): Map[String, Seq[String]] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { line =>
        val i = line.indexOf('=')
        if (i <= 0) None
        else Some(line.substring(0, i).trim -> line.substring(i + 1).trim)
      }
      .toSeq
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }

  // ------------------------------------------------- debian control text

  /** RFC822-ish control paragraphs (openwrt `Packages` indexes, ipk
    * `control` files — reference parses with `debcon`,
    * `minecode/miners/openwrt.py:70-95`): blank-line-separated
    * paragraphs of ordered `Key: value` fields; continuation lines
    * start with whitespace and append as `\n` + line (leading space
    * kept, like debcon). */
  def debParagraphs(text: String): Seq[Seq[(String, String)]] = {
    val paras = Seq.newBuilder[Seq[(String, String)]]
    var fields = Vector.empty[(String, String)]
    def flush(): Unit = { if (fields.nonEmpty) paras += fields; fields = Vector.empty }
    text.linesIterator.foreach { raw =>
      val line = raw.stripSuffix("\r")
      if (line.trim.isEmpty) flush()
      else if ((line.head == ' ' || line.head == '\t') && fields.nonEmpty) {
        val (k, v) = fields.last
        fields = fields.init :+ (k -> (v + "\n" + line))
      } else {
        val i = line.indexOf(':')
        if (i > 0)
          fields = fields :+ (line.substring(0, i).trim ->
            line.substring(i + 1).trim)
      }
    }
    flush()
    paras.result()
  }

  /** deb822 dictionaries — debcon `get_paragraphs_data` shape
    * (`minecode/miners/debian.py:153-231` Release/Sources/Packages
    * parsing): lowercase keys; a value opened by an empty first line
    * (e.g. `MD5Sum:` blocks) drops that leading newline and the first
    * continuation indent. */
  def deb822Paragraphs(text: String): Seq[Map[String, String]] =
    debParagraphs(text).map(_.map { case (k, v0) =>
      val v =
        if (v0.startsWith("\n")) v0.substring(1).replaceFirst("^[ \t]", "")
        else v0
      k.toLowerCase -> v
    }.toMap)

  /** debcon-style serialization: `Key: value` lines in field order with
    * a trailing newline (what the reference stores as URI `data`). */
  def debSerialize(para: Seq[(String, String)]): String =
    para.map { case (k, v) => s"$k: $v" }.mkString("", "\n", "\n")

  /** Control fields of an OpenWrt `.ipk`: gzip tar wrapping
    * `control.tar.gz`, itself wrapping `control`
    * (`minecode/miners/openwrt.py:98-113`). */
  def ipkControl(bytes: Array[Byte]): Option[Seq[(String, String)]] =
    for {
      controlTarGz <- tarEntries(GzipTolerant.readAll(bytes))
        .collectFirst { case (n, b) if n.stripPrefix("./") == "control.tar.gz" => b }
      control <- tarEntries(GzipTolerant.readAll(controlTarGz))
        .collectFirst { case (n, b) if n.stripPrefix("./") == "control" => b }
      para <- debParagraphs(new String(control, "UTF-8")).headOption
    } yield para

  /** The YAML `metadata` of a `.gem` archive — a plain tar holding a
    * gzipped `metadata.gz` (`minecode/miners/rubygems.py` archive
    * mapper extracts the same member). */
  def gemMetadataText(gem: Array[Byte]): Option[String] =
    tarEntries(gem).collectFirst {
      case (n, b) if n.stripPrefix("./") == "metadata.gz" =>
        new String(GzipTolerant.readAll(b), "UTF-8")
    }

  /** Entries of a zip archive (googlecode `google-code-archive.txt.zip`
    * — the reference extracts with `extract_file`). */
  def zipEntries(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val in = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> in.readAllBytes()
      e = in.getNextEntry
    }
    out.result()
  }
}
