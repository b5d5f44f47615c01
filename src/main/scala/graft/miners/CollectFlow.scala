package graft.miners

import graft.catalog.{MergeEngine, PackageRow}
import graft.sources.{EcosystemParsers, RegistryParsers}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §3.2 — the live collect flow (`GET /api/collect/?purl=...`,
  * `packagedb/api.py:807-855` → `minecode/collectors/`): a requested
  * PURL is resolved by ecosystem, its registry metadata fetched
  * (injected transport), versions parsed, package rows built, and the
  * results merge-upserted into the catalog at the collector's mining
  * level.
  *
  * The fetch+parse runs on executors: requests are distributed as a
  * Dataset and resolved inside mapPartitions, then eagerly
  * checkpointed so each external fetch happens exactly once; the
  * merge is the fully distributed MergeEngine plan.
  */
object CollectFlow {

  val CollectMiningLevel = 50

  /** Percent-encode one URL path segment: a purl name/version holding a
    * reserved character (space, '#', '?', '+', '/') must not change the
    * request's path structure. Unreserved characters pass through, so
    * well-formed names build byte-identical URLs to before. */
  private[miners] def encSeg(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** Percent-encode a query-string value (form-urlencoded: space → '+'). */
  private[miners] def encQ(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Resolve one purl via the registry: fetch → parse versions →
    * build one PackageRow per version. */
  def collectPurl(purl: String, transport: Transport)
      : Either[String, Seq[PackageRow]] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) return Left(s"invalid purl: $purl")
    val (ptype, namespace, name) = (parsed(0), Option(parsed(1)), parsed(2))
    val version = Option(parsed(3))
    // split from the raw purl, not parsed(4): the joined form has
    // already URL-decoded values, so an encoded '&' inside a value
    // (e.g. a download_url qualifier) would corrupt a re-split
    val qualifiers: Map[String, String] =
      graft.functions.PurlParse.parseQualifiers(purl)
    ptype match {
      case "pypi" =>
        transport.fetch(s"https://pypi.org/pypi/$name/json").map { bytes =>
          RegistryParsers.pypiVersions(new String(bytes, "UTF-8")).map { v =>
            PackageRow.minimal(
              s"https://pypi.org/packages/source/${name.head}/$name/$name-${v.value}.tar.gz",
              "pypi", name, Some(v.value), CollectMiningLevel)
              .copy(release_date = v.releaseDate.flatMap(tsOf))
          }
        }
      case "npm" =>
        // scoped packages (pkg:npm/@scope/name): metadata URL encodes
        // the scope separator (@scope%2Fname), tarball lives under
        // @scope/name/-/name-<v>.tgz with the UNSCOPED name in the file
        val metaId = namespace match {
          case Some(ns) => s"$ns%2F$name"
          case None     => name
        }
        val tarDir = namespace.map(ns => s"$ns/$name").getOrElse(name)
        // a versioned purl collects exactly that version via the
        // per-version endpoint, like the reference's map_npm_package
        // (collectors/npm.py:30-77); an unversioned purl collects the
        // full version list for the watch/diff path
        version match {
          case Some(v) =>
            return transport
              .fetch(s"https://registry.npmjs.org/$metaId/$v").map { bytes =>
                Mappers.npmSingleVersionPackage(new String(bytes, "UTF-8"))
                  .toSeq.map { mp =>
                    PackageRow.minimal(mp.row.download_url, "npm", name,
                      Some(v), CollectMiningLevel)
                      .copy(namespace = namespace,
                        description = mp.row.description,
                        homepage_url = mp.row.homepage_url,
                        sha1 = mp.row.sha1,
                        declared_license_expression =
                          mp.row.declared_license_expression)
                  }
              }
          case None =>
        }
        transport.fetch(s"https://registry.npmjs.org/$metaId").map { bytes =>
          RegistryParsers.npmVersions(new String(bytes, "UTF-8")).map { v =>
            PackageRow.minimal(
              s"https://registry.npmjs.org/$tarDir/-/$name-${v.value}.tgz",
              "npm", name, Some(v.value), CollectMiningLevel)
              .copy(namespace = namespace,
                release_date = v.releaseDate.flatMap(tsOf))
          }
        }
      case "maven" =>
        val ns = namespace.getOrElse(return Left(s"maven purl needs namespace: $purl"))
        val gPath = ns.replace('.', '/')
        transport.fetch(
          s"https://repo1.maven.org/maven2/$gPath/$name/maven-metadata.xml")
          .map { bytes =>
            RegistryParsers.mavenMetadataVersions(new String(bytes, "UTF-8"))
              .map { v =>
                PackageRow.minimal(
                  s"https://repo1.maven.org/maven2/$gPath/$name/${v.value}/$name-${v.value}.jar",
                  "maven", name, Some(v.value), CollectMiningLevel)
                  .copy(namespace = Some(ns))
              }
          }
      case "cargo" =>
        // crates.io API + the static.crates.io crate file layout
        transport.fetch(s"https://crates.io/api/v1/crates/$name").map { b =>
          RegistryParsers.cargoVersions(new String(b, "UTF-8")).map { v =>
            PackageRow.minimal(
              s"https://static.crates.io/crates/$name/$name-${v.value}.crate",
              "cargo", name, Some(v.value), CollectMiningLevel)
              .copy(release_date = v.releaseDate.flatMap(tsOf))
          }
        }
      case "gem" =>
        transport.fetch(s"https://rubygems.org/api/v1/versions/$name.json")
          .map { b =>
            RegistryParsers.gemVersions(new String(b, "UTF-8")).map { v =>
              PackageRow.minimal(
                s"https://rubygems.org/downloads/$name-${v.value}.gem",
                "gem", name, Some(v.value), CollectMiningLevel)
                .copy(release_date = v.releaseDate.flatMap(tsOf))
            }
          }
      case "nuget" =>
        val id = name.toLowerCase
        transport.fetch(
          s"https://api.nuget.org/v3/registration5-semver1/$id/index.json")
          .map { b =>
            RegistryParsers.nugetVersions(new String(b, "UTF-8")).map { v =>
              val vl = v.value.toLowerCase
              PackageRow.minimal(
                s"https://api.nuget.org/v3-flatcontainer/$id/$vl/$id.$vl.nupkg",
                "nuget", name, Some(v.value), CollectMiningLevel)
                .copy(release_date = v.releaseDate.flatMap(tsOf))
            }
          }
      case "composer" =>
        val ns = namespace.getOrElse(
          return Left(s"composer purl needs vendor namespace: $purl"))
        val pkg = s"$ns/$name"
        transport.fetch(s"https://repo.packagist.org/p/$pkg.json").map { b =>
          RegistryParsers.composerVersions(new String(b, "UTF-8"), pkg)
            .map { r =>
              PackageRow.minimal(
                r.distUrl.getOrElse(
                  s"https://repo.packagist.org/p/$pkg.json#${r.version}"),
                "composer", name, Some(r.version), CollectMiningLevel)
                .copy(namespace = Some(ns),
                  release_date = r.releaseDate.flatMap(tsOf))
            }
        }
      case "hex" =>
        transport.fetch(s"https://hex.pm/api/packages/$name").map { b =>
          RegistryParsers.hexVersions(new String(b, "UTF-8")).map { v =>
            PackageRow.minimal(
              s"https://repo.hex.pm/tarballs/$name-${v.value}.tar",
              "hex", name, Some(v.value), CollectMiningLevel)
              .copy(release_date = v.releaseDate.flatMap(tsOf))
          }
        }
      case "golang" =>
        // module path = namespace/name; goproxy requires the
        // case-encoded path (golang.org/ref/mod#goproxy-protocol)
        val module = namespace.map(ns => s"$ns/$name").getOrElse(name)
        val escaped = RegistryParsers.goEscapePath(module)
        transport.fetch(s"https://proxy.golang.org/$escaped/@v/list").map { b =>
          RegistryParsers.goproxyList(new String(b, "UTF-8")).map { v =>
            val ev = RegistryParsers.goEscapePath(v.value)
            PackageRow.minimal(
              s"https://proxy.golang.org/$escaped/@v/$ev.zip",
              "golang", name, Some(v.value), CollectMiningLevel)
              .copy(namespace = namespace,
                release_date = v.releaseDate.flatMap(tsOf))
          }
        }
      case "deb" if namespace.contains("ubuntu") =>
        // Ubuntu debs resolve via Launchpad getPublishedSources
        // (reference VERSION_API_CLASS_BY_PACKAGE_NAMESPACE:
        // deb/ubuntu → LaunchpadVersionAPI), a paginated collection
        // walked via next_collection_link; page cap guards against a
        // cyclic link spinning an executor task
        val first = "https://api.launchpad.net/1.0/ubuntu/+archive/" +
          s"primary?ws.op=getPublishedSources&source_name=$name&exact_match=true"
        val MaxPages = 50
        var url = Option(first)
        var pages = 0
        val acc = Seq.newBuilder[RegistryParsers.PackageVersion]
        var err: Option[String] = None
        while (url.isDefined && pages < MaxPages && err.isEmpty) {
          transport.fetch(url.get) match {
            case Left(e) => if (pages == 0) err = Some(e) else url = None
            case Right(b) =>
              val (vs, next) =
                RegistryParsers.launchpadVersions(new String(b, "UTF-8"))
              acc ++= vs
              url = if (next == url) None else next
              pages += 1
          }
        }
        err.toLeft(acc.result().map { v =>
          val initial = name.take(1)
          PackageRow.minimal(
            s"https://archive.ubuntu.com/ubuntu/pool/main/$initial/$name/${name}_${v.value}.dsc",
            "deb", name, Some(v.value), CollectMiningLevel)
            .copy(namespace = namespace,
              release_date = v.releaseDate.flatMap(tsOf))
        })
      case "deb" =>
        // sources.debian.org version list + the standard archive pool
        // layout for source packages
        transport.fetch(s"https://sources.debian.org/api/src/$name")
          .map { b =>
            RegistryParsers.debianVersions(new String(b, "UTF-8")).map { v =>
              val initial = name.take(1)
              PackageRow.minimal(
                s"https://deb.debian.org/debian/pool/main/$initial/$name/${name}_${v.value}.dsc",
                "deb", name, Some(v.value), CollectMiningLevel)
                .copy(namespace = namespace)
            }
          }
      case "cran" =>
        // crandb version list; CRAN source layout src/contrib
        // (`minecode/collectors/cran.py:23-35`, download URL asserted in
        // the reference's own test_cran.py)
        transport.fetch(s"https://crandb.r-pkg.org/${encSeg(name)}/all").map { b =>
          EcosystemParsers.cranVersions(new String(b, "UTF-8"))
            .filter(v => version.forall(_ == v.value))
            .map { v =>
              PackageRow.minimal(
                s"https://cran.r-project.org/src/contrib/${name}_${v.value}.tar.gz",
                "cran", name, Some(v.value), CollectMiningLevel)
                .copy(release_date = v.releaseDate.flatMap(tsOf))
            }
        }
      case "hackage" =>
        // hackage version map; canonical tarball + homepage layout
        // (`minecode/collectors/hackage.py:24-70`)
        transport.fetch(s"https://hackage.haskell.org/package/${encSeg(name)}.json")
          .map { b =>
            EcosystemParsers.hackageVersions(new String(b, "UTF-8"))
              .filter(v => version.forall(_ == v))
              .map { v =>
                PackageRow.minimal(
                  s"https://hackage.haskell.org/package/$name-$v/$name-$v.tar.gz",
                  "hackage", name, Some(v), CollectMiningLevel)
                  .copy(primary_language = Some("haskell"),
                    homepage_url =
                      Some(s"https://hackage.haskell.org/package/$name-$v"))
              }
          }
      case "conda" =>
        // conda purl spec qualifiers pick the channel/subdir/build;
        // metadata comes from the channel's repodata keyed by artifact
        // file name (`minecode/collectors/conda.py:27-60`). The
        // reference pulls repodata.json.bz2; the plain repodata.json
        // published alongside it is byte-equivalent after decompression
        // and needs no bzip2 codec.
        val v = version.getOrElse(return Left(s"conda purl needs version: $purl"))
        val build = qualifiers.getOrElse("build",
          return Left(s"conda purl needs build qualifier: $purl"))
        val channel = qualifiers.getOrElse("channel", "main")
        val subdir = qualifiers.getOrElse("subdir", "linux-64")
        val atype = qualifiers.getOrElse("type", "tar.bz2")
        val identifier = s"$name-$v-$build.$atype"
        val base = s"https://repo.anaconda.com/pkgs/$channel/$subdir"
        transport.fetch(s"$base/repodata.json").map { b =>
          EcosystemParsers.condaRepodata(new String(b, "UTF-8"), identifier)
            .toSeq.map { meta =>
              PackageRow.minimal(s"$base/$identifier", "conda", name,
                Some(v), CollectMiningLevel)
                .copy(namespace = namespace,
                  sha256 = meta.sha256, md5 = meta.md5, size = meta.size,
                  declared_license_expression = meta.license)
            }
        }
      case "apk" =>
        // Alpine: the APKINDEX for the purl's repo/arch names every
        // package; rows come from its P/V/T/L/S/t fields
        // (`minecode/collectors/alpine.py:25-55`)
        val v = version.getOrElse(return Left(s"apk purl needs version: $purl"))
        val arch = qualifiers.getOrElse("arch",
          return Left(s"apk purl needs arch qualifier: $purl"))
        val repo = qualifiers.getOrElse("repo",
          return Left(s"apk purl needs repo qualifier: $purl"))
        val alpineVersion = qualifiers.getOrElse("alpine_version",
          return Left(s"apk purl needs alpine_version qualifier: $purl"))
        val base = s"https://dl-cdn.alpinelinux.org/alpine/$alpineVersion/$repo/$arch"
        transport.fetch(s"$base/APKINDEX.tar.gz").map { gz =>
          val tar = graft.sources.GzipTolerant.readAll(gz)
          val index = EcosystemParsers.tarEntries(tar)
            .collectFirst { case (n, bytes) if n == "APKINDEX" =>
              new String(bytes, "UTF-8") }
            .getOrElse("")
          EcosystemParsers.apkIndex(index)
            .filter(e => e.name == name && e.version == v)
            .map { e =>
              PackageRow.minimal(s"$base/$name-$v.apk", "apk", name,
                Some(v), CollectMiningLevel)
                .copy(namespace = namespace, description = e.description,
                  declared_license_expression = e.license, size = e.size,
                  release_date = e.buildDate.map(s =>
                    new java.sql.Timestamp(s * 1000L)))
            }
        }
      case "cpan" =>
        // MetaCPAN release search; the release record carries the
        // authoritative download_url + sha256
        // (`minecode/collectors/cpan.py:21-56`)
        val v = version.getOrElse(return Left(s"cpan purl needs version: $purl"))
        transport.fetch(
          "https://fastapi.metacpan.org/v1/release/_search?" +
            s"q=distribution:${encQ(name)}%20AND%20version:${encQ(v)}").map { b =>
          EcosystemParsers.cpanRelease(new String(b, "UTF-8")).toSeq.map { r =>
            PackageRow.minimal(
              r.downloadUrl.getOrElse(
                s"https://fastapi.metacpan.org/v1/release/$name#$v"),
              "cpan", name, Some(v), CollectMiningLevel)
              .copy(description = r.abstractText,
                declared_license_expression = r.licenses.headOption,
                sha256 = r.sha256, release_date = r.date.flatMap(tsOf))
          }
        }
      case "pub" =>
        // pub.dev API; archive layout per the reference's pub miner
        // (`minecode/collectors/pub.py:17-60`, `minecode/miners/pub.py:38`)
        val url = version match {
          case Some(v) =>
            s"https://pub.dev/api/packages/${encSeg(name)}/versions/${encSeg(v)}"
          case None    => s"https://pub.dev/api/packages/${encSeg(name)}"
        }
        transport.fetch(url).map { b =>
          EcosystemParsers.pubVersions(new String(b, "UTF-8")).map { v =>
            PackageRow.minimal(
              s"https://pub.dev/packages/$name/versions/${v.version}.tar.gz",
              "pub", name, Some(v.version), CollectMiningLevel)
              .copy(description = v.description, homepage_url = v.homepage,
                primary_language = Some("dart"),
                release_date = v.published.flatMap(tsOf))
          }
        }
      case "github" =>
        // GitHub tags pages, 100/page until an empty page
        // (`minecode/collectors/github.py:21-52`)
        val owner = namespace.getOrElse(
          return Left(s"github purl needs owner namespace: $purl"))
        val MaxPages = 50
        var page = 1
        val acc = Seq.newBuilder[String]
        var err: Option[String] = None
        var done = false
        while (!done && page <= MaxPages && err.isEmpty) {
          transport.fetch(
            s"https://api.github.com/repos/${encSeg(owner)}/${encSeg(name)}/tags?page=$page&per_page=100") match {
            // a mid-pagination failure means the tag list is incomplete
            // — fail the collect rather than merge a silently-truncated
            // version set into the catalog
            case Left(e) => err = Some(s"page $page: $e")
            case Right(b) =>
              val tags = EcosystemParsers.githubTags(new String(b, "UTF-8"))
              if (tags.isEmpty) done = true
              else { acc ++= tags; page += 1 }
          }
        }
        if (err.isEmpty && !done)
          err = Some(s"tag pagination truncated after $MaxPages pages: $purl")
        err.toLeft(acc.result()
          .filter(t => version.forall(_ == t))
          .map { tag =>
            PackageRow.minimal(
              s"https://github.com/$owner/$name/archive/refs/tags/$tag.tar.gz",
              "github", name, Some(tag), CollectMiningLevel)
              .copy(namespace = namespace,
                homepage_url = Some(s"https://github.com/$owner/$name"))
          })
      case "gitlab" =>
        // GitLab repository tags; archive layout /-/archive/{tag}
        // (`minecode/collectors/gitlab.py:14-33`)
        val ns = namespace.getOrElse(
          return Left(s"gitlab purl needs namespace: $purl"))
        val proj = java.net.URLEncoder.encode(s"$ns/$name", "UTF-8")
        transport.fetch(
          s"https://gitlab.com/api/v4/projects/$proj/repository/tags").map { b =>
          EcosystemParsers.gitlabTags(new String(b, "UTF-8"))
            .filter(t => version.forall(_ == t.name))
            .map { t =>
              PackageRow.minimal(
                s"https://gitlab.com/$ns/$name/-/archive/${t.name}/$name-${t.name}.tar.gz",
                "gitlab", name, Some(t.name), CollectMiningLevel)
                .copy(namespace = namespace,
                  release_date = t.date.flatMap(tsOf))
            }
        }
      case "bitbucket" =>
        // Bitbucket refs/tags walked through `next` links
        // (`minecode/collectors/bitbucket.py:14-40`)
        val ns = namespace.getOrElse(
          return Left(s"bitbucket purl needs namespace: $purl"))
        val MaxPages = 50
        var url = Option(
          s"https://api.bitbucket.org/2.0/repositories/$ns/$name/refs/tags")
        var pages = 0
        val acc = Seq.newBuilder[EcosystemParsers.GitTag]
        var err: Option[String] = None
        while (url.isDefined && pages < MaxPages && err.isEmpty) {
          transport.fetch(url.get) match {
            case Left(e) => err = Some(s"page ${pages + 1}: $e")
            case Right(b) =>
              val (tags, next) =
                EcosystemParsers.bitbucketTags(new String(b, "UTF-8"))
              acc ++= tags
              url = if (next == url) None else next
              pages += 1
          }
        }
        if (err.isEmpty && url.isDefined)
          err = Some(s"tag pagination truncated after $MaxPages pages: $purl")
        err.toLeft(acc.result()
          .filter(t => version.forall(_ == t.name))
          .map { t =>
            PackageRow.minimal(
              s"https://bitbucket.org/$ns/$name/get/${t.name}.tar.gz",
              "bitbucket", name, Some(t.name), CollectMiningLevel)
              .copy(namespace = namespace, release_date = t.date.flatMap(tsOf))
          })
      case "docker" =>
        // Docker Hub summary + paginated tags; a version selects by tag
        // name or sha256 digest (`minecode/collectors/dockerhub.py`)
        val ns = namespace.getOrElse("library")
        val repoBase = s"https://hub.docker.com/v2/repositories/$ns/$name"
        transport.fetch(s"$repoBase/").flatMap { sb =>
          val description =
            EcosystemParsers.dockerhubDescription(new String(sb, "UTF-8"))
          val MaxPages = 50
          var url = Option(s"$repoBase/tags/?page=1&page_size=100")
          var pages = 0
          val acc = Seq.newBuilder[EcosystemParsers.DockerTag]
          var err: Option[String] = None
          while (url.isDefined && pages < MaxPages && err.isEmpty) {
            transport.fetch(url.get) match {
              case Left(e) => err = Some(s"page ${pages + 1}: $e")
              case Right(b) =>
                val (tags, next) =
                  EcosystemParsers.dockerhubTags(new String(b, "UTF-8"))
                acc ++= tags
                url = if (next == url) None else next
                pages += 1
            }
          }
          if (err.isEmpty && url.isDefined)
            err = Some(s"tag pagination truncated after $MaxPages pages: $purl")
          err.toLeft(acc.result()
            .filter { t =>
              version.forall(v =>
                if (v.startsWith("sha256")) t.digest.contains(v) else t.name == v)
            }
            .map { t =>
              val digest = t.digest.getOrElse("")
              PackageRow.minimal(
                s"https://hub.docker.com/layers/$ns/$name/${t.name}/images/$digest",
                "docker", name, Some(version.getOrElse(t.name)),
                CollectMiningLevel)
                .copy(namespace = namespace, description = description,
                  sha256 = t.digest.map(_.stripPrefix("sha256:")),
                  size = t.size,
                  homepage_url = Some(
                    if (ns == "library") s"https://hub.docker.com/_/$name"
                    else s"https://hub.docker.com/r/$ns/$name"),
                  release_date = t.lastPushed.flatMap(tsOf))
            })
        }
      case "huggingface" =>
        // HF model API; weights (.bin siblings) resolve at the purl's
        // sha (`minecode/collectors/huggingface.py:18-105`)
        val ns = namespace.getOrElse(
          return Left(s"huggingface purl needs namespace: $purl"))
        val sha = version.getOrElse(
          return Left(s"huggingface purl needs version/sha: $purl"))
        transport.fetch(s"https://huggingface.co/api/models/$ns/$name").map { b =>
          EcosystemParsers.huggingfaceModel(new String(b, "UTF-8")).toSeq
            .flatMap { m =>
              m.binFiles.map { f =>
                PackageRow.minimal(
                  s"https://huggingface.co/$ns/$name/resolve/$sha/$f",
                  "huggingface", name, Some(sha), CollectMiningLevel)
                  .copy(namespace = namespace,
                    homepage_url = Some(s"https://huggingface.co/$ns/$name"),
                    declared_license_expression = m.license,
                    release_date = m.createdAt.flatMap(tsOf))
              }
            }
        }
      case "conan" =>
        // conan-center-index: config.yml locates the recipe folder,
        // conandata.yml names the source url + sha256
        // (`minecode/collectors/conan.py:24-120`)
        val v = version.getOrElse(return Left(s"conan purl needs version: $purl"))
        val base =
          "https://raw.githubusercontent.com/conan-io/conan-center-index/master/recipes"
        transport.fetch(s"$base/$name/config.yml").flatMap { cb =>
          EcosystemParsers.conanVersionFolder(new String(cb, "UTF-8"), v) match {
            case None => Left(s"no conan recipe folder for $name@$v")
            case Some(folder) =>
              transport.fetch(s"$base/$name/$folder/conandata.yml").map { db =>
                EcosystemParsers.conanSource(new String(db, "UTF-8"), v).toSeq
                  .map { case (url, sha256) =>
                    PackageRow.minimal(url, "conan", name, Some(v),
                      CollectMiningLevel).copy(sha256 = sha256)
                  }
              }
          }
        }
      case "swift" =>
        // Swift resolves through the GitHub repo record's tags; the
        // namespace is a repository host path like github.com/{owner}
        // (`minecode/collectors/swift.py:14-40`)
        val ns = namespace.getOrElse(
          return Left(s"swift purl needs namespace: $purl"))
        val owner = ns.split("/").last
        transport.fetch(s"https://api.github.com/repos/$owner/$name").map { b =>
          val (description, tags) =
            EcosystemParsers.githubRepoTags(new String(b, "UTF-8"))
          tags.filter(t => version.forall(_ == t.name)).map { t =>
            PackageRow.minimal(
              t.tarballUrl.getOrElse(
                s"https://github.com/$owner/$name/archive/refs/tags/${t.name}.tar.gz"),
              "swift", name, Some(t.name), CollectMiningLevel)
              .copy(namespace = namespace, description = description,
                primary_language = Some("swift"),
                homepage_url = Some(s"https://github.com/$owner/$name"))
          }
        }
      case "gnu" =>
        // GNU ftp mirror directory listing → one row per source tarball
        // (`minecode/collectors/gnu.py` via fetchcode's directory-listed
        // handler; fixture `gnu/glibc/index.html`)
        transport.fetch(s"https://ftp.gnu.org/gnu/$name/").map { b =>
          EcosystemParsers.dirListingVersions(new String(b, "UTF-8"), name)
            .filter(e => version.forall(_ == e.version))
            .map { e =>
              PackageRow.minimal(
                s"https://ftp.gnu.org/gnu/$name/${e.file}",
                "gnu", name, Some(e.version), CollectMiningLevel)
                .copy(release_date = e.date.flatMap(d => tsOf(d + "T00:00:00")))
            }
        }
      case "openssl" =>
        // openssl.org/source directory listing
        // (`minecode/collectors/openssl.py`; fixture
        // `openssl/Indexof_source.html`)
        transport.fetch("https://www.openssl.org/source/").map { b =>
          EcosystemParsers.dirListingVersions(new String(b, "UTF-8"), "openssl")
            .filter(e => version.forall(_ == e.version))
            .map { e =>
              PackageRow.minimal(
                s"https://www.openssl.org/source/${e.file}",
                "openssl", name, Some(e.version), CollectMiningLevel)
                .copy(release_date = e.date.flatMap(d => tsOf(d + "T00:00:00")))
            }
        }
      case "luarocks" =>
        // luarocks purl2url rockspec layout; existence probed with a
        // fetch like the reference's HEAD check
        // (`minecode/collectors/luarocks.py:14-50`)
        val v = version.getOrElse(
          return Left(s"luarocks purl needs version: $purl"))
        val url = namespace match {
          case Some(ns) => s"https://luarocks.org/manifests/$ns/$name-$v.src.rock"
          case None     => s"https://luarocks.org/$name-$v.src.rock"
        }
        transport.fetch(url).map { _ =>
          Seq(PackageRow.minimal(url, "luarocks", name, Some(v),
            CollectMiningLevel)
            .copy(namespace = namespace, primary_language = Some("lua"),
              homepage_url = Some(namespace match {
                case Some(ns) => s"https://luarocks.org/modules/$ns/$name"
                case None     => s"https://luarocks.org/modules/$name"
              })))
        }
      case "alpm" =>
        // Arch archive layout (`minecode/collectors/alpm.py:16-40`).
        // The reference downloads the .pkg.tar.zst and reads .PKGINFO;
        // zstd isn't decodable with the JDK alone, so the row carries
        // the purl-derived fields and the archive URL — a transport
        // that pre-decodes can feed `EcosystemParsers.pkginfo` instead.
        val v = version.getOrElse(return Left(s"alpm purl needs version: $purl"))
        val arch = qualifiers.getOrElse("arch", "any")
        val url = s"https://archive.archlinux.org/packages/${name.head}/$name/" +
          s"$name-$v-$arch.pkg.tar.zst"
        Right(Seq(PackageRow.minimal(url, "alpm", name, Some(v),
          CollectMiningLevel).copy(namespace = namespace)))
      case "nix" =>
        // official nixpkgs only (`minecode/collectors/nix.py:14-46`);
        // devbox API record → per release/platform/output rows, each
        // resolved through its cache.nixos.org narinfo to the nar
        // archive URL (`minecode/miners/nix.py:16-107`)
        if (!namespace.exists(_.equalsIgnoreCase("nixpkgs")))
          return Left(s"nix purls are collected for nixpkgs only: $purl")
        transport.fetch(s"https://search.devbox.sh/v2/pkg?name=$name")
          .flatMap { b =>
            EcosystemParsers.nixPackage(new String(b, "UTF-8")) match {
              case None => Left(s"unparseable nix package data: $purl")
              case Some(pkg) =>
                val combos = for {
                  release <- pkg.releases
                  if version.forall(_ == release.version)
                  platform <- release.platforms
                  output <- platform.outputs
                } yield (release, platform, output)
                // a failed/unparseable narinfo means we don't know the
                // archive URL — fail the collect instead of recording
                // the metadata URL as a fake download_url
                combos.foldLeft(
                  Right(Vector.empty): Either[String, Vector[PackageRow]]) {
                  case (accE, (release, platform, output)) => accE.flatMap { acc =>
                    val baseName = output.storePath
                      .reverse.takeWhile(_ != '/').reverse
                    val hash = baseName.split("-")(0)
                    transport.fetch(s"https://cache.nixos.org/$hash.narinfo")
                      .flatMap(n => EcosystemParsers.narinfoUrl(
                        new String(n, "UTF-8"))
                        .toRight(s"narinfo without URL field: $hash"))
                      .map { p =>
                        val dl = s"https://cache.nixos.org/$p"
                        val qualifiers = (
                          platform.commit.map("commit=" + _).toSeq ++
                            Seq(s"output=${output.name}") ++
                            platform.system.map("system=" + _).toSeq
                          ).mkString("&")
                        acc :+ PackageRow.minimal(dl, "nix", name,
                          Some(release.version), CollectMiningLevel)
                          .copy(namespace = namespace,
                            qualifiers = Some(qualifiers),
                            description = pkg.summary,
                            homepage_url = pkg.homepage,
                            declared_license_expression =
                              if (pkg.licenses.isEmpty) None
                              else Some(pkg.licenses.mkString("\n")),
                            release_date = platform.date.flatMap(tsOf))
                      }
                  }
                }.map(rows => rows: Seq[PackageRow])
            }
          }
      case "generic" =>
        // generic purls carry their own download_url qualifier
        // (`minecode/collectors/generic.py:30-55`)
        qualifiers.get("download_url") match {
          case None => Left(s"generic purl needs download_url qualifier: $purl")
          case Some(u) =>
            Right(Seq(PackageRow.minimal(u, "generic", name, version,
              CollectMiningLevel).copy(namespace = namespace)))
        }
      case other => Left(s"unsupported ecosystem: $other")
    }
  }

  /** Lenient ISO-ish timestamp parse used for registry release dates
    * ("2022-03-08T17:50:52.496Z" → timestamp at second precision);
    * malformed dates become null rather than failing the task. */
  private def tsOf(d: String): Option[java.sql.Timestamp] =
    scala.util.Try(
      java.sql.Timestamp.valueOf(d.replace("T", " ").take(19))
    ).toOption

  /** Batch collect: purl requests → (collected package rows, errors),
    * merged into the existing catalog. The registry fetches run on
    * EXECUTORS — requests are distributed as a Dataset and resolved
    * inside mapPartitions (Transport is Serializable), so a
    * watch-driven batch of millions of purls never serializes through
    * the driver; only the (small) error list is collected. */
  def collect(spark: SparkSession, catalog: DataFrame, purls: Seq[String],
      transport: Transport, now: String): (DataFrame, Seq[String]) = {
    import spark.implicits._
    val resolved = spark.createDataset(purls)
      .mapPartitions { it =>
        it.map { p =>
          collectPurl(p, transport) match {
            case Left(e)     => (p, e, Seq.empty[PackageRow])
            case Right(rows) => (p, null: String, rows)
          }
        }
      }
      .toDF("purl", "error", "rows")
      // eager materialization: the error frame, the row frame, and the
      // caller's eventual action all derive from this — an external
      // fetch must run exactly once per purl, never on lineage replay
      .localCheckpoint(true)
    val errors = resolved.filter(col("error").isNotNull)
      .select(concat(col("purl"), lit(": "), col("error")))
      .as[String].collect().toSeq
    val incoming = resolved.filter(col("error").isNull)
      .select(explode(col("rows")).as("r"))
      .select(col("r.*"))
      .withColumn("visit_level", lit(CollectMiningLevel))
    if (incoming.isEmpty) (catalog, errors)
    else {
      val merged = MergeEngine.mergePackages(catalog, incoming, now)
      (merged.packages, errors ++ merged.errors
        .select("download_url", "error").as[(String, String)].collect()
        .map { case (u, e) => s"$u: $e" })
    }
  }
}
