package graft.miners

import graft.catalog.{MergeEngine, PackageRow}
import graft.sources.RegistryParsers
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

  /** Resolve one purl via the registry: fetch → parse versions →
    * build one PackageRow per version. */
  def collectPurl(purl: String, transport: Transport)
      : Either[String, Seq[PackageRow]] = {
    val parsed = graft.functions.PurlParse.parse(purl)
    if (parsed == null) return Left(s"invalid purl: $purl")
    val (ptype, namespace, name) = (parsed(0), Option(parsed(1)), parsed(2))
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
