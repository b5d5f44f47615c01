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
  * The fetch+parse runs per-request on executors inside mapPartitions
  * (requests are small batches); the merge is the fully distributed
  * MergeEngine plan.
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
              .copy(release_date = v.releaseDate.map(d =>
                java.sql.Timestamp.valueOf(d.replace("T", " ").take(19))))
          }
        }
      case "npm" =>
        transport.fetch(s"https://registry.npmjs.org/$name").map { bytes =>
          RegistryParsers.npmVersions(new String(bytes, "UTF-8")).map { v =>
            PackageRow.minimal(
              s"https://registry.npmjs.org/$name/-/$name-${v.value}.tgz",
              "npm", name, Some(v.value), CollectMiningLevel)
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
      case other => Left(s"unsupported ecosystem: $other")
    }
  }

  /** Batch collect: purl requests → (collected package rows, errors),
    * merged into the existing catalog. */
  def collect(spark: SparkSession, catalog: DataFrame, purls: Seq[String],
      transport: Transport, now: String): (DataFrame, Seq[String]) = {
    import spark.implicits._
    val results = purls.map(p => p -> collectPurl(p, transport))
    val errors = results.collect { case (p, Left(e)) => s"$p: $e" }
    val rows = results.flatMap { case (_, r) => r.getOrElse(Seq.empty) }
    if (rows.isEmpty) (catalog, errors)
    else {
      val incoming = rows.toDF()
        .withColumn("visit_level", lit(CollectMiningLevel))
      val merged = MergeEngine.mergePackages(catalog, incoming, now)
      (merged.packages, errors ++ merged.errors
        .select("download_url", "error").as[(String, String)].collect()
        .map { case (u, e) => s"$u: $e" })
    }
  }
}
