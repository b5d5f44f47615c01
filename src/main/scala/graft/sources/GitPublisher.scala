package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset}

/** S15 — FederatedCode git publisher
  * (`minecode/pipelines/__init__.py:150-348`,
  * `minecode/pipes/__init__.py:161-332`): mined purls are written as
  * sorted `purls.yml` files into a git checkout and committed in
  * batches of 100 files, with a numbered commit message per batch and
  * a final commit for the remainder.
  *
  * Spark shape: a git checkout is a single-writer resource, so the
  * publisher is the *sink* side of a `foreachBatch` — the distributed
  * plan produces (path, purls) rows, and each micro-batch drains
  * driver-side through `toLocalIterator` (bounded memory: one row at
  * a time) into the checkout. Mining stays fully distributed; only
  * the final file/commit step is serialized, exactly like the
  * reference's worker loop.
  */
object GitPublisher {

  /** One file to publish: repo-relative path + the purls it lists. */
  final case class PublishItem(relativePath: String, purls: Seq[String])

  val DefaultBatchSize = 100 // minecode/pipelines/__init__.py:218

  /** Repo-relative directory for a purl's artifacts
    * (`clearcode/store_scans.py:157-161`): type/namespace?/name/version. */
  /** `dump_purls` (`minecode/management/commands/dump_purls.py`):
    * one compact JSON line `{"purl":…,"download_url":…}` per package
    * of the given type. The caller writes the frame with
    * `.write.text(...)` — at 100 TB that shards naturally by
    * partition instead of the reference's per-million-row file
    * rotation. */
  def dumpPurls(packages: org.apache.spark.sql.DataFrame,
      packageType: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.purl_build
    packages.filter(col("ptype") === packageType)
      .select(to_json(struct(
        purl_build(col("ptype"), col("namespace"), col("name"),
          col("version")).as("purl"),
        col("download_url"))).as("line"))
  }

  def purlPath(ptype: String, namespace: Option[String], name: String,
      version: String): String =
    (Seq(ptype) ++ namespace.filter(_.nonEmpty) ++ Seq(name, version))
      .mkString("/")

  /** Short lowercase purl hash used to shard purls across federated
    * repos (`clearcode/store_scans.py:164-174`): first `length` hex
    * chars of sha512(purl). */
  def purlHash(purl: String, length: Int = 3): String = {
    val d = java.security.MessageDigest.getInstance("SHA-512")
      .digest(purl.getBytes(StandardCharsets.UTF_8))
    d.take((length + 1) / 2).map(b => f"$b%02x").mkString.take(length)
  }

  /** Run git in `repoDir` with a fixed identity (no global config
    * dependency); returns stdout, throws on nonzero exit. */
  def git(repoDir: File, args: String*): String = {
    val cmd = Seq("git", "-c", "user.name=graft-publisher",
      "-c", "user.email=publisher@graft.invalid") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(repoDir)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      StandardCharsets.UTF_8)
    if (p.waitFor() != 0)
      throw new RuntimeException(
        s"git ${args.mkString(" ")} failed in $repoDir:\n$out")
    out
  }

  /** Write one purls.yml: sorted unique purls as a YAML list
    * (`pipes/__init__.py:161-173`); append merges with the existing
    * list before dedup+sort. Returns the relative path written. */
  def writePurlsYaml(repoDir: File, relativePath: String,
      purls: Seq[String], append: Boolean = false): String = {
    val full = Paths.get(repoDir.getPath, relativePath)
    Files.createDirectories(full.getParent)
    val existing =
      if (append && Files.exists(full))
        Files.readAllLines(full).toArray(Array.empty[String]).toSeq
          .filter(_.startsWith("- ")).map(_.stripPrefix("- "))
      else Seq.empty
    val yaml = renderPurlsYaml(existing ++ purls)
    Files.write(full, yaml.getBytes(StandardCharsets.UTF_8))
    relativePath
  }

  /** Pure rendering half of [[writePurlsYaml]]: dedupe, sort, dash
    * list — one purl per `- ` line, trailing newline. */
  def renderPurlsYaml(purls: Seq[String]): String =
    purls.distinct.sorted.map(p => s"- $p").mkString("", "\n", "\n")

  /** The reference's numbered commit message
    * (`pipelines/__init__.py:118-134`, without the service identity
    * footer). */
  def commitMessage(commitCount: Int, totalCommitCount: String = "many")
      : String =
    s"Add newly mined PackageURLs ($commitCount/$totalCommitCount)"

  /** Publish a stream of items into the checkout: write each file,
    * commit every `batchSize` files, final commit for the remainder.
    * Returns the number of commits made. */
  def publish(items: Iterator[PublishItem], repoDir: File,
      batchSize: Int = DefaultBatchSize, append: Boolean = false): Int = {
    var pending = List.empty[String]
    var commits = 0
    def commit(msg: String): Unit = if (pending.nonEmpty) {
      git(repoDir, Seq("add", "--") ++ pending.reverse: _*)
      git(repoDir, "commit", "-q", "-m", msg)
      commits += 1
      pending = Nil
    }
    items.foreach { item =>
      pending ::= writePurlsYaml(repoDir, item.relativePath, item.purls,
        append)
      if (pending.size >= batchSize) commit(commitMessage(commits + 1))
    }
    commit(commitMessage(commits + 1, totalCommitCount = s"${commits + 1}"))
    commits
  }

  /** `federate_packages` (`minecode/management/commands/
    * federate_packages.py`): every catalog purl appended into its
    * shard's purls.yml, committed in 1000-file batches — the same
    * publish machinery as the mining pipelines, driven from the
    * whole-catalog frame. `purled` rows: (relativePath, purl). */
  def federatePackages(purled: DataFrame, repoDir: File,
      batchSize: Int = 1000): Int = {
    import scala.jdk.CollectionConverters._
    val session = purled.sparkSession
    import session.implicits._
    val items = purled
      .groupBy("relativePath")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_set("purl")).as("purls"))
      .selectExpr("CAST(relativePath AS STRING)", "purls")
      .as[(String, Seq[String])]
    publish(items.toLocalIterator().asScala
      .map { case (p, purls) => PublishItem(p, purls) },
      repoDir, batchSize, append = true)
  }

  /** The SBOM federation commit message (`minecode/management/
    * commands/federate_sboms.py:19-29`, without the service-identity
    * footer that is deployment config). */
  def sbomCommitMessage(commitBatch: Int,
      totalCommitBatch: String = "many"): String =
    s"Save CycloneDX SBOMs from PurlDB ($commitBatch/$totalCommitBatch)"

  /** `federate_sboms`: write one CycloneDX document per package into
    * the checkout at its purl path and commit every `batchSize` files
    * (the reference's PACKAGE_BATCH_SIZE is 1000). `sboms` rows:
    * (purl, sbom json) — the output of
    * [[graft.catalog.Sbom.toCycloneDxDocument]]. `toLocalIterator`
    * keeps driver memory at one row; the git tree shards by the
    * purl's path segments. Returns the commit count. */
  def federateSboms(sboms: DataFrame, repoDir: File,
      batchSize: Int = 1000): Int = {
    import scala.jdk.CollectionConverters._
    val session = sboms.sparkSession
    import session.implicits._
    val rows = sboms.selectExpr("CAST(purl AS STRING)",
      "CAST(bom AS STRING)").as[(String, String)]
    var pending = List.empty[String]
    var commits = 0
    def commit(msg: String): Unit = if (pending.nonEmpty) {
      git(repoDir, Seq("add", "--") ++ pending.reverse: _*)
      git(repoDir, "commit", "-q", "-m", msg)
      commits += 1
      pending = Nil
    }
    rows.toLocalIterator().asScala.foreach { case (purl, json) =>
      // qualifiers don't belong in a filesystem path
      val rel = purl.stripPrefix("pkg:").split('?').head +
        "/cyclonedx-bom.json"
      val full = Paths.get(repoDir.getPath, rel)
      Files.createDirectories(full.getParent)
      Files.write(full, json.getBytes(StandardCharsets.UTF_8))
      pending ::= rel
      if (pending.size >= batchSize) commit(sbomCommitMessage(commits + 1))
    }
    commit(sbomCommitMessage(commits + 1, s"${commits + 1}"))
    commits
  }

  /** Drain one micro-batch DataFrame of (relativePath, purls) into
    * the checkout — the body of a `foreachBatch((df, id) => ...)`
    * streaming sink. `toLocalIterator` keeps driver memory bounded to
    * one row regardless of batch size. */
  def publishBatch(batch: DataFrame, repoDir: File,
      batchSize: Int = DefaultBatchSize, append: Boolean = false): Int = {
    import scala.jdk.CollectionConverters._
    val session = batch.sparkSession
    import session.implicits._
    val items: Dataset[(String, Seq[String])] = batch
      .selectExpr("CAST(relativePath AS STRING)", "purls")
      .as[(String, Seq[String])]
    publish(items.toLocalIterator().asScala
      .map { case (p, purls) => PublishItem(p, purls) },
      repoDir, batchSize, append)
  }
}
