package graft

import java.nio.file.Files

import graft.sources.GitPublisher
import graft.sources.GitPublisher.PublishItem

/** End-to-end S15: publish purls.yml batches into a real local git
  * repo and assert the batched-commit contract
  * (`minecode/pipelines/__init__.py:150-348`, batch_size=100).
  */
class GitPublisherSpec extends SparkTestBase {

  private def initRepo(): java.io.File = {
    val dir = Files.createTempDirectory("graft-publisher").toFile
    GitPublisher.git(dir, "init", "-q", "-b", "main")
    dir
  }

  private def log(dir: java.io.File): Seq[String] =
    GitPublisher.git(dir, "log", "--pretty=%s").linesIterator.toSeq

  test("publisher commits in batches of batch_size files + final commit") {
    val dir = initRepo()
    val items = (1 to 250).map(i =>
      PublishItem(f"aboutcode-packages-0/npm/pkg$i%03d/purls.yml",
        Seq(f"pkg:npm/pkg$i%03d@1.0.0")))
    val commits = GitPublisher.publish(items.iterator, dir, batchSize = 100)
    assert(commits == 3) // 100 + 100 + 50
    val messages = log(dir)
    assert(messages == Seq(
      "Add newly mined PackageURLs (3/3)",
      "Add newly mined PackageURLs (2/many)",
      "Add newly mined PackageURLs (1/many)"))
    // every file landed in exactly one commit
    val firstBatch = GitPublisher.git(dir, "show", "--stat", "--pretty=",
      "HEAD~2").linesIterator.count(_.contains("purls.yml"))
    assert(firstBatch == 100)
    val lastBatch = GitPublisher.git(dir, "show", "--stat", "--pretty=",
      "HEAD").linesIterator.count(_.contains("purls.yml"))
    assert(lastBatch == 50)
  }

  test("purl paths and shard hashes match the reference layout") {
    // clearcode/store_scans.py get_purl_path / get_purl_hash
    assert(GitPublisher.purlPath("npm", None, "abbrev", "1.0.3") ===
      "npm/abbrev/1.0.3")
    assert(GitPublisher.purlPath("maven", Some("org.apache"), "x", "1")
      === "maven/org.apache/x/1")
    // sha512 prefixes verified against hashlib
    assert(GitPublisher.purlHash("pkg:npm/abbrev@1.0.3") === "9b1")
    assert(GitPublisher.purlHash("pkg:maven/org.apache/x@1", 5) ===
      "f2146")
  }

  test("purls.yml is a sorted YAML list; append merges and dedups") {
    val dir = initRepo()
    GitPublisher.writePurlsYaml(dir, "deb/zlib/purls.yml",
      Seq("pkg:deb/zlib@2", "pkg:deb/zlib@1"))
    val p = java.nio.file.Paths.get(dir.getPath, "deb/zlib/purls.yml")
    assert(new String(Files.readAllBytes(p), "UTF-8") ==
      "- pkg:deb/zlib@1\n- pkg:deb/zlib@2\n")
    // append: merge, dedup, re-sort (pipes write_packageurls_to_file)
    GitPublisher.writePurlsYaml(dir, "deb/zlib/purls.yml",
      Seq("pkg:deb/zlib@3", "pkg:deb/zlib@1"), append = true)
    assert(new String(Files.readAllBytes(p), "UTF-8") ==
      "- pkg:deb/zlib@1\n- pkg:deb/zlib@2\n- pkg:deb/zlib@3\n")
    // overwrite mode replaces
    GitPublisher.writePurlsYaml(dir, "deb/zlib/purls.yml",
      Seq("pkg:deb/zlib@9"))
    assert(new String(Files.readAllBytes(p), "UTF-8") == "- pkg:deb/zlib@9\n")
  }

  test("foreachBatch-shaped sink drains a DataFrame into the checkout") {
    import spark.implicits._
    val dir = initRepo()
    val df = (1 to 7).map(i =>
        (s"aboutcode-packages-1/gem/g$i/purls.yml", Seq(s"pkg:gem/g$i@1")))
      .toDF("relativePath", "purls")
    val commits = GitPublisher.publishBatch(df, dir, batchSize = 3)
    assert(commits == 3) // 3 + 3 + 1
    assert(log(dir).head == "Add newly mined PackageURLs (3/3)")
    val tracked = GitPublisher.git(dir, "ls-files").linesIterator.size
    assert(tracked == 7)
  }

  test("federate_sboms writes CycloneDX docs at purl paths with batch commits") {
    // minecode/management/commands/federate_sboms.py — one document
    // per package in the checkout, committed in batches with the
    // reference's SBOM message format
    import graft.catalog.{DependencyRow, PackageRow, Sbom}
    import spark.implicits._
    val dir = initRepo()
    val pkgs = (1 to 3).map(i =>
      PackageRow.minimal(s"http://r/p$i.jar", "maven", s"p$i", Some("1.0"))
        .copy(namespace = Some("org.x"))).toDF()
    val deps = Seq.empty[DependencyRow].toDF()
      .select($"download_url", $"purl".as("dep_purl"))
    val sboms = Sbom.toCycloneDxDocument(pkgs, deps)
    val commits = GitPublisher.federateSboms(sboms, dir, batchSize = 2)
    assert(commits == 2) // 2 + 1
    assert(log(dir).head == "Save CycloneDX SBOMs from PurlDB (2/2)")
    val files = GitPublisher.git(dir, "ls-files").linesIterator.toSeq
    assert(files.size == 3)
    assert(files.forall(_.endsWith("/cyclonedx-bom.json")))
    assert(files.exists(_.startsWith("maven/org.x/p1@1.0/")))
    // the committed document is the Sbom output verbatim
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.getPath,
        files.find(_.contains("p1")).get)), "UTF-8")
    assert(content.contains("\"bomFormat\":\"CycloneDX\""))
  }

  test("federate_packages appends purls into sharded purls.yml files") {
    import spark.implicits._
    val dir = initRepo()
    val purled = Seq(
      ("maven/org.x/purls.yml", "pkg:maven/org.x/a@1.0"),
      ("maven/org.x/purls.yml", "pkg:maven/org.x/b@1.0"),
      ("npm/purls.yml", "pkg:npm/c@2.0")).toDF("relativePath", "purl")
    val commits = GitPublisher.federatePackages(purled, dir, batchSize = 1000)
    assert(commits == 1)
    val yml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.getPath, "maven/org.x/purls.yml")), "UTF-8")
    assert(yml == "- pkg:maven/org.x/a@1.0\n- pkg:maven/org.x/b@1.0\n")
    // append semantics: a re-run with one new purl merges + dedups
    val again = Seq(("npm/purls.yml", "pkg:npm/c@2.0"),
      ("npm/purls.yml", "pkg:npm/d@1.0")).toDF("relativePath", "purl")
    GitPublisher.federatePackages(again, dir, batchSize = 1000)
    val npm = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.getPath, "npm/purls.yml")), "UTF-8")
    assert(npm == "- pkg:npm/c@2.0\n- pkg:npm/d@1.0\n")
  }

  test("dump_purls emits compact JSON lines for one package type") {
    // minecode/management/commands/dump_purls.py — compact separators
    import graft.catalog.PackageRow
    import spark.implicits._
    val pkgs = Seq(
      PackageRow.minimal("http://a/x.jar", "maven", "x", Some("1.0"))
        .copy(namespace = Some("org.a")),
      PackageRow.minimal("http://n/y.tgz", "npm", "y", Some("2.0")))
      .toDF()
    val lines = GitPublisher.dumpPurls(pkgs, "maven")
      .as[String].collect().toSeq
    assert(lines == Seq(
      """{"purl":"pkg:maven/org.a/x@1.0","download_url":"http://a/x.jar"}"""))
  }
}
