package graft

import graft.miners.{MavenCrawl, Transport}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the maven directory-listing crawl against the
  * reference's own test cases and HTML fixtures
  * (`minecode/tests/collectors/test_maven.py:374-575`).
  */
class MavenCrawlSpec extends AnyFunSuite {

  private val fixtures =
    "/root/reference/minecode/tests/testfiles/maven/html"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$path")), "UTF-8")

  private val listing = """
        <a href="../">../</a>
        <a href="1.0.b2/" title="1.0.b2/">1.0.b2/</a>
                                                   2005-09-20 05:53         -
        <a href="1.2.01/" title="1.2.01/">1.2.01/</a>
                                                   2010-02-03 21:05         -
        """

  test("directory filter keeps only non-parent directories") {
    val links = Seq("../" -> "-", "foo/" -> "-", "foo.pom" -> "2023-09-28")
    assert(MavenCrawl.filterOnlyDirectories(links) === Seq("foo/" -> "-"))
  }

  test("artifact filter keeps the installable extensions, not poms") {
    val exts = Seq("pom", "ejb3", "ear", "aar", "apk", "gem", "jar",
      "nar", "so", "swc", "tar", "tar.gz", "war", "xar", "zip")
    val links = ("../" -> "t") +: exts.map(e => s"foo.$e" -> "t")
    val kept = MavenCrawl.filterForArtifacts(links).map(_._1)
    assert(kept === exts.filterNot(_ == "pom").map(e => s"foo.$e"))
  }

  test("links collect from repo1-style listings with timestamps") {
    assert(MavenCrawl.collectLinksFromText(listing,
      MavenCrawl.filterOnlyDirectories) === Seq(
      "1.0.b2/" -> "2005-09-20 05:53", "1.2.01/" -> "2010-02-03 21:05"))
  }

  test("relative links rebase onto the page URL") {
    val url = "https://repo1.maven.org/maven2/xml-apis/xml-apis/"
    assert(MavenCrawl.absoluteUrls(listing, url,
      MavenCrawl.filterOnlyDirectories) === Seq(
      "https://repo1.maven.org/maven2/xml-apis/xml-apis/1.0.b2/" ->
        "2005-09-20 05:53",
      "https://repo1.maven.org/maven2/xml-apis/xml-apis/1.2.01/" ->
        "2010-02-03 21:05"))
  }

  test("maven.apache.org listing fixture parses") {
    val got = MavenCrawl.collectLinksAndTimestamps(
      read("maven.apache.org/abbot.html"))
    assert(got === Seq(
      "1.4.0/" -> "2015-09-22 16:03",
      "maven-metadata.xml" -> "2015-09-24 14:18"))
  }

  test("repository.jboss.org nexus listing fixture parses") {
    val got = MavenCrawl.collectLinksAndTimestamps(
      read("repository.jboss.org/commons-codec.html"))
    assert(got === Seq(
      "1.2/" -> "",
      ("https://repository.jboss.org/nexus/repository/public/" +
        "apache-codec/commons-codec/maven-metadata.xml") ->
        "Fri Sep 05 09:38:07 Z 2025"))
  }

  test("repository.apache.org snapshots listing fixture parses") {
    val got = MavenCrawl.collectLinksAndTimestamps(
      read("repository.apache.org/common-chain.html"))
    assert(got.map(_._1) === Seq(
      "https://repository.apache.org/content/groups/snapshots/" +
        "commons-chain/commons-chain/1.3-SNAPSHOT/",
      "https://repository.apache.org/content/groups/snapshots/" +
        "commons-chain/commons-chain/2.0-SNAPSHOT/",
      "https://repository.apache.org/content/groups/snapshots/" +
        "commons-chain/commons-chain/maven-metadata.xml.md5",
      "https://repository.apache.org/content/groups/snapshots/" +
        "commons-chain/commons-chain/maven-metadata.xml.sha1"))
    assert(got.head._2 === "Thu Jul 04 05:45:00 UTC 2013")
  }

  test("repo.spring.io listing fixture parses") {
    val got = MavenCrawl.collectLinksAndTimestamps(
      read("repo.spring.io/scstest.html"))
    assert(got === Seq(
      "0.0.11.M2/" -> "07-Aug-2019 08:40",
      "0.0.11.RC2/" -> "07-Aug-2019 08:36",
      "maven-metadata.xml" -> "07-Aug-2019 09:07"))
  }

  test("plugins.gradle.org listing fixture parses") {
    val got = MavenCrawl.collectLinksAndTimestamps(
      read("plugins.gradle.org/test.html"))
    assert(got === Seq("0.0.10/" -> "", "1.0.1/" -> "", "1.1.0/" -> "",
      "maven-metadata.xml" -> ""))
  }

  test("classifier resolves from the artifact filename") {
    assert(MavenCrawl.classifierFromArtifactUrl(
      "https://repo1.maven.org/maven2/net/alchim31/livereload-jvm/" +
        "0.2.0/livereload-jvm-0.2.0-onejar.jar",
      "livereload-jvm", "0.2.0").contains("onejar"))
    assert(MavenCrawl.classifierFromArtifactUrl(
      "https://repo1.maven.org/maven2/xml-apis/xml-apis/1.0.b2/" +
        "xml-apis-1.0.b2.jar", "xml-apis", "1.0.b2").isEmpty)
  }

  test("namespace/name/version resolve from a repo URL") {
    // the reference's doctest: net/shibboleth/parent/7.11.0
    val (ns, name, version) = MavenCrawl.determineNamespaceNameVersion(
      "https://repo1.maven.org/maven2/net/shibboleth/parent/7.11.0/",
      "https://repo1.maven.org/maven2",
      prefix => prefix.stripSuffix("/") match {
        case p if p.endsWith("/parent/7.11.0") => "version"
        case p if p.endsWith("/parent")        => "package"
        case _                                 => "namespace"
      })
    assert((ns, name, version) === ("net.shibboleth", "parent", "7.11.0"))
  }

  test("import flow maps a package page to per-artifact catalog rows") {
    // test_priority_queue-style end-to-end, offline: a package page
    // with one version dir; its version page holds a jar, a sources
    // jar, and a pom (skipped); .sha1 side files resolve
    val pageUrl = "https://repo1.maven.org/maven2/xml-apis/xml-apis"
    val versionPage = """
        <a href="../">../</a>
        <a href="xml-apis-1.0.b2.jar" title="xml-apis-1.0.b2.jar">xml-apis-1.0.b2.jar</a>
                               2005-09-20 05:53    109318
        <a href="xml-apis-1.0.b2-sources.jar" title="s">xml-apis-1.0.b2-sources.jar</a>
                               2005-09-20 05:53      2249
        <a href="xml-apis-1.0.b2.pom" title="xml-apis-1.0.b2.pom">xml-apis-1.0.b2.pom</a>
                               2005-09-20 05:53      2249
        """
    val transport = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = uri match {
        case u if u == s"$pageUrl/1.0.b2" => Right(versionPage.getBytes)
        case u if u.endsWith(".jar.sha1") =>
          Right("3136ca936f64c9d68529f048c2618bd356bf85c9  x\n".getBytes)
        case u => Left(s"unexpected: $u")
      }
    }
    val Right(rows) = MavenCrawl.importPackagePage(
      s"$pageUrl/", listing.replace("1.2.01/", "../")
        .replace("""<a href="../">../</a>""", ""),
      "xml-apis", "xml-apis", transport): @unchecked
    assert(rows.map(_.download_url) === Seq(
      s"$pageUrl/1.0.b2/xml-apis-1.0.b2.jar",
      s"$pageUrl/1.0.b2/xml-apis-1.0.b2-sources.jar"))
    assert(rows.forall(_.sha1.contains(
      "3136ca936f64c9d68529f048c2618bd356bf85c9")))
    assert(rows(0).qualifiers.isEmpty)
    assert(rows(1).qualifiers.contains("classifier=sources"))
    assert(rows(0).release_date.map(_.toString)
      .contains("2005-09-20 05:53:00.0"))
    assert(rows.forall(_.version.contains("1.0.b2")))
  }

  test("listing timestamps parse in all three formats") {
    assert(MavenCrawl.parseListingTimestamp("2005-09-20 05:53").nonEmpty)
    assert(MavenCrawl.parseListingTimestamp("07-Aug-2019 08:40").nonEmpty)
    assert(MavenCrawl
      .parseListingTimestamp("Thu Jul 04 05:45:00 UTC 2013").nonEmpty)
    assert(MavenCrawl
      .parseListingTimestamp("Fri Sep 05 09:38:07 Z 2025").nonEmpty)
    assert(MavenCrawl.parseListingTimestamp("").isEmpty)
    assert(MavenCrawl.parseListingTimestamp("-").isEmpty)
  }
}
