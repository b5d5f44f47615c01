package graft

import graft.catalog.PackageRow
import graft.miners.{MavenPom, Transport}

/** Golden tests for the POM → PackageData + ancestry merge flow,
  * using the reference's own checked-in POM fixtures and the same
  * expectations as its collectors/test_maven.py (parse-before,
  * merge-after, ancestry ordering).
  */
class MavenPomSpec extends SparkTestBase {

  private val fixtureDir =
    "/root/reference/minecode/tests/testfiles/maven/pom"

  private def pom(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtureDir, name)), "UTF-8")

  test("ant-antlr POM parses to the reference's package_before fields") {
    val pkg = MavenPom.toPackage(pom("ant-antlr-1.10.1.pom")).get
    // expectations from ant-antlr-1.10.1-package_before.json
    assert(pkg.namespace.contains("org.apache.ant"))
    assert(pkg.name == "ant-antlr")
    assert(pkg.version.contains("1.10.1"))
    assert(pkg.primary_language.contains("Java"))
    assert(pkg.homepage_url.contains("http://ant.apache.org/"))
    // description = name + "\n" + description
    assert(pkg.description.exists(_.startsWith("Apache Ant + ANTLR\n")))
    assert(pkg.description.exists(_.contains("antlr specific task")))
    assert(pkg.declared_license_expression.isEmpty) // no licenses element
  }

  test("merge_parent fills license from the parent POM, keeps own fields") {
    val child = MavenPom.toPackage(pom("ant-antlr-1.10.1.pom")).get
    val parent = MavenPom.toPackage(pom("ant-parent-1.10.1.pom")).get
    val merged = MavenPom.mergeParent(child, parent)
    // package_after.json: declared_license_expression = apache-2.0
    assert(merged.declared_license_expression.contains("apache-2.0"))
    // own homepage NOT overwritten
    assert(merged.homepage_url.contains("http://ant.apache.org/"))
    // the fill is recorded in history with the parent purl
    assert(merged.history.exists(h =>
      h.message.contains("declared_license_expression") &&
        h.message.contains("pkg:maven/org.apache.ant/ant-parent@1.10.1")))
  }

  private val pomTransport = new Transport {
    def fetch(uri: String): Either[String, Array[Byte]] = uri match {
      case u if u.endsWith("/org/apache/pulsar/pulsar-client-1x-base/2.5.1/pulsar-client-1x-base-2.5.1.pom") =>
        Right(pom("pulsar-client-1x-base-2.5.1.pom").getBytes("UTF-8"))
      case u if u.endsWith("/org/apache/pulsar/pulsar/2.5.1/pulsar-2.5.1.pom") =>
        Right(pom("pulsar-2.5.1.pom").getBytes("UTF-8"))
      case u if u.endsWith("/org/apache/apache/18/apache-18.pom") =>
        Right(pom("apache-18.pom").getBytes("UTF-8"))
      case u if u.endsWith("/org/apache/pulsar/pulsar-client-1x/2.5.1/pulsar-client-1x-2.5.1.pom") =>
        Right(pom("pulsar-client-1x-2.5.1.pom").getBytes("UTF-8"))
      case u => Left(s"404: $u")
    }
  }

  test("get_ancestry walks the parent chain oldest-first") {
    // same fixture chain and expected order as the reference's
    // test_get_ancestry: apache-18, pulsar-2.5.1, pulsar-client-1x-base
    val ancestry = MavenPom.getAncestry(
      pom("pulsar-client-1x-2.5.1.pom"), pomTransport)
    assert(ancestry.size == 3)
    def artifactOf(text: String) =
      MavenPom.parse(text).get.artifactId.get
    assert(ancestry.map(artifactOf) ==
      Seq("apache", "pulsar", "pulsar-client-1x-base"))
  }

  test("get_ancestry terminates on cyclic parent refs (A⇄B and self-parent)") {
    def pomWithParent(g: String, a: String, v: String,
        pg: String, pa: String, pv: String): String =
      s"""<project xmlns="http://maven.apache.org/POM/4.0.0">
        <parent><groupId>$pg</groupId><artifactId>$pa</artifactId>
          <version>$pv</version></parent>
        <groupId>$g</groupId><artifactId>$a</artifactId><version>$v</version>
      </project>"""
    val aPom = pomWithParent("g", "a", "1", "g", "b", "1")
    val bPom = pomWithParent("g", "b", "1", "g", "a", "1")
    val selfPom = pomWithParent("g", "s", "1", "g", "s", "1")
    val t = new Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = uri match {
        case u if u.endsWith("/g/a/1/a-1.pom") => Right(aPom.getBytes("UTF-8"))
        case u if u.endsWith("/g/b/1/b-1.pom") => Right(bPom.getBytes("UTF-8"))
        case u if u.endsWith("/g/s/1/s-1.pom") => Right(selfPom.getBytes("UTF-8"))
        case u                                 => Left(s"404: $u")
      }
    }
    // A -> B -> A: walk stops once coords repeat, never spins
    val cyc = MavenPom.getAncestry(aPom, t)
    assert(cyc.size == 2)
    // self-parent: one ancestor, then stop
    val self = MavenPom.getAncestry(selfPom, t)
    assert(self.size == 1)
  }

  test("merged ancestor package fills fields walking the whole chain") {
    val pkg = PackageRow.minimal(
      "https://repo1.maven.org/maven2/org/apache/pulsar/pulsar-client-1x/2.5.1/pulsar-client-1x-2.5.1.jar",
      "maven", "pulsar-client-1x", Some("2.5.1"))
      .copy(namespace = Some("org.apache.pulsar"))
    val merged = MavenPom.mergedAncestorPackage(pkg, pomTransport)
    // pulsar-client-merged-ancestor-package.json: license + homepage
    // filled from ancestors
    assert(merged.declared_license_expression.exists(_.nonEmpty))
    assert(merged.homepage_url.exists(_.nonEmpty))
    assert(merged.history.nonEmpty)
  }

  test("pom package mapper matches the reference's five mapper fixtures") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val dir = "/root/reference/minecode/tests/testfiles/maven/mapper"
    def read(p: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$p")), "UTF-8")
    def jstr(v: JValue): Option[String] = v match {
      case JString(s) if s.nonEmpty => Some(s); case _ => None
    }
    Seq("axis-1.4", "commons-pool-1.5.7", "struts-menu-2.4.2",
      "mysql-connector-java-5.1.27", "xbean-jmx-2.0").foreach { fixture =>
      val g = MavenPom.pomPackage(read(s"$fixture.pom")).get
      val w = JsonMethods.parse(read(s"$fixture.pom.package.json"))
      assert(g.row.name == jstr(w \ "name").get, fixture)
      assert(g.row.namespace == jstr(w \ "namespace"), fixture)
      assert(g.row.version == jstr(w \ "version"), fixture)
      assert(g.row.description == jstr(w \ "description"), fixture)
      assert(g.row.homepage_url == jstr(w \ "homepage_url"), fixture)
      assert(g.row.declared_license_expression ==
        jstr(w \ "extracted_license_statement"), fixture)
      assert(g.vcsUrl == jstr(w \ "vcs_url"), fixture)
      assert(g.codeViewUrl == jstr(w \ "code_view_url"), fixture)
      val wantSources = (w \ "source_packages") match {
        case JArray(ss) => ss.flatMap(jstr); case _ => Seq.empty
      }
      if (wantSources.nonEmpty) assert(g.sourcePackages == wantSources, fixture)
      assert(g.dependencies.map(d => (d.purl, d.extracted_requirement,
        d.scope, d.is_runtime, d.is_optional, d.is_pinned)) ==
        ((w \ "dependencies") match {
          case JArray(ds) => ds.map(d => (jstr(d \ "purl").get,
            jstr(d \ "extracted_requirement"), jstr(d \ "scope"),
            (d \ "is_runtime") == JBool(true),
            (d \ "is_optional") == JBool(true),
            (d \ "is_pinned") == JBool(true)))
          case _ => Seq.empty
        }), fixture)
    }
  }

  test("property interpolation resolves project built-ins and properties") {
    val text = """<project xmlns="http://maven.apache.org/POM/4.0.0">
      <parent><groupId>g.p</groupId><artifactId>par</artifactId>
        <version>3.1</version></parent>
      <artifactId>child</artifactId>
      <properties><my.prop>hello</my.prop></properties>
      <name>${my.prop} v${project.version}</name>
      <url>http://example.com/${project.groupId}</url>
    </project>"""
    val pom = MavenPom.parse(text).get
    assert(pom.effectiveGroupId.contains("g.p"))   // inherited
    assert(pom.effectiveVersion.contains("3.1"))   // inherited
    assert(pom.name.contains("hello v3.1"))
    assert(pom.url.contains("http://example.com/g.p"))
  }
}
