package graft.miners

import graft.sources.Robots

/** S2/S3/S12/X1/X7 — the visitor side of the mining dataflow with an
  * injected transport (zero-egress environment; production swaps in a
  * real HTTP client, nothing else changes).
  */

/** Pluggable fetch transport (S2); large payloads can be spilled by
  * the implementation (S3) — the visitor only sees bytes or an error. */
trait Transport extends Serializable {
  def fetch(uri: String): Either[String, Array[Byte]]
}

/** X1 — visitor result: yielded URIs + payload + error, the
  * reference's `Visitor.__call__` 3-tuple
  * (`minecode/miners/__init__.py:137-188`). */
final case class VisitResult(uris: Seq[String], payload: Option[Array[Byte]],
    error: Option[String])

/** S2 — HTTP visitor honoring robots.txt disallow rules
  * (`run_visit.py:192-211`): fetch, expand links via the supplied
  * extractor, report errors in-band. Runs inside `mapPartitions`. */
final class HttpVisitor(transport: Transport,
    extractUris: Array[Byte] => Seq[String],
    robotsRules: Map[String, Robots.Rules] = Map.empty)
    extends Serializable {

  def visit(uri: String): VisitResult = {
    val host = uri.split("/").drop(2).headOption.getOrElse("")
    val path = "/" + uri.split("/").drop(3).mkString("/")
    robotsRules.get(host) match {
      case Some(rules) if !Robots.allowed(path, rules) =>
        VisitResult(Seq.empty, None, Some(s"disallowed by robots.txt: $uri"))
      case _ =>
        transport.fetch(uri) match {
          case Left(err) => VisitResult(Seq.empty, None, Some(err))
          case Right(payload) =>
            VisitResult(extractUris(payload), Some(payload), None)
        }
    }
  }
}

/** S12 — seed source (`minecode/miners/maven.py:91-106`): static root
  * URIs that bootstrap the frontier — exactly the two the reference's
  * MavenSeed yields (the commented-out mirrors are not seeds). */
object Seeds {
  val maven: Seq[String] = Seq(
    "https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.gz",
    "https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.properties")
  def all: Seq[String] = maven
}

/** X7 — per-ecosystem artifact builder: shape a parsed index record
  * into catalog package fields (`minecode/miners/maven.py:569-707`,
  * `get_mini_package` `:989-1033`). */
object ArtifactBuilder {
  def mavenPackage(record: Map[String, String])
      : Option[graft.catalog.PackageRow] =
    for {
      g <- record.get("groupId")
      a <- record.get("artifactId")
      v <- record.get("version")
    } yield {
      val classifier = record.get("classifier")
      val ext = record.getOrElse("extension", "jar")
      val gPath = g.replace('.', '/')
      val fileSuffix = classifier.map("-" + _).getOrElse("")
      graft.catalog.PackageRow.minimal(
        s"https://repo1.maven.org/maven2/$gPath/$a/$v/$a-$v$fileSuffix.$ext",
        "maven", a, Some(v))
        .copy(namespace = Some(g),
          qualifiers = classifier.map(c => s"classifier=$c"),
          description = record.get("description"))
    }
}
