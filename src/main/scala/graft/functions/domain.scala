package graft.functions

import java.util.regex.Pattern

/** Domain scalar functions (SURVEY §2.8 F2/F5/F7/F15) — pure Scala
  * implementations usable from Dataset code and wrapped as UDFs where
  * needed. Each cites the reference behavior it reproduces; all are
  * reimplementations from observed semantics, not ported code.
  */

/** F5 — version_hint: extract a version from an artifact path via a
  * battery of regexes (`minecode/version.py:13-96`). The pattern list
  * reproduces the reference's published patterns (they are the
  * behavioral contract); matching strategy: strip archive extensions
  * and non-version tags, then per pattern scan path segments from the
  * last segment backwards, skipping the first segment when there are
  * several (`minecode/version.py:49-75`).
  */
object VersionHint {

  private val patterns: Seq[Pattern] = Seq(
    """v\d+\.feature\_(\d+\.){1,3}\d+""",
    """\d{4}-\d{2}-\d{2}_\d+""",
    """(M?(v\d+(\-|\_))?\d+\.){1,3}\d+[A-Za-z0-9]*((\.|\-|_|~)(b|B|rc|r|v|RC|alpha|beta|m|pre|vm|G)?\d+((\-|\.)\d+)?)?((\.|\-)(((alpha|dev|beta|rc|final|pre)(\-|\_)\d+[A-Za-z]?(\-RELEASE)?)|alpha|dev(\.\d+\.\d+)?|beta|final|release|fixed|(cr\d(\_\d*)?)))?""",
    """[A-Za-z]?(\d+\_){1,3}\d+\_?[A-Za-z]{0,2}\d+""",
    """(b|rc|r|v|RC|alpha|beta|m|pre|revision-)\d+(\-\d+)?""",
    """current|previous|latest|alpha|beta""",
    """\d+-\d+-\d+-\d+""",
    """\d{4}-\d{2}-\d{2}""",
    """\d+-\d+-\d+""",
    """(\d(\-|\_)){1,2}\d""",
    """\d{5,14}""").map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  private val archiveExtensions = Seq(
    ".7z", ".7zip", ".tar.gz", ".tar.bz2", ".tar.xz", ".tgz", ".tbz",
    ".tbz2", ".tz", ".txz", ".zip", ".rar", ".tar", ".gz", ".bz2", ".jar",
    ".tar.lzma", ".war", ".lib", ".a", ".ear", ".sar", ".tlz", ".xz",
    ".lzma", ".exe", ".rpm", ".deb", ".msi", ".z", ".pkg")

  private val nonVersionTags =
    Seq("win32", "am64", "x86_64", "i386", "i586", "x86", "macosx")

  private val packageExtensions = Seq(".deb", ".rpm", ".srpm", ".diff.gz")

  private val preReleaseTags: Seq[String] = {
    val tags = Seq("pre", "rc", "alpha", "beta", "b1", "b2", "b3", "b4", "b5")
    tags.flatMap { t =>
      Seq("_", "-", ".", "~").flatMap(p => Seq(p + t.toUpperCase, p + t)) ++
        Seq(t.toUpperCase, t)
    }
  }

  private def stripExtensions(path: String): String =
    archiveExtensions.foldLeft(path) { (p, ext) =>
      if (p.toLowerCase.endsWith(ext)) p.substring(0, p.length - ext.length)
      else p
    }

  private def stripVersionTags(path: String): String =
    nonVersionTags.foldLeft(path)((p, t) =>
      Pattern.compile(Pattern.quote(t), Pattern.CASE_INSENSITIVE)
        .matcher(p).replaceAll(""))

  private def fixPackagesVersion(path: String, vs: String): String =
    if (packageExtensions.exists(path.endsWith) &&
      vs.count(_ == '-') == 1) vs.split("-").head
    else vs

  private def stripPreReleases(vs: String): String =
    preReleaseTags.find(vs.contains) match {
      case Some(tag) => vs.split(Pattern.quote(tag)).headOption.getOrElse("")
      case None      => vs
    }

  def apply(path: String, ignorePreReleases: Boolean = false,
      removeVPrefix: Boolean = false): Option[String] = {
    val stripped = stripVersionTags(stripExtensions(path))
    if (stripped.isEmpty) return None
    patterns.iterator.flatMap { pattern =>
      val segments = stripped.split("/")
      val interesting =
        if (segments.length > 1) segments.drop(1) else segments
      interesting.reverseIterator.flatMap { segment =>
        val m = pattern.matcher(segment)
        if (m.find()) {
          var v = fixPackagesVersion(path, m.group(0))
          if (ignorePreReleases) v = stripPreReleases(v)
          if (removeVPrefix && v.startsWith("v")) v = v.substring(1)
          Some(v)
        } else None
      }.take(1)
    }.take(1).toSeq.headOption
  }
}

/** F2 — canonical_url: URL canonicalization with the reference's
  * semantics (`minecode/models.py:34-53`): lowercase scheme+host,
  * punycode the host, strip the fragment, drop a default port
  * (http:80 / https:443), normalize dot segments, keep query.
  */
object CanonicalUrl {
  def apply(uri: String): Option[String] =
    try {
      val u = new java.net.URI(uri.trim).normalize()
      val scheme = Option(u.getScheme).map(_.toLowerCase).getOrElse(return None)
      val host = Option(u.getHost)
        .map(h => java.net.IDN.toASCII(h.toLowerCase))
        .getOrElse(return None)
      val defaultPort = scheme match {
        case "http" => 80; case "https" => 443; case _ => -1
      }
      val port =
        if (u.getPort == -1 || u.getPort == defaultPort) ""
        else s":${u.getPort}"
      val path = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
      val query = Option(u.getRawQuery).map("?" + _).getOrElse("")
      Some(s"$scheme://$host$port$path$query") // fragment dropped
    } catch { case _: Exception => None }
}

/** F7 — combine_expressions: AND-join of detected license expressions
  * with dedup and parenthesization of compound sub-expressions
  * (`minecode/indexing.py:208-215` via license-expression lib).
  */
object LicenseExpressions {
  def combine(expressions: Seq[String]): Option[String] = {
    val cleaned = expressions.filter(e => e != null && e.trim.nonEmpty)
      .map(_.trim).distinct
    cleaned match {
      case Nil      => None
      case Seq(one) => Some(one)
      case many => Some(many.map { e =>
        if (e.toUpperCase.contains(" OR ") || e.toUpperCase.contains(" AND "))
          s"($e)"
        else e
      }.mkString(" AND "))
    }
  }
}

/** F15 — vers range membership per the published VERSION-RANGE-SPEC
  * (`vers:<scheme>/<constraint>|<constraint>...`), used by the API's
  * filter (`packagedb/api.py:1309-1342`). Constraint ops: = != < <= >
  * >=, plus `*`. Containment: != excludes; = includes; remaining
  * ordered comparators form a union of intervals (a `>`/`>=` opens an
  * interval closed by the next `<`/`<=`). Version comparison uses a
  * scheme-aware natural ordering with semver-style pre-release
  * handling — the behavioral subset the reference exercises for its 12
  * supported ecosystems (`packagedb/api.py:977-991`).
  */
object VersRange {

  /** Natural compare with pre-release awareness: numeric runs compare
    * numerically; a pre-release suffix (alpha/beta/rc/pre/dev/a/b)
    * sorts before its base version. */
  def compareVersions(a: String, b: String): Int = {
    val pre = Set("alpha", "beta", "rc", "pre", "dev", "a", "b", "c", "m",
      "milestone", "snapshot")
    def tokens(v: String): Seq[Either[Long, String]] = {
      val raw = v.toLowerCase.stripPrefix("v")
      val buf = scala.collection.mutable.ArrayBuffer.empty[Either[Long, String]]
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c.isDigit) {
          var j = i; while (j < raw.length && raw.charAt(j).isDigit) j += 1
          buf += Left(raw.substring(i, j).toLong); i = j
        } else if (c.isLetter) {
          var j = i; while (j < raw.length && raw.charAt(j).isLetter) j += 1
          buf += Right(raw.substring(i, j)); i = j
        } else i += 1 // separators
      }
      buf.toSeq
    }
    val (ta, tb) = (tokens(a), tokens(b))
    val n = math.max(ta.length, tb.length)
    var i = 0
    while (i < n) {
      (ta.lift(i), tb.lift(i)) match {
        case (Some(Left(x)), Some(Left(y))) =>
          if (x != y) return java.lang.Long.compare(x, y)
        case (Some(Right(x)), Some(Right(y))) =>
          if (x != y) return x.compareTo(y)
        case (Some(Left(_)), Some(Right(_)))  => return 1 // 1.2.1 > 1.2.rc
        case (Some(Right(_)), Some(Left(_)))  => return -1
        case (Some(Left(_)), None)            => return 1 // 1.2.1 > 1.2
        case (None, Some(Left(_)))            => return -1
        // trailing alpha token = pre-release → base wins
        case (Some(Right(t)), None) => return if (pre(t)) -1 else 1
        case (None, Some(Right(t))) => return if (pre(t)) 1 else -1
        case (None, None)           => return 0
      }
      i += 1
    }
    0
  }

  private final case class Constraint(op: String, version: String)

  private def parse(vers: String): Option[(String, Seq[Constraint])] = {
    val s = vers.trim
    if (!s.toLowerCase.startsWith("vers:")) return None
    val body = s.substring(5)
    val slash = body.indexOf('/')
    if (slash <= 0) return None
    val scheme = body.substring(0, slash).toLowerCase
    val constraints = body.substring(slash + 1).split("\\|").toSeq
      .map(_.trim).filter(_.nonEmpty).map { c =>
        val op = Seq(">=", "<=", "!=", ">", "<", "=").find(c.startsWith)
          .getOrElse("=")
        val v = if (c.startsWith(op)) c.substring(op.length) else c
        Constraint(op, v.trim)
      }
    Some((scheme, constraints))
  }

  /** True iff `version` is contained in the `vers` range string.
    * Comparison is scheme-aware: the vers scheme picks the ecosystem
    * comparator ([[EcosystemVersions]] — pep440 for pypi, dpkg rules
    * for deb, ComparableVersion for maven, SemVer for npm/cargo/...),
    * matching the reference's univers delegation
    * (`packagedb/api.py:1309-1342`). */
  def contains(vers: String, version: String): Option[Boolean] = {
    parse(vers).map { case (scheme, constraints) =>
      def cmpV(a: String, b: String): Int =
        EcosystemVersions.compare(scheme, a, b)
      if (constraints.isEmpty || constraints.exists(_.version == "*"))
        return Some(!constraints.exists(c =>
          c.op == "!=" && cmpV(version, c.version) == 0))
      val cmp = (c: Constraint) => cmpV(version, c.version)
      if (constraints.exists(c => c.op == "!=" && cmp(c) == 0)) false
      else if (constraints.exists(c => c.op == "=" && cmp(c) == 0)) true
      else {
        // union of intervals over the ordered comparators
        val ordered = constraints.filter(c => c.op != "=" && c.op != "!=")
          .sortWith((x, y) => cmpV(x.version, y.version) < 0)
        def sat(c: Constraint): Boolean = c.op match {
          case ">"  => cmp(c) > 0
          case ">=" => cmp(c) >= 0
          case "<"  => cmp(c) < 0
          case "<=" => cmp(c) <= 0
        }
        var i = 0
        var contained = false
        while (i < ordered.length && !contained) {
          val c = ordered(i)
          if (c.op == "<" || c.op == "<=") {
            // lower-unbounded interval (or closes the previous opener —
            // that pairing is handled when the opener is visited)
            if (i == 0 && sat(c)) contained = true
            i += 1
          } else { // > or >=
            val closer = ordered.drop(i + 1)
              .find(n => n.op == "<" || n.op == "<=")
            closer match {
              case Some(cl) => if (sat(c) && sat(cl)) contained = true
              case None     => if (sat(c)) contained = true
            }
            i += 1
          }
        }
        contained
      }
    }
  }
}
