package graft.miners

import scala.util.matching.Regex

/** Mining periphery — X3 router, S9 ls-listing parser, J10/F14
  * source-repo inference. Pure Scala, executed inside flatMap/
  * mapPartitions closures on executors.
  */

/** X3 — regex router (`minecode/route.py:38-200`): dispatch a URI to
  * the unique matching handler; error if zero or more than one
  * pattern matches; `is_routable` via the compiled alternation fast
  * path (`minecode/route.py:187-200`).
  */
final class Router[H](routes: Vector[(Regex, H)]) extends Serializable {

  // `route.py:196-198` — one anchored `^(p1|p2|...)$` alternation,
  // compiled once; `matches()` is already whole-string so the anchors
  // are for fidelity with the reference's pattern text
  private val alternation: Regex =
    routes.map { case (r, _) => s"(?:${r.pattern.pattern})" }
      .mkString("^(", "|", ")$").r

  def isRoutable(uri: String): Boolean =
    routes.nonEmpty && alternation.pattern.matcher(uri).matches()

  /** Resolve to the single matching handler.
    * @throws IllegalStateException on zero or multiple matches */
  def resolve(uri: String): H = resolveEither(uri) match {
    case Right(h)  => h
    case Left(err) => throw new IllegalStateException(err)
  }

  /** Total-function resolve for dataflow use: Right(handler) on a
    * unique match; Left mirrors the reference's NoRouteAvailable /
    * MultipleRoutesDefined exceptions (`minecode/route.py:161-185`). */
  def resolveEither(uri: String): Either[String, H] =
    routes.filter { case (r, _) => r.pattern.matcher(uri).matches() } match {
      case Vector((_, h)) => Right(h)
      case Vector()       => Left(s"no route: $uri")
      case several => Left(s"ambiguous route ($uri): ${several.size} matches")
    }

  /** Number of rules whose pattern full-matches `uri` — the candidate
    * count `route.py:175` inspects before raising. */
  def matchCount(uri: String): Int =
    routes.count { case (r, _) => r.pattern.matcher(uri).matches() }
}

/** S9 — parser for `ls -alR` / find-style directory listings
  * (`minecode/ls.py:1-194`): directory-header blocks
  * ("some/dir:") followed by long-format entries; emits
  * (path, is_file, size, date) rows. Months/dates follow the unix ls
  * convention: `Mon DD YYYY` for old entries, `Mon DD HH:MM` for
  * recent ones (year-less dates get no date rather than a guessed
  * year — the reference uses ftputil's parser which does the same
  * tolerant parse).
  */
object LsParser {

  final case class Entry(path: String, isFile: Boolean, size: Option[Long],
      date: Option[String])

  private val months = Map("jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4,
    "may" -> 5, "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10,
    "nov" -> 11, "dec" -> 12)

  // -rw-r--r--  1 user group  1234 Jan  5  2020 name possibly spaced
  private val entryRe =
    """^([-dlbcps])[rwxsStT-]{9}\+?\s+\d+\s+\S+\s+\S+\s+(\d+)\s+([A-Za-z]{3})\s+(\d{1,2})\s+(\d{4}|\d{1,2}:\d{2})\s+(.+)$""".r

  def parse(listing: String): Seq[Entry] = {
    var currentDir = ""
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    listing.linesIterator.foreach { raw =>
      val line = raw.stripLineEnd
      if (line.endsWith(":") && !line.contains(" ")) {
        currentDir = line.dropRight(1).stripPrefix("./").stripPrefix("/")
      } else entryRe.findFirstMatchIn(line).foreach { m =>
        val kind = m.group(1)
        val size = m.group(2).toLong
        val name = m.group(6).split(" -> ").head // symlink target
        if (name != "." && name != "..") {
          val date = (months.get(m.group(3).toLowerCase), m.group(5)) match {
            case (Some(mo), y) if y.length == 4 =>
              Some(f"$y-$mo%02d-${m.group(4).toInt}%02d")
            case _ => None
          }
          val path =
            if (currentDir.isEmpty) name else s"$currentDir/$name"
          out += Entry(path, kind == "-", if (kind == "-") Some(size) else None,
            date)
        }
      }
    }
    out.toSeq
  }

  /** Reference-shaped entry (`minecode/ls.py:43-128` Entry.to_dict):
    * type ∈ f/d/l/s, size and date only for files, target for links.
    * Year-less listing dates carry a `0000` placeholder year — the
    * reference's own golden tests strip the year before comparing
    * (ftputil guesses it from the clock, which is unstable). */
  final case class FullEntry(path: String, etype: String, size: Long,
      date: Option[String], target: Option[String])

  private val fullRe =
    ("""^([-dlbcps])[rwxsStT-]{9}\+?\s+\d+\s+\S+\s+\S+\s+(\d+)\s+""" +
      """([A-Za-z]{3})\s+(\d{1,2})\s+(\d{4}|\d{1,2}:\d{2})\s+(.+)$""").r

  private def cleanPath(p: String): String = {
    var s = p.trim.replaceAll("^/+|/+$", "")
    if (s.startsWith("./")) s = s.substring(2)
    s.trim
  }

  /** Full listing parse (`minecode/ls.py:148-194`): `from_find` strips
    * the leading inode and block-size columns; `dir:` header lines set
    * the base directory for `ls -lR` output; `total` lines and `.`/
    * `..` entries are skipped. */
  def referenceEntries(listing: String, fromFind: Boolean): Seq[FullEntry] = {
    var baseDir = ""
    val out = Vector.newBuilder[FullEntry]
    listing.linesIterator.foreach { raw =>
      var line = raw.trim
      if (line.nonEmpty && !line.startsWith("total")) {
        if (fromFind) {
          // remove_inode: drop the first two space-separated tokens
          line = line.split("\\s+", 3) match {
            case Array(_, _, rest) => rest.trim
            case _                 => line
          }
        }
        fullRe.findFirstMatchIn(line) match {
          case None =>
            if (line.endsWith(":"))
              baseDir = line.replaceAll("^:+|:+$", "")
          case Some(m) =>
            val kind = m.group(1)
            val rawName = m.group(6)
            val (name, target) =
              if (kind == "l" && rawName.contains(" -> ")) {
                val parts = rawName.split(" -> ", 2)
                (parts(0), Some(parts(1)))
              } else (rawName, None)
            if (name != "." && name != "..") {
              val etype = kind match {
                case "-" => "f"; case "d" => "d"; case "l" => "l"
                case _   => "s"
              }
              val date =
                if (etype != "f") None
                else (months.get(m.group(3).toLowerCase), m.group(5)) match {
                  case (Some(mo), y) if y.length == 4 =>
                    Some(f"$y-$mo%02d-${m.group(4).toInt}%02d")
                  case (Some(mo), _) =>
                    Some(f"0000-$mo%02d-${m.group(4).toInt}%02d")
                  case _ => None
                }
              val cleaned = cleanPath(name)
              val path =
                if (baseDir.nonEmpty && baseDir != ".")
                  s"${cleanPath(baseDir)}/$cleaned"
                else cleaned
              out += FullEntry(path, etype,
                if (etype == "f") m.group(2).toLong else 0L, date, target)
            }
        }
      }
    }
    out.result()
  }
}

/** J10/F14 — source-repo candidate URL inference
  * (`purl2vcs/src/purl2vcs/find_source_repo.py:190-313`): generate
  * plausible VCS URLs for a package from its purl and metadata URLs,
  * to be joined against the catalog (the join is the Spark side; this
  * is the per-row candidate generator, a flatMap closure).
  */
object SourceRepo {
  def candidateUrls(ptype: String, namespace: Option[String], name: String,
      homepage: Option[String]): Seq[String] = {
    val fromHomepage = homepage.toSeq
      .filter(h => h.contains("github.com") || h.contains("gitlab.com") ||
        h.contains("bitbucket.org"))
      .map(_.stripSuffix("/").stripSuffix(".git"))
    val guesses = (ptype.toLowerCase, namespace) match {
      case ("github", Some(ns))  => Seq(s"https://github.com/$ns/$name")
      case ("golang", Some(ns)) if ns.startsWith("github.com/") =>
        Seq(s"https://${ns.stripPrefix("https://")}/$name",
          s"https://$ns/$name".replace("https://https://", "https://"))
      case ("maven", Some(ns)) =>
        Seq(s"https://github.com/${ns.split('.').last}/$name")
      case (_, Some(ns)) => Seq(s"https://github.com/$ns/$name")
      case (_, None)     => Seq(s"https://github.com/$name/$name")
    }
    (fromHomepage ++ guesses).distinct
  }

  /** Apache SVN tag URL → the mirrored GitHub tree URL
    * (`purl2vcs/src/purl2vcs/find_source_repo.py:84-113`): only
    * `svn.apache.org/repos/asf/{name}/tags/{tag}/...` converts; any
    * other shape returns None. */
  def convertApacheSvnToGithubUrl(rawUrl: String): Option[String] = {
    val url =
      if (rawUrl.contains("svn+")) rawUrl.split("svn\\+", 2).last
      else rawUrl
    val uri =
      try new java.net.URI(url)
      catch { case _: Exception => return None }
    if (uri.getHost != "svn.apache.org") return None
    val segs = Option(uri.getPath).getOrElse("").split("/")
    if (segs.length < 6) return None
    if (segs(1) != "repos" || segs(2) != "asf" || segs(4) != "tags")
      return None
    Some(s"https://github.com/apache/${segs(3)}/tree/${segs(5)}")
  }

  private val UrlHints = Seq("github", "gitlab", "bitbucket")

  /** Repo URL → hosting purls
    * (`purl2vcs/src/purl2vcs/find_source_repo.py:249-311`): normalize
    * the `git@host+`, `https+//`, `git+https://...@commit`, `.git`,
    * and `git://host:path` spellings, then emit one purl per matching
    * host hint. */
  def repoUrlToPurls(sourceUrl: String): Seq[String] = {
    var url = sourceUrl
    if (url.startsWith("git@github.com+"))
      url = url.substring(url.indexOf('+') + 1)
    if (url.startsWith("https+//"))
      url = url.replace("https+//", "https://")
    if ((url.startsWith("git+https://") || url.startsWith("git://")) &&
      url.contains("@"))
      url = url.substring(0, url.lastIndexOf('@'))
    if (url.endsWith(".git"))
      url = url.substring(0, url.length - 4)
    if (url.startsWith("git://")) {
      var rest = url.stripPrefix("git://")
      if (rest.contains(":")) rest = rest.replace(":", "/")
      url = s"https://$rest"
    }
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return Seq.empty
    val afterScheme = url.substring(schemeEnd + 3)
    val slash = afterScheme.indexOf('/')
    if (slash < 0) return Seq.empty
    val netloc = afterScheme.substring(0, slash)
    val segments = afterScheme.substring(slash).split("/", -1)
    if (segments.length <= 2) return Seq.empty
    val (namespace, name) = (segments(1), segments(2))
    if (name.isEmpty) Seq.empty
    else UrlHints.filter(netloc.contains)
      .map(hint => s"pkg:$hint/$namespace/$name")
  }

  /** (tag, commit) pairs of a `git ls-remote` output
    * (`find_source_repo.py:436-447`). */
  def tagsAndCommits(lsRemoteOutput: String): Seq[(String, String)] =
    lsRemoteOutput.split("\n").toSeq.flatMap { line =>
      line.split("\t") match {
        case Array(commit, ref, _*) if ref.startsWith("refs/tags/") =>
          Some(ref.stripPrefix("refs/tags/") -> commit)
        case _ => None
      }
    }

  /** First tag matching `version` after lowercasing, `_`→`.`, and
    * leading-v strip (`find_source_repo.py:450-464`). */
  def tagAndCommit(version: String, tags: Seq[(String, String)])
      : Option[(String, String)] = {
    val v = version.toLowerCase
    tags.find { case (tag, _) =>
      tag.toLowerCase.replace("_", ".").replaceAll("^v+", "") == v
    }
  }
}
