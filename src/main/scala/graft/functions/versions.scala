package graft.functions

/** F15 — per-ecosystem version comparison, the ordering semantics the
  * reference delegates to the `univers` library for its 12 supported
  * ecosystems (`packagedb/api.py:977-991`, `:1309-1342`). Each
  * comparator reimplements the PUBLISHED versioning specification of
  * its ecosystem (PEP 440, Debian policy §5.6.12, Maven
  * ComparableVersion, SemVer 2.0.0, RubyGems Gem::Version) — no code
  * is ported from univers or the reference.
  */
object EcosystemVersions {

  /** Scheme-aware compare: negative / 0 / positive. Unknown schemes
    * fall back to the generic natural comparator. */
  def compare(scheme: String, a: String, b: String): Int =
    scheme.toLowerCase match {
      case "pypi" | "pep440"            => pep440Compare(a, b)
      case "deb" | "debian" | "ubuntu"  => debianCompare(a, b)
      case "maven"                      => mavenCompare(a, b)
      case "npm" | "cargo" | "composer" | "hex" | "golang" | "swift" |
           "semver"                     => semverCompare(a, b)
      case "gem" | "rubygems"           => rubygemsCompare(a, b)
      case "nuget"                      => nugetCompare(a, b)
      case _                            => VersRange.compareVersions(a, b)
    }

  // ---------------------------------------------------------------- pep440

  /** Parsed PEP 440 version: epoch ! release [pre] [post] [dev] [+local].
    * Ordering key per the spec: (epoch, release, preKey, postKey,
    * devKey, local), where dev < pre < final < post at the same
    * release. */
  private final case class Pep440(
      epoch: Long, release: Seq[Long],
      pre: Option[(Int, Long)],   // (a=0, b=1, rc=2, num)
      post: Option[Long], dev: Option[Long], local: Seq[String])

  private val Pep440Re =
    ("""(?ix) ^\s* v? (?:(\d+)!)?            # epoch
       (\d+(?:\.\d+)*)                       # release
       (?:[._-]? (a|b|c|rc|alpha|beta|pre|preview) [._-]? (\d*))?  # pre
       (?:(?:-(\d+)) | (?:[._-]? (post|rev|r) [._-]? (\d*)))?      # post
       (?:[._-]? dev [._-]? (\d*))?          # dev
       (?:\+([a-z0-9._-]+))? \s*$""").r

  private def parsePep440(v: String): Option[Pep440] =
    Pep440Re.findFirstMatchIn(v.toLowerCase).map { m =>
      val epoch = Option(m.group(1)).map(_.toLong).getOrElse(0L)
      val release = m.group(2).split("\\.").map(_.toLong).toSeq
      val pre = Option(m.group(3)).map { tag =>
        val rank = tag match {
          case "a" | "alpha"                  => 0
          case "b" | "beta"                   => 1
          case "c" | "rc" | "pre" | "preview" => 2
        }
        (rank, Option(m.group(4)).filter(_.nonEmpty).map(_.toLong)
          .getOrElse(0L))
      }
      val post = Option(m.group(5)).map(_.toLong)
        .orElse(Option(m.group(6)).map(_ =>
          Option(m.group(7)).filter(_.nonEmpty).map(_.toLong).getOrElse(0L)))
      val dev = Option(m.group(8)).map(d =>
        if (d.isEmpty) 0L else d.toLong)
      val local = Option(m.group(9)).toSeq
        .flatMap(_.split("[._-]").toSeq)
      Pep440(epoch, release, pre, post, dev, local)
    }

  def pep440Compare(a: String, b: String): Int =
    (parsePep440(a), parsePep440(b)) match {
      case (Some(x), Some(y)) =>
        if (x.epoch != y.epoch) return java.lang.Long.compare(x.epoch, y.epoch)
        val rc = compareNumSeq(x.release, y.release)
        if (rc != 0) return rc
        // segment rank at equal release: dev=0 < pre=1 < final=2 < post=3
        def rank(p: Pep440): Int =
          if (p.pre.isDefined) 1
          else if (p.post.isDefined) 3
          else if (p.dev.isDefined) 0
          else 2
        val (rx, ry) = (rank(x), rank(y))
        if (rx != ry) return Integer.compare(rx, ry)
        // same segment: compare inside it
        (x.pre, y.pre) match {
          case (Some((px, pn)), Some((qx, qn))) =>
            if (px != qx) return Integer.compare(px, qx)
            if (pn != qn) return java.lang.Long.compare(pn, qn)
          case _ =>
        }
        val pc = java.lang.Long.compare(
          x.post.getOrElse(-1L), y.post.getOrElse(-1L))
        if (pc != 0) return pc
        // a dev on an otherwise-equal version sorts before no-dev
        val dc = java.lang.Long.compare(
          x.dev.getOrElse(Long.MaxValue), y.dev.getOrElse(Long.MaxValue))
        if (dc != 0) return dc
        compareLocal(x.local, y.local)
      case _ => VersRange.compareVersions(a, b) // unparseable → generic
    }

  private def compareNumSeq(a: Seq[Long], b: Seq[Long]): Int = {
    val n = math.max(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Long.compare(a.lift(i).getOrElse(0L),
        b.lift(i).getOrElse(0L))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** PEP 440 local segments: numeric segments compare numerically and
    * sort after alphanumeric ones; absence sorts before presence. */
  private def compareLocal(a: Seq[String], b: Seq[String]): Int = {
    if (a.isEmpty || b.isEmpty) return Integer.compare(a.length, b.length)
    val n = math.max(a.length, b.length)
    var i = 0
    while (i < n) {
      (a.lift(i), b.lift(i)) match {
        case (None, Some(_)) => return -1
        case (Some(_), None) => return 1
        case (Some(x), Some(y)) =>
          val xn = x.forall(_.isDigit); val yn = y.forall(_.isDigit)
          val c =
            if (xn && yn) java.lang.Long.compare(x.toLong, y.toLong)
            else if (xn) 1 else if (yn) -1
            else x.compareTo(y)
          if (c != 0) return c
        case _ =>
      }
      i += 1
    }
    0
  }

  // ---------------------------------------------------------------- debian

  /** Debian policy §5.6.12: [epoch:]upstream[-revision]; upstream and
    * revision compare by alternating non-digit/digit chunks where `~`
    * sorts before everything (including end-of-string) and letters
    * sort before non-letters. */
  def debianCompare(a: String, b: String): Int = {
    def split(v: String): (Long, String, String) = {
      val colon = v.indexOf(':')
      val (epoch, rest) =
        if (colon > 0 && v.take(colon).forall(_.isDigit))
          (v.take(colon).toLong, v.drop(colon + 1))
        else (0L, v)
      val dash = rest.lastIndexOf('-')
      if (dash >= 0) (epoch, rest.take(dash), rest.drop(dash + 1))
      else (epoch, rest, "")
    }
    val (ea, ua, ra) = split(a.trim)
    val (eb, ub, rb) = split(b.trim)
    if (ea != eb) return java.lang.Long.compare(ea, eb)
    val uc = debianPartCompare(ua, ub)
    if (uc != 0) uc else debianPartCompare(ra, rb)
  }

  /** Character order: `~` < end-of-string < letters < non-letters
    * (by code point within each class); digit runs compare numerically
    * (leading zeros skipped, longer run of significant digits wins).
    * Mirrors the published dpkg verrevcmp algorithm. */
  private def debianPartCompare(a: String, b: String): Int = {
    def order(s: String, i: Int): Int =
      if (i >= s.length) 0
      else {
        val c = s.charAt(i)
        if (c == '~') -1
        else if (c.isDigit) 0
        else if (c.isLetter) c.toInt
        else c.toInt + 256
      }
    def digitAt(s: String, i: Int): Boolean =
      i < s.length && s.charAt(i).isDigit
    var i = 0; var j = 0
    while (i < a.length || j < b.length) {
      // non-digit stretch: order() is 0 only at end-of-string or a
      // digit, so unequal orders return and equal nonzero orders mean
      // the same literal char on both sides — advancing both is safe
      while ((i < a.length && !digitAt(a, i)) ||
             (j < b.length && !digitAt(b, j))) {
        val ca = order(a, i); val cb = order(b, j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += 1; j += 1
      }
      // numeric run: skip leading zeros, then first-difference wins
      // unless one run has more significant digits
      while (digitAt(a, i) && a.charAt(i) == '0') i += 1
      while (digitAt(b, j) && b.charAt(j) == '0') j += 1
      var firstDiff = 0
      while (digitAt(a, i) && digitAt(b, j)) {
        if (firstDiff == 0)
          firstDiff = Integer.compare(a.charAt(i), b.charAt(j))
        i += 1; j += 1
      }
      if (digitAt(a, i)) return 1
      if (digitAt(b, j)) return -1
      if (firstDiff != 0) return firstDiff
    }
    0
  }

  // ---------------------------------------------------------------- maven

  /** Maven ComparableVersion: tokens split on `.`/`-` and digit↔letter
    * transitions; known qualifiers rank alpha < beta < milestone < rc
    * (=cr) < snapshot < '' (=ga/final/release) < sp < other
    * (lexical); numeric tokens compare numerically and beat
    * qualifiers; trailing zero/empty tokens are trimmed. */
  def mavenCompare(a: String, b: String): Int = {
    def tokens(v: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val s = v.toLowerCase
      var cur = new StringBuilder
      def flush(): Unit =
        if (cur.nonEmpty) { out += cur.toString; cur = new StringBuilder }
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '.' || c == '-') flush()
        else {
          if (cur.nonEmpty &&
            cur.last.isDigit != c.isDigit) flush()
          cur += c
        }
        i += 1
      }
      flush()
      // trim trailing tokens equal to zero/ga so 1.0 == 1 == 1.0.ga
      var ts = out.toSeq
      while (ts.nonEmpty && isNullToken(ts.last)) ts = ts.dropRight(1)
      ts
    }
    def isNullToken(t: String): Boolean =
      t.forall(_.isDigit) && (t.isEmpty || t.toLong == 0L) ||
        t == "ga" || t == "final" || t == "release"
    def qualifierRank(t: String): Int = t match {
      case "alpha" | "a"     => 0
      case "beta" | "b"      => 1
      case "milestone" | "m" => 2
      case "rc" | "cr"       => 3
      case "snapshot"        => 4
      case "" | "ga" | "final" | "release" => 5
      case "sp"              => 6
      case _                 => 7
    }
    def cmpTok(x: Option[String], y: Option[String]): Int = {
      val tx = x.getOrElse("")
      val ty = y.getOrElse("")
      val nx = tx.nonEmpty && tx.forall(_.isDigit)
      val ny = ty.nonEmpty && ty.forall(_.isDigit)
      if (nx && ny) java.lang.Long.compare(tx.toLong, ty.toLong)
      // a missing token pads as 0 against numbers ("1.0-x" vs "1":
      // the 0 is interior, not trimmed) and as '' against qualifiers
      else if (nx && y.isEmpty) if (tx.toLong == 0L) 0 else 1
      else if (ny && x.isEmpty) if (ty.toLong == 0L) 0 else -1
      else if (nx) 1    // numbers beat qualifiers ("" included)
      else if (ny) -1
      else {
        val (qx, qy) = (qualifierRank(tx), qualifierRank(ty))
        if (qx != qy) Integer.compare(qx, qy)
        else if (qx == 7) tx.compareTo(ty) // both "other": lexical
        else 0 // same rank incl. aliases (cr == rc, ga == final == '')
      }
    }
    val (ta, tb) = (tokens(a), tokens(b))
    val n = math.max(ta.length, tb.length)
    var i = 0
    while (i < n) {
      val c = cmpTok(ta.lift(i), tb.lift(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  // ---------------------------------------------------------------- semver

  /** SemVer 2.0.0: major.minor.patch, pre-release identifiers compare
    * dot-wise (numeric < alphanumeric; numeric numerically,
    * alphanumeric ASCII-lexically; fewer identifiers < more); build
    * metadata after `+` is IGNORED for precedence. A leading `v` is
    * tolerated (golang convention). */
  def semverCompare(a: String, b: String): Int = {
    def parse(v: String): (Seq[Long], Seq[String]) = {
      val noBuild = v.trim.stripPrefix("v").takeWhile(_ != '+')
      val (core, pre) = noBuild.indexOf('-') match {
        case -1 => (noBuild, "")
        case i  => (noBuild.take(i), noBuild.drop(i + 1))
      }
      val nums = core.split("\\.").toSeq
        .map(s => if (s.nonEmpty && s.forall(_.isDigit)) s.toLong else 0L)
      val ids = if (pre.isEmpty) Seq.empty else pre.split("\\.").toSeq
      (nums, ids)
    }
    val (na, pa) = parse(a)
    val (nb, pb) = parse(b)
    val nc = compareNumSeq(na, nb)
    if (nc != 0) return nc
    (pa.isEmpty, pb.isEmpty) match {
      case (true, true)   => 0
      case (true, false)  => 1  // release > its pre-releases
      case (false, true)  => -1
      case (false, false) =>
        val n = math.max(pa.length, pb.length)
        var i = 0
        while (i < n) {
          (pa.lift(i), pb.lift(i)) match {
            case (None, Some(_)) => return -1 // fewer ids sort first
            case (Some(_), None) => return 1
            case (Some(x), Some(y)) =>
              val xn = x.nonEmpty && x.forall(_.isDigit)
              val yn = y.nonEmpty && y.forall(_.isDigit)
              val c =
                if (xn && yn) java.lang.Long.compare(x.toLong, y.toLong)
                else if (xn) -1 // numeric < alphanumeric
                else if (yn) 1
                else x.compareTo(y)
              if (c != 0) return c
            case _ =>
          }
          i += 1
        }
        0
    }
  }

  // -------------------------------------------------------------- rubygems

  /** RubyGems Gem::Version: dot segments, letter segments mark
    * pre-releases (a letter segment < any numeric segment); trailing
    * zeros trim; `1.0.a` < `1.0` < `1.0.1`. */
  def rubygemsCompare(a: String, b: String): Int = {
    def segments(v: String): Seq[Either[Long, String]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Either[Long, String]]
      val s = v.trim.toLowerCase
      var cur = new StringBuilder
      var curDigit = false
      def flush(): Unit = if (cur.nonEmpty) {
        out += (if (curDigit) Left(cur.toString.toLong)
                else Right(cur.toString))
        cur = new StringBuilder
      }
      s.foreach { c =>
        if (c == '.' || c == '-') flush()
        else if (c.isDigit || c.isLetter) {
          if (cur.nonEmpty && curDigit != c.isDigit) flush()
          curDigit = c.isDigit
          cur += c
        }
      }
      flush()
      var segs = out.toSeq
      while (segs.nonEmpty && segs.last == Left(0L)) segs = segs.dropRight(1)
      segs
    }
    val (sa, sb) = (segments(a), segments(b))
    // Gem::Version pads the shorter side with numeric zeros, so
    // "1.0.a" vs "1.0" becomes [1,0,a] vs [1,0,0] → letter < number
    val n = math.max(sa.length, sb.length)
    var i = 0
    while (i < n) {
      (sa.lift(i).getOrElse(Left(0L)), sb.lift(i).getOrElse(Left(0L))) match {
        case (Left(x), Left(y)) =>
          if (x != y) return java.lang.Long.compare(x, y)
        case (Right(x), Right(y)) =>
          val c = x.compareTo(y); if (c != 0) return c
        case (Right(_), Left(_)) => return -1 // letter < number (pre)
        case (Left(_), Right(_)) => return 1
      }
      i += 1
    }
    0
  }

  // ---------------------------------------------------------------- nuget

  /** NuGet: SemVer-like with up to 4 numeric parts and
    * CASE-INSENSITIVE pre-release comparison; build metadata
    * ignored. */
  def nugetCompare(a: String, b: String): Int =
    semverCompare(a.toLowerCase, b.toLowerCase)
}
