package graft.sources

import scala.collection.mutable

/** Block-YAML reader for Ruby gemspec metadata (the `metadata` file
  * inside a `.gem`, reference `minecode/miners/rubygems.py`
  * build_rubygem_packages_from_metadata via saneyaml). Supports the
  * subset those documents use: nested maps and sequences, `!ruby/...`
  * tags (ignored, the tagged node parses as its plain shape), `&id`
  * anchors with `*id` aliases, quoted scalars, `[]`/`{}` empties, and
  * nested sequence items (`- - ">="`). Not a general YAML parser.
  */
object GemYaml {

  def parse(text: String): Any = {
    // (indent, content) lines; document markers and comments dropped
    val lines: Vector[(Int, String)] = text.linesIterator
      .map(_.replaceAll("\\s+$", ""))
      .filter(_.trim.nonEmpty)
      .flatMap { raw =>
        val indent = raw.takeWhile(_ == ' ').length
        var content = raw.trim
        if (content.startsWith("---")) {
          content = content.stripPrefix("---").trim
          if (content.isEmpty || content.startsWith("!")) None
          else Some(indent -> content)
        } else if (content.startsWith("#")) None
        else Some(indent -> content)
      }
      .toVector

    val anchors = mutable.Map.empty[String, Any]
    var i = 0

    def unquote(s: String): String =
      if (s.length >= 2 && ((s.head == '"' && s.last == '"') ||
        (s.head == '\'' && s.last == '\''))) s.substring(1, s.length - 1)
      else s

    /** Strip leading `&anchor` / `!tag` tokens; returns (rest, anchor). */
    def stripDecor(s0: String): (String, Option[String]) = {
      var s = s0.trim
      var anchor: Option[String] = None
      var changed = true
      while (changed && s.nonEmpty) {
        changed = false
        if (s.head == '&' || s.head == '!') {
          val sp = s.indexOf(' ')
          val token = if (sp < 0) s else s.substring(0, sp)
          if (token.head == '&') anchor = Some(token.substring(1))
          s = if (sp < 0) "" else s.substring(sp + 1).trim
          changed = true
        }
      }
      (s, anchor)
    }

    def parseScalar(s: String): Any =
      if (s == "[]") List.empty
      else if (s == "{}") Map.empty
      else if (s.startsWith("*")) anchors.getOrElse(s.substring(1), null)
      else unquote(s)

    /** Split `key: value` / `key:`; None when the line is not a map
      * entry (colon must end the line or be followed by a space). */
    def splitKey(line: String): Option[(String, String)] = {
      var idx = line.indexOf(':')
      while (idx >= 0) {
        if (idx == line.length - 1) return Some(
          (unquote(line.substring(0, idx)), ""))
        if (line.charAt(idx + 1) == ' ') return Some(
          (unquote(line.substring(0, idx)), line.substring(idx + 2).trim))
        idx = line.indexOf(':', idx + 1)
      }
      None
    }

    def hasChildAt(indent: Int): Boolean =
      i < lines.length && lines(i)._1 > indent

    /** Value from the inline remainder of a key/dash at `indent`. */
    def parseValue(rest0: String, indent: Int): Any = {
      val (rest, anchor) = stripDecor(rest0)
      val v =
        if (rest.isEmpty) {
          if (hasChildAt(indent)) parseBlock(lines(i)._1)
          else if (i < lines.length && lines(i)._1 == indent &&
            lines(i)._2.startsWith("-")) parseSeq(indent)
          else null
        } else if (rest == "-" || rest.startsWith("- ")) {
          // nested sequence starting inline: `- - ">="`
          val first = parseValue(
            if (rest == "-") "" else rest.substring(2), indent + 2)
          val more =
            if (i < lines.length && lines(i)._1 > indent &&
              lines(i)._2.startsWith("-")) parseSeq(lines(i)._1)
            else List.empty
          first :: more.toList
        } else splitKey(rest) match {
          case Some((key, value)) =>
            // map starting inline: first pair on the dash line
            val head = key -> parseValue(value, indent + 2)
            val tail =
              if (i < lines.length && lines(i)._1 > indent &&
                !lines(i)._2.startsWith("-")) parseMap(lines(i)._1)
              else Map.empty[String, Any]
            Map(head) ++ tail
          case None =>
            val quote = rest.headOption.filter(c => c == '\'' || c == '"')
            if (quote.isDefined && (rest.length == 1 ||
              rest.last != quote.get)) {
              // multi-line QUOTED scalar: fold continuation lines
              // until the closing quote (psych wraps long strings)
              var acc = rest
              while (i < lines.length && lines(i)._1 > indent &&
                (acc.length == 1 || acc.last != quote.get)) {
                acc = acc + " " + lines(i)._2
                i += 1
              }
              parseScalar(acc)
            } else {
              // plain multi-line scalar: more-indented follow-up lines
              // fold onto the value with a single space
              var s = parseScalar(rest)
              if (s.isInstanceOf[String] && quote.isEmpty &&
                !rest.startsWith("*")) {
                while (i < lines.length && lines(i)._1 > indent &&
                  !lines(i)._2.startsWith("- ") &&
                  splitKey(lines(i)._2).isEmpty) {
                  s = s.asInstanceOf[String] + " " + lines(i)._2
                  i += 1
                }
              }
              s
            }
        }
      anchor.foreach(a => anchors(a) = v)
      v
    }

    def parseSeq(indent: Int): List[Any] = {
      val out = List.newBuilder[Any]
      while (i < lines.length && lines(i)._1 == indent &&
        lines(i)._2.startsWith("-")) {
        val content = lines(i)._2
        i += 1
        val rest = if (content == "-") "" else content.substring(1).trim
        out += parseValue(rest, indent)
      }
      out.result()
    }

    def parseMap(indent: Int): Map[String, Any] = {
      val out = mutable.LinkedHashMap.empty[String, Any]
      while (i < lines.length && lines(i)._1 == indent &&
        !lines(i)._2.startsWith("- ") && lines(i)._2 != "-") {
        splitKey(lines(i)._2) match {
          case Some((key, value)) =>
            i += 1
            out(key) = parseValue(value, indent)
          case None => i += 1 // unparseable line: skip it, keep the rest
        }
      }
      out.toMap
    }

    def parseBlock(indent: Int): Any =
      if (i < lines.length && (lines(i)._2.startsWith("- ") ||
        lines(i)._2 == "-")) parseSeq(indent)
      else parseMap(indent)

    if (lines.isEmpty) null else parseBlock(lines(0)._1)
  }

  /** Typed helpers over the untyped tree. */
  def str(v: Any): Option[String] = v match {
    case s: String if s.nonEmpty => Some(s)
    case _                       => None
  }

  def map(v: Any): Map[String, Any] = v match {
    case m: Map[String @unchecked, Any @unchecked] => m
    case _                                         => Map.empty
  }

  def list(v: Any): List[Any] = v match {
    case l: List[Any @unchecked] => l
    case _                       => List.empty
  }
}
