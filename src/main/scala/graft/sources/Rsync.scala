package graft.sources

/** rsync directory-listing parsing (reference `minecode/rsync.py`):
  * module lists from a bare `rsync host::` run and `Entry` rows from
  * recursive `--no-motd` listings. Only files (`-`) and directories
  * (`d`) are kept — links/devices/pipes are dropped, octal-escaped
  * path bytes (`#ddd`) are decoded, and the local timestamp is
  * rendered as a UTC ISO instant, all as the reference does.
  */
object Rsync {

  final case class Entry(
      etype: String, perm: String, size: Long, date: String, path: String)

  /** Module names from bare `rsync rsync://host` output
    * (`minecode/rsync.py:29-47`): motd lines are indented; module
    * lines are `name\tdescription`. */
  def modules(text: String): Seq[String] =
    text.linesIterator.flatMap { line =>
      if (line.isEmpty || line.startsWith(" ")) None
      else {
        val t = line.trim
        val tab = t.indexOf('\t')
        if (t.isEmpty || tab < 0) None
        else Some(t.substring(0, tab).trim)
      }
    }.toSeq

  private val Line =
    """^([-d])(.{9}) +([\d,]+) (\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}) +(.+)$""".r

  private val Octal = """#(\d{3})""".r

  /** Decode rsync's `#ddd` octal escapes (`minecode/rsync.py:52-62`).
    * Non-octal digit runs (`#888`) throw, matching the reference's
    * ValueError — directoryEntries skips such lines like the
    * reference's parse loop does. */
  def decodePath(p: String): String =
    Octal.replaceAllIn(p, m =>
      java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 8).toChar.toString))

  /** `YYYY/MM/DD HH:mm:ss` → `YYYY-MM-DDTHH:mm:ss+00:00`
    * (`minecode/rsync.py:65-70` pins the listing clock to UTC). */
  def decodeTs(s: String): String =
    s.substring(0, 10).replace('/', '-') + "T" + s.substring(11) + "+00:00"

  /** One listing line → Entry; None for blank lines, `skipping
    * directory` notes, and non-file/dir types
    * (`minecode/rsync.py:77-110`). */
  def entry(line: String): Option[Entry] = {
    val l = line.stripSuffix("\n").stripSuffix("\r")
    if (l.isEmpty || l.contains("skipping directory")) None
    else Line.findFirstMatchIn(l).map { m =>
      Entry(m.group(1), m.group(2),
        m.group(3).replace(",", "").toLong,
        decodeTs(m.group(4)), decodePath(m.group(5)))
    }
  }

  /** Every parseable Entry of a listing (`minecode/rsync.py:113-126`);
    * lines whose path decoding fails are skipped, as the reference's
    * `except ValueError: continue` does. */
  def directoryEntries(text: String): Seq[Entry] =
    text.linesIterator.flatMap { l =>
      try entry(l)
      catch { case _: NumberFormatException => None }
    }.toSeq
}
