package graft.sources

/** SourceForge CSV curation filter (reference `minecode/filter.py`):
  * appends computed_version / release_date / download-URL columns to a
  * project-release CSV, splitting the `version` column on its
  * `:  released on ` separator and running the file name through the
  * version-hint battery. Output is byte-identical to Python's
  * `csv.QUOTE_ALL` writer (every field quoted, quotes doubled, CRLF).
  */
object SfNet {

  private val NewHeaders = Seq(
    "computed_version", "release_date_ts", "file_download_url",
    "reviewed", "curated_name", "excluded_reason", "curated_owner",
    "owner_type")

  private val Sep = ":  released on "

  /** Minimal RFC-4180 reader: quoted fields with doubled quotes and
    * embedded separators; rows split on CRLF/LF outside quotes. */
  private[sources] def parseCsv(text: String): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    var fields = Vector.empty[String]
    val field = new StringBuilder
    var inQuotes = false
    var i = 0
    def endField(): Unit = { fields = fields :+ field.result(); field.clear() }
    def endRow(): Unit = { endField(); rows += fields; fields = Vector.empty }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            field += '"'; i += 1
          } else inQuotes = false
        } else field += c
      } else c match {
        case '"'  => inQuotes = true
        case ','  => endField()
        case '\r' => if (i + 1 < text.length && text.charAt(i + 1) == '\n') {
          endRow(); i += 1
        } else field += c
        case '\n' => endRow()
        case _    => field += c
      }
      i += 1
    }
    if (field.nonEmpty || fields.nonEmpty) endRow()
    rows.result()
  }

  private def writeRow(row: Seq[String]): String =
    row.map(f => "\"" + f.replace("\"", "\"\"") + "\"")
      .mkString("", ",", "\r\n")

  /** Curation screens (`minecode/filter.py:75-97`): a good name is
    * pure ASCII letters (the code is stricter than its docstring —
    * digits and spaces also fail); a good filename contains the
    * project id or name wholesale. */
  private def goodName(s: String): Boolean =
    s.nonEmpty && s.toLowerCase.forall(c => c >= 'a' && c <= 'z')

  private def goodFilename(pid: String, fn: String, name: String): Boolean =
    fn.nonEmpty && (fn.toLowerCase.contains(pid.toLowerCase) ||
      fn.toLowerCase.contains(name.toLowerCase))

  /** The sf_net transform (`minecode/filter.py:18-82`): rows whose
    * version column carries the release separator gain the computed
    * version, release timestamp, master.dl download URL, and five
    * empty curation columns; other rows (including the header, which
    * first gains the new column names) pass through re-quoted. */
  def sfNet(inputCsv: String): String = {
    val out = new StringBuilder
    parseCsv(inputCsv).zipWithIndex.foreach { case (row0, i) =>
      var row = row0
      if (i == 0) row = row ++ NewHeaders
      // blank lines parse as a single empty field; Python's csv.reader
      // yields [] for them and the reference skips those rows
      if (row.exists(_.nonEmpty) && row.size > 2) {
        val versionColumn = row(2)
        val sepIdx = versionColumn.indexOf(Sep)
        if (sepIdx < 0) out ++= writeRow(row)
        else {
          val fileName = versionColumn.substring(0, sepIdx)
          val releaseDate = versionColumn.substring(sepIdx + Sep.length)
          val projectId = row(0)
          val name = row(1)
          val foundVersion = graft.functions.VersionHint(fileName)
          val excludedReason =
            if (projectId.contains(".")) "mirror or special project"
            else if (foundVersion.isEmpty) "no version"
            else if (!goodName(name)) "special chars in name"
            else if (!goodFilename(projectId, fileName, name))
              "multi component possible"
            else ""
          out ++= writeRow(row ++ Seq(
            foundVersion.getOrElse(""),
            releaseDate,
            s"http://master.dl.sourceforge.net/project/$projectId$fileName",
            "", "", excludedReason, "", ""))
        }
      }
    }
    out.result()
  }
}
