package graft

/** Shared parser for the reference's abbot scan fixture, used by the
  * lifecycle golden (MatchLifecycleSpec) and the 10×-index scale spec
  * (MatchScaleSpec). Read in place from the read-only reference tree.
  */
object AbbotFixture {
  val path =
    "/root/reference/matchcode/tests/testfiles/match/scancodeio_abbot-0.12.3.json"

  def available: Boolean = new java.io.File(path).exists()

  /** (path, name, is_file, size, sha1, dir_fp, file_fp) per resource. */
  lazy val rows
      : Seq[(String, String, Boolean, Long, Option[String], Option[String],
        Option[String])] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(new java.io.File(path))
    (root \ "files") match {
      case JArray(files) => files.map { f =>
        def str(v: JValue): Option[String] =
          v match { case JString(s) if s.nonEmpty => Some(s); case _ => None }
        val p = str(f \ "path").getOrElse("")
        val isFile = (f \ "type") == JString("file")
        val size = (f \ "size") match {
          case JInt(n) => n.toLong; case _ => 0L
        }
        (p, p.split('/').last, isFile, size, str(f \ "sha1"),
          if (isFile) None else str(f \ "extra_data" \ "directory_content"),
          if (isFile) str(f \ "extra_data" \ "halo1") else None)
      }
      case _ => Seq.empty
    }
  }
}
