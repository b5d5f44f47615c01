package graft

import graft.sources.{Rsync, SfNet}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the rsync listing parser and the SourceForge CSV
  * filter against the reference's own fixtures
  * (`minecode/tests/test_rsync.py`, `test_filter.py`).
  */
class RsyncSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/minecode/tests/testfiles"

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/$path")), "UTF-8")

  test("modules parse skips the motd block") {
    assert(Rsync.modules(read("rsync/rsync_modules")) ==
      "apache CPAN CTAN eclipse flightgear gnualpha gnuftp mozdev mozilla opencsw simgear sugar xemacs"
        .split(" ").toSeq)
  }

  test("rsync 3.1 entries parse type, perm, size, UTC date, path") {
    val lines = Seq(
      "drwxrwxr-x          4,096 2015/07/23 17:36:47 .",
      "-rw-rw-r--              0 2015/07/23 17:36:47 foo",
      "-rw-rw-r--              0 2015/07/23 17:36:47 bar/that/baz")
    assert(lines.flatMap(Rsync.entry) == Seq(
      Rsync.Entry("d", "rwxrwxr-x", 4096, "2015-07-23T17:36:47+00:00", "."),
      Rsync.Entry("-", "rw-rw-r--", 0, "2015-07-23T17:36:47+00:00", "foo"),
      Rsync.Entry("-", "rw-rw-r--", 0, "2015-07-23T17:36:47+00:00",
        "bar/that/baz")))
  }

  test("octal escapes decode; links and devices are dropped") {
    assert(Rsync.entry(
      "-rwxrwxr-x        4096 2004/08/09 00:47:02 pub/#345sou/a/a7") ==
      Some(Rsync.Entry("-", "rwxrwxr-x", 4096, "2004-08-09T00:47:02+00:00",
        "pub/åsou/a/a7")))
    // spaces inside paths survive, comma-grouped sizes parse
    assert(Rsync.entry(
      "-rw-r--r--     4399746 2008/11/23 16:03:57 zz/ZZUL P/ZUL.gz") ==
      Some(Rsync.Entry("-", "rw-r--r--", 4399746,
        "2008-11-23T16:03:57+00:00", "zz/ZZUL P/ZUL.gz")))
    assert(Rsync.entry(
      "lrwxrwxrwx          19 2007/11/22 11:37:54 s/c/a/index.html").isEmpty)
    assert(Rsync.entry(
      "crwxrwxrwx          19 2007/11/22 11:37:54 dev/pts1").isEmpty)
  }

  test("wicket directory listing parses head entries like the reference") {
    val entries = Rsync.directoryEntries(read("rsync/rsync_wicket.dir"))
    assert(entries.take(4) == Seq(
      Rsync.Entry("d", "rwxrwxr-x", 4096, "2014-03-18T19:02:46+00:00", "."),
      Rsync.Entry("-", "rw-rw-r--", 5, "2014-03-18T19:02:46+00:00",
        ".revision"),
      Rsync.Entry("d", "rwxrwxr-x", 4096, "2014-02-05T09:34:20+00:00",
        "1.4.23"),
      Rsync.Entry("-", "rw-rw-r--", 95314, "2014-02-05T09:23:44+00:00",
        "1.4.23/CHANGELOG-1.4")))
    assert(entries.size > 20)
  }

  test("protocol 30 and 31 listings both parse") {
    Seq("rsync/rsync_v3.0.9_protocol30.dir",
      "rsync/rsync_v3.1.0_protocol31.dir").foreach { f =>
      val es = Rsync.directoryEntries(read(f))
      assert(es.exists(_.path == "foo"), f)
      assert(es.exists(_.path == "bar"), f)
    }
  }

  test("sf_net filter output is byte-identical to the reference's expected CSV") {
    val got = SfNet.sfNet(read("filter_sf/tst_sfnet.csv"))
    assert(got == read("filter_sf/tst_sfnet2.csv"))
  }

  // ------------------------------------------ ls / find -ls listings

  private def checkListing(listing: String, expectedPath: String,
      fromFind: Boolean): Unit = {
    import org.json4s._
    // the reference's own golden flow (`tests/test_ls.py:34-46`):
    // strip the unstable year from dates, sort, compare dicts
    val got = graft.miners.LsParser
      .referenceEntries(read(listing), fromFind)
      .map(e => e.copy(date = e.date.map(_.substring(4))))
      .sortBy(e => (e.path, e.etype))
    val want = org.json4s.jackson.JsonMethods.parse(read(expectedPath)) match {
      case JArray(items) => items.map { it =>
        def str(f: String) = it \ f match {
          case JString(s) => Some(s); case _ => None
        }
        val size = it \ "size" match { case JInt(n) => n.toLong; case _ => 0L }
        graft.miners.LsParser.FullEntry(str("path").get, str("type").get,
          size, str("date"), str("target"))
      }
      case _ => fail(s"unexpected shape: $expectedPath")
    }
    assert(got == want)
  }

  test("find -ls listings golden-match the reference's expected entries") {
    checkListing("directories/find-ls",
      "directories/find-ls-expected.json", fromFind = true)
    checkListing("directories/find-ls-apache-start",
      "directories/find-ls-apache-start-expected.json", fromFind = true)
  }

  test("ls -lR listings golden-match the reference's expected entries") {
    checkListing("directories/ls-lr",
      "directories/ls-lr-expected.json", fromFind = false)
    checkListing("directories/ls-lr-ubuntu",
      "directories/ls-lr-ubuntu-expected.json", fromFind = false)
  }
}
