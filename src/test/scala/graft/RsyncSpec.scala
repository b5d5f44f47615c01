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
}
