package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{PackageRow, Takedown}
import graft.matching.Matching

/** The catalog takedown flow ([[graft.catalog.Takedown]]) — the
  * reference's FK-cascade delete (packagedb/models.py:1191-1226: a
  * package delete removes its Resource rows and its matchcode index
  * rows inside one DB transaction) over immutable multi-table
  * manifests: merge → takedown → exact/approx/snippet match no longer
  * surfaces the package, while time travel still reads the
  * pre-delete version. */
class TakedownSpec extends SparkTestBase {
  import spark.implicits._

  private val NOW = "2026-08-16T00:00:00Z"
  private val UrlA = "http://x/a.jar"
  private val UrlB = "http://x/b.jar"

  private def fp(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def packages: DataFrame = Seq(
    PackageRow.minimal(UrlA, "maven", "a", Some("1.0"), miningLevel = 50),
    PackageRow.minimal(UrlB, "maven", "b", Some("2.0"), miningLevel = 50))
    .toDF()

  private def resources: DataFrame = Seq(
    (UrlA, "a/Main.java", "sha-a1"), (UrlA, "a/Util.java", "sha-a2"),
    (UrlB, "b/Main.java", "sha-b1"))
    .toDF("download_url", "path", "sha1")

  private def exactIndex: DataFrame = Seq(
    ("sha-a1", UrlA, "a/Main.java"), ("sha-a2", UrlA, "a/Util.java"),
    ("sha-b1", UrlB, "b/Main.java"))
    .toDF("sha1", "download_url", "path")

  private def approxIndex: DataFrame = Seq(
    (UrlA, "a/Main.java", "Main.java", 10L, true, fp("fa")),
    (UrlB, "b/Main.java", "Main.java", 12L, true, fp("fb")))
    .toDF("download_url", "path", "name", "size", "is_file",
      "fingerprint")

  private def snippetIndex: DataFrame = Seq(
    (fp("s1"), UrlA, "a/Main.java", 0L),
    (fp("s1"), UrlB, "b/Main.java", 0L),
    (fp("s2"), UrlB, "b/Main.java", 8L))
    .toDF("fingerprint", "download_url", "path", "position")

  private def freshCatalog(tag: String): String = {
    val root = Files.createTempDirectory(s"takedown_$tag").toString
    Takedown.save(root, packages, resources, exactIndex, approxIndex,
      snippetIndex)
    root
  }

  private def urls(us: String*): DataFrame = us.toDF("download_url")

  test("takedown cascades in ONE commit: package, resources, and all " +
      "matchcode index rows vanish together; the other package and " +
      "time travel are untouched") {
    val root = freshCatalog("cascade")
    // a merge first — proves the multi-table manifest re-links the
    // index dirs it does not touch
    val v2 = Takedown.mergePackages(spark, root, Seq(
      PackageRow.minimal(UrlA, "maven", "a", Some("1.0"),
        miningLevel = 60).copy(description = Some("enriched")))
      .toDF().withColumn("visit_level", lit(60)), NOW)
    assert(v2 == 2L)
    val preDelete = Takedown.load(spark, root)
    assert(preDelete.packages.filter(col("download_url") === UrlA)
      .head().getAs[String]("description") == "enriched")

    val v3 = Takedown.takedown(root, urls(UrlA))
    assert(v3 == 3L)
    val cat = Takedown.load(spark, root)

    // the cascade, table by table
    assert(cat.packages.filter(col("download_url") === UrlA).count() == 0)
    assert(cat.resources.filter(col("download_url") === UrlA).count() == 0)
    assert(cat.packages.count() == 1 && cat.resources.count() == 1)

    // exact match: the taken-down package's sha1 no longer matches;
    // the survivor still does
    val queries = Seq(("q/x.java", "sha-a1"), ("q/y.java", "sha-b1"))
      .toDF("path", "sha1")
    val exact = Matching.exactMatch(queries, cat.exactIndex)
      .select("download_url").collect().map(_.getString(0)).toSeq
    assert(exact == Seq(UrlB), s"got $exact")

    // approx index rows are gone (the frame the Hamming matcher scans)
    assert(cat.approxIndex.filter(col("download_url") === UrlA)
      .count() == 0)
    assert(cat.approxIndex.count() == 1)

    // snippet match: the shared fingerprint now resolves only to B
    val qSnip = Seq(("q/x.java", fp("s1"), 0L))
      .toDF("q_path", "fingerprint", "position")
    val snip = Matching.snippetMatch(qSnip, cat.snippetIndex)
      .select("download_url").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(snip == Seq(UrlB), s"got $snip")

    // time travel: the pre-delete version reads the package COMPLETE
    val at2 = Takedown.loadAt(spark, root, 2L)
    assert(at2.packages.filter(col("download_url") === UrlA).count() == 1)
    assert(at2.resources.filter(col("download_url") === UrlA).count() == 2)
    assert(at2.exactIndex.filter(col("download_url") === UrlA).count() == 2)
    assert(Matching.exactMatch(queries, at2.exactIndex).count() == 2)

    // the takedown staged ONLY the tombstone dir — no table rewrite
    val rec3 = Files.readString(
      Paths.get(root, "_commits", f"v$v3%020d")).trim
    assert(rec3.linesIterator.count(_.startsWith("T\t")) == 1)
    val rec2 = Files.readString(
      Paths.get(root, "_commits", f"v$v2%020d")).trim
    def dirOf(rec: String, tag: String) = rec.linesIterator
      .find(_.startsWith(s"$tag\t")).get
    Seq("P", "R", "X", "A", "N").foreach { t =>
      assert(dirOf(rec3, t) == dirOf(rec2, t),
        s"takedown must re-link table $t, not rewrite it") }
  }

  test("compact folds the tombstone physically and a re-mined " +
      "package re-enters afterward; replay tag no-ops") {
    val root = freshCatalog("fold")
    val v2 = Takedown.takedown(root, urls(UrlA), tag = Some(5L))
    // crash-replayed takedown batch no-ops
    assert(Takedown.takedown(root, urls(UrlA), tag = Some(5L)) == v2)

    val v3 = Takedown.compact(spark, root)
    val rec = Files.readString(
      Paths.get(root, "_commits", f"v$v3%020d")).trim
    assert(!rec.linesIterator.exists(_.startsWith("T\t")))
    // physically folded: the raw P/X dirs no longer hold UrlA
    val pDir = rec.linesIterator.find(_.startsWith("P\t")).get.drop(2)
    assert(spark.read.parquet(s"$root/data/$pDir")
      .filter(col("download_url") === UrlA).count() == 0)
    // the replay tag survived the fold
    assert(Takedown.takedown(root, urls(UrlB), tag = Some(5L)) == v3)

    // post-fold, the url is free to re-enter (the reference would
    // likewise re-create a deleted package when its source is
    // re-mined)
    Takedown.mergePackages(spark, root, Seq(
      PackageRow.minimal(UrlA, "maven", "a", Some("1.1"),
        miningLevel = 50)).toDF().withColumn("visit_level", lit(50)),
      NOW)
    assert(Takedown.load(spark, root).packages
      .filter(col("download_url") === UrlA).count() == 1)
  }

  test("every loaded table filters through the tombstones — a reader " +
      "never sees a package whose index rows survived it") {
    val root = freshCatalog("atomic")
    Takedown.takedown(root, urls(UrlB))
    val cat = Takedown.load(spark, root)
    val counts = Seq(cat.packages, cat.resources, cat.exactIndex,
      cat.approxIndex, cat.snippetIndex)
      .map(_.filter(col("download_url") === UrlB).count())
    assert(counts.forall(_ == 0L), s"per-table UrlB rows: $counts")
    // and a save without the cascade key is refused outright
    val e = intercept[IllegalArgumentException] {
      Takedown.save(Files.createTempDirectory("takedown_bad").toString,
        packages.drop("download_url"), resources, exactIndex,
        approxIndex, snippetIndex)
    }
    assert(e.getMessage.contains("cascade key"))
  }
}
