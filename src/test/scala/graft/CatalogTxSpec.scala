package graft

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier
import java.util.concurrent.atomic.AtomicBoolean

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import graft.catalog.{MergeEngine, PackageRow, TxLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The optimistic-concurrency catalog commit: two simultaneous
  * mergers into one catalog root must SERIALIZE (loser rebases onto
  * the winner's snapshot and re-applies), never lost-update — the
  * isolation story the reference gets from Postgres row locks and a
  * Delta runtime would give Spark, built here from a link(2) CAS over
  * plain parquet (catalog/TxLog.scala).
  */
class CatalogTxSpec extends SparkTestBase {
  import spark.implicits._

  private val NOW = "2026-08-14T00:00:00Z"

  private def emptyCatalog: DataFrame =
    Seq.empty[PackageRow].toDF()

  private def seedDf: DataFrame = Seq(
    PackageRow.minimal("http://x/a.jar", "maven", "a", Some("1.0"),
      miningLevel = 50),
    PackageRow.minimal("http://x/b.jar", "maven", "b", Some("2.0"),
      miningLevel = 50)).toDF()

  private def incoming(rows: PackageRow*)(level: Int): DataFrame =
    rows.toDF().withColumn("visit_level", lit(level))

  private def canon(df: DataFrame): Set[String] =
    df.select("download_url", "ptype", "name", "version", "description",
      "mining_level")
      .toJSON.collect().toSet

  test("CAS primitive: second commit of the same version loses") {
    val root = Files.createTempDirectory("txcas").toString
    TxLog.init(root)
    assert(TxLog.commit(root, 0L, "dirA") == 1L)
    intercept[TxLog.CommitConflict] { TxLog.commit(root, 0L, "dirB") }
    assert(TxLog.snapshot(root)._1 == 1L)
    assert(TxLog.snapshot(root)._2.contains(s"$root/data/dirA"))
  }

  test("mergeCommit composes the level-rule merge with the CAS log") {
    val root = Files.createTempDirectory("txmc").toString
    val v1 = TxLog.mergeCommit(spark, root, incoming(
      PackageRow.minimal("http://x/a.jar", "maven", "a", Some("1.0")))(50),
      NOW, emptyCatalog)
    val v2 = TxLog.mergeCommit(spark, root, incoming(
      PackageRow.minimal("http://x/a.jar", "maven", "a", Some("1.1"))
        .copy(description = Some("newer")))(60),
      NOW, emptyCatalog)
    assert((v1, v2) == (1L, 2L))
    val (_, cat) = TxLog.read(spark, root, emptyCatalog)
    val row = cat.filter($"download_url" === "http://x/a.jar").collect().head
    assert(row.getAs[String]("version") == "1.1")
    assert(row.getAs[String]("description") == "newer")
    assert(row.getAs[Int]("mining_level") == 60)
  }

  test("two interleaved mergers serialize to a serial application") {
    val root = Files.createTempDirectory("txmerge").toString
    TxLog.transact(spark, root, emptyCatalog)(_ => seedDf)

    // batch A updates a.jar at a higher level and adds c.jar;
    // batch B updates b.jar and adds d.jar — overlapping CATALOG, so
    // a lost update would drop the other batch's effect entirely
    val inA = incoming(
      PackageRow.minimal("http://x/a.jar", "maven", "a", Some("1.1"))
        .copy(description = Some("A-desc")),
      PackageRow.minimal("http://x/c.jar", "maven", "c", Some("3.0")))(60)
    val inB = incoming(
      PackageRow.minimal("http://x/b.jar", "maven", "b", Some("2.1"))
        .copy(description = Some("B-desc")),
      PackageRow.minimal("http://x/d.jar", "maven", "d", Some("4.0")))(60)

    // both transactions are forced to read the SAME snapshot (v1)
    // before either commits: the barrier holds each one's FIRST merge
    // evaluation until the other arrives, so the CAS conflict is
    // guaranteed, not timing-dependent; the rebased re-run skips it
    val barrier = new CyclicBarrier(2)
    def contendedMerge(in: DataFrame): DataFrame => DataFrame = {
      val first = new AtomicBoolean(true)
      snap => {
        if (first.getAndSet(false)) barrier.await()
        MergeEngine.mergePackages(snap, in, NOW).packages
      }
    }
    val fa = Future {
      TxLog.transact(spark, root, emptyCatalog)(contendedMerge(inA))
    }
    val fb = Future {
      TxLog.transact(spark, root, emptyCatalog)(contendedMerge(inB))
    }
    val versions = Set(Await.result(fa, 120.seconds),
      Await.result(fb, 120.seconds))
    assert(versions == Set(2L, 3L),
      s"expected versions 2 and 3, got $versions")

    val (v, finalDf) = TxLog.read(spark, root, emptyCatalog)
    assert(v == 3L)

    // serial oracles, both orders (the merge is commutative on this
    // input, but the contract is only "equals SOME serial order")
    val ab = MergeEngine.mergePackages(
      MergeEngine.mergePackages(seedDf, inA, NOW).packages, inB, NOW).packages
    val ba = MergeEngine.mergePackages(
      MergeEngine.mergePackages(seedDf, inB, NOW).packages, inA, NOW).packages
    val got = canon(finalDf)
    assert(got == canon(ab) || got == canon(ba),
      s"concurrent result is not a serial application:\n$got")
    // no lost update: every batch's effect is present
    assert(finalDf.filter($"download_url" === "http://x/a.jar" &&
      $"description" === "A-desc").count() == 1)
    assert(finalDf.filter($"download_url" === "http://x/b.jar" &&
      $"description" === "B-desc").count() == 1)
    assert(finalDf.count() == 4)

    // retention drops the superseded snapshots and the loser's
    // abandoned staging, keeps the live version readable
    TxLog.vacuum(root, keep = 1)
    val (v2, after) = TxLog.read(spark, root, emptyCatalog)
    assert(v2 == 3L && canon(after) == got)
    val dataDirs = Files.list(java.nio.file.Paths.get(root, "data"))
    try assert(dataDirs.count() == 1L)
    finally dataDirs.close()
  }
}
