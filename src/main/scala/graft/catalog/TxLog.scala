package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimistic-concurrency commit log over plain parquet — the
  * transactional MERGE runtime the environment's missing Delta jars
  * would otherwise provide (SURVEY §1.3; the reference serializes its
  * many workers through Postgres row locks, e.g. `run_map.py:79-103`
  * racing the priority worker).
  *
  * Layout under a catalog root:
  * {{{
  *   data/<uuid>/        immutable parquet snapshots, write-once
  *   _commits/v<NNNN>    one file per committed version; its content
  *                       names the data dir of that version
  * }}}
  *
  * The compare-and-swap primitive is POSIX `link(2)` via
  * `Files.createLink`: a prepared meta file (already carrying the data
  * dir name) is hard-linked to the version-keyed commit name, which
  * atomically either claims the version or throws
  * `FileAlreadyExistsException` — the loser saw a concurrent commit.
  * Unlike create-then-write, the claim and its content land in ONE
  * atomic step, so readers never observe a claimed-but-empty commit
  * and a crash can never poison a version slot.
  *
  * [[transact]] is the writer loop: read snapshot v, apply the
  * caller's merge against it, stage the result, CAS v+1; on conflict
  * rebase — re-read the winner's snapshot and re-apply — exactly the
  * optimistic protocol of every table format (Delta/Iceberg commit
  * protocols). Staged-but-unclaimed data dirs from losers or crashes
  * are unreachable garbage, removed by retention alongside superseded
  * versions.
  *
  * On a 100 TB deployment the same protocol runs against an object
  * store with a conditional-PUT (or a DynamoDB-style lock row) as the
  * CAS; every data write stays a distributed Spark job — only the
  * few-bytes commit record is driver-side.
  */
object TxLog {

  final class CommitConflict(version: Long)
    extends RuntimeException(s"version $version already committed")

  private def commitsDir(root: String): Path = Paths.get(root, "_commits")
  private def name(v: Long): String = f"v$v%020d"

  def init(root: String): Unit = {
    Files.createDirectories(commitsDir(root))
    Files.createDirectories(Paths.get(root, "data"))
  }

  /** Highest committed version and its data dir (0 / None = empty). */
  def snapshot(root: String): (Long, Option[String]) = {
    val dir = commitsDir(root)
    if (!Files.exists(dir)) return (0L, None)
    val listing = Files.list(dir)
    val latest =
      try {
        val it = listing.iterator()
        var best = 0L
        var bestName: Option[Path] = None
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith("v")) {
            val v = n.drop(1).toLong
            if (v > best) { best = v; bestName = Some(p) }
          }
        }
        bestName.map(p => (best, Files.readString(p).trim))
      } finally listing.close()
    latest match {
      case Some((v, d)) => (v, Some(s"$root/data/$d"))
      case None         => (0L, None)
    }
  }

  /** Read the committed table at the latest version; `empty` supplies
    * the version-0 frame (schema included). */
  def read(spark: SparkSession, root: String, empty: => DataFrame)
      : (Long, DataFrame) = snapshot(root) match {
    case (v, Some(dataDir)) => (v, spark.read.parquet(dataDir))
    case (v, None)          => (v, empty)
  }

  /** CAS-commit `dataDirName` (relative to root/data) as version
    * `readVersion + 1`. Throws [[CommitConflict]] if someone else
    * committed first. */
  def commit(root: String, readVersion: Long, dataDirName: String): Long = {
    val next = readVersion + 1
    val tmp = commitsDir(root).resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, dataDirName)
    try {
      Files.createLink(commitsDir(root).resolve(name(next)), tmp)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflict(next)
    } finally Files.deleteIfExists(tmp)
  }

  /** Optimistic transaction: read → merge → stage → CAS, rebasing on
    * conflict up to `maxRetries` times. `merge` must be a pure
    * function of the snapshot (it reruns on rebase). Returns the
    * committed version. */
  def transact(spark: SparkSession, root: String, empty: => DataFrame,
      maxRetries: Int = 10)(merge: DataFrame => DataFrame): Long = {
    init(root)
    var attempt = 0
    while (true) {
      val (v, current) = read(spark, root, empty)
      val out = merge(current)
      val dirName = UUID.randomUUID().toString
      out.write.parquet(s"$root/data/$dirName")
      try return commit(root, v, dirName)
      catch {
        case _: CommitConflict if attempt < maxRetries =>
          attempt += 1
          // loser's staged snapshot is unreachable; best-effort GC now
          val stale = Paths.get(root, "data", dirName)
          Files.walk(stale).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The user-facing composition: merge one scanned-package batch into
    * the catalog at `root` under the optimistic protocol — the
    * Spark-side equivalent of the reference's run_map/priority workers
    * concurrently upserting through Postgres. Any number of callers on
    * any number of drivers sharing the filesystem serialize; each
    * retry re-applies the SAME level-rule merge onto the winner's
    * snapshot, so the final catalog is a serial application
    * (CatalogTxSpec). Returns the committed version. */
  def mergeCommit(spark: SparkSession, root: String, incoming: DataFrame,
      now: String, empty: => DataFrame): Long =
    transact(spark, root, empty) { snapshot =>
      MergeEngine.mergePackages(snapshot, incoming, now).packages
    }

  /** Retention: drop data dirs unreachable from the last `keep`
    * committed versions (superseded snapshots plus abandoned losers'
    * staging). Safe to run anytime — committed data is write-once. */
  def vacuum(root: String, keep: Int = 2): Unit = {
    val dir = commitsDir(root)
    if (!Files.exists(dir)) return
    val commits = {
      val listing = Files.list(dir)
      try {
        val it = listing.iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Path)]
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith("v")) buf += ((n.drop(1).toLong, p))
        }
        buf.sortBy(-_._1)
      } finally listing.close()
    }
    val live = commits.take(keep)
      .map { case (_, p) => Files.readString(p).trim }.toSet
    val dataRoot = Paths.get(root, "data")
    val listing = Files.list(dataRoot)
    try {
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (!live.contains(p.getFileName.toString))
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
      }
    } finally listing.close()
  }
}
