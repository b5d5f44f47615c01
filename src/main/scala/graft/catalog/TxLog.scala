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
  *   data/<uuid>/        immutable parquet data, write-once
  *   _commits/v<NNNN>    one file per committed version; its content
  *                       names the data of that version — either a
  *                       single dir (whole-snapshot commits, transact)
  *                       or a per-partition manifest of
  *                       `pid<TAB>uuid/pid=N` lines (delta commits,
  *                       mergeCommitDelta: only the partitions touched
  *                       by a batch are rewritten, the rest re-link)
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

  /** Highest committed version and its data dir (0 / None = empty).
    * Whole-snapshot roots only; a delta root (manifest commits) reads
    * through [[readDelta]]. */
  def snapshot(root: String): (Long, Option[String]) =
    snapshotContent(root) match {
      case Some((v, content)) if !content.contains('\t') =>
        (v, Some(s"$root/data/$content"))
      case Some((v, _)) => (v, None) // delta root: use readDelta
      case None         => (0L, None)
    }

  /** Read the committed table at the latest version; `empty` supplies
    * the version-0 frame (schema included). */
  def read(spark: SparkSession, root: String, empty: => DataFrame)
      : (Long, DataFrame) = snapshot(root) match {
    case (v, Some(dataDir)) => (v, spark.read.parquet(dataDir))
    case (v, None)          => (v, empty)
  }

  /** CAS-commit `content` (a data dir name, or a partition manifest —
    * see [[mergeCommitDelta]]) as version `readVersion + 1`. Throws
    * [[CommitConflict]] if someone else committed first. */
  def commit(root: String, readVersion: Long, content: String): Long = {
    val next = readVersion + 1
    val tmp = commitsDir(root).resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, content)
    try {
      Files.createLink(commitsDir(root).resolve(name(next)), tmp)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflict(next)
    } finally Files.deleteIfExists(tmp)
  }

  /** Best-effort recursive delete of a staged-but-unclaimed data dir. */
  private def gcStaged(root: String, dirName: String): Unit = {
    val stale = Paths.get(root, "data", dirName)
    if (Files.exists(stale))
      Files.walk(stale).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
  }

  /** Optimistic transaction: read → merge → stage → CAS, rebasing on
    * conflict up to `maxRetries` times. `merge` must be a pure
    * function of the snapshot (it reruns on rebase). Returns the
    * committed version. The staged dir of every losing attempt is
    * GC'd immediately — including the final one when retries exhaust
    * and the [[CommitConflict]] propagates (ADVICE r9: the exhausted
    * path used to leak its staging until a vacuum). */
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
        case e: CommitConflict =>
          // loser's staged snapshot is unreachable; best-effort GC now
          gcStaged(root, dirName)
          if (attempt >= maxRetries) throw e
          attempt += 1
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
    * (CatalogTxSpec). Returns the committed version.
    *
    * Rewrites the WHOLE catalog per commit — fine for a small catalog
    * or a bulk rebuild; the incremental path a large deployment needs
    * is [[mergeCommitDelta]]. */
  def mergeCommit(spark: SparkSession, root: String, incoming: DataFrame,
      now: String, empty: => DataFrame): Long =
    transact(spark, root, empty) { snapshot =>
      MergeEngine.mergePackages(snapshot, incoming, now).packages
    }

  // ---- O(delta) partitioned commits -------------------------------

  /** Fixed hash-partition count of a delta catalog. 64 here; a 100 TB
    * catalog picks partitions ≈ table_bytes / target_file_bytes (e.g.
    * 100 TB / 1 GB ≈ 10⁵) once at root creation — the count must
    * never change, since manifests re-link old partition dirs. */
  val DefaultPartitions = 64

  /** The catalog's stable partition key: hash of the identity column
    * `download_url` (the reference upserts row-by-row keyed on it,
    * `minecode/model_utils.py:267-277`; Delta/Iceberg pay per-FILE
    * add/remove for the same reason — a commit must not cost a table
    * copy). */
  private def pidCol(partitions: Int) =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("download_url")),
      org.apache.spark.sql.functions.lit(partitions.toLong)).cast("int")

  /** Latest version + per-partition manifest (pid → data path relative
    * to root/data). A manifest commit is one line per live partition,
    * `pid<TAB>relPath`; absent pids hold no rows yet. (0, empty) on an
    * empty root. */
  def manifestSnapshot(root: String): (Long, Map[Int, String]) =
    snapshotContent(root) match {
      case None => (0L, Map.empty)
      case Some((v, content)) =>
        val entries = content.linesIterator.filter(_.contains('\t')).map {
          line =>
            val Array(pid, path) = line.split('\t')
            pid.toInt -> path
        }.toMap
        (v, entries)
    }

  /** Raw content of the latest commit (None on an empty root). */
  private def snapshotContent(root: String): Option[(Long, String)] = {
    val dir = commitsDir(root)
    if (!Files.exists(dir)) return None
    val listing = Files.list(dir)
    try {
      val it = listing.iterator()
      var best = 0L
      var bestPath: Option[Path] = None
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith("v")) {
          val v = n.drop(1).toLong
          if (v > best) { best = v; bestPath = Some(p) }
        }
      }
      bestPath.map(p => (best, Files.readString(p).trim))
    } finally listing.close()
  }

  /** Highest numeric `#tag=` header across commit records, -1 with
    * none — the applied-batch watermark of an idempotent streaming
    * writer (FrontierStream tags each micro-batch's merge with its
    * batchId; a replayed batch at or below the watermark skips the
    * merge, which is what makes merge-then-crash-then-replay
    * exactly-once). Scans every live commit record — so the watermark
    * survives interleaved UNtagged writers committing after the
    * stream — floored by the TAGFLOOR sidecar that [[vacuum]] leaves
    * behind when it prunes old commit records: the scan stays bounded
    * by the retention window, not the stream's lifetime. */
  def maxTag(root: String): Long = {
    val dir = commitsDir(root)
    if (!Files.exists(dir)) return -1L
    val listing = Files.list(dir)
    try {
      var best = tagFloor(root)
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("v"))
          Files.readString(p).linesIterator
            .filter(_.startsWith("#tag="))
            .foreach(l => best = math.max(best, l.drop(5).trim.toLong))
      }
      best
    } finally listing.close()
  }

  /** The monotonic watermark carried forward from pruned commit
    * records (-1 before any prune). */
  private def tagFloor(root: String): Long = {
    val f = commitsDir(root).resolve("TAGFLOOR")
    if (Files.exists(f)) Files.readString(f).trim.toLong else -1L
  }

  /** Raise the TAGFLOOR sidecar to `tag` (atomic replace). The
    * read-check-move is not atomic across raisers — vacuum is the
    * single raiser and vacuums must not run concurrently (the same
    * single-vacuumer contract the data sweep already assumes). */
  private def raiseTagFloor(root: String, tag: Long): Unit = {
    if (tag <= tagFloor(root)) return
    val tmp = commitsDir(root).resolve(s".floor-${UUID.randomUUID()}")
    Files.writeString(tmp, tag.toString)
    Files.move(tmp, commitsDir(root).resolve("TAGFLOOR"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read a delta catalog at its latest version: the union of every
    * manifest partition. `empty` supplies the version-0 schema. */
  def readDelta(spark: SparkSession, root: String, empty: => DataFrame)
      : (Long, DataFrame) = {
    val (v, m) = manifestSnapshot(root)
    if (m.isEmpty) (v, empty)
    else (v, spark.read.parquet(
      m.values.toSeq.sorted.map(p => s"$root/data/$p"): _*))
  }

  /** O(delta) catalog commit: merge `incoming` into ONLY the hash
    * partitions its keys land in, and re-link every other partition
    * from the previous manifest — a 10-package priority merge into a
    * 10⁸-row catalog reads and writes a handful of partition files,
    * never the table (CatalogTxSpec asserts on the files written).
    * Same optimistic protocol as [[transact]]: stage → CAS → rebase
    * on conflict; concurrent mergers — even to disjoint partitions —
    * serialize through the version counter, so the result is always a
    * serial application of the merges. */
  def mergeCommitDelta(spark: SparkSession, root: String,
      incoming: DataFrame, now: String, empty: => DataFrame,
      partitions: Int = DefaultPartitions, maxRetries: Int = 10,
      preCommitHook: Long => Unit = _ => (),
      tag: Option[Long] = None): Long = {
    init(root)
    val inc = incoming.cache() // reused across pid probe + retries
    try {
      // bounded by `partitions`, never corpus size
      val touched = inc.select(pidCol(partitions).as("pid")).distinct()
        .collect().map(_.getInt(0)).sorted
      var attempt = 0
      while (true) {
        val (v, m) = manifestSnapshot(root)
        val touchedPaths = touched.toSeq.flatMap(m.get)
          .map(p => s"$root/data/$p")
        val subset =
          if (touchedPaths.isEmpty) empty
          else spark.read.parquet(touchedPaths: _*)
        val merged = MergeEngine.mergePackages(subset, inc, now).packages
        val dirName = UUID.randomUUID().toString
        merged.withColumn("pid", pidCol(partitions))
          .write.partitionBy("pid").parquet(s"$root/data/$dirName")
        val manifest =
          (tag.map(t => s"#tag=$t").toSeq ++
            (m ++ touched.map(p => p -> s"$dirName/pid=$p"))
              .toSeq.sortBy(_._1)
              .map { case (p, d) => s"$p\t$d" }).mkString("\n")
        preCommitHook(v) // test seam: races injected between stage+CAS
        try return commit(root, v, manifest)
        catch {
          case e: CommitConflict =>
            gcStaged(root, dirName)
            if (attempt >= maxRetries) throw e
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    } finally inc.unpersist(false)
  }

  /** Retention: drop data dirs unreachable from the last `keep`
    * committed versions (superseded snapshots plus abandoned losers'
    * staging). Handles both commit formats: a whole-snapshot commit
    * references its single dir; a delta manifest references the
    * top-level dir of every `pid → uuid/pid=N` entry — a dir stays
    * live as long as ANY live manifest re-links ANY of its
    * partitions.
    *
    * Concurrency contract (ADVICE r9): an in-flight writer's staged
    * dir is unreferenced until its CAS lands, so an unguarded vacuum
    * racing it could delete data whose commit then succeeds — a
    * poisoned version. `graceMs` closes the window: only
    * unreferenced dirs last modified more than `graceMs` ago are
    * deleted, so vacuum is safe alongside writers whose
    * stage-to-commit latency is below the grace (default 20 min; a
    * Spark stage write updates the dir mtime at every file landing).
    * Similarly, `keep` ≥ 2 leaves slow concurrent READERS a full
    * version of margin; quiesce readers before `keep = 1`. */
  def vacuum(root: String, keep: Int = 2,
      graceMs: Long = 20L * 60 * 1000): Unit = {
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
    val live = commits.take(keep).flatMap { case (_, p) =>
      Files.readString(p).trim.linesIterator
        .filterNot(_.startsWith("#")) // tag headers reference no dir
        .map { line =>
          val ref = line.split('\t').last // manifest line or bare dir
          ref.split('/').head
        }
    }.toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val dataRoot = Paths.get(root, "data")
    val listing = Files.list(dataRoot)
    try {
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (!live.contains(p.getFileName.toString) &&
            Files.getLastModifiedTime(p).toMillis <= cutoff)
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
      }
    } finally listing.close()

    // bounded METADATA for always-on streams: prune commit records
    // beyond the keep window too (one per micro-batch, forever,
    // otherwise — making every maxTag/readDelta dir scan O(stream
    // lifetime)). Their `#tag=` watermark is folded into the TAGFLOOR
    // sidecar FIRST, so a replayed batch still skips its merge after
    // the record that carried its tag is gone. Only the newest commit
    // is ever read by snapshot/readDelta, so pruning older records
    // cannot change what any reader resolves; liveness above was
    // computed from the kept records only.
    val stale = commits.drop(keep)
      .filter { case (_, p) =>
        Files.getLastModifiedTime(p).toMillis <= cutoff }
    if (stale.nonEmpty) {
      var floor = -1L
      stale.foreach { case (_, p) =>
        Files.readString(p).linesIterator
          .filter(_.startsWith("#tag="))
          .foreach(l => floor = math.max(floor, l.drop(5).trim.toLong))
      }
      if (floor >= 0) raiseTagFloor(root, floor)
      stale.foreach { case (_, p) => Files.deleteIfExists(p) }
    }
  }
}
