package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The remaining queue surfaces (SURVEY §2.9 ST5/ST6/ST8): priority
  * collect requests, package watches, and the activity inbox — all
  * state DataFrames with claim/due/append plans mirroring the
  * reference's managers.
  */
object Queues {

  /** ST5 — priority requests (`minecode/models.py:812-862`): insert
    * only when no identical request is pending (J12 anti-join), claim
    * FIFO by request_date. */
  def insertPriorityRequests(pending: DataFrame,
      requests: DataFrame): DataFrame = {
    val newOnes = requests
      .join(pending.filter(col("processed_date").isNull)
          .select(col("uri").as("pending_uri")),
        col("uri") === col("pending_uri"), "left_anti")
    pending.unionByName(newOnes)
  }

  /** The index-request routability gate in front of the queue insert
    * (`packagedb/api.py:1021-1027`, `minecode/api.py:79`): a purl the
    * priority router cannot route is diverted to the caller's
    * `unsupported_packages` report instead of being queued; everything
    * routable proceeds through the ST5 insert-if-absent. The check is
    * the reference's `is_routable` decision (`route.py:187-200`) over
    * [[graft.miners.RouteRegistry.priority]], via the prefix-pruned
    * [[graft.functions.UriRoutable]] codegen expression. Returns
    * (queue-after-insert, unsupported-requests). */
  def insertRoutableRequests(pending: DataFrame,
      requests: DataFrame): (DataFrame, DataFrame) = {
    val routable =
      graft.functions.GraftFunctions.uri_routable(col("uri"), "priority")
    (insertPriorityRequests(pending, requests.filter(routable)),
      requests.filter(!routable))
  }

  /** Claim the oldest unprocessed requests, FIFO by (request_date,
    * uri). */
  def claimPriorityRequests(pending: DataFrame, batchSize: Int): DataFrame =
    pending.filter(col("processed_date").isNull &&
        col("wip_date").isNull)
      .orderBy(col("request_date"), col("uri"))
      .limit(batchSize)

  /** `make_scannableuris` (`minecode/management/commands/
    * make_scannableuris.py`): one scan-queue entry per catalog
    * package, insert-if-absent on the download URL (J12 anti-join).
    * `scannables` carries (uri, priority). */
  def makeScannableUris(scannables: DataFrame,
      packages: DataFrame): DataFrame = {
    val created = packages
      .select(col("download_url").as("uri")).distinct()
      .join(scannables.select("uri"), Seq("uri"), "left_anti")
      .withColumn("priority", lit(0))
    scannables.unionByName(created)
  }

  /** `increase_scannableuri_priority`: bump matching URIs to the
    * arbitrary top priority 100 (case-insensitive regex, like the
    * reference's `uri__iregex`). */
  def increaseScannablePriority(scannables: DataFrame,
      pattern: String): DataFrame =
    scannables.withColumn("priority",
      when(col("uri").rlike(s"(?i)$pattern"), lit(100))
        .otherwise(col("priority")))

  /** ST6 — package watches (`packagedb/models.py:1285-1454`): due when
    * last_watch_date is null or older than watch_interval days
    * (1-365 clamp, default 7). */
  def dueWatches(watches: DataFrame, now: Timestamp): DataFrame = {
    val interval = least(greatest(coalesce(col("watch_interval"), lit(7)),
      lit(1)), lit(365))
    watches.filter(col("is_active") &&
      (col("last_watch_date").isNull ||
        col("last_watch_date") <
          to_timestamp(lit(now)) - make_interval(lit(0), lit(0), lit(0),
            interval)))
  }

  /** ST8 — activity inbox (`packagedb/api.py:1393-1411`): append
    * "create"-type events with non-empty content as PackageActivity
    * rows (`if content and activity_type.lower() == "create"` — an
    * empty payload is rejected even when the type matches). */
  def appendActivities(inbox: DataFrame, events: DataFrame): DataFrame =
    inbox.unionByName(
      events.filter(col("payload").isNotNull && col("payload") =!= "" &&
          lower(col("activity_type")) === "create")
        .select(col("actor"), col("payload"), col("received_date")))

  /** The priority-queue worker loop (`minecode/management/commands/
    * priority_queue.py:60-101` + `test_priority_queue.py`) as one
    * batch pass: claim the oldest unprocessed requests FIFO
    * (`get_next_request`), run each purl through the registry
    * collectors (the router), merge the collected packages into the
    * catalog, and mark every claimed request processed — per-request
    * errors recorded, wip cleared and processed_date set whether the
    * collect succeeded or not (the reference's `finally` block).
    *
    * The claim is a bounded driver-side batch (the reference's
    * MAP_BATCH_SIZE-style loop); the collects themselves run on
    * executors inside [[graft.miners.CollectFlow.collect]].
    * Returns (updated pending queue, updated catalog).
    */
  def processPriorityRequests(spark: org.apache.spark.sql.SparkSession,
      pending: DataFrame, catalog: DataFrame,
      transport: graft.miners.Transport, now: Timestamp,
      batchSize: Int = 10): (DataFrame, DataFrame) = {
    import spark.implicits._
    val claimed = claimPriorityRequests(pending, batchSize)
      .select("uri").as[String].collect().toSeq
    if (claimed.isEmpty) return (pending, catalog)
    // the reference worker resolves each claimed purl through the
    // priority router before collecting; NoRouteAvailable is caught
    // and recorded as the row's processing_error while the row is
    // still marked processed (`minecode/management/commands/
    // priority_queue.py:85-137`)
    val routed = claimed.map(u =>
      u -> graft.miners.RouteRegistry.priorityRouter.resolveEither(u))
    val routable = routed.collect { case (u, Right(_)) => u }
    val routeErrors = routed.collect {
      case (u, Left(e)) if e.startsWith("no route") =>
        s"$u: No route available for $u"
      case (u, Left(e)) => s"$u: $e"
    }
    val (merged, collectErrors) =
      if (routable.isEmpty) (catalog, Seq.empty[String])
      else graft.miners.CollectFlow.collect(
        spark, catalog, routable, transport, now.toString)
    val errors = collectErrors ++ routeErrors
    // error strings are "purl: message"; attribute them back to rows
    val errByPurl = claimed.map { u =>
      u -> (errors.collect {
        case e if e.startsWith(u + ": ") => e.substring(u.length + 2)
      } match {
        case Seq() => null: String
        case es    => es.mkString("; ")
      })
    }
    val claimedDf = errByPurl.toDF("c_uri", "c_err")
    val base =
      if (pending.columns.contains("processing_error")) pending
      else pending.withColumn("processing_error",
        lit(null).cast("string"))
    val updated = base
      .join(broadcast(claimedDf), base("uri") === col("c_uri"), "left")
      .withColumn("processed_date",
        when(col("c_uri").isNotNull, lit(now).cast("timestamp"))
          .otherwise(col("processed_date")))
      .withColumn("wip_date",
        when(col("c_uri").isNotNull, lit(null).cast("timestamp"))
          .otherwise(col("wip_date")))
      .withColumn("processing_error",
        when(col("c_uri").isNotNull, col("c_err"))
          .otherwise(col("processing_error")))
      .drop("c_uri", "c_err")
    (updated, merged)
  }

  /** `load_priority_queue` (`minecode/management/commands/
    * load_priority_queue.py:33-60`): walk a scanned codebase's sha1
    * checksums, look each up in the maven search index (injected —
    * the reference queries search.maven.org's solr endpoint), and
    * create one priority request per (group, artifact, version) hit.
    * The reference inserts directly — NOT through the
    * insert-if-absent gate — and skips hits with any empty
    * coordinate; lookups run on executors. Returns the created
    * request rows (uri = package_url = the maven purl, plus the
    * matching sha1). */
  def loadPriorityQueue(spark: org.apache.spark.sql.SparkSession,
      resources: DataFrame,
      lookup: String => Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    resources.filter(col("sha1").isNotNull)
      .select("sha1").as[String]
      .mapPartitions(_.flatMap { sha1 =>
        lookup(sha1).collect {
          case (g, a, v) if g.nonEmpty && a.nonEmpty && v.nonEmpty =>
            val purl = s"pkg:maven/$g/$a@$v"
            (purl, purl, sha1)
        }
      })
      .toDF("uri", "package_url", "sha1")
  }

  /** `manage_scans`' stale-scan sweep (`minecode/management/commands/
    * manage_scans.py:149-176`): a scan still SUBMITTED or IN_PROGRESS
    * more than 2 hours after its scan_date is marked `timeout` and
    * its wip_date cleared; everything else passes through. The
    * reference computes hours from `timedelta.seconds`, which wraps
    * every 24 h (a 25-hour-old scan reads as 1 h and is transiently
    * immune) — an artifact of the field, not the documented intent
    * ("past some time → timed out"); this sweep uses total elapsed
    * time. */
  def sweepStaleScans(scannables: DataFrame, now: Timestamp): DataFrame = {
    val cutoff = new Timestamp(now.getTime - 2L * 3600 * 1000)
    val stale = col("scan_status").isin("submitted", "in_progress") &&
      col("scan_date").isNotNull && col("scan_date") < lit(cutoff)
    scannables
      .withColumn("wip_date",
        when(stale, lit(null).cast("timestamp")).otherwise(col("wip_date")))
      .withColumn("scan_status",
        when(stale, lit("timeout")).otherwise(col("scan_status")))
  }

  // ---------------------------------------------------------------- watch

  /** Ecosystems the collect flow can fetch versions for (the engine's
    * analogue of fetchcode's `SUPPORTED_ECOSYSTEMS`,
    * `packagedb/tasks.py:13`). */
  val FetchSupportedEcosystems: Seq[String] = Seq("pypi", "npm", "maven",
    "cargo", "gem", "nuget", "composer", "hex", "golang", "deb",
    "ubuntu", "cran", "hackage", "conda", "apk", "cpan", "pub", "github",
    "gitlab", "bitbucket", "docker", "huggingface", "conan", "swift",
    "gnu", "openssl", "luarocks", "alpm", "nix", "generic")

  /** Ecosystems the priority queue can process
    * (`packagedb/tasks.py:17`). */
  val PriorityQueueSupportedEcosystems: Seq[String] = Seq("maven", "npm")

  /** Ecosystems with a native version comparator
    * (`packagedb/tasks.py:19-21` via univers; here
    * [[graft.functions.EcosystemVersions]]). */
  val VersionComparatorEcosystems: Seq[String] = Seq("pypi", "deb",
    "debian", "ubuntu", "maven", "npm", "cargo", "composer", "hex",
    "golang", "swift", "gem", "nuget", "generic")

  /** `is_supported_watch_ecosystem` (`packagedb/tasks.py:87-104`) as a
    * column: null when supported, else the first failing layer's error
    * message. */
  def watchSupportError(ptype: Column): Column =
    when(!ptype.isin(FetchSupportedEcosystems: _*),
      concat(lit("`"), ptype, lit("` ecosystem is not supported by the collect flow")))
      .when(!ptype.isin(PriorityQueueSupportedEcosystems: _*),
        concat(lit("`"), ptype, lit("` ecosystem is not supported by the priority queue")))
      .when(!ptype.isin(VersionComparatorEcosystems: _*),
        concat(lit("`"), ptype, lit("` ecosystem is not supported by the version comparators")))

  /** `get_next_execution` (`packagedb/schedules.py:22-30`): the next
    * watch run is last_watch_date + interval, or now when unset or
    * already past. */
  def nextExecution(watchIntervalDays: Int,
      lastWatchDate: Option[Timestamp], now: Timestamp): Timestamp =
    lastWatchDate
      .map(d => new Timestamp(d.getTime + watchIntervalDays * 86400000L))
      .filter(_.after(now))
      .getOrElse(now)

  /** The watch cycle (`packagedb/tasks.py:25-85`,
    * `watch_new_packages` / `get_and_index_new_purls`) as one
    * distributed pass over every due watch at once — the reference
    * runs one RQ job per watch; here the fetched version lists and the
    * catalog join in bulk, so 10 M watches are a broadcast join plus
    * one anti-join, not 10 M tasks.
    *
    *  - `watches`: (package_url, ptype, namespace, name, is_active,
    *    watch_interval, last_watch_date)
    *  - `packages`: the catalog (ptype, namespace, name, version, ...)
    *  - `fetched`: registry version rows from the collect flow
    *    (ptype, namespace, name, version)
    *  - `pending`: the priority-request queue (uri, request_date,
    *    wip_date, processed_date)
    *
    * Returns (updated watches, updated pending queue): versions the
    * catalog doesn't have yet become priority requests
    * (insert-if-absent), every processed watch gets
    * last_watch_date=now, unsupported ecosystems get watch_error.
    */
  def watchCycle(watches: DataFrame, packages: DataFrame,
      fetched: DataFrame, pending: DataFrame, now: Timestamp)
      : (DataFrame, DataFrame) = {
    val due = dueWatches(watches, now)
      .withColumn("watch_error", watchSupportError(col("ptype")))
    val keys = Seq("ptype", "namespace", "name")
    val supported = due.filter(col("watch_error").isNull)
      .select(keys.map(col): _*)

    // fetched minus local: anti-join on the full purl key
    val newPurls = fetched
      .join(broadcast(supported), keys, "left_semi")
      .join(packages.select(col("ptype"), col("namespace"), col("name"),
          col("version")),
        Seq("ptype", "namespace", "name", "version"), "left_anti")
      .select(concat(lit("pkg:"), col("ptype"),
          when(col("namespace").isNotNull && col("namespace") =!= "",
            concat(lit("/"), col("namespace"))).otherwise(lit("")),
          lit("/"), col("name"), lit("@"), col("version")).as("uri"),
        lit(now).cast("timestamp").as("request_date"),
        lit(null).cast("timestamp").as("wip_date"),
        lit(null).cast("timestamp").as("processed_date"))

    val dueKeys = due.select(col("package_url").as("due_url"))
    val base =
      if (watches.columns.contains("watch_error")) watches
      else watches.withColumn("watch_error", lit(null).cast("string"))
    val updatedWatches = base
      .join(broadcast(dueKeys), col("package_url") === col("due_url"),
        "left")
      .withColumn("last_watch_date",
        when(col("due_url").isNotNull, lit(now).cast("timestamp"))
          .otherwise(col("last_watch_date")))
      .withColumn("watch_error",
        when(col("due_url").isNotNull, watchSupportError(col("ptype")))
          .otherwise(col("watch_error")))
      .drop("due_url")

    (updatedWatches, insertPriorityRequests(pending, newPurls))
  }
}
