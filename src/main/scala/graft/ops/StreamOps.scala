package graft.ops

import java.sql.Timestamp

import graft._
import graft.core._
import graft.streaming.Frontier
import org.apache.spark.sql.functions._

/** Driver-surface simulation of the mining frontier loops (ST1-ST3):
  * seeds a frontier from the documents table, runs two visit
  * micro-cycles with a deterministic visitor and one map cycle, and
  * emits the final queue state. Rows-only check (the loop semantics
  * are covered value-level by StreamingSpec); registered so the queue
  * machinery runs through the same entry point as every other
  * operator.
  */
object StreamOps {

  val frontierSim = QueryDef(
    "st_frontier_sim", "ST1-ST3/J12/O2",
    "two visit micro-cycles + map cycle over a document-seeded frontier",
    (s, dir) => {
      import s.implicits._
      val now = Timestamp.valueOf("2026-08-12 00:00:00")
      val seed = t(s, dir, "documents").filter(col("doc_id") < 20)
        .select(
          concat(lit("http://"), col("source"), lit(".example/doc/"),
            col("doc_id").cast("string")).as("uri"),
          concat(lit("http://"), col("source"), lit(".example/doc/"),
            col("doc_id").cast("string")).as("canonical"),
          concat(col("source"), lit(".example")).as("host"),
          (col("doc_id") % 7).cast("int").as("priority"),
          lit(null).cast("timestamp").as("last_visit_date"),
          lit(null).cast("timestamp").as("last_map_date"),
          lit(null).cast("timestamp").as("wip_date"),
          lit(null).cast("string").as("visit_error"))
      val visitor: Frontier.Visitor = u =>
        if (u.count(_ == '/') <= 3) Seq(s"$u/meta.json") else Seq.empty
      // a production frontier persists queue state between micro-batches
      // (Delta/parquet write per trigger); localCheckpoint is the
      // in-process equivalent — without it, iterated cycles compound
      // lineage and every action replays all previous cycles
      val f1 = Frontier.visitCycle(s, seed, visitor, now, batchSize = 8)
        .localCheckpoint(true)
      val f2 = Frontier.visitCycle(s, f1, visitor, now, batchSize = 8)
        .localCheckpoint(true)
      val (f3, _) = Frontier.mapCycle(s, f2,
        u => Seq(s"pkg:generic/$u"), now, batchSize = 10)
      f3.select(col("uri"),
          col("last_visit_date").isNotNull.as("visited"),
          col("last_map_date").isNotNull.as("mapped"),
          col("priority"))
        .orderBy("uri")
    },
    // The final queue state is deterministic and SQL-expressible:
    // seed URIs have four '/' so the depth-gated visitor yields no
    // children; two claim cycles of 8 by (priority DESC, uri DESC)
    // visit the overall top 16, and the map cycle of 10 maps the
    // overall top 10 (a subset of the visited 16). The oracle mirrors
    // the claim-order state machine directly.
    Some("""WITH seed AS (
        SELECT 'http://' || source || '.example/doc/' ||
            CAST(doc_id AS VARCHAR) AS uri,
          CAST(doc_id % 7 AS INTEGER) AS priority
        FROM documents WHERE doc_id < 20),
      ranked AS (
        SELECT uri, priority,
          ROW_NUMBER() OVER (ORDER BY priority DESC, uri DESC) AS rn
        FROM seed)
      SELECT uri, rn <= 16 AS visited, rn <= 10 AS mapped, priority
      FROM ranked ORDER BY uri"""))

  /** ST4 — the 8-state scan-queue machine replayed deterministically
    * (`minecode/models.py:648-808`): five event-log patterns per scan
    * uuid, including illegal transitions the guards must IGNORE
    * (double submit, post-terminal start, start-before-submit). The
    * replay runs the same guarded-transition fold the streaming
    * `flatMapGroupsWithState` machine uses ([[graft.streaming
    * .ScanQueue.applySequence]]); the oracle re-derives each pattern's
    * legal transition count, terminal state, and last applied detail. */
  val scanQueueReplay = QueryDef(
    "st_scan_queue", "ST4",
    "scan-queue 8-state replay: guarded transitions over event logs",
    (s, dir) => {
      import s.implicits._
      import graft.streaming.ScanQueue
      t(s, dir, "part")
        .select(col("p_partkey").cast("string").as("uuid"),
          (col("p_partkey") % 5).cast("int").as("pat"))
        .as[(String, Int)]
        .map { case (uuid, pat) =>
          val evs = pat match {
            case 0 => Seq("submit", "start", "scan_done", "index_done")
            case 1 => Seq("submit", "submit", "start", "scan_done")
            case 2 => Seq("submit", "start", "fail", "start")
            case 3 => Seq("submit", "start", "scan_done", "index_fail")
            case _ => Seq("start", "submit", "start")
          }
          val start = ScanQueue.ScanState(uuid, ScanQueue.New.code, "")
          val out = ScanQueue.applySequence(uuid, start,
            evs.iterator.map(e =>
              ScanQueue.ScanEvent(uuid, e, s"$e@$uuid")))
          // all current patterns emit >=1 transition, but a pattern
          // with no legal transition must yield the start state, not
          // throw (same guard applyEvents uses)
          val last = out.lastOption.getOrElse(start)
          (uuid, last.status, out.size, last.detail)
        }
        .toDF("uuid", "final_status", "n_transitions", "last_detail")
        .orderBy(col("uuid"))
    },
    Some("""SELECT CAST(p_partkey AS VARCHAR) AS uuid,
        CASE p_partkey % 5 WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 5
          WHEN 3 THEN 7 ELSE 2 END AS final_status,
        CASE p_partkey % 5 WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 3
          WHEN 3 THEN 4 ELSE 2 END AS n_transitions,
        CASE p_partkey % 5
          WHEN 0 THEN 'index_done@' || CAST(p_partkey AS VARCHAR)
          WHEN 1 THEN 'scan_done@' || CAST(p_partkey AS VARCHAR)
          WHEN 2 THEN 'fail@' || CAST(p_partkey AS VARCHAR)
          WHEN 3 THEN 'index_fail@' || CAST(p_partkey AS VARCHAR)
          ELSE 'start@' || CAST(p_partkey AS VARCHAR) END AS last_detail
      FROM part ORDER BY uuid"""))

  /** ST5 — priority-request queue discipline
    * (`minecode/models.py:812-862`): insert-if-absent against PENDING
    * rows only (a processed request may legally be re-requested —
    * duplicate uri, new pending row), then FIFO claim by
    * (request_date, uri) skipping processed and in-flight rows. The
    * oracle mirrors the anti-join's processed-rows exemption, which is
    * the discriminating part. */
  val priorityQueue = QueryDef(
    "st_priority_queue", "ST5/J12/O2",
    "priority queue: insert-if-absent (pending only) → FIFO claim",
    (s, dir) => {
      val nullTs = lit(null).cast("timestamp")
      val pending = t(s, dir, "part").select(
        concat(lit("pkg:gen/p"), col("p_partkey").cast("string"))
          .as("uri"),
        expr("""timestamp'2026-08-01 00:00:00' -
            make_interval(0, 0, 0, CAST(p_partkey % 20 AS INT))""")
          .as("request_date"),
        when(col("p_partkey") % 3 === 0,
          lit(Timestamp.valueOf("2026-08-05 00:00:00")))
          .otherwise(nullTs).as("processed_date"),
        when(col("p_partkey") % 7 === 0 && col("p_partkey") % 3 =!= 0,
          lit(Timestamp.valueOf("2026-08-12 00:00:00")))
          .otherwise(nullTs).as("wip_date"))
      val requests = t(s, dir, "part").select(
        concat(lit("pkg:gen/p"), (col("p_partkey") + 1500).cast("string"))
          .as("uri"),
        lit(Timestamp.valueOf("2026-08-10 00:00:00")).as("request_date"),
        nullTs.as("processed_date"), nullTs.as("wip_date"))
      val queue = graft.streaming.Queues
        .insertPriorityRequests(pending, requests)
      graft.streaming.Queues.claimPriorityRequests(queue, 50)
        .select("uri", "request_date")
        .orderBy("request_date", "uri")
    },
    Some("""WITH pending AS (
        SELECT 'pkg:gen/p' || CAST(p_partkey AS VARCHAR) AS uri,
          TIMESTAMP '2026-08-01 00:00:00'
            - to_days(CAST(p_partkey % 20 AS INTEGER)) AS request_date,
          CASE WHEN p_partkey % 3 = 0
            THEN TIMESTAMP '2026-08-05 00:00:00' END AS processed_date,
          CASE WHEN p_partkey % 7 = 0 AND p_partkey % 3 <> 0
            THEN TIMESTAMP '2026-08-12 00:00:00' END AS wip_date
        FROM part),
      requests AS (
        SELECT 'pkg:gen/p' || CAST(p_partkey + 1500 AS VARCHAR) AS uri,
          TIMESTAMP '2026-08-10 00:00:00' AS request_date,
          CAST(NULL AS TIMESTAMP) AS processed_date,
          CAST(NULL AS TIMESTAMP) AS wip_date
        FROM part),
      queue AS (
        SELECT * FROM pending
        UNION ALL
        SELECT r.* FROM requests r
        WHERE NOT EXISTS (
          SELECT 1 FROM pending p
          WHERE p.uri = r.uri AND p.processed_date IS NULL))
      SELECT uri, request_date FROM queue
      WHERE processed_date IS NULL AND wip_date IS NULL
      ORDER BY request_date, uri LIMIT 50"""))

  /** ST6 — package-watch scheduling (`packagedb/models.py:1285-1454`):
    * a watch is due when active and never watched, or last watched
    * more than `watch_interval` days ago — interval NULL defaults to
    * 7 and is clamped to [1, 365]. The generated intervals cover the
    * default, both clamp edges, and both due directions. */
  val watchesDue = QueryDef(
    "st_watches_due", "ST6",
    "package watches due: interval clamp + staleness filter",
    (s, dir) => {
      val now = Timestamp.valueOf("2026-08-13 00:00:00")
      val watches = t(s, dir, "part").select(
        concat(lit("pkg:maven/ns/a"), col("p_partkey").cast("string"))
          .as("package_url"),
        when(col("p_partkey") % 5 === 0, lit(null).cast("int"))
          .otherwise((col("p_partkey") % 400).cast("int"))
          .as("watch_interval"),
        (col("p_partkey") % 4 =!= 0).as("is_active"),
        when(col("p_partkey") % 6 === 0, lit(null).cast("timestamp"))
          .otherwise(expr("""timestamp'2026-08-13 00:00:00' -
            make_interval(0, 0, 0, CAST(p_partkey % 300 AS INT))"""))
          .as("last_watch_date"))
      graft.streaming.Queues.dueWatches(watches, now)
        .select("package_url", "watch_interval", "is_active")
        .orderBy("package_url")
    },
    Some("""WITH w AS (
        SELECT 'pkg:maven/ns/a' || CAST(p_partkey AS VARCHAR)
            AS package_url,
          CASE WHEN p_partkey % 5 = 0 THEN NULL
            ELSE CAST(p_partkey % 400 AS INTEGER) END AS watch_interval,
          p_partkey % 4 <> 0 AS is_active,
          CASE WHEN p_partkey % 6 = 0 THEN NULL
            ELSE TIMESTAMP '2026-08-13 00:00:00'
              - to_days(CAST(p_partkey % 300 AS INTEGER)) END
            AS last_watch_date
        FROM part)
      SELECT package_url, watch_interval, is_active FROM w
      WHERE is_active AND (last_watch_date IS NULL OR
        last_watch_date < TIMESTAMP '2026-08-13 00:00:00'
          - to_days(CAST(LEAST(GREATEST(COALESCE(watch_interval, 7), 1),
              365) AS INTEGER)))
      ORDER BY package_url"""))

  /** ST8 — activity inbox append (`packagedb/api.py:1393-1411`):
    * only "create"-type events (case-insensitive) with non-empty
    * content land in the inbox; other types and empty payloads are
    * rejected. */
  val activityInbox = QueryDef(
    "st_activity_inbox", "ST8",
    "activity inbox: create-type non-empty events appended",
    (s, dir) => {
      val inbox = t(s, dir, "part").filter(col("p_partkey") % 10 === 0)
        .select(
          concat(lit("actor"), (col("p_partkey") % 5).cast("string"))
            .as("actor"),
          concat(lit("existing "), col("p_partkey").cast("string"))
            .as("payload"),
          lit(Timestamp.valueOf("2026-08-01 00:00:00"))
            .as("received_date"))
      val events = t(s, dir, "part").select(
        concat(lit("actor"), (col("p_partkey") % 7).cast("string"))
          .as("actor"),
        when(col("p_partkey") % 4 === 0, lit(""))
          .when(col("p_partkey") % 4 === 1, lit(null).cast("string"))
          .otherwise(concat(lit("pkg event "),
            col("p_partkey").cast("string"))).as("payload"),
        when(col("p_partkey") % 3 === 0, lit("Create"))
          .when(col("p_partkey") % 3 === 1, lit("update"))
          .otherwise(lit("CREATE")).as("activity_type"),
        lit(Timestamp.valueOf("2026-08-13 00:00:00")).as("received_date"))
      graft.streaming.Queues.appendActivities(inbox, events)
        .orderBy("actor", "payload")
    },
    Some("""WITH inbox AS (
        SELECT 'actor' || CAST(p_partkey % 5 AS VARCHAR) AS actor,
          'existing ' || CAST(p_partkey AS VARCHAR) AS payload,
          TIMESTAMP '2026-08-01 00:00:00' AS received_date
        FROM part WHERE p_partkey % 10 = 0),
      events AS (
        SELECT 'actor' || CAST(p_partkey % 7 AS VARCHAR) AS actor,
          CASE WHEN p_partkey % 4 = 0 THEN ''
               WHEN p_partkey % 4 = 1 THEN NULL
               ELSE 'pkg event ' || CAST(p_partkey AS VARCHAR) END
            AS payload,
          CASE WHEN p_partkey % 3 = 0 THEN 'Create'
               WHEN p_partkey % 3 = 1 THEN 'update'
               ELSE 'CREATE' END AS activity_type,
          TIMESTAMP '2026-08-13 00:00:00' AS received_date
        FROM part)
      SELECT actor, payload, received_date FROM inbox
      UNION ALL
      SELECT actor, payload, received_date FROM events
      WHERE payload IS NOT NULL AND payload <> ''
        AND LOWER(activity_type) = 'create'
      ORDER BY actor, payload"""))

  /** S12 — seed bootstrap (`minecode/miners/maven.py:91-106`): the
    * static MavenSeed URIs union into the frontier through the same
    * insert-if-absent-among-pending discipline as any visitor yield; a
    * seed already pending is not duplicated. */
  val seedBootstrap = QueryDef(
    "s12_seed_bootstrap", "S12/J12",
    "static seeds union into the frontier, insert-if-absent",
    (s, dir) => {
      import s.implicits._
      val existing = t(s, dir, "part")
        .filter(col("p_partkey") < 20)
        .select(when(col("p_partkey") === 0,
            lit(graft.miners.Seeds.all.head))
          .otherwise(concat(lit("http://h/"),
            col("p_partkey").cast("string"))).as("uri"))
      val seeds = graft.miners.Seeds.all.toDF("uri")
      val inserted = seeds.join(
        existing.select(col("uri").as("existing_uri")),
        col("uri") === col("existing_uri"), "left_anti")
      existing.unionByName(inserted.select("uri")).orderBy("uri")
    },
    Some("""WITH existing AS (
        SELECT CASE WHEN p_partkey = 0 THEN
            'https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.gz'
          ELSE 'http://h/' || CAST(p_partkey AS VARCHAR) END AS uri
        FROM part WHERE p_partkey < 20),
      seeds AS (SELECT * FROM (VALUES
        ('https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.gz'),
        ('https://repo1.maven.org/maven2/.index/nexus-maven-repository-index.properties'))
        t(uri))
      SELECT uri FROM existing
      UNION ALL
      SELECT uri FROM seeds
      WHERE uri NOT IN (SELECT uri FROM existing)
      ORDER BY uri"""))

  /** ST2 — the FULL `get_visitables` composition
    * (`minecode/models.py:241-273`) under the driver oracle: never
    * visited (gated on is_visitable) ∪ revisitables — visited more
    * than 240 h before `now`, excluding mappable-but-unmapped rows
    * and unvisitable rows. The generated frontier covers every
    * branch: fresh visits (inside the horizon), stale visits, WIP
    * rows, unvisitable rows, and the mappable-pending exclusion.
    * cutoff = 2026-08-13 − 240 h = 2026-08-03. */
  val revisitHorizon = QueryDef(
    "st_revisit_horizon", "ST2/U2",
    "get_visitables: never-visited ∪ 240h revisitables with excludes",
    (s, dir) => {
      val now = Timestamp.valueOf("2026-08-13 00:00:00")
      val nullTs = lit(null).cast("timestamp")
      val f = t(s, dir, "part").select(
        concat(lit("http://h/"), col("p_partkey").cast("string"))
          .as("uri"),
        (col("p_partkey") % 10).cast("int").as("priority"),
        when(col("p_partkey") % 4 === 0, nullTs)
          .when(col("p_partkey") % 4 === 1,
            lit(Timestamp.valueOf("2026-07-01 00:00:00")))
          .when(col("p_partkey") % 4 === 2,
            lit(Timestamp.valueOf("2026-08-10 00:00:00")))
          .otherwise(lit(Timestamp.valueOf("2026-07-20 00:00:00")))
          .as("last_visit_date"),
        when(col("p_partkey") % 5 === 0,
          lit(Timestamp.valueOf("2026-07-02 00:00:00")))
          .otherwise(nullTs).as("last_map_date"),
        when(col("p_partkey") % 11 === 0,
          lit(Timestamp.valueOf("2026-08-12 23:00:00")))
          .otherwise(nullTs).as("wip_date"),
        (col("p_partkey") % 3 =!= 0).as("is_visitable"),
        (col("p_partkey") % 2 === 0).as("is_mappable"))
      Frontier.getVisitables(f, now)
        .withColumn("is_revisit", col("last_visit_date").isNotNull)
        .select("uri", "priority", "is_revisit")
        .orderBy("uri")
    },
    Some("""WITH f AS (
        SELECT 'http://h/' || CAST(p_partkey AS VARCHAR) AS uri,
          CAST(p_partkey % 10 AS INTEGER) AS priority,
          CASE WHEN p_partkey % 4 = 0 THEN NULL
               WHEN p_partkey % 4 = 1 THEN TIMESTAMP '2026-07-01 00:00:00'
               WHEN p_partkey % 4 = 2 THEN TIMESTAMP '2026-08-10 00:00:00'
               ELSE TIMESTAMP '2026-07-20 00:00:00' END
            AS last_visit_date,
          CASE WHEN p_partkey % 5 = 0
            THEN TIMESTAMP '2026-07-02 00:00:00' END AS last_map_date,
          CASE WHEN p_partkey % 11 = 0
            THEN TIMESTAMP '2026-08-12 23:00:00' END AS wip_date,
          p_partkey % 3 <> 0 AS is_visitable,
          p_partkey % 2 = 0 AS is_mappable
        FROM part)
      SELECT uri, priority, FALSE AS is_revisit FROM f
      WHERE wip_date IS NULL AND last_visit_date IS NULL AND is_visitable
      UNION ALL
      SELECT uri, priority, TRUE AS is_revisit FROM f
      WHERE wip_date IS NULL AND last_visit_date IS NOT NULL
        AND last_visit_date < TIMESTAMP '2026-08-03 00:00:00'
        AND NOT (is_mappable AND last_map_date IS NULL)
        AND is_visitable
      ORDER BY uri"""))

  /** ST3 — the map-loop replayed deterministically
    * (`run_map.py:79-182`), the same closed-form trick as ST4: the
    * loop claims batches of 10 from `get_mappables` ordered by
    * -priority until the queue drains, and because a map outcome
    * never re-enters the queue (every branch sets last_map_date),
    * the whole loop collapses to rank ÷ batch-size — batch_round is
    * the iteration that would have processed each row. Patterns cover
    * all three `map_uri` branches (success / empty yield / mapper
    * exception, applied through [[Frontier.mapUriOutcome]]) and all
    * three non-mappable states (visit error, already mapped,
    * is_mappable=false). The rank window is global like the
    * reference's queue order; it is bounded by queue depth, and a
    * production claimer takes orderBy().limit() per trigger instead
    * of materializing the full rank (see st_frontier_sim). Ties in
    * priority are broken by uri DESC (upstream leaves tie order to
    * the database; the replay pins it for determinism). */
  val mapCycleReplay = QueryDef(
    "st_map_cycle", "ST3/X2",
    "map-loop replay: batched get_mappables + map_uri outcome branches",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val nullTs = lit(null).cast("timestamp")
      val f = t(s, dir, "part").select(
        col("p_partkey").cast("long").as("k"),
        concat(lit("http://repo.example/p"),
          col("p_partkey").cast("string")).as("uri"),
        (col("p_partkey") % 9).cast("int").as("priority"),
        (col("p_partkey") % 6).cast("int").as("pat"))
        .withColumn("last_visit_date",
          lit(Timestamp.valueOf("2026-08-01 00:00:00")))
        .withColumn("has_visit_error", col("pat") === 3)
        .withColumn("last_map_date",
          when(col("pat") === 4,
            lit(Timestamp.valueOf("2026-08-02 00:00:00")))
            .otherwise(nullTs))
        .withColumn("is_mappable", col("pat") =!= 5)
        .withColumn("has_map_error", lit(false))
        .withColumn("wip_date", nullTs)
      // get_mappables (minecode/models.py:336-345): never_mapped
      // (successfully visited, unmapped, not in-flight) and mappable
      // with no prior map error, ordered by -priority
      val mappables = f.filter(col("wip_date").isNull &&
        col("last_visit_date").isNotNull && !col("has_visit_error") &&
        col("last_map_date").isNull && col("is_mappable") &&
        !col("has_map_error"))
      val ranked = mappables.withColumn("rn",
          row_number().over(Window.orderBy(desc("priority"), desc("uri"))))
        .withColumn("batch_round",
          (((col("rn") - 1) / 10) + 1).cast("int"))
      val outcomes = ranked
        .select(col("uri"), col("pat"), col("batch_round"), col("k"))
        .as[(String, Int, Int, Long)]
        .map { case (uri, pat, round, k) =>
          val res: Either[String, Seq[String]] = pat match {
            case 0 => Right((0 until (1 + (k % 2)).toInt)
              .map(i => s"pkg:gen/$uri#$i"))
            case 1 => Right(Seq.empty)
            case _ => Left(s"boom@$uri")
          }
          val (n, err) = Frontier.mapUriOutcome(res)
          (uri, round, n, err.orNull)
        }
        .toDF("uri", "batch_round", "n_packages", "map_error")
      f.join(outcomes, Seq("uri"), "left")
        .select(col("uri"), col("batch_round"), col("n_packages"),
          col("map_error"))
        .orderBy("uri")
    },
    Some("""WITH f AS (
        SELECT p_partkey AS k,
          'http://repo.example/p' || CAST(p_partkey AS VARCHAR) AS uri,
          CAST(p_partkey % 9 AS INTEGER) AS priority,
          CAST(p_partkey % 6 AS INTEGER) AS pat
        FROM part),
      ranked AS (
        SELECT uri, pat, k,
          CAST((ROW_NUMBER() OVER (ORDER BY priority DESC, uri DESC)
            - 1) // 10 + 1 AS INTEGER) AS batch_round
        FROM f WHERE pat NOT IN (3, 4, 5)),
      outcomes AS (
        SELECT uri, batch_round,
          CASE pat WHEN 0 THEN CAST(1 + k % 2 AS INTEGER)
            ELSE 0 END AS n_packages,
          CASE pat
            WHEN 1 THEN 'No visited scanned packages returned.'
            WHEN 2 THEN
              'Error: Failed to map while processing ResourceURI: boom@'
                || uri
          END AS map_error
        FROM ranked)
      SELECT f.uri, o.batch_round, o.n_packages, o.map_error
      FROM f LEFT JOIN outcomes o ON f.uri = o.uri
      ORDER BY f.uri"""))

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** VALUES fragment of every (router, pattern, handler) registration
    * — the SQL-side registry, built from the same vectors as the
    * Spark-side Router so both engines share one source of truth. */
  private def patsValues: String = {
    import graft.miners.RouteRegistry
    Seq("visit" -> RouteRegistry.visit,
      "map" -> RouteRegistry.map,
      "priority" -> RouteRegistry.priority).flatMap { case (rn, entries) =>
      entries.map { case (p, h) => s"('$rn','${sqlQuote(p)}','$h')" }
    }.mkString(",\n        ")
  }

  /** The x3 oracle is BUILT from [[graft.miners.RouteRegistry]] — the
    * same (pattern, handler) vectors drive the Spark-side [[graft.
    * miners.Router]] (java.util.regex) and this DuckDB SQL (RE2), so
    * the gate cross-checks the dispatch through two independent regex
    * engines from one source of truth. */
  private def routeDispatchSql: String = {
    import graft.miners.RouteRegistry
    val pats = patsValues
    val tpls = RouteRegistry.templates.zipWithIndex
      .map { case (tpl, i) => s"($i,'${sqlQuote(tpl)}')" }
      .mkString(",\n        ")
    s"""WITH tpl(tid, tpl) AS (SELECT * FROM (VALUES
        $tpls) t(tid, tpl)),
      uris AS (
        SELECT DISTINCT
          replace(tpl, '#K#', CAST(p_partkey AS VARCHAR)) AS uri
        FROM part
        JOIN tpl ON tid = p_partkey % ${RouteRegistry.templates.size}
        WHERE p_partkey < 170),
      pats AS (SELECT * FROM (VALUES
        $pats) t(router, pattern, handler)),
      matched AS (
        SELECT u.uri, p.router, CAST(COUNT(*) AS INTEGER) AS n_matches,
               MIN(p.handler) AS one_handler
        FROM uris u JOIN pats p ON regexp_full_match(u.uri, p.pattern)
        GROUP BY u.uri, p.router),
      pairs AS (
        SELECT uri, router FROM uris
        CROSS JOIN (SELECT DISTINCT router FROM pats) r)
      SELECT pr.uri, pr.router,
        COALESCE(m.n_matches, 0) AS n_matches,
        CASE WHEN m.n_matches = 1 THEN m.one_handler END AS handler,
        CASE WHEN m.n_matches IS NULL THEN 'no_route'
             WHEN m.n_matches = 1 THEN 'ok'
             ELSE 'ambiguous' END AS status
      FROM pairs pr LEFT JOIN matched m
        ON pr.uri = m.uri AND pr.router = m.router
      ORDER BY pr.uri, pr.router"""
  }

  /** X3 — route dispatch under the driver oracle: a templated URI
    * corpus (every collector ecosystem, every miner family, no-route
    * and genuinely ambiguous URIs — [[graft.miners.RouteRegistry.
    * templates]]) is dispatched through all three registries by the
    * executor-side [[graft.miners.Router]], reproducing
    * `minecode/route.py:161-185`: unique match → handler, zero →
    * NoRouteAvailable, several → MultipleRoutesDefined. The oracle SQL
    * re-derives the dispatch from the same registry vectors with
    * DuckDB's RE2 `regexp_full_match`, so Python-re (fixture), Java
    * regex (Spark), and RE2 (oracle) must all agree on every
    * corpus URI × 3 routers. */
  val routeDispatch = QueryDef(
    "x3_route_dispatch", "X3/ST2",
    "three-registry route dispatch over a templated URI corpus",
    (s, dir) => {
      import s.implicits._
      import graft.miners.RouteRegistry
      val tpls = RouteRegistry.templates
      val uris = t(s, dir, "part").filter(col("p_partkey") < 170)
        .select(
          element_at(typedLit(tpls),
            (col("p_partkey") % tpls.size).cast("int") + 1).as("tpl"),
          col("p_partkey").cast("string").as("kstr"))
        .select(expr("replace(tpl, '#K#', kstr)").as("uri"))
        .distinct()
      uris.as[String]
        .flatMap { uri =>
          Seq("map", "priority", "visit").map { rn =>
            val r = RouteRegistry.router(rn)
            val (status, handler) = r.resolveEither(uri) match {
              case Right(h)                            => ("ok", h)
              case Left(e) if e.startsWith("no route") => ("no_route", null)
              case Left(_)                             => ("ambiguous", null)
            }
            (uri, rn, r.matchCount(uri), handler, status)
          }
        }
        .toDF("uri", "router", "n_matches", "handler", "status")
        .orderBy("uri", "router")
    },
    Some(routeDispatchSql))

  /** ST9 — the crash-replay convergence claim as an oracled query: a
    * visit micro-batch that crashed after the child inserts but before
    * the visited merge is REPLAYED from the half-applied state, and the
    * result must equal the single clean application (which is what the
    * oracle computes in closed form). Idempotence rests on the
    * pending-row identity `(canonical, last_visit_date IS NULL)` being
    * unique (`minecode/models.py:450` unique_together): the re-yielded
    * children all hit the insert-if-absent anti-join, and re-claiming
    * picks the same seeds because pending children rank below every
    * seed (priority 0 < 1+k%10). Any double-insert or claim drift
    * hash-mismatches. */
  val replayIdempotent = QueryDef(
    "st9_replay_idempotent", "ST9/J12/O2",
    "crash-replay of a half-applied visit micro-batch stays exactly-once",
    (s, dir) => {
      val now = Timestamp.valueOf("2026-08-12 00:00:00")
      val nullTs = lit(null).cast("timestamp")
      val seeds = t(s, dir, "part").filter(col("p_partkey") < 30)
        .select(
          concat(lit("http://h"), (col("p_partkey") % 7).cast("string"),
            lit(".example/p"), col("p_partkey").cast("string")).as("uri"),
          (col("p_partkey") % 10 + 1).cast("int").as("priority"))
        .withColumn("canonical", col("uri"))
        .withColumn("host", regexp_extract(col("uri"), "//([^/]+)/", 1))
        .withColumn("last_visit_date", nullTs)
        .withColumn("last_map_date", nullTs)
        .withColumn("wip_date", nullTs)
        .withColumn("visit_error", lit(null).cast("string"))
      // children count derives from the seed key: even keys yield two
      val visitor: Frontier.Visitor = { u =>
        val k = u.substring(u.lastIndexOf('p') + 1).toLong
        if (k % 2 == 0) Seq(s"$u/c1", s"$u/c2") else Seq(s"$u/c1")
      }
      val f1 = Frontier.visitCycle(s, seeds, visitor, now, batchSize = 10)
        .localCheckpoint(true)
      // crash case (b) of StreamingSpec's ST9: children landed, the
      // visited-status merge did not — rebuild that torn state
      val children = f1.filter(col("last_visit_date").isNull)
        .join(seeds.select("uri"), Seq("uri"), "left_anti")
      val half = seeds.unionByName(children)
      Frontier.visitCycle(s, half, visitor, now, batchSize = 10)
        .select(col("uri"), col("priority"),
          col("last_visit_date").isNotNull.as("visited"))
        .orderBy("uri")
    },
    Some("""WITH seeds AS (
        SELECT 'http://h' || CAST(p_partkey % 7 AS VARCHAR) ||
            '.example/p' || CAST(p_partkey AS VARCHAR) AS uri,
          CAST(p_partkey % 10 + 1 AS INTEGER) AS priority,
          p_partkey AS k
        FROM part WHERE p_partkey < 30),
      claimed AS (
        SELECT * FROM seeds ORDER BY priority DESC, uri DESC LIMIT 10),
      children AS (
        SELECT uri || '/c1' AS uri FROM claimed
        UNION ALL
        SELECT uri || '/c2' FROM claimed WHERE k % 2 = 0)
      SELECT uri, priority, TRUE AS visited FROM claimed
      UNION ALL
      SELECT uri, priority, FALSE AS visited FROM seeds
      WHERE uri NOT IN (SELECT uri FROM claimed)
      UNION ALL
      SELECT uri, CAST(0 AS INTEGER) AS priority, FALSE AS visited
      FROM children
      ORDER BY uri"""))

  // --- st_seed_revisit fixtures: one deterministic URI per part key,
  // three routability families (visit+map / visit-only / unroutable)
  private def seedFamilyUri(k: Int): String = (k % 3) match {
    case 0 => s"https://repo1.maven.org/maven2/junit/junit/4.$k/junit-4.pom"
    case 1 => s"https://repo.maven.apache.org/g$k/maven-metadata.xml"
    case _ => s"https://example.org/opaque/$k.bin"
  }

  /** The seed command's static URI list — half the frontier uris plus
    * absent routable, absent unroutable, and pattern-filtered seeds. */
  private val seedRevisitSeeds: Seq[String] =
    (0 until 60 by 2).map(seedFamilyUri) ++
      (0 until 10).map(k => s"https://lib.haxe.org/p/lib$k/versions") ++
      (0 until 5).map(k => s"ftp://mirror.example/pub/f$k.tar.gz") ++
      Seq("rsync://filtered.example/x")

  /** ST2/S12/X3 — the seed command's revisit-gated insert UNDER the
    * driver oracle, with the frontier's eligibility flags computed by
    * the production path (the [[graft.functions.UriRoutable]]
    * expression over the generated registries) rather than synthetic
    * booleans: the oracle re-derives is_visitable/is_mappable per URI
    * with DuckDB's RE2 over the same pattern vectors, then mirrors the
    * pattern filter (python re.match = prefix), the pending-row block,
    * and the stale-revisit re-seed (`seed.py:42-89`,
    * `models.py:204-217`). A flag disagreement between java.util.regex
    * and RE2, or any drift in the gate logic, hash-mismatches. */
  val seedRevisit = QueryDef(
    "st_seed_revisit", "ST2/S12/X3",
    "seed insert: pattern filter, pending block, revisit gate, real flags",
    (s, dir) => {
      val now = Timestamp.valueOf("2026-08-13 00:00:00")
      val nullTs = lit(null).cast("timestamp")
      val frontier = Frontier.withRoutability(
        t(s, dir, "part").filter(col("p_partkey") < 60)
          .select(col("p_partkey").cast("int").as("k"))
          .withColumn("uri",
            when(col("k") % 3 === 0,
              concat(lit("https://repo1.maven.org/maven2/junit/junit/4."),
                col("k"), lit("/junit-4.pom")))
              .when(col("k") % 3 === 1,
                concat(lit("https://repo.maven.apache.org/g"), col("k"),
                  lit("/maven-metadata.xml")))
              .otherwise(concat(lit("https://example.org/opaque/"),
                col("k"), lit(".bin"))))
          .withColumn("priority", (col("k") % 9).cast("int"))
          .withColumn("last_visit_date",
            when(col("k") % 4 === 0, nullTs)
              .when(col("k") % 4 === 1,
                lit(Timestamp.valueOf("2026-07-01 00:00:00")))
              .when(col("k") % 4 === 2,
                lit(Timestamp.valueOf("2026-08-10 00:00:00")))
              .otherwise(lit(Timestamp.valueOf("2026-07-20 00:00:00"))))
          .withColumn("last_map_date",
            when(col("k") % 5 === 0,
              lit(Timestamp.valueOf("2026-07-02 00:00:00")))
              .otherwise(nullTs))
          .withColumn("wip_date",
            when(col("k") % 13 === 0,
              lit(Timestamp.valueOf("2026-08-12 23:00:00")))
              .otherwise(nullTs))
          .drop("k"))
      Frontier.insertSeedUris(frontier, seedRevisitSeeds, now,
          pattern = Some("(https|ftp)://"))
        .select(col("uri"), col("priority"),
          col("last_visit_date").isNotNull.as("visited"),
          col("is_visitable"), col("is_mappable"))
        .orderBy("uri", "visited")
    },
    Some {
      val seedVals = seedRevisitSeeds
        .map(u => s"('${sqlQuote(u)}')").mkString(",\n        ")
      s"""WITH f0 AS (
        SELECT CAST(p_partkey AS INTEGER) AS k,
          CASE CAST(p_partkey % 3 AS INTEGER)
            WHEN 0 THEN 'https://repo1.maven.org/maven2/junit/junit/4.'
              || CAST(p_partkey AS VARCHAR) || '/junit-4.pom'
            WHEN 1 THEN 'https://repo.maven.apache.org/g'
              || CAST(p_partkey AS VARCHAR) || '/maven-metadata.xml'
            ELSE 'https://example.org/opaque/'
              || CAST(p_partkey AS VARCHAR) || '.bin' END AS uri,
          CAST(p_partkey % 9 AS INTEGER) AS priority,
          CASE WHEN p_partkey % 4 = 0 THEN NULL
               WHEN p_partkey % 4 = 1 THEN TIMESTAMP '2026-07-01 00:00:00'
               WHEN p_partkey % 4 = 2 THEN TIMESTAMP '2026-08-10 00:00:00'
               ELSE TIMESTAMP '2026-07-20 00:00:00' END AS last_visit_date,
          CASE WHEN p_partkey % 5 = 0
            THEN TIMESTAMP '2026-07-02 00:00:00' END AS last_map_date,
          CASE WHEN p_partkey % 13 = 0
            THEN TIMESTAMP '2026-08-12 23:00:00' END AS wip_date
        FROM part WHERE p_partkey < 60),
      pats AS (SELECT * FROM (VALUES
        $patsValues) t(router, pattern, handler)),
      seeds(uri) AS (SELECT * FROM (VALUES
        $seedVals) s(uri)),
      all_uris AS (SELECT uri FROM f0 UNION SELECT uri FROM seeds),
      flags AS (
        SELECT uri,
          EXISTS(SELECT 1 FROM pats p WHERE p.router = 'visit'
            AND regexp_full_match(uri, p.pattern)) AS is_visitable,
          EXISTS(SELECT 1 FROM pats p WHERE p.router = 'map'
            AND regexp_full_match(uri, p.pattern)) AS is_mappable
        FROM all_uris),
      f AS (SELECT f0.*, fl.is_visitable, fl.is_mappable
        FROM f0 JOIN flags fl USING (uri)),
      wanted AS (
        SELECT uri FROM seeds
        WHERE regexp_matches(uri, '^(?:(https|ftp)://)')),
      pending AS (SELECT uri FROM f
        WHERE last_visit_date IS NULL AND wip_date IS NULL),
      revisitable AS (SELECT uri FROM f
        WHERE wip_date IS NULL AND last_visit_date IS NOT NULL
          AND last_visit_date < TIMESTAMP '2026-08-03 00:00:00'
          AND NOT (is_mappable AND last_map_date IS NULL)
          AND is_visitable),
      inserted AS (
        SELECT uri FROM wanted WHERE uri NOT IN (SELECT uri FROM f)
        UNION
        SELECT uri FROM wanted
        WHERE uri NOT IN (SELECT uri FROM pending)
          AND uri IN (SELECT uri FROM revisitable))
      SELECT uri, priority, last_visit_date IS NOT NULL AS visited,
        is_visitable, is_mappable
      FROM f
      UNION ALL
      SELECT i.uri, CAST(100 AS INTEGER), FALSE, fl.is_visitable,
        fl.is_mappable
      FROM inserted i JOIN flags fl USING (uri)
      ORDER BY uri, visited"""
    })

  val defs: Seq[QueryDef] = Seq(frontierSim, scanQueueReplay,
    priorityQueue, watchesDue, activityInbox, seedBootstrap,
    revisitHorizon, mapCycleReplay, routeDispatch, replayIdempotent,
    seedRevisit)
}
