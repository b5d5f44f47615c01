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
          val out = ScanQueue.applySequence(uuid,
            ScanQueue.ScanState(uuid, ScanQueue.New.code, ""),
            evs.iterator.map(e =>
              ScanQueue.ScanEvent(uuid, e, s"$e@$uuid")))
          (uuid, out.last.status, out.size, out.last.detail)
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

  val defs: Seq[QueryDef] = Seq(frontierSim, scanQueueReplay)
}
