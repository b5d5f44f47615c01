package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The scan-queue state machine (ST4) — the reference's 8-state
  * ScannableURI lifecycle (`minecode/models.py:648-808`, states at
  * `:702-724`: new → submitted → in-progress → completed → indexed,
  * with failed / timeout / index-failed terminals) re-expressed as
  * `flatMapGroupsWithState` keyed by scan uuid, with processing-time
  * timeouts standing in for the reference's 1200 s RQ job timeout
  * (`minecode/models.py:806`).
  */
object ScanQueue {

  sealed trait Status { def code: Int }
  case object New extends Status { val code = 0 }
  case object Submitted extends Status { val code = 1 }
  case object InProgress extends Status { val code = 2 }
  case object Completed extends Status { val code = 3 }
  case object Indexed extends Status { val code = 4 }
  case object Failed extends Status { val code = 5 }
  case object TimedOut extends Status { val code = 6 }
  case object IndexFailed extends Status { val code = 7 }

  /** Incoming worker events for a scan request. */
  final case class ScanEvent(uuid: String, event: String, detail: String)

  /** Current state snapshot per scan uuid. */
  final case class ScanState(uuid: String, status: Int, detail: String)

  val TimeoutMs: Long = 1200L * 1000 // scan-processing timeout, ST4

  /** Legal transitions; anything else is ignored (the reference's
    * workers guard the same way via queryset filters on scan_status). */
  private val transitions: Map[(Int, String), Status] = Map(
    (New.code, "submit") -> Submitted,
    (Submitted.code, "start") -> InProgress,
    (InProgress.code, "scan_done") -> Completed,
    (Completed.code, "index_done") -> Indexed,
    (New.code, "fail") -> Failed,
    (Submitted.code, "fail") -> Failed,
    (InProgress.code, "fail") -> Failed,
    (Completed.code, "index_fail") -> IndexFailed)

  /** Pure guarded-transition fold shared by the streaming machine and
    * the batch replay query (`st_scan_queue`): apply events in order
    * from `start`, ignoring illegal transitions; returns every emitted
    * state snapshot. */
  def applySequence(uuid: String, start: ScanState,
      events: Iterator[ScanEvent]): Seq[ScanState] = {
    var cur = start
    val emitted = Seq.newBuilder[ScanState]
    events.foreach { ev =>
      transitions.get((cur.status, ev.event)).foreach { next =>
        cur = ScanState(uuid, next.code, ev.detail)
        emitted += cur
      }
    }
    emitted.result()
  }

  def applyEvents(withTimeouts: Boolean,
      timeoutMs: Long = TimeoutMs)(uuid: String,
      events: Iterator[ScanEvent],
      state: GroupState[ScanState]): Iterator[ScanState] = {
    if (state.hasTimedOut) {
      val cur = state.get
      val out = cur.copy(status = TimedOut.code, detail = "processing timeout")
      state.remove()
      return Iterator(out)
    }
    val start = state.getOption.getOrElse(ScanState(uuid, New.code, ""))
    val emitted = applySequence(uuid, start, events)
    val cur = emitted.lastOption.getOrElse(start)
    val terminal = Set(Indexed.code, Failed.code, TimedOut.code,
      IndexFailed.code)
    if (terminal.contains(cur.status)) state.remove()
    else {
      state.update(cur)
      if (withTimeouts) state.setTimeoutDuration(timeoutMs)
    }
    emitted.iterator
  }

  /** Wire the state machine over a (possibly streaming) event Dataset.
    * `withTimeouts=true` arms the 1200 s processing-time timeout (the
    * production setting); `false` runs without the timeout clock so
    * bounded test streams drain and stop. */
  def run(spark: SparkSession, events: Dataset[ScanEvent],
      withTimeouts: Boolean = true,
      timeoutMs: Long = TimeoutMs): Dataset[ScanState] = {
    import spark.implicits._
    val timeoutConf =
      if (withTimeouts) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.uuid)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        applyEvents(withTimeouts, timeoutMs))
  }
}
