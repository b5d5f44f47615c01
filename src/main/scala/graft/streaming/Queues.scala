package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
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

  /** Claim the oldest unprocessed requests, FIFO by (request_date,
    * uri). */
  def claimPriorityRequests(pending: DataFrame, batchSize: Int): DataFrame =
    pending.filter(col("processed_date").isNull &&
        col("wip_date").isNull)
      .orderBy(col("request_date"), col("uri"))
      .limit(batchSize)

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
    * "create"-type events as PackageActivity rows. */
  def appendActivities(inbox: DataFrame, events: DataFrame): DataFrame =
    inbox.unionByName(
      events.filter(lower(col("activity_type")) === "create")
        .select(col("actor"), col("payload"), col("received_date")))
}
