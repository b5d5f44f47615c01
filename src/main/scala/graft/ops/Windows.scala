package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.5 — window functions: ranking (row_number / rank with
  * ties), top-N per group, duplicate preference, and the span-merge
  * (gaps-and-islands) grouping behind snippet-match span merging.
  */
object Windows {

  val w2 = QueryDef(
    "w2_topn_per_group", "W2",
    "top-3 rows per status by ordered rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rn")
    },
    Some("""SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_orderstatus
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3
      ORDER BY o_orderstatus, rn"""))

  val w3 = QueryDef(
    "w3_rank_keep_ties", "W3",
    "rank()=1 keeps all rows tied on the best key (match ranking shape)",
    (s, dir) => {
      val w = Window.partitionBy(col("p_type")).orderBy(desc("p_size"))
      t(s, dir, "part")
        .withColumn("rk", rank().over(w))
        .filter(col("rk") === 1)
        .select("p_type", "p_partkey", "p_name", "p_size")
        .orderBy("p_type", "p_partkey")
    },
    Some("""SELECT p_type, p_partkey, p_name, p_size FROM (
        SELECT p_type, p_partkey, p_name, p_size,
          RANK() OVER (PARTITION BY p_type ORDER BY p_size DESC) AS rk
        FROM part) WHERE rk = 1
      ORDER BY p_type, p_partkey"""))

  val w4 = QueryDef(
    "w4_span_merge", "W4/X4",
    "gaps-and-islands session merge per user (span-merge semantics)",
    (s, dir) => {
      val gapMs = 1800L * 1000 // merge events within 30 min
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("prev_ms", lag(col("ms"), 1).over(w))
        .withColumn("new_island",
          when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("new_island")).over(wRun))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "island")
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
      flagged AS (
        SELECT user_id, event_id, ms,
          CASE WHEN lag(ms) OVER w IS NULL
                 OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_island
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      islands AS (
        SELECT user_id, ms,
          CAST(SUM(new_island) OVER (PARTITION BY user_id ORDER BY ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        FROM flagged)
      SELECT user_id, island, MIN(ms) AS start_ms, MAX(ms) AS end_ms,
        COUNT(*) AS n_events
      FROM islands GROUP BY user_id, island
      ORDER BY user_id, island"""))

  val w5 = QueryDef(
    "w5_duplicate_preference", "W5/J8",
    "duplicate flagging: preferred row per signature group wins",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
      t(s, dir, "documents")
        .withColumn("keeper_id", first(col("doc_id")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("keeper_id"), (col("rn") > 1).as("is_duplicate"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars,
        FIRST_VALUE(doc_id) OVER w AS keeper_id,
        (ROW_NUMBER() OVER w > 1) AS is_duplicate
      FROM documents
      WINDOW w AS (PARTITION BY lang, n_chars ORDER BY doc_id)
      ORDER BY doc_id"""))

  /** Quantile bucketing — how a corpus picks quality cutoffs ("keep
    * the top 3 deciles by quality score"). A naive global
    * `Window.orderBy` is a SINGLE-PARTITION sort in Spark — the
    * classic scale anti-pattern — so the global rank is built with
    * the two-phase distributed pattern (as in t_seq_pack's prefix
    * sum): range-repartition on the total order (score, doc_id — ties
    * broken), per-partition local row_number, tiny per-partition
    * count frame → broadcast prefix offsets, global rank = offset +
    * local rank. Decile = (rank−1)·10 div n + 1, the same integer
    * formula in both engines (no reliance on engine ntile remainder
    * conventions). Score is integer micro-units — no float compare.
    */
  val w6 = QueryDef(
    "w6_ntile_buckets", "W2/W3 + LLM-pipeline quality cutoffs",
    "deciles over total-ordered quality score via two-phase rank",
    (s, dir) => {
      val scored = t(s, dir, "documents")
        .withColumn("w", filter(split(col("text"), " "), x => x =!= ""))
        .select(col("doc_id"), col("n_chars"),
          (size(col("w")) * lit(1000000L) /
            greatest(col("n_chars"), lit(1L))).cast("long").as("score"))
        .repartitionByRange(col("score"), col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val counts = scored.groupBy("pid")
        .agg(count(lit(1)).as("cnt"))
      // the offsets window runs over ≤ numShufflePartitions rows —
      // single-partition is correct THERE (the frame is tiny)
      val offsets = counts
        .withColumn("offset",
          coalesce(sum("cnt").over(Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = counts.agg(sum("cnt").as("n_total"))
      val lw = Window.partitionBy(col("pid"))
        .orderBy(col("score"), col("doc_id"))
      scored
        .withColumn("local_rn", row_number().over(lw))
        .join(broadcast(offsets.select("pid", "offset")), "pid")
        .crossJoin(broadcast(tot))
        .withColumn("rnk", col("offset") + col("local_rn"))
        .withColumn("decile",
          expr("CAST((rnk - 1) * 10 div n_total AS INT) + 1"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          min("score").as("min_score"),
          max("score").as("max_score"),
          sum(col("n_chars")).as("chars"))
        .orderBy("decile")
    },
    Some("""WITH sc AS (
        SELECT doc_id, n_chars,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
            * 1000000 // greatest(n_chars, 1) AS BIGINT) AS score
        FROM documents),
      d AS (
        SELECT n_chars, score,
          CAST((ROW_NUMBER() OVER (ORDER BY score, doc_id) - 1) * 10
            // (SELECT COUNT(*) FROM sc) AS INTEGER) + 1 AS decile
        FROM sc)
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
        MIN(score) AS min_score, MAX(score) AS max_score,
        CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM d GROUP BY decile ORDER BY decile"""))

  /** W2's top-n-per-group answered WITHOUT a rank window: the
    * [[graft.functions.TopKAgg]] mergeable aggregate keeps ≤ k rows
    * of state per partition and combines map-side, so the shuffle
    * carries k·groups·tasks rows while the window formulation
    * shuffles (and sorts) every row of every group — the shape that
    * matters when one group holds a billion rows. Same answer as a
    * ROW_NUMBER mirror, which is the oracle. */
  val wTopkAgg = QueryDef(
    "w_topk_agg", "W2 via mergeable UDAF (map-side top-k state)",
    "top-3 lineitems per returnflag via bounded mergeable aggregate",
    (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(graft.functions.TopKAgg.top_k(cents(col("l_extendedprice")),
          col("l_orderkey"), col("l_linenumber"), 3).as("top"))
        .select(col("l_returnflag"), posexplode(col("top")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rank"),
          (col("col.c") / 100.0).as("price"),
          col("col.ok").as("l_orderkey"), col("col.ln").as("l_linenumber"))
        .orderBy("l_returnflag", "rank")
    },
    Some("""WITH c AS (
        SELECT l_returnflag,
          CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
          l_orderkey, l_linenumber
        FROM lineitem),
      r AS (
        SELECT l_returnflag, cents, l_orderkey, l_linenumber,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY cents DESC, l_orderkey, l_linenumber) AS rank
        FROM c)
      SELECT l_returnflag, rank, cents / 100.0 AS price,
        l_orderkey, l_linenumber
      FROM r WHERE rank <= 3 ORDER BY l_returnflag, rank"""))

  val defs: Seq[QueryDef] = Seq(w2, w3, w4, w5, w6, wTopkAgg)
}
