package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — aggregations, including the inverted-index join
  * (J6) and Jaccard coefficient (A4) that feed the snippet-matching
  * semantics. All double outputs are produced by a single final IEEE
  * op over exact integers (see core.scala).
  */
object Aggregates {

  val a1 = QueryDef(
    "a1_status_counts", "A1",
    "group-by status counts + exact value sums (queue stats shape)",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          (asDouble(sum(cents(col("value")))) / 100.0).as("sum_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type, COUNT(*) AS n,
        COUNT(DISTINCT user_id) AS n_users,
        CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val a2 = QueryDef(
    "a2_conditional_agg", "A2",
    "conditional sum(when(...)) flag counts per group",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_final"),
          sum(when(col("o_totalprice") > 200000.0, 1L).otherwise(0L)).as("n_big"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val a3 = QueryDef(
    "a3_distinct_count", "A3",
    "per-key distinct counting (distinct fingerprints per package shape)",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id"),
    Some("""SELECT user_id, COUNT(DISTINCT event_type) AS n_types,
        COUNT(*) AS n_events
      FROM events GROUP BY user_id ORDER BY user_id"""))

  val j6a4 = QueryDef(
    "j6_a4_token_jaccard", "J6/A4",
    "inverted-index join of exploded tokens + Jaccard vs next doc",
    (s, dir) => {
      val words = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("word"))
        .filter(col("word") =!= "")
      val sizes = words.groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"))
      val a = words.alias("a")
      val b = words.alias("b")
      val inter = a.join(b,
          col("a.word") === col("b.word") &&
            col("b.doc_id") === col("a.doc_id") + 1)
        .groupBy(col("a.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_common"))
      val sa = sizes.alias("sa")
      val sb = sizes.alias("sb")
      sa.join(sb, col("sb.doc_id") === col("sa.doc_id") + 1)
        .join(inter, col("sa.doc_id") === inter("doc_id"), "left")
        .select(
          col("sa.doc_id").as("d1"),
          col("sb.doc_id").as("d2"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          (asDouble(coalesce(col("n_common"), lit(0L))) /
            asDouble(col("sa.n_words") + col("sb.n_words") -
              coalesce(col("n_common"), lit(0L)))).as("jaccard"))
        .orderBy("d1")
    },
    Some("""WITH words AS (
        SELECT doc_id, unnest(list_distinct(list_filter(
          string_split(text, ' '), w -> w <> ''))) AS word
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM words GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_id, COUNT(*) AS n_common
        FROM words a JOIN words b
          ON a.word = b.word AND b.doc_id = a.doc_id + 1
        GROUP BY a.doc_id)
      SELECT sa.doc_id AS d1, sb.doc_id AS d2,
        COALESCE(inter.n_common, 0) AS n_common,
        CAST(COALESCE(inter.n_common, 0) AS DOUBLE) /
          CAST(sa.n_words + sb.n_words - COALESCE(inter.n_common, 0) AS DOUBLE)
          AS jaccard
      FROM sizes sa
      JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
      LEFT JOIN inter ON sa.doc_id = inter.doc_id
      ORDER BY d1"""))

  val a6 = QueryDef(
    "a6_merge_latest_wins", "A6/X9",
    "field-level merge fold: per key, value from highest-precedence row",
    (s, dir) => {
      val rank = unix_timestamp(col("o_orderdate")) * 1000000 + col("o_orderkey")
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_totalprice"), rank).as("latest_price"),
          max_by(col("o_orderstatus"), rank).as("latest_status"),
          max(col("o_orderdate")).as("latest_date"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey,
        arg_max(o_totalprice, CAST(floor(epoch(o_orderdate)) AS BIGINT)*1000000 + o_orderkey) AS latest_price,
        arg_max(o_orderstatus, CAST(floor(epoch(o_orderdate)) AS BIGINT)*1000000 + o_orderkey) AS latest_status,
        MAX(o_orderdate) AS latest_date,
        COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  val a7 = QueryDef(
    "a7_latest_version", "A7/F6/O3",
    "latest version per name by natural-version order (natver_key)",
    (s, dir) => {
      val versioned = t(s, dir, "part")
        .withColumn("version",
          concat(pmod(col("p_partkey"), lit(3)).cast("string"), lit("."),
            pmod(col("p_partkey"), lit(12)).cast("string")))
      versioned
        .groupBy(col("p_name"))
        .agg(
          max_by(col("version"),
            // natural-version ordering via the custom sort-key
            // expression; unique tiebreak on p_partkey
            concat(graft.functions.GraftFunctions.natver_key(col("version")),
              lpad(col("p_partkey").cast("string"), 10, "0"))).as("latest_version"),
          count(lit(1)).as("n_versions"))
        .orderBy("p_name")
    },
    Some("""SELECT p_name,
        arg_max(CAST(p_partkey % 3 AS VARCHAR) || '.' || CAST(p_partkey % 12 AS VARCHAR),
          (p_partkey % 3) * 1000000000000 + (p_partkey % 12) * 1000000 + p_partkey)
          AS latest_version,
        COUNT(*) AS n_versions
      FROM part GROUP BY p_name ORDER BY p_name"""))

  val a8 = QueryDef(
    "a8_distinct", "A8",
    "projection distinct",
    (s, dir) =>
      t(s, dir, "documents").select("lang", "source").distinct()
        .orderBy("lang", "source"),
    Some("""SELECT DISTINCT lang, source FROM documents
      ORDER BY lang, source"""))

  val a9 = QueryDef(
    "a9_scalar_counters", "A9",
    "single-row response counters over branch predicates",
    (s, dir) =>
      t(s, dir, "events").agg(
        count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        countDistinct(col("user_id")).as("n_users")),
    Some("""SELECT COUNT(*) AS n_total,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        COUNT(DISTINCT user_id) AS n_users
      FROM events"""))

  /** ROLLUP — the multi-granularity report shape (per (lang, source),
    * per lang, grand total) in ONE pass: Spark expands grouping sets
    * inside a single hash aggregate (an Expand node feeding one
    * shuffle), not one job per level. GROUPING() flags disambiguate
    * NULL-as-subtotal from NULL data, and order the output. */
  val rollup1 = QueryDef(
    "a_rollup", "A1/A2 + grouping sets",
    "ROLLUP(lang, source): 3 aggregation levels in one pass",
    (s, dir) =>
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("chars"),
          grouping(col("lang")).as("g_lang"),
          grouping(col("source")).as("g_source"))
        .orderBy(col("g_lang"), col("g_source"), col("lang"),
          col("source")),
    Some("""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(n_chars) AS BIGINT) AS chars,
        CAST(GROUPING(lang) AS TINYINT) AS g_lang,
        CAST(GROUPING(source) AS TINYINT) AS g_source
      FROM documents
      GROUP BY ROLLUP(lang, source)
      ORDER BY g_lang, g_source, lang, source"""))

  /** PIVOT — long→wide reshaping (per-user event-type counts as
    * columns). Spark pivots with an explicit value list so the output
    * schema is static and the plan is ONE aggregate, no per-column
    * scans; the oracle is the equivalent conditional aggregation,
    * which is also exactly what Spark compiles the pivot into. */
  val pivot1 = QueryDef(
    "a_pivot_events", "A2 + pivot",
    "per-user event-type counts pivoted to columns",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
    Some("""SELECT user_id,
        CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
          AS purchase,
        CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Exact distributed quantiles (p50/p90/p99 of extended price per
    * return-flag group) via two-phase rank interpolation — the same
    * range-repartition + local row_number + broadcast-offsets shape as
    * `w6_ntile_buckets`, so a group is NEVER forced into a single
    * window partition (a per-group window over 4 groups at 100 TB
    * would put ~25 TB through one task; the range partitioner keeps
    * each group spread over all partitions and only the ≤
    * partitions×groups offset frame is single-partition). The
    * interpolation is spelled out rank-arithmetically — pos =
    * p·(n−1)+1, v_lo + (pos−⌊pos⌋)·(v_hi−v_lo) — with the identical
    * IEEE op order in Spark and the oracle (DuckDB decimal literals
    * are cast to DOUBLE), so the gate compares bit-for-bit without
    * relying on either engine's quantile_cont convention.
    */
  val percentiles = QueryDef(
    "a_percentiles", "A1/W2 + OLAP quantiles",
    "exact p50/p90/p99 per group via two-phase rank interpolation",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.expressions.Window
      val scored = par(t(s, dir, "lineitem"))
        .select(col("l_returnflag").as("g1"), col("l_linestatus").as("g2"),
          col("l_extendedprice").as("v"),
          col("l_orderkey"), col("l_linenumber"))
        .repartitionByRange(col("g1"), col("g2"), col("v"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("pid", spark_partition_id())
      val counts = scored.groupBy("pid", "g1", "g2")
        .agg(count(lit(1)).as("cnt"))
      // the offsets window runs over ≤ partitions×groups rows —
      // single-partition is correct THERE (the frame is tiny)
      // one tiny frame carries both the per-partition prefix offset
      // and the per-group total, so the big ranked frame needs a
      // single broadcast join
      val gw = Window.partitionBy("g1", "g2")
      val offsets = counts
        .withColumn("offset",
          coalesce(sum("cnt").over(gw.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum("cnt").over(gw))
        .select("pid", "g1", "g2", "offset", "n")
      val lw = Window.partitionBy(col("pid"), col("g1"), col("g2"))
        .orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))
      def pos(p: Double): Column = lit(p) * (col("n") - lit(1)) + lit(1)
      val ranked = scored
        .withColumn("local_rn", row_number().over(lw))
        .join(broadcast(offsets), Seq("pid", "g1", "g2"))
        .withColumn("rn", col("offset") + col("local_rn"))
      val marks = ranked.groupBy("g1", "g2", "n").agg(
        max(when(col("rn") === floor(pos(0.5)), col("v"))).as("lo50"),
        max(when(col("rn") === ceil(pos(0.5)), col("v"))).as("hi50"),
        max(when(col("rn") === floor(pos(0.9)), col("v"))).as("lo90"),
        max(when(col("rn") === ceil(pos(0.9)), col("v"))).as("hi90"),
        max(when(col("rn") === floor(pos(0.99)), col("v"))).as("lo99"),
        max(when(col("rn") === ceil(pos(0.99)), col("v"))).as("hi99"))
      def interp(p: Double, lo: String, hi: String): Column =
        col(lo) + (pos(p) - floor(pos(p))) * (col(hi) - col(lo))
      marks.select(
        col("g1").as("l_returnflag"), col("g2").as("l_linestatus"),
        col("n"),
        interp(0.5, "lo50", "hi50").as("p50"),
        interp(0.9, "lo90", "hi90").as("p90"),
        interp(0.99, "lo99", "hi99").as("p99"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""WITH ranked AS (
        SELECT l_returnflag AS g1, l_linestatus AS g2,
          l_extendedprice AS v,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
        FROM lineitem),
      marks AS (
        SELECT g1, g2, n,
          MAX(CASE WHEN rn = CAST(FLOOR(CAST(0.5 AS DOUBLE)*(n-1)+1)
            AS BIGINT) THEN v END) AS lo50,
          MAX(CASE WHEN rn = CAST(CEIL(CAST(0.5 AS DOUBLE)*(n-1)+1)
            AS BIGINT) THEN v END) AS hi50,
          MAX(CASE WHEN rn = CAST(FLOOR(CAST(0.9 AS DOUBLE)*(n-1)+1)
            AS BIGINT) THEN v END) AS lo90,
          MAX(CASE WHEN rn = CAST(CEIL(CAST(0.9 AS DOUBLE)*(n-1)+1)
            AS BIGINT) THEN v END) AS hi90,
          MAX(CASE WHEN rn = CAST(FLOOR(CAST(0.99 AS DOUBLE)*(n-1)+1)
            AS BIGINT) THEN v END) AS lo99,
          MAX(CASE WHEN rn = CAST(CEIL(CAST(0.99 AS DOUBLE)*(n-1)+1)
            AS BIGINT) THEN v END) AS hi99
        FROM ranked GROUP BY g1, g2, n)
      SELECT g1 AS l_returnflag, g2 AS l_linestatus, n,
        lo50 + ((CAST(0.5 AS DOUBLE)*(n-1)+1)
          - FLOOR(CAST(0.5 AS DOUBLE)*(n-1)+1)) * (hi50 - lo50) AS p50,
        lo90 + ((CAST(0.9 AS DOUBLE)*(n-1)+1)
          - FLOOR(CAST(0.9 AS DOUBLE)*(n-1)+1)) * (hi90 - lo90) AS p90,
        lo99 + ((CAST(0.99 AS DOUBLE)*(n-1)+1)
          - FLOOR(CAST(0.99 AS DOUBLE)*(n-1)+1)) * (hi99 - lo99) AS p99
      FROM marks ORDER BY l_returnflag, l_linestatus"""))

  /** Window funnel (the ClickHouse `windowFunnel` shape): per user,
    * the earliest view → first click after it → first purchase after
    * that, all inside a 7-day window from the view; the furthest
    * stage reached is reported. Expressed as a cascade of three
    * filtered MIN aggregations, each an equi-join + hash agg on
    * user_id — every stage hash-partitions on the same key, so at
    * scale the shuffles collapse onto one exchange (AQE reuses the
    * partitioning) and no per-user event list is ever materialized.
    */
  val funnel = QueryDef(
    "a_window_funnel", "A2/W1 + OLAP funnel",
    "view→click→purchase within 7 days per user, furthest stage",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
      val s2 = ev.join(s1, Seq("user_id"))
        .filter(col("event_type") === "click" &&
          col("ts") >= col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val s3 = ev.join(s1, Seq("user_id")).join(s2, Seq("user_id"))
        .filter(col("event_type") === "purchase" &&
          col("ts") >= col("t2") &&
          col("ts") <= col("t1") + expr("INTERVAL 7 DAYS"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          when(col("t3").isNotNull, lit(3))
            .when(col("t2").isNotNull, lit(2))
            .when(col("t1").isNotNull, lit(1))
            .otherwise(lit(0)).as("stage"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
        SELECT user_id, event_type, ts FROM events),
      s1 AS (
        SELECT user_id, MIN(ts) FILTER (event_type = 'view') AS t1
        FROM ev GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM ev e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts >= s1.t1
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM ev e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id)
      SELECT s1.user_id, t1, t2, t3,
        CASE WHEN t3 IS NOT NULL THEN 3
             WHEN t2 IS NOT NULL THEN 2
             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      ORDER BY user_id"""))

  /** Cohort retention: users grouped by the week of their first
    * signup, counted as retained in every later week they show any
    * activity. Two hash aggregations and one equi-join, all keyed on
    * user_id / (cohort, offset) — the activity frame is
    * (user, week)-distinct BEFORE the join, so the join input is
    * bounded by users×weeks, not by raw event volume. Week offsets
    * are exact integer day arithmetic on week-truncated stamps (no
    * engine datediff-boundary conventions involved). */
  val retention = QueryDef(
    "a_retention_cohorts", "A1/A3 + OLAP retention",
    "signup-week cohorts × active-week offsets → retained user counts",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      activity.join(cohorts, Seq("user_id"))
        .filter(col("w") >= col("cw"))
        .groupBy(col("cw"), expr("datediff(w, cw) div 7")
          .cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cw").as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH cohorts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
      activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        FROM events)
      SELECT cw AS cohort_week,
        CAST(date_diff('day', cw, w) // 7 AS INTEGER) AS week_offset,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM activity JOIN cohorts USING (user_id)
      WHERE w >= cw
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Data-quality expectation profile — the validation pass a
    * pipeline runs BEFORE committing a corpus snapshot to training
    * (the Deequ/Great-Expectations shape): row count, null/blank
    * counts, metadata-consistency violations (n_chars must equal the
    * actual text length), key-uniqueness violations, domain
    * cardinality, and value ranges, plus the boolean gates a scheduler
    * branches on. Everything reduces in ONE aggregation — count/sum
    * partials combine map-side; the two exact COUNT(DISTINCT)s expand
    * the input ×3 (Spark's Expand) but stay a single shuffle. At
    * 100 TB the distincts are the only non-O(1)-state aggregates —
    * swap them for the HLL sketch the `a_sketch_distinct` gate
    * validates when exactness stops mattering. */
  val dataQuality = QueryDef(
    "a_data_quality", "A9/A3 + LLM-pipeline: expectation validation",
    "one-pass corpus profile: nulls, consistency, uniqueness, ranges",
    (s, dir) =>
      t(s, dir, "documents")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
          sum(when(trim(col("text")) === "", 1L).otherwise(0L))
            .as("n_blank_text"),
          sum(when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L))
            .as("n_len_mismatch"),
          countDistinct(col("doc_id")).as("n_distinct_ids"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .select(col("*"),
          (col("n_distinct_ids") === col("n_rows")).as("ok_ids_unique"),
          (col("n_len_mismatch") === 0).as("ok_len_consistent")),
    Some("""WITH p AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null_text,
          CAST(SUM(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_blank_text,
          CAST(SUM(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_len_mismatch,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_ids,
          CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
          MIN(n_chars) AS min_chars,
          MAX(n_chars) AS max_chars
        FROM documents)
      SELECT *, n_distinct_ids = n_rows AS ok_ids_unique,
        n_len_mismatch = 0 AS ok_len_consistent
      FROM p"""))

  /** Incremental view maintenance — the 100 TB refresh pattern: a
    * materialized per-source aggregate is brought from snapshot v1
    * to v2 by merging ONLY the CDC delta (adds +m, removes −m,
    * in-place modifications m₂−m₁) into the stored v1 aggregate,
    * never rescanning the corpus. Snapshots reuse s_snapshot_diff's
    * construction (17/19-modular membership, 13-modular content
    * change — v1's changed rows carry +7 chars so modifications
    * actually move the sum). The oracle is the FRESH v2 aggregate:
    * hash equality proves the maintained view is exactly the
    * recomputed one, which is the whole IVM correctness claim.
    * Count and sum are self-maintainable aggregates; the merge is
    * two tiny per-source frames full-outer joined. */
  val incrementalAgg = QueryDef(
    "a_incremental_agg", "A1/S10-CDC: incremental view maintenance",
    "v1 aggregate + CDC delta merge == fresh v2 aggregate (per source)",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("source"),
          (col("n_chars") +
            when(col("doc_id") % 13 === 0, 7L).otherwise(0L)).as("m"))
      val v2 = docs.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"), col("source"), col("n_chars").as("m"))
      val aggV1 = v1.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("m").as("sm"))
      val delta = v1.select(col("doc_id"), col("source").as("src1"),
          col("m").as("m1"))
        .join(v2.select(col("doc_id"), col("source").as("src2"),
          col("m").as("m2")), Seq("doc_id"), "full_outer")
        .select(coalesce(col("src2"), col("src1")).as("source"),
          when(col("m1").isNull, 1L).when(col("m2").isNull, -1L)
            .otherwise(0L).as("dn"),
          (coalesce(col("m2"), lit(0L)) - coalesce(col("m1"), lit(0L)))
            .as("dm"))
        .groupBy("source").agg(sum("dn").as("dn"), sum("dm").as("dm"))
      aggV1.join(delta, Seq("source"), "full_outer")
        .select(col("source"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_docs"),
          (coalesce(col("sm"), lit(0L)) + coalesce(col("dm"), lit(0L)))
            .as("sum_chars"))
        // IVM delete-group rule: a source whose documents are ALL
        // removed in v2 must drop out of the maintained view (the
        // fresh recompute has no row for it), not linger as n_docs=0
        .filter(col("n_docs") > 0)
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents WHERE doc_id % 19 <> 0
      GROUP BY source ORDER BY source"""))

  val defs: Seq[QueryDef] =
    Seq(a1, a2, a3, j6a4, a6, a7, a8, a9, rollup1, pivot1, percentiles,
      funnel, retention, dataQuality, incrementalAgg)
}
