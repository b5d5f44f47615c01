package graft.ops

import graft._
import graft.core._
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.3 — joins. Dimension sides are broadcast explicitly;
  * fact-fact joins shuffle on their keys and rely on AQE for skew.
  */
object Joins {

  val j1 = QueryDef(
    "j1_fk_join", "J1",
    "FK equi-join fact→dim (Resource→Package shape), dim broadcast",
    (s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      val ord = t(s, dir, "orders")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "o_orderstatus", "o_orderpriority")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
        o_orderstatus, o_orderpriority
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity >= 45
      ORDER BY l_orderkey, l_linenumber"""))

  val j2 = QueryDef(
    "j2_prefetch_agg", "J2",
    "eager 1-N join + per-parent aggregation (prefetch_related shape)",
    (s, dir) => {
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      ord.join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderkey"), col("o_orderstatus"))
        .agg(
          count(col("l_linenumber")).as("n_lines"),
          coalesce(sum(col("l_quantity").cast("long")), lit(0L)).as("sum_qty"))
        .filter(col("n_lines") >= 6)
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
        COUNT(l_linenumber) AS n_lines,
        CAST(COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS sum_qty
      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_orderstatus
      HAVING COUNT(l_linenumber) >= 6
      ORDER BY o_orderkey"""))

  val j3 = QueryDef(
    "j3_bridge_join", "J3",
    "two equi-joins through a bridge (M2M package↔set shape)",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val nat = broadcast(t(s, dir, "nation"))
      val reg = broadcast(t(s, dir, "region"))
      cust.join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          countDistinct(col("n_name")).as("n_nations"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name, COUNT(*) AS n_customers,
        COUNT(DISTINCT n_name) AS n_nations
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  val j4 = QueryDef(
    "j4_exact_hash_semijoin", "J4",
    "exact checksum batch lookup: broadcast query-side semi-join on md5",
    (s, dir) => {
      val keys = Seq(
        "6a61f20d762017bbefbe4a16efa3a85b", // md5('cold widget')
        "dc272844a672b08bd588bc8950a448cb", // md5('blue rod')
        "073b9aa31eeaba8602492c5f1f296932") // md5('large bolt')
      val keyDf = s.createDataFrame(
        s.sparkContext.parallelize(keys.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType))))
      t(s, dir, "part")
        .withColumn("fp", md5(col("p_name")))
        .join(broadcast(keyDf), col("fp") === col("k"), "left_semi")
        .select("p_partkey", "p_name", "fp")
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey, p_name, md5(p_name) AS fp FROM part
      WHERE md5(p_name) IN ('6a61f20d762017bbefbe4a16efa3a85b',
        'dc272844a672b08bd588bc8950a448cb',
        '073b9aa31eeaba8602492c5f1f296932')
      ORDER BY p_partkey"""))

  val j7 = QueryDef(
    "j7_path_suffix_join", "J7/F9",
    "path-suffix generator (explode) + equi-join on suffix",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("path",
          concat(col("source"), lit("/doc"), col("doc_id").cast("string")))
      docs
        .withColumn("suffix", explode(expr(
          """transform(sequence(1, size(split(path, '/'))),
               i -> array_join(slice(split(path, '/'), i,
                                     size(split(path, '/')) - i + 1), '/'))""")))
        // every doc_id ending in 7 (10% of corpus) plus one two-level
        // suffix: ~50 expected rows at sf0.01 instead of the vacuous 2
        .filter(col("suffix").rlike("^doc[0-9]*7$") ||
          col("suffix") === "src3/doc3")
        .select("doc_id", "path", "suffix")
        .orderBy("doc_id", "suffix")
    },
    Some("""WITH p AS (
        SELECT doc_id, source || '/doc' || CAST(doc_id AS VARCHAR) AS path,
               string_split(source || '/doc' || CAST(doc_id AS VARCHAR), '/') AS parts
        FROM documents),
      sfx AS (
        SELECT doc_id, path,
          unnest(list_transform(range(1, len(parts) + 1),
            i -> array_to_string(parts[i:], '/'))) AS suffix
        FROM p)
      SELECT doc_id, path, suffix FROM sfx
      WHERE regexp_matches(suffix, '^doc[0-9]*7$') OR suffix = 'src3/doc3'
      ORDER BY doc_id, suffix"""))

  val j8 = QueryDef(
    "j8_duplicate_selfjoin", "J8",
    "duplicate-candidate self-join on shared signature, smaller id wins",
    (s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      val a = d.alias("a")
      val b = d.alias("b")
      a.join(b,
          col("a.lang") === col("b.lang") &&
            col("a.n_chars") === col("b.n_chars") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("keep_id"), col("b.doc_id").as("dup_id"),
          col("a.lang").as("lang"), col("a.n_chars").as("n_chars"))
        .orderBy("keep_id", "dup_id")
    },
    Some("""SELECT a.doc_id AS keep_id, b.doc_id AS dup_id,
        a.lang AS lang, a.n_chars AS n_chars
      FROM documents a JOIN documents b
        ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
      ORDER BY keep_id, dup_id"""))

  val j9 = QueryDef(
    "j9_earliest_per_key", "J9/W1",
    "earliest-row-per-group via window rank (correlated-subquery shape)",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) WHERE rn = 1
      ORDER BY o_custkey"""))

  val j12 = QueryDef(
    "j12_anti_join", "J12/U3",
    "insert-if-absent anti-join (frontier dedup shape)",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      // anti-join against high-value orders: every sf0.01 customer has
      // SOME order, so the unfiltered form returns 0 rows and the gate
      // is vacuous — the threshold makes the expected set non-empty
      // (202 rows at sf0.01) so a wrong join type actually fails
      val ord = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey"""))

  val j13 = QueryDef(
    "j13_range_join", "J13",
    "equi-join with conjunctive range predicate (stays a hash join)",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = broadcast(t(s, dir, "part"))
      li.join(part,
          col("l_partkey") === col("p_partkey") &&
            col("l_quantity") >= col("p_size") - 5 &&
            col("l_quantity") <= col("p_size") + 5)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_in_band"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, COUNT(*) AS n_in_band,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
        AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
      GROUP BY p_brand ORDER BY p_brand"""))

  /** As-of join — the temporal "latest left row at or before each
    * right row" lookup (kdb aj / pandas merge_asof / Flink temporal
    * join), an operator Spark lacks natively. The scalable plan is
    * NOT a range join (whose candidate set explodes with history
    * depth): tag both sides, UNION them, and run one per-key window
    * with `last(_, ignoreNulls)` over a rows-frame — a single shuffle
    * on the key, cost linear in total events, no pair materialization
    * at any history depth. Ordering (ts, tag, event_id) is total, so
    * an equal-timestamp click sorts before the purchase ("at or
    * before") and both engines resolve ties identically.
    *
    * Here: each purchase event picks up the same user's most recent
    * click at or before it; gap_us is the exact integer microsecond
    * lag (epoch-µs subtraction — no float time arithmetic). */
  val j14 = QueryDef(
    "j14_asof_join", "J13 + LLM-pipeline temporal: as-of join",
    "purchase ← latest prior click per user via union + last(ignoreNulls)",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(0).as("tag"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(1).as("tag"), lit(null).cast("long").as("click_id"),
          lit(null).cast("timestamp").as("click_ts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("asof_click_id",
          last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("asof_click_ts",
          last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("asof_click_id"),
          (unix_micros(col("ts")) -
            unix_micros(col("asof_click_ts"))).as("gap_us"))
        .orderBy("purchase_id")
    },
    Some("""WITH u AS (
        SELECT user_id, ts, event_id, 0 AS tag,
          event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS tag,
          NULL AS click_id, NULL AS click_ts
        FROM events WHERE event_type = 'purchase'),
      m AS (
        SELECT user_id, ts, event_id, tag,
          LAST_VALUE(click_id IGNORE NULLS) OVER w AS asof_click_id,
          LAST_VALUE(click_ts IGNORE NULLS) OVER w AS asof_click_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        asof_click_id,
        epoch_us(ts) - epoch_us(asof_click_ts) AS gap_us
      FROM m WHERE tag = 1
      ORDER BY purchase_id"""))

  /** Explicit skew-salted shuffle join — the manual counterpart to
    * AQE's skew-join splitting, for the case AQE cannot fix: a HOT
    * KEY on the build side of a shuffled join (one task receives the
    * whole key-0 partition). A synthetic 70%-hot key
    * (l_partkey%10<7 → key 0) reproduces the pathology; the plan
    * salts the probe side with a deterministic 8-way hash and
    * explodes the dim side 8×, so the join shuffles on (key, salt)
    * and the hot key spreads over 8 tasks. The dim side takes a
    * SHUFFLE_HASH hint — broadcast would hide the skew this operator
    * exists to demonstrate; at 100 TB a dim too big to broadcast is
    * exactly where manual salting earns its keep. The final per-key
    * aggregate is two-phase automatically (partials per (key,salt)
    * task, merge on key). Semantics = plain join+groupBy, which is
    * the oracle. */
  val j15 = QueryDef(
    "j15_salted_skew_join", "J1/A1 + skew salting at scale",
    "hot-key fact⋈dim via 8-way salt replication (AQE-independent)",
    (s, dir) => {
      val S = 8
      val fact = t(s, dir, "lineitem")
        .withColumn("skew_key",
          when(pmod(col("l_partkey"), lit(10)) < 7, lit(0L))
            .otherwise(col("l_partkey")))
        .withColumn("salt",
          pmod(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(S)) + S, lit(S)))
      val dim = t(s, dir, "part")
        .select(col("p_partkey").as("skew_key"), col("p_name"))
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      fact.join(dim.hint("SHUFFLE_HASH"), Seq("skew_key", "salt"))
        .groupBy("skew_key", "p_name")
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"))
        .orderBy("skew_key")
    },
    Some("""WITH f AS (
        SELECT CASE WHEN l_partkey % 10 < 7 THEN 0 ELSE l_partkey END
          AS skew_key, l_extendedprice
        FROM lineitem)
      SELECT f.skew_key, p.p_name, COUNT(*) AS n_items,
        CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
          AS BIGINT) / 100.0 AS revenue
      FROM f JOIN part p ON p.p_partkey = f.skew_key
      GROUP BY 1, 2 ORDER BY skew_key"""))

  /** Batch twin of the streaming attribution join
    * ([[graft.streaming.EventStream.attributeClicks]], spec-driven
    * with MemoryStreams): every click joined to the same user's
    * views at most 30 minutes before it. Equi-key on user plus a
    * time-range predicate — the shape Spark executes as a
    * hash-partitioned join with the range filter applied post-match,
    * and at stream scale with watermark-bounded state. The oracle
    * pins the interval semantics (inclusive both ends) the streaming
    * spec asserts. */
  val j17 = QueryDef(
    "j17_attribution_join", "J13 + streaming-twin interval attribution",
    "clicks joined to same-user views within the preceding 30 minutes",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("vts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("cuser"), col("ts").as("cts"))
      views.join(clicks,
          col("user_id") === col("cuser") &&
            col("cts") >= col("vts") &&
            col("cts") <= col("vts") + expr("interval 30 minutes"))
        .select(col("user_id"), col("view_id"), col("click_id"),
          (unix_timestamp(col("cts")) - unix_timestamp(col("vts")))
            .as("secs_to_click"))
        .orderBy("user_id", "view_id", "click_id")
    },
    Some("""SELECT v.user_id, v.event_id AS view_id,
        c.event_id AS click_id,
        CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS secs_to_click
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = v.user_id
        AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
      ORDER BY v.user_id, view_id, click_id"""))

  val defs: Seq[QueryDef] =
    Seq(j1, j2, j3, j4, j7, j8, j9, j12, j13, j14, j15, j17)
}
