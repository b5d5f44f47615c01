package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-pattern operators: explicit skew mitigation (salting) and
  * embedding-space near-duplicate detection. AQE handles most skew at
  * runtime; the salted plan is the hand-built variant for aggregations
  * whose hot keys are known in advance (a 100 TB pipeline staple).
  */
object ScaleOps {

  /** Two-phase salted aggregation: the returnflag distribution is
    * heavily skewed (3 values over the whole table), so a naive
    * groupBy sends each key to one reducer. Phase 1 groups on
    * (key, salt) — fan-out 16 — phase 2 merges the partials. The
    * result is identical to the direct groupBy, which is what the
    * oracle checks. */
  val saltedAgg = QueryDef(
    "a_salted_agg", "A1 + skew salting",
    "two-phase (salt, merge) aggregation over a skewed key",
    (s, dir) => {
      val salted = t(s, dir, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      val partial = salted
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(
          sum(col("l_quantity").cast("long")).as("p_qty"),
          sum(cents(col("l_extendedprice"))).as("p_px"),
          count(lit(1)).as("p_n"))
      partial
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("p_qty")).as("sum_qty"),
          (asDouble(sum(col("p_px"))) / 100.0).as("sum_price"),
          sum(col("p_n")).as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0
          AS sum_price,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Embedding-cosine near-duplicate pairs through the LSH buckets:
    * same sign-bit bucket, exact quantized cosine above threshold.
    * The synthetic embeddings top out near cosine 0.5, so the 0.25
    * threshold keeps a meaningful survivor set (54 pairs of ~500
    * candidates at sf0.01) — enough surface for an oracle mismatch to
    * appear on, instead of two engines agreeing on a near-empty set. */
  val embedNearDup = QueryDef(
    "d_embed_neardup", "LLM-pipeline dedup: embedding-cosine",
    "LSH-bucketed embedding near-dup pairs (cosine ≥ 0.25)",
    (s, dir) => {
      val qv = expr(
        "transform(embedding, x -> CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT))")
      val bucket = expr(
        """aggregate(sequence(1, 8),
             0, (acc, i) -> acc * 2 +
               CASE WHEN element_at(embedding, i) >= 0.0 THEN 1 ELSE 0 END)""")
      val dot = graft.functions.GraftFunctions.dot_long(col("va"), col("vb"))
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), qv.as("v"), bucket.as("bucket"))
        .withColumn("n2",
          graft.functions.GraftFunctions.dot_long(col("v"), col("v")))
      val a = emb.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("n2").as("n2a"), col("bucket"))
      val b = emb.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("n2").as("n2b"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .withColumn("cosine",
          asDouble(dot) / (sqrt(asDouble(col("n2a"))) *
            sqrt(asDouble(col("n2b")))))
        .filter(col("cosine") >= 0.25)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    },
    Some("""WITH b AS (
        SELECT vec_id,
          ((((((((CASE WHEN embedding[1] >= 0.0 THEN 1 ELSE 0 END) * 2 +
            CASE WHEN embedding[2] >= 0.0 THEN 1 ELSE 0 END) * 2 +
            CASE WHEN embedding[3] >= 0.0 THEN 1 ELSE 0 END) * 2 +
            CASE WHEN embedding[4] >= 0.0 THEN 1 ELSE 0 END) * 2 +
            CASE WHEN embedding[5] >= 0.0 THEN 1 ELSE 0 END) * 2 +
            CASE WHEN embedding[6] >= 0.0 THEN 1 ELSE 0 END) * 2 +
            CASE WHEN embedding[7] >= 0.0 THEN 1 ELSE 0 END) * 2 +
            CASE WHEN embedding[8] >= 0.0 THEN 1 ELSE 0 END) AS bucket
        FROM embeddings),
      u AS (
        SELECT vec_id, i,
          CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) *
            CAST(1000000 AS DOUBLE) + 0.5) AS BIGINT) AS x
        FROM (SELECT vec_id, embedding,
                unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings)),
      nrm AS (SELECT vec_id, CAST(SUM(x*x) AS BIGINT) AS n2
        FROM u GROUP BY vec_id),
      cand AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b
        FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
      dots AS (
        SELECT c.id_a, c.id_b, CAST(SUM(ua.x*ub.x) AS BIGINT) AS dp
        FROM cand c
        JOIN u ua ON ua.vec_id = c.id_a
        JOIN u ub ON ub.vec_id = c.id_b AND ua.i = ub.i
        GROUP BY c.id_a, c.id_b)
      SELECT id_a, id_b,
        CAST(dp AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
          AS cosine
      FROM dots
      JOIN nrm na ON na.vec_id = id_a
      JOIN nrm nb ON nb.vec_id = id_b
      WHERE CAST(dp AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.25
      ORDER BY id_a, id_b"""))

  /** Temperature-weighted mixture sampling — the multilingual /
    * multi-domain rebalancing step of a training-data pipeline (the
    * XLM-R / mT5 recipe): per-group sampling quotas ∝ n^(1/T) with
    * T=2, so low-resource groups are up-weighted relative to their
    * share. Everything is deterministic and engine-portable:
    *  - weights are integer-quantized (floor(sqrt(n)*1e6 + 0.5)) so
    *    the quota arithmetic is exact integer division, never a
    *    float sum whose ordering differs between engines;
    *  - row selection ranks by a fixed LCG permutation of doc_id
    *    (h = (doc_id*1103515245 + 12345) mod 2^31 — valid for ids up
    *    to ~8.3e9 before ANSI-mode overflow), the distributed stand-in
    *    for a seeded shuffle: rank ≤ quota IS the sample.
    *
    * 100 TB shape: one groupBy for counts (5-row result, broadcast
    * back), one window rank per group — a single shuffle over the
    * corpus, no collect, no iteration. The 2-row crossJoin of scalar
    * aggregates is a broadcast nested loop over one row, same pattern
    * as the recall gate. */
  val mixSample = QueryDef(
    "a_mix_sample", "LLM-pipeline sampling: temperature mixture",
    "per-lang quotas ∝ n^(1/2), target 20%, LCG-ranked selection",
    (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val weights = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_s"))
        .withColumn("w",
          floor(sqrt(asDouble(col("n_s"))) * 1000000.0 + 0.5).cast("long"))
      val tot = weights.agg(
        sum(col("w")).as("sum_w"),
        sum(col("n_s")).as("n_total"))
      val quotas = weights.crossJoin(broadcast(tot))
        .withColumn("quota",
          expr("(n_total div 5) * w div sum_w"))
        .select("lang", "quota")
      val h = expr("(doc_id * 1103515245L + 12345L) % 2147483648L")
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      docs.withColumn("h", h)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .join(broadcast(quotas), "lang")
        .filter(col("rnk") <= col("quota"))
        .select("doc_id", "lang", "h", "rnk")
        .orderBy("doc_id")
    },
    Some("""WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_s
        FROM documents GROUP BY lang),
      wts AS (
        SELECT lang, n_s,
          CAST(FLOOR(sqrt(CAST(n_s AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
            AS w
        FROM counts),
      tot AS (
        SELECT CAST(SUM(w) AS BIGINT) AS sum_w,
          CAST(SUM(n_s) AS BIGINT) AS n_total
        FROM wts),
      quotas AS (
        SELECT lang, ((n_total // 5) * w) // sum_w AS quota
        FROM wts, tot),
      ranked AS (
        SELECT doc_id, lang,
          (doc_id * 1103515245 + 12345) % 2147483648 AS h,
          CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
            (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS BIGINT)
            AS rnk
        FROM documents)
      SELECT r.doc_id, r.lang, r.h, r.rnk
      FROM ranked r JOIN quotas q ON r.lang = q.lang
      WHERE r.rnk <= q.quota
      ORDER BY r.doc_id"""))

  /** Sketch-vs-exact distinct-count gate — the 100 TB replacement for
    * exact COUNT(DISTINCT). An exact per-group distinct shuffles every
    * (group, user) pair; the HyperLogLog++ sketch
    * (`approx_count_distinct`, Spark's native HLL++ aggregate) ships a
    * fixed ≤ few-KB partial per group per map task instead, so the
    * shuffle volume is groups × tasks × sketch-size — independent of
    * row count. This query carries BOTH branches and emits the exact
    * count plus a boolean error gate (|approx − exact| ≤ 5·rsd·exact,
    * rsd 0.02 → 10% — 5 standard errors, far beyond observed HLL++
    * deviation), the same discriminating-gate pattern as
    * `d_lsh_recall`: a sketch drifting out of its error bound
    * hash-mismatches loudly instead of passing silently. At sf ≤ 0.1
    * the per-group cardinality sits in HLL++'s exact sparse regime, so
    * the gate is trivially tight; the 100× user-offset events corpus
    * pushes it into true dense-sketch estimation (the scale point in
    * BASELINE.md). Production keeps only the sketch branch. */
  val sketchDistinct = QueryDef(
    "a_sketch_distinct", "A3 + HLL sketch gate",
    "per-type exact vs approx_count_distinct(users), 5σ error gate",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) <=
            asDouble(col("n_exact")) * (5 * 0.02)).as("gate_ok"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        TRUE AS gate_ok
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Sketch-vs-exact quantile gate — the 100 TB replacement for the
    * two-phase exact rank interpolation in `a_percentiles`. Spark's
    * `percentile_approx` (Greenwald-Khanna summaries) carries a
    * DETERMINISTIC rank guarantee: the returned element's rank is
    * within n/accuracy of ⌈p·n⌉. The gate verifies exactly that
    * guarantee from first principles: one extra aggregation pass
    * computes the true rank window of each returned value
    * (count(v < q), count(v ≤ q)) and checks it intersects
    * [p·n − tol, p·n + tol], tol = n/accuracy + 1. Only the portable
    * facts (group, p, n, gate booleans) are emitted — the sketch
    * value itself is engine-specific and never crosses the oracle.
    * Shape at scale: two map-side-combined aggregations over the
    * corpus plus one broadcast of the ≤ groups×3 quantile frame — no
    * sort, no range repartition, no per-group window. */
  val sketchQuantile = QueryDef(
    "a_sketch_quantile", "A1/W2 + GK sketch gate",
    "percentile_approx rank-guarantee gate vs exact rank window",
    (s, dir) => {
      val ps = Seq(0.5, 0.9, 0.99)
      val base = t(s, dir, "events").select(col("event_type"), col("value"))
      val approx = base.groupBy("event_type")
        .agg(
          percentile_approx(col("value"),
            array(ps.map(lit): _*), lit(10000)).as("qs"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          posexplode(col("qs")).as(Seq("i", "q")))
        .withColumn("p", element_at(array(ps.map(lit): _*), col("i") + 1))
      base.join(broadcast(approx), "event_type")
        .groupBy("event_type", "p", "n")
        .agg(
          sum(when(col("value") < col("q"), 1L).otherwise(0L)).as("r_lt"),
          sum(when(col("value") <= col("q"), 1L).otherwise(0L)).as("r_le"))
        .select(col("event_type"), col("p"), col("n"),
          ((asDouble(col("r_lt")) <=
              col("p") * asDouble(col("n")) + asDouble(col("n")) / 10000.0 + 1.0) &&
            (asDouble(col("r_le")) >=
              col("p") * asDouble(col("n")) - asDouble(col("n")) / 10000.0 - 1.0))
            .as("rank_ok"))
        .orderBy("event_type", "p")
    },
    Some("""SELECT event_type, p, CAST(COUNT(*) AS BIGINT) AS n,
        TRUE AS rank_ok
      FROM events
      CROSS JOIN (SELECT unnest([CAST(0.5 AS DOUBLE), 0.9, 0.99]) AS p)
      GROUP BY event_type, p ORDER BY event_type, p"""))

  /** Token-budget mixture cut — the OTHER half of dataset mixing
    * (a_mix_sample fixes per-group document quotas; production
    * mixing fixes per-source TOKEN budgets): within each source,
    * documents are taken in priority order (longest first, doc_id
    * tiebreak) while the running token total stays within B=800 —
    * the greedy prefix fill used when a recipe says "at most N
    * tokens from source X". One window cumsum per source
    * (hash-partitioned on source, never global) + a filter: a single
    * shuffle at any corpus size. Integer token counts end to end. */
  val tokenBudget = QueryDef(
    "a_token_budget", "LLM-pipeline sampling: per-source token budget",
    "greedy prefix fill: longest-first docs per source until 800 tokens",
    (s, dir) => {
      val B = 800L
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long").as("n_tokens"))
      val w = Window.partitionBy("source")
        .orderBy(desc("n_tokens"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= B)
        .select("source", "doc_id", "n_tokens", "cum_tokens")
        // doc_id as final key: cum_tokens ties when a doc has zero
        // tokens, so (source, cum_tokens) alone is not a total order
        .orderBy("source", "cum_tokens", "doc_id")
    },
    Some("""WITH d AS (
        SELECT doc_id, source,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
            AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT source, doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY n_tokens DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tokens
        FROM d)
      SELECT source, doc_id, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 800
      ORDER BY source, cum_tokens, doc_id"""))

  val defs: Seq[QueryDef] =
    Seq(saltedAgg, embedNearDup, mixSample, sketchDistinct, sketchQuantile,
      tokenBudget)
}
