package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._

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
    * The synthetic embeddings top out near cosine 0.5, so the 0.40
    * threshold keeps a small non-empty survivor set (3 pairs of ~500
    * candidates at sf0.01) — the oracle discriminates instead of
    * agreeing on empty. */
  val embedNearDup = QueryDef(
    "d_embed_neardup", "LLM-pipeline dedup: embedding-cosine",
    "LSH-bucketed embedding near-dup pairs (cosine ≥ 0.4)",
    (s, dir) => {
      val qv = expr(
        "transform(embedding, x -> CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT))")
      val bucket = expr(
        """aggregate(sequence(1, 8),
             0, (acc, i) -> acc * 2 +
               CASE WHEN element_at(embedding, i) >= 0.0 THEN 1 ELSE 0 END)""")
      val dot = expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), qv.as("v"), bucket.as("bucket"))
        .withColumn("n2", expr(
          "aggregate(zip_with(v, v, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      val a = emb.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("n2").as("n2a"), col("bucket"))
      val b = emb.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("n2").as("n2b"), col("bucket"))
      a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .withColumn("cosine",
          asDouble(dot) / (sqrt(asDouble(col("n2a"))) *
            sqrt(asDouble(col("n2b")))))
        .filter(col("cosine") >= 0.4)
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
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.4
      ORDER BY id_a, id_b"""))

  val defs: Seq[QueryDef] = Seq(saltedAgg, embedNearDup)
}
