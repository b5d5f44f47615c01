package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embedding column.
  *
  * Determinism note: float dot products are order-dependent, so we
  * quantize each component to an exact integer (round(x*1e6)) and do
  * the dot product / norms in integer arithmetic — bit-identical in
  * any engine — then a fixed sequence of IEEE double ops
  * (sqrt, mul, div) for the cosine. (x*1e6 can never land exactly on
  * .5: (2k+1)/2e6 has 5^6 in the denominator, unrepresentable in
  * binary floating point, so ROUND ties never occur.)
  *
  * Scale path: brute-force top-k is O(Q·N); the LSH-bucketed variant
  * probes only same-bucket candidates (sign-bit hyperplane hash), an
  * equi-join that hash-partitions cleanly on a 1000-executor cluster.
  */
object SimilarityOps {

  /** embedding array<float> → array<long> quantized micro-units.
    * floor(x*1e6 + 0.5) not round(): round ties (the double product CAN
    * land exactly on .5) resolve HALF_UP in Spark but ties-to-even in
    * DuckDB; floor(+0.5) is the same IEEE op sequence in both. */
  private def qvec = expr(
    "transform(embedding, x -> CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT))")

  private def dot(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")

  val bruteTopK = QueryDef(
    "s_cosine_topk", "LLM-pipeline similarity: brute-force cosine top-k",
    "exact top-5 cosine neighbors for query vectors (quantized ints)",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), qvec.as("v"))
        .withColumn("n2", dot("v", "v"))
      val queries = broadcast(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("n2").as("qn2")))
      val pairs = queries.join(emb, col("vec_id") =!= col("qid"))
        .withColumn("dp", dot("qv", "v"))
        .withColumn("cosine",
          asDouble(col("dp")) /
            (sqrt(asDouble(col("qn2"))) * sqrt(asDouble(col("n2")))))
      val w = Window.partitionBy(col("qid"))
        .orderBy(desc("cosine"), col("vec_id"))
      pairs
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("vec_id").as("nid"), col("cosine"), col("rn"))
        .orderBy("qid", "rn")
    },
    Some("""WITH u AS (
        SELECT vec_id, i,
          CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(1000000 AS DOUBLE) + 0.5) AS BIGINT) AS x
        FROM (SELECT vec_id, embedding,
                unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings)),
      nrm AS (
        SELECT vec_id, CAST(SUM(x*x) AS BIGINT) AS n2 FROM u GROUP BY vec_id),
      dots AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid, CAST(SUM(a.x*b.x) AS BIGINT) AS dp
        FROM u a JOIN u b ON a.i = b.i
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id),
      cos AS (
        SELECT qid, nid,
          CAST(dp AS DOUBLE) /
            (sqrt(CAST(qa.n2 AS DOUBLE)) * sqrt(CAST(qb.n2 AS DOUBLE))) AS cosine
        FROM dots
        JOIN nrm qa ON qa.vec_id = qid
        JOIN nrm qb ON qb.vec_id = nid)
      SELECT qid, nid, cosine, rn FROM (
        SELECT qid, nid, cosine,
          ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY cosine DESC, nid) AS rn
        FROM cos) WHERE rn <= 5
      ORDER BY qid, rn"""))

  /** LSH-bucketed ANN: bucket = sign bits of the first 8 components
    * (8 fixed axis-aligned hyperplanes). Probing joins only same-bucket
    * rows — the 100 TB plan — then ranks within bucket. Recall is
    * traded for the equi-join; the oracle mirrors the same bucketing so
    * results stay checkable.
    */
  val lshAnn = QueryDef(
    "s_cosine_ann_lsh", "LLM-pipeline similarity: LSH-bucketed ANN",
    "sign-bit bucket equi-join ANN top-3 (scale path for cosine top-k)",
    (s, dir) => {
      val bucketExpr = expr(
        """aggregate(sequence(1, 8),
             0, (acc, i) -> acc * 2 +
               CASE WHEN element_at(embedding, i) >= 0.0 THEN 1 ELSE 0 END)""")
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), qvec.as("v"), bucketExpr.as("bucket"))
        .withColumn("n2", dot("v", "v"))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("n2").as("qn2"), col("bucket").as("qbucket"))
      val pairs = queries.join(emb,
          col("qbucket") === col("bucket") && col("vec_id") =!= col("qid"))
        .withColumn("dp", dot("qv", "v"))
        .withColumn("cosine",
          asDouble(col("dp")) /
            (sqrt(asDouble(col("qn2"))) * sqrt(asDouble(col("n2")))))
      val w = Window.partitionBy(col("qid"))
        .orderBy(desc("cosine"), col("vec_id"))
      pairs
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("vec_id").as("nid"), col("cosine"), col("rn"))
        .orderBy("qid", "rn")
    },
    Some("""WITH b AS (
        SELECT vec_id, embedding,
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
          CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(1000000 AS DOUBLE) + 0.5) AS BIGINT) AS x
        FROM (SELECT vec_id, embedding,
                unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings)),
      nrm AS (
        SELECT vec_id, CAST(SUM(x*x) AS BIGINT) AS n2 FROM u GROUP BY vec_id),
      cand AS (
        SELECT qa.vec_id AS qid, qb.vec_id AS nid
        FROM b qa JOIN b qb
          ON qa.bucket = qb.bucket AND qa.vec_id <> qb.vec_id
        WHERE qa.vec_id < 10),
      dots AS (
        SELECT c.qid, c.nid, CAST(SUM(a.x*b.x) AS BIGINT) AS dp
        FROM cand c
        JOIN u a ON a.vec_id = c.qid
        JOIN u b ON b.vec_id = c.nid AND a.i = b.i
        GROUP BY c.qid, c.nid),
      cos AS (
        SELECT qid, nid,
          CAST(dp AS DOUBLE) /
            (sqrt(CAST(qa.n2 AS DOUBLE)) * sqrt(CAST(qb.n2 AS DOUBLE))) AS cosine
        FROM dots
        JOIN nrm qa ON qa.vec_id = qid
        JOIN nrm qb ON qb.vec_id = nid)
      SELECT qid, nid, cosine, rn FROM (
        SELECT qid, nid, cosine,
          ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY cosine DESC, nid) AS rn
        FROM cos) WHERE rn <= 3
      ORDER BY qid, rn"""))

  val defs: Seq[QueryDef] = Seq(bruteTopK, lshAnn)
}
