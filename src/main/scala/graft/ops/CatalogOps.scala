package graft.ops

import graft._
import graft.core._
import graft.catalog.MergeEngine
import graft.matching.Matching
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-surface queries exercising the catalog merge engine (A6/S13)
  * and the matching engine (J4/J5/J6/A4/A5/X4) on frames derived from
  * the synthetic tables, with DuckDB oracles where the semantics are
  * SQL-expressible.
  */
object CatalogOps {

  /** Synthetic catalog "existing" side: even part keys. */
  private def existingPkgs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").filter(col("p_partkey") % 2 === 0).select(
      concat(lit("http://repo/p"), col("p_partkey").cast("string"))
        .as("download_url"),
      lit("maven").as("ptype"),
      lit(null).cast("string").as("namespace"),
      col("p_name").as("name"),
      lit("1.0").as("version"),
      lit(null).cast("string").as("qualifiers"),
      lit(null).cast("string").as("subpath"),
      lit(null).cast("string").as("primary_language"),
      lit("old desc").as("description"),
      lit(null).cast("string").as("homepage_url"),
      lit(null).cast("string").as("declared_license_expression"),
      lit(null).cast("string").as("copyright"),
      lit(null).cast("string").as("md5"),
      lit(null).cast("string").as("sha1"),
      lit(null).cast("string").as("sha256"),
      lit(null).cast("string").as("sha512"),
      lit(null).cast("long").as("size"),
      lit(null).cast("timestamp").as("release_date"),
      lit(50).as("mining_level"),
      lit(null).cast("int").as("package_content"),
      array().cast("array<string>").as("keywords"),
      array().cast("array<struct<timestamp:string,message:string>>")
        .as("history"))

  val a6merge = QueryDef(
    "a6_merge_engine", "A6/S13/F17",
    "field-level level-based merge upsert via MergeEngine (model_utils semantics)",
    (s, dir) => {
      val existing = existingPkgs(s, dir)
      val incoming = t(s, dir, "part").select(
        concat(lit("http://repo/p"), col("p_partkey").cast("string"))
          .as("download_url"),
        lit("maven").as("ptype"),
        lit(null).cast("string").as("namespace"),
        col("p_name").as("name"),
        lit("2.0").as("version"),
        lit(null).cast("string").as("qualifiers"),
        lit(null).cast("string").as("subpath"),
        lit(null).cast("string").as("primary_language"),
        when(col("p_partkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(lit("new desc")).as("description"),
        when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("http://h/"), col("p_partkey").cast("string")))
          .as("homepage_url"),
        lit(null).cast("string").as("declared_license_expression"),
        lit(null).cast("string").as("copyright"),
        lit(null).cast("string").as("md5"),
        lit(null).cast("string").as("sha1"),
        lit(null).cast("string").as("sha256"),
        lit(null).cast("string").as("sha512"),
        lit(null).cast("long").as("size"),
        lit(null).cast("timestamp").as("release_date"),
        lit(0).as("mining_level"),
        lit(null).cast("int").as("package_content"),
        array().cast("array<string>").as("keywords"),
        array().cast("array<struct<timestamp:string,message:string>>")
          .as("history"),
        (col("p_partkey") % 100).cast("int").as("visit_level"))
      MergeEngine.mergePackages(existing, incoming, "2026-01-01T00:00:00Z")
        .packages
        .select(col("download_url"), col("version"), col("description"),
          col("homepage_url"), col("mining_level"),
          size(col("history")).as("n_history"))
        .orderBy("download_url")
    },
    Some("""WITH e AS (
        SELECT 'http://repo/p' || CAST(p_partkey AS VARCHAR) AS download_url,
          '1.0' AS version, 'old desc' AS description,
          CAST(NULL AS VARCHAR) AS homepage_url, 50 AS mining_level
        FROM part WHERE p_partkey % 2 = 0),
      n AS (
        SELECT 'http://repo/p' || CAST(p_partkey AS VARCHAR) AS download_url,
          '2.0' AS version,
          CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE 'new desc' END AS description,
          CASE WHEN p_partkey % 5 = 0 THEN NULL
               ELSE 'http://h/' || CAST(p_partkey AS VARCHAR) END AS homepage_url,
          CAST(p_partkey % 100 AS INTEGER) AS visit_level
        FROM part),
      j AS (SELECT e.download_url AS e_url, n.download_url AS n_url,
          e.version AS e_version, n.version AS n_version,
          e.description AS e_desc, n.description AS n_desc,
          e.homepage_url AS e_home, n.homepage_url AS n_home,
          e.mining_level, n.visit_level,
          (n.download_url IS NOT NULL AND e.download_url IS NOT NULL
            AND n.visit_level >= e.mining_level) AS repl
        FROM e FULL OUTER JOIN n ON e.download_url = n.download_url)
      SELECT COALESCE(e_url, n_url) AS download_url,
        CASE WHEN e_url IS NULL THEN n_version
             WHEN n_url IS NULL OR n_version IS NULL OR n_version = ''
               THEN e_version
             WHEN e_version IS NULL OR e_version = '' THEN n_version
             WHEN repl THEN n_version ELSE e_version END AS version,
        CASE WHEN e_url IS NULL THEN n_desc
             WHEN n_url IS NULL OR n_desc IS NULL OR n_desc = '' THEN e_desc
             WHEN e_desc IS NULL OR e_desc = '' THEN n_desc
             WHEN repl THEN n_desc ELSE e_desc END AS description,
        CASE WHEN e_url IS NULL THEN n_home
             WHEN n_url IS NULL OR n_home IS NULL OR n_home = '' THEN e_home
             WHEN e_home IS NULL OR e_home = '' THEN n_home
             WHEN repl THEN n_home ELSE e_home END AS homepage_url,
        CASE WHEN e_url IS NULL THEN visit_level
             WHEN n_url IS NOT NULL AND repl THEN visit_level
             ELSE mining_level END AS mining_level,
        CASE WHEN e_url IS NOT NULL AND n_url IS NOT NULL AND (
               (n_version IS NOT NULL AND n_version <> ''
                 AND (e_version IS NULL OR e_version = '' OR repl)
                 AND (e_version IS NULL OR e_version <> n_version))
            OR (n_desc IS NOT NULL AND n_desc <> ''
                 AND (e_desc IS NULL OR e_desc = '' OR repl)
                 AND (e_desc IS NULL OR e_desc <> n_desc))
            OR (n_home IS NOT NULL AND n_home <> ''
                 AND (e_home IS NULL OR e_home = '' OR repl)
                 AND (e_home IS NULL OR e_home <> n_home)))
          THEN 1 ELSE 0 END AS n_history
      FROM j ORDER BY download_url"""))

  val exact = QueryDef(
    "m_exact_match", "J4/S1",
    "matching stage 1: exact checksum lookup against the index",
    (s, dir) => {
      val queries = t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(concat(lit("doc/"), col("doc_id").cast("string")).as("path"),
          md5(col("text")).as("sha1"))
      val index = t(s, dir, "documents").select(
        md5(col("text")).as("sha1"),
        concat(lit("pkg://"), col("source"), lit("/"),
          col("doc_id").cast("string")).as("download_url"),
        concat(lit("files/doc_"), col("doc_id").cast("string")).as("path"))
      Matching.exactMatch(queries, index)
        .orderBy("q_path", "download_url")
    },
    Some("""SELECT 'doc/' || CAST(q.doc_id AS VARCHAR) AS q_path,
        md5(q.text) AS sha1,
        'pkg://' || i.source || '/' || CAST(i.doc_id AS VARCHAR)
          AS download_url,
        'files/doc_' || CAST(i.doc_id AS VARCHAR) AS matched_path
      FROM documents q JOIN documents i ON md5(q.text) = md5(i.text)
      WHERE q.doc_id < 50
      ORDER BY q_path, download_url"""))

  val snippet = QueryDef(
    "m_snippet_match", "J6/A3/A4",
    "snippet inverted-index match: distinct-fp Jaccard per (query, resource)",
    (s, dir) => {
      val words = graft.core.par(t(s, dir, "documents"))
        .select(col("doc_id"), col("source"),
          posexplode(array_distinct(filter(split(col("text"), " "),
            w => w =!= ""))))
        .withColumnRenamed("pos", "position")
        .withColumnRenamed("col", "fingerprint")
      // the query side is scanned twice inside snippetMatch (count agg
      // + match join) — tiny (5 docs), so cache it; the index side is
      // large and cheaper to recompute than to materialize
      val queries = words.filter(col("doc_id") < 5)
        .select(concat(lit("doc/"), col("doc_id").cast("string")).as("q_path"),
          col("fingerprint"), col("position"))
        .cache()
      val index = words.filter(col("doc_id") >= 450)
        .select(col("fingerprint"),
          concat(lit("pkg://"), col("doc_id").cast("string"))
            .as("download_url"),
          lit("src").as("path"), col("position"))
      Matching.snippetMatch(queries, index)
        .filter(col("jaccard") >= 0.2)
        .select("q_path", "download_url", "matched_fps", "jaccard")
        .orderBy("q_path", "download_url")
    },
    Some("""WITH words AS (
        SELECT doc_id, unnest(list_distinct(list_filter(
          string_split(text, ' '), w -> w <> ''))) AS w
        FROM documents),
      q AS (SELECT doc_id, w FROM words WHERE doc_id < 5),
      i AS (SELECT doc_id, w FROM words WHERE doc_id >= 450),
      qn AS (SELECT doc_id, COUNT(*) AS q_fps FROM q GROUP BY doc_id),
      inn AS (SELECT doc_id, COUNT(*) AS i_fps FROM i GROUP BY doc_id),
      m AS (SELECT q.doc_id AS qd, i.doc_id AS id, COUNT(*) AS matched_fps
        FROM q JOIN i ON q.w = i.w GROUP BY q.doc_id, i.doc_id)
      SELECT 'doc/' || CAST(qd AS VARCHAR) AS q_path,
        'pkg://' || CAST(id AS VARCHAR) AS download_url,
        matched_fps,
        CAST(matched_fps AS DOUBLE) /
          CAST(qn.q_fps + inn.i_fps - matched_fps AS DOUBLE) AS jaccard
      FROM m JOIN qn ON qn.doc_id = qd JOIN inn ON inn.doc_id = id
      WHERE CAST(matched_fps AS DOUBLE) /
          CAST(qn.q_fps + inn.i_fps - matched_fps AS DOUBLE) >= 0.2
      ORDER BY q_path, download_url"""))

  val rank = QueryDef(
    "a5_rank_packages", "A5",
    "rank candidate packages by matched-resource count, greedy reassign",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val matches = docs.select(
          concat(lit("doc/"), col("doc_id").cast("string")).as("path"),
          concat(lit("pkg://src-"), col("source")).as("download_url"),
          lit("exact_file").as("match_type"))
        .unionByName(docs.select(
          concat(lit("doc/"), col("doc_id").cast("string")).as("path"),
          concat(lit("pkg://lang-"), col("lang")).as("download_url"),
          lit("approx_file").as("match_type")))
      Matching.rankPackages(matches)
        .orderBy("path")
    },
    Some("""WITH m AS (
        SELECT 'doc/' || CAST(doc_id AS VARCHAR) AS path,
          'pkg://src-' || source AS download_url,
          'exact_file' AS match_type
        FROM documents
        UNION ALL
        SELECT 'doc/' || CAST(doc_id AS VARCHAR) AS path,
          'pkg://lang-' || lang AS download_url,
          'approx_file' AS match_type
        FROM documents),
      c AS (SELECT download_url, COUNT(DISTINCT path) AS n_matched
        FROM m GROUP BY download_url)
      SELECT path, download_url, match_type, n_matched FROM (
        SELECT m.path, m.download_url, m.match_type, c.n_matched,
          ROW_NUMBER() OVER (PARTITION BY m.path
            ORDER BY c.n_matched DESC, m.download_url) AS rn
        FROM m JOIN c ON m.download_url = c.download_url)
      WHERE rn = 1 ORDER BY path"""))

  /** X5+J5 end-to-end: halohash fingerprints built with the
    * TypedImperativeAggregate (map-side partial merge), then banded
    * approximate matching of a slightly-perturbed query side against
    * them. Index and query fingerprints come out of ONE aggregation
    * pass: the shingle explode is deduped per (source, shingle) with an
    * in-query flag, then a single groupBy(source) computes both the
    * full halohash and the conditional (query-side) halohash — the
    * aggregate skips nulls, so `halohash(when(in_q, shingle))`
    * aggregates the subset for free. One explode, two shuffles, no
    * cache. */
  val halohash = QueryDef(
    "x5_halohash_match", "X5/J5/F4",
    "bah128 aggregator builds dir fingerprints; banded match finds them",
    (s, dir) => {
      // query side excludes shingles contributed ONLY by every 25th doc
      // (~4% perturbation, inside the ±5% candidate band)
      val perShingle = graft.core.par(t(s, dir, "documents"))
        .withColumn("w", filter(split(col("text"), " "), w => w =!= ""))
        .select(col("doc_id"), col("source"),
          explode(expr(
            """transform(sequence(1, greatest(size(w) - 2, 1)),
                 i -> array_join(slice(w, i, 3), ' '))""")).as("shingle"))
        .groupBy(col("source"), col("shingle"))
        .agg(max(when(col("doc_id") % 25 =!= 0, 1).otherwise(0)).as("in_q"))
      val fps = perShingle
        .groupBy(col("source"))
        .agg(
          graft.matching.HaloHash.halohash(col("shingle"))
            .as("fingerprint"),
          graft.matching.HaloHash.halohash(
            when(col("in_q") === 1, col("shingle"))).as("q_fingerprint"))
        // feeds both sides of the match join; one row per source, so
        // caching costs nothing and halves the aggregation work
        .cache()
      val index = fps
        .select(concat(lit("pkg://"), col("source")).as("download_url"),
          col("source").as("path"), col("source").as("name"),
          lit(0L).as("size"), lit(false).as("is_file"), col("fingerprint"))
      val queries = fps
        .select(col("source").as("q_path"), col("source").as("q_name"),
          lit(0L).as("q_size"), lit(false).as("q_is_file"),
          col("q_fingerprint").as("fingerprint"))
      graft.matching.Matching.approximateMatch(queries, index)
        .orderBy("q_path", "download_url")
    },
    // DuckDB mirror of the full bah128 pipeline: per-(source, shingle)
    // seeded FNV-1a64 ×2 (seed-derived init constants precomputed from
    // `Fnv.hash64(bytes, seed)`'s definition; murmur fmix multiplies
    // split into 32-bit halves to stay inside HUGEINT), 128-bit
    // majority vote as two UBIGINT halves, 4×32-bit band join, ±5%
    // element-count band (floor semantics), Hamming<10 verify, rank.
    // The name_diff tie-break uses an exact-name proxy (0 when
    // q_name = name, else 1) instead of Ratcliff-Obershelp — not
    // SQL-expressible — which is exact whenever surviving matches are
    // exact-name, as they are for this query's perturbation design
    // (the query side is each source's own shingle subset).
    Some("""WITH docs AS (
        SELECT doc_id, source,
          list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents),
      sh AS (
        SELECT doc_id, source,
          unnest(list_transform(range(1, greatest(len(ws)-2, 1) + 1),
            i -> array_to_string(ws[i:i+2], ' '))) AS shingle
        FROM docs),
      per_shingle AS (
        SELECT source, shingle,
          max(CASE WHEN doc_id % 25 <> 0 THEN 1 ELSE 0 END) AS in_q
        FROM sh GROUP BY 1, 2),
      fnv AS (
        SELECT source, shingle, in_q,
          list_reduce(
            list_prepend(CAST(2418831075770096789 AS HUGEINT),
              list_transform(range(1, length(shingle)+1),
                i -> CAST(unicode(substr(shingle, i, 1)) AS HUGEINT))),
            (h, b) -> (CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                       * 1099511628211) % 18446744073709551616) AS h0_s1,
          list_reduce(
            list_prepend(CAST(11897090167733100029 AS HUGEINT),
              list_transform(range(1, length(shingle)+1),
                i -> CAST(unicode(substr(shingle, i, 1)) AS HUGEINT))),
            (h, b) -> (CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                       * 1099511628211) % 18446744073709551616) AS h0_s2
        FROM per_shingle),
      h11 AS (SELECT *, CAST(xor(CAST(h0_s1 AS UBIGINT),
          CAST(h0_s1 AS UBIGINT) // 8589934592) AS HUGEINT) AS h1_f1 FROM fnv),
      h12 AS (SELECT *,
        (((CAST(h1_f1 AS HUGEINT) * (18397679294719823053 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(h1_f1 AS HUGEINT) * (18397679294719823053 % 4294967296))
          % 18446744073709551616 AS h1_f2 FROM h11),
      h13 AS (SELECT *, CAST(xor(CAST(h1_f2 AS UBIGINT),
          CAST(h1_f2 AS UBIGINT) // 8589934592) AS HUGEINT) AS h1_f3 FROM h12),
      h14 AS (SELECT *,
        (((CAST(h1_f3 AS HUGEINT) * (14181476777654086739 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(h1_f3 AS HUGEINT) * (14181476777654086739 % 4294967296))
          % 18446744073709551616 AS h1_f4 FROM h13),
      h15 AS (SELECT *, xor(CAST(h1_f4 AS UBIGINT),
          CAST(h1_f4 AS UBIGINT) // 8589934592) AS h1 FROM h14),
      h21 AS (SELECT *, CAST(xor(CAST(h0_s2 AS UBIGINT),
          CAST(h0_s2 AS UBIGINT) // 8589934592) AS HUGEINT) AS h2_f1 FROM h15),
      h22 AS (SELECT *,
        (((CAST(h2_f1 AS HUGEINT) * (18397679294719823053 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(h2_f1 AS HUGEINT) * (18397679294719823053 % 4294967296))
          % 18446744073709551616 AS h2_f2 FROM h21),
      h23 AS (SELECT *, CAST(xor(CAST(h2_f2 AS UBIGINT),
          CAST(h2_f2 AS UBIGINT) // 8589934592) AS HUGEINT) AS h2_f3 FROM h22),
      h24 AS (SELECT *,
        (((CAST(h2_f3 AS HUGEINT) * (14181476777654086739 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(h2_f3 AS HUGEINT) * (14181476777654086739 % 4294967296))
          % 18446744073709551616 AS h2_f4 FROM h23),
      hashes AS (SELECT source, shingle, in_q, h1,
        xor(CAST(h2_f4 AS UBIGINT), CAST(h2_f4 AS UBIGINT) // 8589934592) AS h2
        FROM h24),
      bits AS (
        SELECT source, in_q, unnest(range(0, 64)) AS i, h1, h2 FROM hashes),
      idx_cnt AS (
        SELECT source, i,
          SUM(CASE WHEN (h1 // CAST(power(2,i) AS UBIGINT)) % 2 = 1
              THEN 1 ELSE 0 END) AS c1,
          SUM(CASE WHEN (h2 // CAST(power(2,i) AS UBIGINT)) % 2 = 1
              THEN 1 ELSE 0 END) AS c2,
          COUNT(*) AS n
        FROM bits GROUP BY 1, 2),
      idx_fp AS (
        SELECT source,
          CAST(SUM(CASE WHEN c1*2 > n THEN CAST(power(2,i) AS HUGEINT)
              ELSE 0 END) AS UBIGINT) AS b1,
          CAST(SUM(CASE WHEN c2*2 > n THEN CAST(power(2,i) AS HUGEINT)
              ELSE 0 END) AS UBIGINT) AS b2,
          MAX(n) AS cnt
        FROM idx_cnt GROUP BY 1),
      qbits AS (
        SELECT source, unnest(range(0, 64)) AS i, h1, h2 FROM hashes
        WHERE in_q = 1),
      qcnt AS (
        SELECT source, i,
          SUM(CASE WHEN (h1 // CAST(power(2,i) AS UBIGINT)) % 2 = 1
              THEN 1 ELSE 0 END) AS c1,
          SUM(CASE WHEN (h2 // CAST(power(2,i) AS UBIGINT)) % 2 = 1
              THEN 1 ELSE 0 END) AS c2,
          COUNT(*) AS n
        FROM qbits GROUP BY 1, 2),
      q_fp AS (
        SELECT source,
          CAST(SUM(CASE WHEN c1*2 > n THEN CAST(power(2,i) AS HUGEINT)
              ELSE 0 END) AS UBIGINT) AS b1,
          CAST(SUM(CASE WHEN c2*2 > n THEN CAST(power(2,i) AS HUGEINT)
              ELSE 0 END) AS UBIGINT) AS b2,
          MAX(n) AS cnt
        FROM qcnt GROUP BY 1),
      i_bands AS (
        SELECT source, cnt, b1, b2, unnest(range(0,4)) AS band_idx,
          CASE unnest(range(0,4))
            WHEN 0 THEN b1 % 4294967296 WHEN 1 THEN b1 // 4294967296
            WHEN 2 THEN b2 % 4294967296 ELSE b2 // 4294967296 END AS band_val
        FROM idx_fp),
      q_bands AS (
        SELECT source, cnt, b1, b2, unnest(range(0,4)) AS band_idx,
          CASE unnest(range(0,4))
            WHEN 0 THEN b1 % 4294967296 WHEN 1 THEN b1 // 4294967296
            WHEN 2 THEN b2 % 4294967296 ELSE b2 // 4294967296 END AS band_val
        FROM q_fp),
      cand AS (
        SELECT DISTINCT q.source AS q_path,
          'pkg://' || i.source AS download_url, i.source AS path,
          q.b1 AS qb1, q.b2 AS qb2, i.b1 AS ib1, i.b2 AS ib2
        FROM q_bands q JOIN i_bands i
          ON q.band_idx = i.band_idx AND q.band_val = i.band_val
          AND i.cnt >= CAST(floor(q.cnt * 0.95) AS BIGINT)
          AND i.cnt <= CAST(floor(q.cnt * 1.05) AS BIGINT)),
      verified AS (
        SELECT q_path, download_url, path,
          CAST(bit_count(xor(qb1, ib1)) + bit_count(xor(qb2, ib2))
            AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(qb1, ib1)) + bit_count(xor(qb2, ib2)) < 10),
      ranked AS (
        SELECT q_path, download_url, path, hamming,
          CAST(0 AS BIGINT) AS size_diff,
          CASE WHEN q_path = path THEN 0.0 ELSE 1.0 END AS name_diff,
          rank() OVER (PARTITION BY q_path ORDER BY hamming,
            CASE WHEN q_path = path THEN 0 ELSE 1 END) AS rk
        FROM verified)
      SELECT q_path, download_url, path, hamming, size_diff, name_diff
      FROM ranked WHERE rk = 1 ORDER BY q_path, download_url"""))

  val scanIndex = QueryDef(
    "m_scan_index", "S4/J4/X8",
    "scan-data indexing: scan JSON → resources → exact + dir-content index",
    (s, dir) => {
      // synthesize one scancode.io-shaped scan document per ten docs,
      // then run the REAL indexing flow: from_json decode → explode →
      // index projections (`Indexing.scanResources`)
      val files = t(s, dir, "documents").select(
        concat(lit("http://pkg/"),
          expr("CAST(doc_id div 10 AS STRING)")).as("download_url"),
        struct(
          concat(lit("f/"), col("doc_id").cast("string")).as("path"),
          lit("file").as("type"),
          concat(lit("f"), col("doc_id").cast("string")).as("name"),
          col("n_chars").as("size"),
          md5(col("text")).as("sha1"),
          struct(
            when(col("doc_id") % 7 === 0,
              md5(concat(col("lang"), col("n_chars").cast("string"))))
              .otherwise(lit("")).as("directory_content"))
            .as("extra_data")).as("f"))
      val scans = files.groupBy("download_url")
        .agg(to_json(struct(collect_list(col("f")).as("files")))
          .as("scan_json"))
      val sr = graft.matching.Indexing.scanResources(scans)
      graft.matching.Indexing.exactFileIndex(sr)
        .select(col("download_url"), lit("exact").as("idx"),
          col("sha1").as("fingerprint"),
          lit(null).cast("string").as("path"))
        .unionByName(graft.matching.Indexing.directoryContentIndex(sr)
          .select(col("download_url"), lit("dir_content").as("idx"),
            col("fingerprint"), col("path")))
        .orderBy("download_url", "idx", "fingerprint")
    },
    Some("""WITH rows_ AS (
        SELECT 'http://pkg/' || CAST(doc_id // 10 AS VARCHAR)
            AS download_url,
          'f/' || CAST(doc_id AS VARCHAR) AS path,
          md5(text) AS sha1,
          CASE WHEN doc_id % 7 = 0
            THEN md5(lang || CAST(n_chars AS VARCHAR))
            ELSE '' END AS dc
        FROM documents)
      SELECT download_url, 'exact' AS idx, sha1 AS fingerprint,
        CAST(NULL AS VARCHAR) AS path
      FROM (SELECT DISTINCT download_url, sha1 FROM rows_)
      UNION ALL
      SELECT download_url, 'dir_content' AS idx, dc AS fingerprint, path
      FROM rows_ WHERE dc <> ''
      ORDER BY download_url, idx, fingerprint"""))

  val packageSets = QueryDef(
    "a_package_sets", "S13 + purl2vcs set assignment",
    "package sets: founders seed new sets, sources join existing ones",
    (s, dir) => {
      val pairs = t(s, dir, "part").filter(col("p_partkey") % 3 === 0)
        .select(concat(lit("http://repo/p"),
          col("p_partkey").cast("string")).as("package_url"),
          concat(lit("http://src/p"),
            col("p_partkey").cast("string")).as("source_url"))
      // every 9th part already sits in a pre-existing seed set, so the
      // join-existing-set path is exercised alongside the founder path
      val members0 = t(s, dir, "part").filter(col("p_partkey") % 9 === 0)
        .select(concat(lit("seed"),
          col("p_partkey").cast("string")).as("set_id"),
          concat(lit("http://repo/p"),
            col("p_partkey").cast("string")).as("download_url"))
      graft.catalog.PackageSets.assignSourcePackages(members0, pairs)
        .orderBy("set_id", "download_url")
    },
    Some("""WITH pairs AS (
        SELECT 'http://repo/p' || CAST(p_partkey AS VARCHAR)
            AS package_url,
          'http://src/p' || CAST(p_partkey AS VARCHAR) AS source_url
        FROM part WHERE p_partkey % 3 = 0),
      members0 AS (
        SELECT 'seed' || CAST(p_partkey AS VARCHAR) AS set_id,
          'http://repo/p' || CAST(p_partkey AS VARCHAR) AS download_url
        FROM part WHERE p_partkey % 9 = 0),
      existing AS (
        SELECT m.set_id, p.source_url
        FROM pairs p JOIN members0 m ON p.package_url = m.download_url),
      founders AS (
        SELECT sha256(package_url) AS set_id, package_url, source_url
        FROM pairs p
        WHERE NOT EXISTS (SELECT 1 FROM members0 m
          WHERE m.download_url = p.package_url)),
      new_rows AS (
        SELECT set_id, package_url AS download_url FROM founders
        UNION ALL SELECT set_id, source_url FROM founders
        UNION ALL SELECT set_id, source_url FROM existing),
      all_rows AS (
        SELECT set_id, download_url FROM members0
        UNION ALL SELECT set_id, download_url FROM new_rows)
      SELECT DISTINCT set_id, download_url FROM all_rows
      ORDER BY set_id, download_url"""))

  /** X8 — `update_or_create_resource` under the driver oracle
    * (`minecode/model_utils.py:452-497`,
    * `packagedb/models.py:1156-1176`): (download_url, path)-keyed
    * MERGE where new keys insert wholesale, matched keys keep every
    * base field (name, size) and take incoming SCAN fields only when
    * truthy — the generated frames cover all gate outcomes per type:
    * empty-string, NULL, and numeric-zero incoming values all keep
    * the existing value; truthy values overwrite. */
  val resourceUpsert = QueryDef(
    "x8_resource_upsert", "X8/S13",
    "resource upsert: keyed MERGE + truthy-gated scan-field whitelist",
    (s, dir) => {
      val base = t(s, dir, "part").select(col("p_partkey").cast("long").as("k"))
      def shaped(df: DataFrame) = df.select(
        concat(lit("http://repo/p"), (col("k") % 40).cast("string"))
          .as("download_url"),
        concat(lit("res/"), col("k").cast("string")).as("path"),
        col("k"))
      val existing = shaped(base.filter(col("k") < 1200)).select(
        col("download_url"), col("path"),
        concat(lit("n"), col("k").cast("string")).as("name"),
        (col("k") % 100).cast("long").as("size"),
        when(col("k") % 3 === 0,
          concat(lit("lic-old-"), col("k").cast("string")))
          .otherwise(lit("")).as("detected_license_expression"),
        concat(lit("c-old-"), col("k").cast("string")).as("copyrights"),
        (col("k") % 7).cast("double").as("percentage_of_license_text"))
      val incoming = shaped(base.filter(col("k") >= 600 && col("k") < 1800))
        .select(
          col("download_url"), col("path"),
          concat(lit("nn"), col("k").cast("string")).as("name"),
          (col("k") + 1000).cast("long").as("size"),
          when(col("k") % 2 === 0,
            concat(lit("lic-new-"), col("k").cast("string")))
            .otherwise(lit("")).as("detected_license_expression"),
          when(col("k") % 5 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("c-new-"), col("k").cast("string")))
            .as("copyrights"),
          when(col("k") % 4 === 0, lit(0.0))
            .otherwise((col("k") % 9 + 1).cast("double"))
            .as("percentage_of_license_text"))
      MergeEngine.upsertResourcesScanFields(existing, incoming,
        Seq("detected_license_expression", "copyrights",
          "percentage_of_license_text"))
        .orderBy("path")
    },
    Some("""WITH existing AS (
        SELECT 'http://repo/p' || CAST(p_partkey % 40 AS VARCHAR)
            AS download_url,
          'res/' || CAST(p_partkey AS VARCHAR) AS path,
          'n' || CAST(p_partkey AS VARCHAR) AS name,
          CAST(p_partkey % 100 AS BIGINT) AS size,
          CASE WHEN p_partkey % 3 = 0
            THEN 'lic-old-' || CAST(p_partkey AS VARCHAR)
            ELSE '' END AS detected_license_expression,
          'c-old-' || CAST(p_partkey AS VARCHAR) AS copyrights,
          CAST(p_partkey % 7 AS DOUBLE) AS percentage_of_license_text
        FROM part WHERE p_partkey < 1200),
      incoming AS (
        SELECT 'http://repo/p' || CAST(p_partkey % 40 AS VARCHAR)
            AS download_url,
          'res/' || CAST(p_partkey AS VARCHAR) AS path,
          'nn' || CAST(p_partkey AS VARCHAR) AS name,
          CAST(1000 + p_partkey AS BIGINT) AS size,
          CASE WHEN p_partkey % 2 = 0
            THEN 'lic-new-' || CAST(p_partkey AS VARCHAR)
            ELSE '' END AS detected_license_expression,
          CASE WHEN p_partkey % 5 = 0 THEN NULL
            ELSE 'c-new-' || CAST(p_partkey AS VARCHAR) END AS copyrights,
          CASE WHEN p_partkey % 4 = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(p_partkey % 9 + 1 AS DOUBLE) END
            AS percentage_of_license_text
        FROM part WHERE p_partkey >= 600 AND p_partkey < 1800)
      SELECT
        COALESCE(e.download_url, n.download_url) AS download_url,
        COALESCE(e.path, n.path) AS path,
        CASE WHEN e.path IS NOT NULL THEN e.name ELSE n.name END AS name,
        CASE WHEN e.path IS NOT NULL THEN e.size ELSE n.size END AS size,
        CASE WHEN e.path IS NULL THEN n.detected_license_expression
          WHEN n.path IS NOT NULL AND n.detected_license_expression <> ''
            THEN n.detected_license_expression
          ELSE e.detected_license_expression END
          AS detected_license_expression,
        CASE WHEN e.path IS NULL THEN n.copyrights
          WHEN n.copyrights IS NOT NULL AND n.copyrights <> ''
            THEN n.copyrights
          ELSE e.copyrights END AS copyrights,
        CASE WHEN e.path IS NULL THEN n.percentage_of_license_text
          WHEN n.percentage_of_license_text IS NOT NULL
            AND n.percentage_of_license_text <> 0
            THEN n.percentage_of_license_text
          ELSE e.percentage_of_license_text END
          AS percentage_of_license_text
      FROM existing e FULL OUTER JOIN incoming n
        ON e.download_url = n.download_url AND e.path = n.path
      ORDER BY path"""))

  val defs: Seq[QueryDef] =
    Seq(a6merge, exact, snippet, rank, halohash, scanIndex, packageSets,
      resourceUpsert)
}
