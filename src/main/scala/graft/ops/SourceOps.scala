package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-surface queries for the source-side operators that are
  * SQL-checkable: JSON codec (S4/F10) and HTML link scraping (S8),
  * plus the ClearlyDefined-style incremental dedup (S10/ST7) and the
  * multimodal feature plumbing (rows-only).
  */
object SourceOps {

  /** Cache-path key for /tmp derived layouts: the FULL sanitized input
    * dir (no hashCode — two dirs can collide) plus a content
    * fingerprint of the source table's parquet files (name+size+mtime),
    * so a corpus regenerated in place gets a fresh cache instead of
    * silently serving stale partitioned data across sessions. */
  private[ops] def cacheKey(dir: String, table: String): String = {
    val sanitized = dir.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    val p = java.nio.file.Paths.get(dir, s"$table.parquet")
    def stat(f: java.nio.file.Path): String =
      s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(f).toMillis};"
    val sig =
      if (!java.nio.file.Files.exists(p)) "nosrc"
      else {
        // a table may be a single parquet file or a directory of parts
        val parts =
          if (java.nio.file.Files.isDirectory(p)) {
            val listing = java.nio.file.Files.list(p)
            try {
              val it = listing.iterator()
              val sb = new StringBuilder
              while (it.hasNext) sb.append(stat(it.next()))
              sb.toString
            } finally listing.close()
          } else stat(p)
        java.security.MessageDigest.getInstance("MD5")
          .digest(parts.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
      }
    s"${sanitized}_$sig"
  }

  val s4json = QueryDef(
    "s4_json_codec", "S4/F10/S16",
    "JSON payload extraction from the events props column",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          to_json(struct(col("event_id"), col("event_type"))).as("as_json"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        '{"event_id":' || CAST(event_id AS VARCHAR) || ',"event_type":"' ||
          event_type || '"}' AS as_json
      FROM events ORDER BY event_id"""))

  val s8html = QueryDef(
    "s8_html_link_scrape", "S8",
    "href link extraction from repo listing HTML via regexp_extract_all",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("html",
          concat(lit("""<html><a href="/pkg/"""), col("doc_id").cast("string"),
            lit("""">p</a> <a href="http://mirror/"""), col("source"),
            lit("""">m</a></html>""")))
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(html, 'href=\"([^\"]+)\"', 1)"))
            .as("link"))
        .orderBy("doc_id", "link"),
    Some("""WITH h AS (
        SELECT doc_id,
          '<html><a href="/pkg/' || CAST(doc_id AS VARCHAR) ||
          '">p</a> <a href="http://mirror/' || source ||
          '">m</a></html>' AS html
        FROM documents)
      SELECT doc_id,
        unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS link
      FROM h ORDER BY doc_id, link"""))

  val s10sync = QueryDef(
    "s10_incremental_sync", "S10/ST7/J12",
    "ClearlyDefined-style incremental dedup: only changed (path, etag) land",
    (s, dir) => {
      // existing state: first 300 docs at etag v1; fetched page: all docs,
      // docs divisible by 3 carry a NEW etag → expected new rows =
      // doc_id >= 300 plus changed etags
      val existing = t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(concat(lit("cd/def/"), col("doc_id").cast("string")).as("path"),
          lit("v1").as("etag"))
      val fetched = t(s, dir, "documents")
        .select(concat(lit("cd/def/"), col("doc_id").cast("string")).as("path"),
          when(col("doc_id") % 3 === 0, lit("v2")).otherwise(lit("v1"))
            .as("etag"),
          md5(col("text")).as("content_sha"))
      fetched.join(existing, Seq("path", "etag"), "left_anti")
        .orderBy("path")
    },
    Some("""WITH existing AS (
        SELECT 'cd/def/' || CAST(doc_id AS VARCHAR) AS path, 'v1' AS etag
        FROM documents WHERE doc_id < 300),
      fetched AS (
        SELECT 'cd/def/' || CAST(doc_id AS VARCHAR) AS path,
          CASE WHEN doc_id % 3 = 0 THEN 'v2' ELSE 'v1' END AS etag,
          md5(text) AS content_sha
        FROM documents)
      SELECT f.path, f.etag, f.content_sha FROM fetched f
      WHERE NOT EXISTS (SELECT 1 FROM existing e
        WHERE e.path = f.path AND e.etag = f.etag)
      ORDER BY f.path"""))

  /** Build a synthetic ClearlyDefined harvest payload per document
    * (all fields derived from k = doc_id % 50, so duplicate items are
    * byte-identical and the output is deterministic), run the real
    * executor-side harvest mapping, and emit the merged packages. */
  private def harvestItems(s: SparkSession, dir: String) = {
    val k = (col("doc_id") % 50).cast("int")
    t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(
        concat(lit("cd/item/"), col("doc_id").cast("string")).as("path"),
        to_json(struct(
          struct(
            struct(array(struct(
              lit("generic").as("type"),
              concat(lit("doc"), k.cast("string")).as("name"),
              concat(lit("http://cd/pkg/"), k.cast("string"))
                .as("download_url"),
              concat(lit("1."), (k % 3).cast("string")).as("version"),
              lit("harvested").as("description")
            )).as("packages")).as("summary"),
            array(
              struct(
                concat(lit("f/"), k.cast("string"), lit("/a.txt")).as("path"),
                lit("file").as("type"),
                array(lit("mit"), lit("apache-2.0"), lit("mit"))
                  .as("license_expressions"),
                array().cast("array<struct<value:string>>").as("copyrights")),
              struct(
                concat(lit("f/"), k.cast("string")).as("path"),
                lit("directory").as("type"),
                array().cast("array<string>").as("license_expressions"),
                array(struct(lit("(c) Acme").as("value")),
                  struct(lit("(c) Acme").as("value"))).as("copyrights"))
            ).as("files")
          ).as("content"))).as("data"))
  }

  /** Existing catalog side for the harvest merge: even package keys
    * already exist at mining level 10 with a description. */
  private def harvestCatalog(s: SparkSession, dir: String) =
    t(s, dir, "documents").filter(col("doc_id") < 50 &&
        col("doc_id") % 2 === 0)
      .select(
        concat(lit("http://cd/pkg/"), col("doc_id").cast("string"))
          .as("download_url"),
        lit("generic").as("ptype"),
        lit(null).cast("string").as("namespace"),
        concat(lit("doc"), col("doc_id").cast("string")).as("name"),
        concat(lit("1."), (col("doc_id") % 3).cast("string")).as("version"),
        lit(null).cast("string").as("qualifiers"),
        lit(null).cast("string").as("subpath"),
        lit(null).cast("string").as("primary_language"),
        lit("have desc").as("description"),
        lit(null).cast("string").as("homepage_url"),
        lit(null).cast("string").as("declared_license_expression"),
        lit(null).cast("string").as("copyright"),
        lit(null).cast("string").as("md5"),
        lit(null).cast("string").as("sha1"),
        lit(null).cast("string").as("sha256"),
        lit(null).cast("string").as("sha512"),
        lit(null).cast("long").as("size"),
        lit(null).cast("timestamp").as("release_date"),
        lit(10).as("mining_level"),
        lit(null).cast("int").as("package_content"),
        array().cast("array<string>").as("keywords"),
        array().cast("array<struct<timestamp:string,message:string>>")
          .as("history"))

  val cdHarvest = QueryDef(
    "s_cd_harvest_map", "S10/A6 (clearindex)",
    "ClearlyDefined harvest payloads → fill-empty package merge",
    (s, dir) => {
      val out = graft.clearindex.Harvest.mapHarvests(s,
        harvestCatalog(s, dir), harvestItems(s, dir),
        "2026-08-12T00:00:00Z")
      out.packages
        .select(col("download_url"), col("name"), col("version"),
          col("description"), col("mining_level"))
        .orderBy("download_url")
    },
    Some("""WITH ks AS (
        SELECT DISTINCT CAST(doc_id % 50 AS INTEGER) AS k
        FROM documents WHERE doc_id < 200)
      SELECT 'http://cd/pkg/' || CAST(k AS VARCHAR) AS download_url,
        'doc' || CAST(k AS VARCHAR) AS name,
        '1.' || CAST(k % 3 AS VARCHAR) AS version,
        CASE WHEN k % 2 = 0 THEN 'have desc' ELSE 'harvested' END
          AS description,
        CASE WHEN k % 2 = 0 THEN 10 ELSE 0 END AS mining_level
      FROM ks ORDER BY download_url"""))

  val cdResources = QueryDef(
    "s_cd_harvest_resources", "S10 (clearindex resources)",
    "harvest file rows: dedup per (package, path), statements joined",
    (s, dir) => {
      val out = graft.clearindex.Harvest.mapHarvests(s,
        harvestCatalog(s, dir), harvestItems(s, dir),
        "2026-08-12T00:00:00Z")
      out.resources
        .select(col("download_url"), col("path"), col("is_file"),
          col("license_expression"), col("copyright"))
        .orderBy("download_url", "path")
    },
    Some("""WITH ks AS (
        SELECT DISTINCT CAST(doc_id % 50 AS INTEGER) AS k
        FROM documents WHERE doc_id < 200),
      rows_ AS (
        SELECT 'http://cd/pkg/' || CAST(k AS VARCHAR) AS download_url,
          'f/' || CAST(k AS VARCHAR) || '/a.txt' AS path,
          TRUE AS is_file,
          'apache-2.0' || chr(10) || 'mit' AS license_expression,
          CAST(NULL AS VARCHAR) AS copyright
        FROM ks
        UNION ALL
        SELECT 'http://cd/pkg/' || CAST(k AS VARCHAR),
          'f/' || CAST(k AS VARCHAR), FALSE,
          CAST(NULL AS VARCHAR), '(c) Acme'
        FROM ks)
      SELECT * FROM rows_ ORDER BY download_url, path"""))

  val mmFeatures = QueryDef(
    "mm_feature_extract", "LLM-pipeline: multimodal columns",
    "media payloads → REAL image decode → descriptor embedding + norm",
    (s, dir) => graft.multimodal.Multimodal.featureSummary(s, dir),
    // Full mirror of the pipeline: the image pixel sums recompute from
    // the seeded-FNV pixel formula (as in mm_image_stats), then every
    // row's 64-dim embedding re-derives from its decoded-feature
    // descriptor with the seeded FNV-1a + fmix mirror (128-bit-safe
    // multiplies), float32 rounding via CAST AS FLOAT, and the norm
    // accumulated in index order (list_reduce) to match the JVM's
    // left-to-right sum exactly.
    Some("""WITH img AS (
  SELECT doc_id, CAST(n_chars % 64 + 8 AS INTEGER) AS w,
         CAST(n_chars % 48 + 6 AS INTEGER) AS h
  FROM documents WHERE doc_id % 3 = 0),
px AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM img),
pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px),
keys AS (
  SELECT doc_id, w, h,
    CAST(doc_id AS VARCHAR) || ':' || CAST(x AS VARCHAR) || ':'
      || CAST(y AS VARCHAR) AS key
  FROM pxy),
kfnv AS (
  SELECT doc_id, w, h,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        list_transform(range(1, length(key)+1),
          i -> CAST(unicode(substr(key, i, 1)) AS HUGEINT))),
      (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                 * 1099511628211) % 18446744073709551616) AS h0
  FROM keys),
k1 AS (SELECT doc_id, w, h,
  CAST(xor(CAST(h0 AS UBIGINT), CAST(h0 AS UBIGINT) // 8589934592) AS HUGEINT) AS f1
  FROM kfnv),
k2 AS (SELECT doc_id, w, h,
  (((f1 * (18397679294719823053 // 4294967296)) % 4294967296) * 4294967296
   + f1 * (18397679294719823053 % 4294967296)) % 18446744073709551616 AS f2
  FROM k1),
k3 AS (SELECT doc_id, w, h,
  CAST(xor(CAST(f2 AS UBIGINT), CAST(f2 AS UBIGINT) // 8589934592) AS HUGEINT) AS f3
  FROM k2),
k4 AS (SELECT doc_id, w, h,
  (((f3 * (14181476777654086739 // 4294967296)) % 4294967296) * 4294967296
   + f3 * (14181476777654086739 % 4294967296)) % 18446744073709551616 AS f4
  FROM k3),
kpx AS (SELECT doc_id, w, h,
  xor(CAST(f4 AS UBIGINT), CAST(f4 AS UBIGINT) // 8589934592) % 16777216 AS p
  FROM k4),
isum AS (
  SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
    CAST(SUM(p // 65536 + (p // 256) % 256 + p % 256) AS BIGINT) AS psum
  FROM kpx GROUP BY doc_id),
media AS (
  SELECT doc_id, 'image' AS kind, w, h, psum FROM isum
  UNION ALL
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
    0 AS w, 0 AS h, CAST(-1 AS BIGINT) AS psum
  FROM documents WHERE doc_id % 3 <> 0),
descr AS (
  SELECT doc_id, kind, w, h, psum,
    kind || ':' || CAST(doc_id AS VARCHAR) || ':' || CAST(w AS VARCHAR)
      || ':' || CAST(h AS VARCHAR) || ':' || CAST(psum AS VARCHAR) AS d
  FROM media),
dims AS (SELECT doc_id, kind, w, h, psum, d, unnest(range(0, 64)) AS i
  FROM descr),
sm AS (SELECT doc_id, kind, w, h, psum, d, i,
  (CAST(i AS HUGEINT) * 11400714819323198485 + 2685821657736338717)
    % 18446744073709551616 AS u0
  FROM dims),
s1 AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(u0 AS UBIGINT), CAST(u0 AS UBIGINT) // 8589934592) AS HUGEINT) AS g1
  FROM sm),
s2 AS (SELECT doc_id, kind, w, h, psum, d, i,
  (((g1 * (18397679294719823053 // 4294967296)) % 4294967296) * 4294967296
   + g1 * (18397679294719823053 % 4294967296)) % 18446744073709551616 AS g2
  FROM s1),
s3 AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(g2 AS UBIGINT), CAST(g2 AS UBIGINT) // 8589934592) AS HUGEINT) AS g3
  FROM s2),
s4 AS (SELECT doc_id, kind, w, h, psum, d, i,
  (((g3 * (14181476777654086739 // 4294967296)) % 4294967296) * 4294967296
   + g3 * (14181476777654086739 % 4294967296)) % 18446744073709551616 AS g4
  FROM s3),
s5 AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(g4 AS UBIGINT), CAST(g4 AS UBIGINT) // 8589934592) AS HUGEINT) AS gs
  FROM s4),
init AS (SELECT doc_id, kind, w, h, psum, d, i,
  CAST(xor(CAST(14695981039346656037 AS UBIGINT), CAST(gs AS UBIGINT)) AS HUGEINT) AS b0
  FROM s5),
body AS (
  SELECT doc_id, kind, w, h, psum, i,
    list_reduce(
      list_prepend(b0,
        list_transform(range(1, length(d)+1),
          c -> CAST(unicode(substr(d, c, 1)) AS HUGEINT))),
      (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                 * 1099511628211) % 18446744073709551616) AS hb
  FROM init),
b1 AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(xor(CAST(hb AS UBIGINT), CAST(hb AS UBIGINT) // 8589934592) AS HUGEINT) AS e1
  FROM body),
b2 AS (SELECT doc_id, kind, w, h, psum, i,
  (((e1 * (18397679294719823053 // 4294967296)) % 4294967296) * 4294967296
   + e1 * (18397679294719823053 % 4294967296)) % 18446744073709551616 AS e2
  FROM b1),
b3 AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(xor(CAST(e2 AS UBIGINT), CAST(e2 AS UBIGINT) // 8589934592) AS HUGEINT) AS e3
  FROM b2),
b4 AS (SELECT doc_id, kind, w, h, psum, i,
  (((e3 * (14181476777654086739 // 4294967296)) % 4294967296) * 4294967296
   + e3 * (14181476777654086739 % 4294967296)) % 18446744073709551616 AS e4
  FROM b3),
b5 AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(xor(CAST(e4 AS UBIGINT), CAST(e4 AS UBIGINT) // 8589934592) AS HUGEINT) AS hf
  FROM b4),
sg AS (SELECT doc_id, kind, w, h, psum, i,
  CASE WHEN hf >= 9223372036854775808 THEN hf - 18446744073709551616
       ELSE hf END AS hs
  FROM b5),
vals AS (SELECT doc_id, kind, w, h, psum, i,
  CAST(CAST(CAST(hs AS DOUBLE) / 9223372036854775807 AS FLOAT) AS DOUBLE) AS v
  FROM sg),
norm2 AS (
  SELECT doc_id, kind, w, h, psum,
    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(v * v ORDER BY i)),
      (a, b) -> a + b) AS n2
  FROM vals GROUP BY doc_id, kind, w, h, psum)
SELECT doc_id AS media_id, kind, w AS width, h AS height,
  psum AS pixel_sum, n2 AS embedding_norm2
FROM norm2 ORDER BY media_id"""))

  val mmImageStats = QueryDef(
    "mm_image_stats", "LLM-pipeline: multimodal columns (oracled)",
    "REAL ImageIO PNG decode → dimensions + exact pixel sums",
    (s, dir) => graft.multimodal.Multimodal.imageStats(s, dir),
    // The payload pixels are (fnv64("id:x:y") & 0xffffff) and PNG RGB
    // is lossless, so the oracle recomputes the decoded statistics
    // from the formula — same FNV-1a + fmix mirror as the simhash
    // oracle (multiplies split into 32-bit halves for HUGEINT).
    Some("""WITH img AS (
        SELECT doc_id, CAST(n_chars % 64 + 8 AS INTEGER) AS w,
          CAST(n_chars % 48 + 6 AS INTEGER) AS h
        FROM documents WHERE doc_id % 3 = 0),
      px AS (
        SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM img),
      pxy AS (
        SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px),
      keys AS (
        SELECT doc_id, w, h,
          CAST(doc_id AS VARCHAR) || ':' || CAST(x AS VARCHAR) || ':' ||
            CAST(y AS VARCHAR) AS key
        FROM pxy),
      fnv AS (
        SELECT doc_id, w, h,
          list_reduce(
            list_prepend(CAST(14695981039346656037 AS HUGEINT),
              list_transform(range(1, length(key)+1),
                i -> CAST(unicode(substr(key, i, 1)) AS HUGEINT))),
            (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                       * 1099511628211) % 18446744073709551616) AS h0
        FROM keys),
      m1 AS (SELECT doc_id, w, h,
        CAST(xor(CAST(h0 AS UBIGINT), CAST(h0 AS UBIGINT) // 8589934592) AS HUGEINT) AS f1
        FROM fnv),
      m2 AS (SELECT doc_id, w, h,
        (((CAST(f1 AS HUGEINT) * (18397679294719823053 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(f1 AS HUGEINT) * (18397679294719823053 % 4294967296))
          % 18446744073709551616 AS f2 FROM m1),
      m3 AS (SELECT doc_id, w, h,
        CAST(xor(CAST(f2 AS UBIGINT), CAST(f2 AS UBIGINT) // 8589934592) AS HUGEINT) AS f3
        FROM m2),
      m4 AS (SELECT doc_id, w, h,
        (((CAST(f3 AS HUGEINT) * (14181476777654086739 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(f3 AS HUGEINT) * (14181476777654086739 % 4294967296))
          % 18446744073709551616 AS f4 FROM m3),
      pxv AS (SELECT doc_id, w, h,
        xor(CAST(f4 AS UBIGINT), CAST(f4 AS UBIGINT) // 8589934592) % 16777216 AS p
        FROM m4)
      SELECT doc_id AS media_id, MAX(w) AS width, MAX(h) AS height,
        CAST(SUM(p // 65536 + (p // 256) % 256 + p % 256) AS BIGINT) AS pixel_sum
      FROM pxv GROUP BY doc_id ORDER BY media_id"""))

  val mmAudioStats = QueryDef(
    "mm_audio_stats", "LLM-pipeline: multimodal columns (oracled)",
    "REAL javax.sound WAV decode → sample rate/count + exact sample stats",
    (s, dir) => graft.multimodal.Multimodal.audioStats(s, dir),
    // Samples are ((fnv64("id:a:i") & 0xffff) - 32768) and 16-bit PCM
    // is lossless, so the oracle recomputes the decoded statistics
    // from the formula — same FNV-1a + fmix mirror as mm_image_stats.
    Some("""WITH aud AS (
        SELECT doc_id, CAST(n_chars % 400 + 100 AS INTEGER) AS n
        FROM documents WHERE doc_id % 3 = 1),
      idx AS (SELECT doc_id, unnest(range(0, n)) AS i FROM aud),
      keys AS (
        SELECT doc_id,
          CAST(doc_id AS VARCHAR) || ':a:' || CAST(i AS VARCHAR) AS key
        FROM idx),
      fnv AS (
        SELECT doc_id,
          list_reduce(
            list_prepend(CAST(14695981039346656037 AS HUGEINT),
              list_transform(range(1, length(key)+1),
                i -> CAST(unicode(substr(key, i, 1)) AS HUGEINT))),
            (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                       * 1099511628211) % 18446744073709551616) AS h0
        FROM keys),
      m1 AS (SELECT doc_id,
        CAST(xor(CAST(h0 AS UBIGINT), CAST(h0 AS UBIGINT) // 8589934592) AS HUGEINT) AS f1
        FROM fnv),
      m2 AS (SELECT doc_id,
        (((CAST(f1 AS HUGEINT) * (18397679294719823053 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(f1 AS HUGEINT) * (18397679294719823053 % 4294967296))
          % 18446744073709551616 AS f2 FROM m1),
      m3 AS (SELECT doc_id,
        CAST(xor(CAST(f2 AS UBIGINT), CAST(f2 AS UBIGINT) // 8589934592) AS HUGEINT) AS f3
        FROM m2),
      m4 AS (SELECT doc_id,
        (((CAST(f3 AS HUGEINT) * (14181476777654086739 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(f3 AS HUGEINT) * (14181476777654086739 % 4294967296))
          % 18446744073709551616 AS f4 FROM m3),
      vals AS (SELECT doc_id,
        CAST(xor(CAST(f4 AS UBIGINT), CAST(f4 AS UBIGINT) // 8589934592)
          % 65536 AS BIGINT) - 32768 AS v
        FROM m4)
      SELECT doc_id AS media_id, CAST(16000 AS INTEGER) AS sample_rate,
        CAST(COUNT(*) AS INTEGER) AS n_samples,
        CAST(SUM(v) AS BIGINT) AS sum_samples,
        CAST(MAX(abs(v)) AS INTEGER) AS max_abs
      FROM vals GROUP BY doc_id ORDER BY media_id"""))

  val mmVideoFrames = QueryDef(
    "mm_video_frames", "LLM-pipeline: multimodal columns (oracled)",
    "AVI (RIFF) demux → every 3rd PNG frame REALLY decoded → stats",
    (s, dir) => graft.multimodal.Multimodal.videoFrameStats(s, dir),
    // Frame pixels are (fnv64("(id*1000+f):x:y") & 0xffffff); the
    // oracle recomputes each sampled frame's dimensions and pixel sum
    // from the formula (mm_image_stats check, per frame).
    Some("""WITH vid AS (
        SELECT doc_id, CAST(n_chars % 8 + 3 AS INTEGER) AS nf,
          CAST(n_chars % 16 + 8 AS INTEGER) AS w,
          CAST(n_chars % 12 + 6 AS INTEGER) AS h
        FROM documents WHERE doc_id % 3 = 2),
      fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM vid),
      sampled AS (SELECT doc_id, w, h, f FROM fr WHERE f % 3 = 0),
      px AS (SELECT doc_id, w, h, f, unnest(range(0, w)) AS x FROM sampled),
      pxy AS (SELECT doc_id, w, h, f, x, unnest(range(0, h)) AS y FROM px),
      keys AS (
        SELECT doc_id, w, h, f,
          CAST(doc_id * 1000 + f AS VARCHAR) || ':' ||
            CAST(x AS VARCHAR) || ':' || CAST(y AS VARCHAR) AS key
        FROM pxy),
      fnv AS (
        SELECT doc_id, w, h, f,
          list_reduce(
            list_prepend(CAST(14695981039346656037 AS HUGEINT),
              list_transform(range(1, length(key)+1),
                i -> CAST(unicode(substr(key, i, 1)) AS HUGEINT))),
            (a, b) -> (CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
                       * 1099511628211) % 18446744073709551616) AS h0
        FROM keys),
      m1 AS (SELECT doc_id, w, h, f,
        CAST(xor(CAST(h0 AS UBIGINT), CAST(h0 AS UBIGINT) // 8589934592) AS HUGEINT) AS f1
        FROM fnv),
      m2 AS (SELECT doc_id, w, h, f,
        (((CAST(f1 AS HUGEINT) * (18397679294719823053 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(f1 AS HUGEINT) * (18397679294719823053 % 4294967296))
          % 18446744073709551616 AS f2 FROM m1),
      m3 AS (SELECT doc_id, w, h, f,
        CAST(xor(CAST(f2 AS UBIGINT), CAST(f2 AS UBIGINT) // 8589934592) AS HUGEINT) AS f3
        FROM m2),
      m4 AS (SELECT doc_id, w, h, f,
        (((CAST(f3 AS HUGEINT) * (14181476777654086739 // 4294967296)) % 4294967296)
           * 4294967296
         + CAST(f3 AS HUGEINT) * (14181476777654086739 % 4294967296))
          % 18446744073709551616 AS f4 FROM m3),
      pxv AS (SELECT doc_id, w, h, f,
        xor(CAST(f4 AS UBIGINT), CAST(f4 AS UBIGINT) // 8589934592) % 16777216 AS p
        FROM m4)
      SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
        MAX(w) AS width, MAX(h) AS height,
        CAST(SUM(p // 65536 + (p // 256) % 256 + p % 256) AS BIGINT)
          AS pixel_sum
      FROM pxv GROUP BY doc_id, f ORDER BY media_id, frame_idx"""))

  /** S9 — `ls -lR` listing parse (`minecode/ls.py:43-128`,
    * `LsParser`): 50 synthetic listings, each mixing directory-header
    * lines (stateful — they set the path prefix of every following
    * entry), file entries with year dates, time-form dates (no date
    * emitted), directory entries, symlinks (name split on " -> "), and
    * names containing spaces. The REAL line-by-line parser runs per
    * listing; the oracle re-derives each line's expected entry (and
    * its header-scoped prefix) arithmetically from the line index. */
  val s9ls = QueryDef(
    "s9_ls_parse", "S9/X1",
    "ls -lR listings → (path, is_file, size, date) rows",
    (s, dir) => {
      import s.implicits._
      val j = expr("p_partkey DIV 50")
      val months = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
      val lines = t(s, dir, "part").select(
        col("p_partkey").as("k"),
        (col("p_partkey") % 50).as("g"),
        j.as("j"),
        when(j % 10 === 0,
          concat(lit("dir"), col("p_partkey").cast("string"), lit(":")))
        .when(j % 7 === 0,
          concat(lit("drwxr-xr-x 2 u g 4096 Feb 3 2021 sub"),
            col("p_partkey").cast("string")))
        .when(j % 11 === 0,
          concat(lit("lrwxrwxrwx 1 u g 11 Mar 4 12:30 link"),
            col("p_partkey").cast("string"), lit(" -> /t/x")))
        .when(j % 9 === 0,
          concat(lit("-rw-r--r-- 1 u g "),
            (col("p_partkey") * 3).cast("string"),
            lit(" Apr 5 12:34 file"), col("p_partkey").cast("string"),
            lit(".bin")))
        .otherwise(
          concat(lit("-rw-r--r-- 1 u g "),
            (col("p_partkey") * 3).cast("string"),
            lit(" "), element_at(typedLit(months), (j % 12 + 1).cast("int")),
            lit(" "), (j % 28 + 1).cast("string"),
            lit(" "), (j % 30 + 1990).cast("string"),
            lit(" file"), col("p_partkey").cast("string"),
            lit(" v2.bin"))).as("line"))
      lines.as[(Long, Long, Long, String)]
        .groupByKey(_._2)
        .flatMapGroups { (g, it) =>
          val listing = it.toSeq.sortBy(_._1).map(_._4).mkString("\n")
          graft.miners.LsParser.parse(listing).map(e =>
            (g, e.path, e.isFile, e.size, e.date))
        }
        .toDF("g", "path", "is_file", "size", "date")
        .orderBy("g", "path")
    },
    Some("""WITH m AS (
        SELECT p_partkey AS k, p_partkey % 50 AS g,
          p_partkey // 50 AS j
        FROM part),
      e AS (
        SELECT k, g, j,
          'dir' || CAST(50 * (j - j % 10) + g AS VARCHAR) AS cur
        FROM m WHERE j % 10 <> 0)
      SELECT g,
        CASE WHEN j % 7 = 0 THEN cur || '/sub' || CAST(k AS VARCHAR)
             WHEN j % 11 = 0 THEN cur || '/link' || CAST(k AS VARCHAR)
             WHEN j % 9 = 0 THEN cur || '/file' || CAST(k AS VARCHAR)
               || '.bin'
             ELSE cur || '/file' || CAST(k AS VARCHAR) || ' v2.bin'
          END AS path,
        j % 7 <> 0 AND j % 11 <> 0 AS is_file,
        CASE WHEN j % 7 <> 0 AND j % 11 <> 0 THEN k * 3 END AS size,
        CASE WHEN j % 7 = 0 THEN '2021-02-03'
             WHEN j % 11 = 0 THEN NULL
             WHEN j % 9 = 0 THEN NULL
             ELSE CAST(j % 30 + 1990 AS VARCHAR) || '-' ||
               lpad(CAST(j % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
               lpad(CAST(j % 28 + 1 AS VARCHAR), 2, '0')
          END AS date
      FROM e ORDER BY g, path"""))

  /** S11 — Alpine APKINDEX parse (`minecode/miners/alpine.py:67-123`,
    * `EcosystemParsers.apkIndex`): blank-line-separated `K:value`
    * paragraph records; blocks missing the mandatory P/V keys are
    * skipped, optional keys (arch, description, size) may be absent
    * per record. The real text parser runs per synthetic index; the
    * oracle re-derives every kept record's fields arithmetically. */
  val s11apk = QueryDef(
    "s11_apkindex", "S11/X1",
    "APKINDEX paragraphs → package rows (real text parser)",
    (s, dir) => {
      import s.implicits._
      val k = col("p_partkey")
      val ks = k.cast("string")
      val blocks = t(s, dir, "part").select(
        k.as("k"),
        (k % 50).as("g"),
        concat_ws("\n",
          concat(lit("P:pkg"), ks),
          // k%13==0 blocks lack the mandatory V → whole block skipped
          when(k % 13 =!= 0, concat(lit("V:1."), (k % 5).cast("string"))),
          when(k % 2 === 0, lit("A:x86_64")),
          when(k % 7 =!= 0, concat(lit("T:desc "), ks)),
          when(k % 3 === 0, lit("L:GPL-2.0")).otherwise(lit("L:MIT")),
          when(k % 11 =!= 0, concat(lit("S:"), (k * 7).cast("string"))),
          concat(lit("t:"), (k + 1700000000L).cast("string"))).as("block"))
      blocks.as[(Long, Long, String)]
        .groupByKey(_._2)
        .flatMapGroups { (g, it) =>
          val text = it.toSeq.sortBy(_._1).map(_._3).mkString("\n\n")
          graft.sources.EcosystemParsers.apkIndex(text).map(e =>
            (g, e.name, e.version, e.arch, e.description, e.license,
              e.size, e.buildDate))
        }
        .toDF("g", "name", "version", "arch", "description", "license",
          "size", "build_date")
        .orderBy("g", "name")
    },
    Some("""SELECT p_partkey % 50 AS g,
        'pkg' || CAST(p_partkey AS VARCHAR) AS name,
        '1.' || CAST(p_partkey % 5 AS VARCHAR) AS version,
        CASE WHEN p_partkey % 2 = 0 THEN 'x86_64' END AS arch,
        CASE WHEN p_partkey % 7 <> 0
          THEN 'desc ' || CAST(p_partkey AS VARCHAR) END AS description,
        CASE WHEN p_partkey % 3 = 0 THEN 'GPL-2.0' ELSE 'MIT' END
          AS license,
        CASE WHEN p_partkey % 11 <> 0 THEN p_partkey * 7 END AS size,
        p_partkey + 1700000000 AS build_date
      FROM part WHERE p_partkey % 13 <> 0
      ORDER BY g, name"""))

  // --- x1/x2 fixtures: a deterministic PyPI registry derived from the
  // part key, so the REAL visitor/mapper machinery (HttpVisitor robots
  // gate + transport error path, json4s parse, purl normalization, the
  // pypiPackages field extraction) runs executor-side while the oracle
  // re-derives every yielded row in closed form.

  private[ops] object PypiFixture {
    /** k is encoded at the tail of the package name; the three name
      * families exercise purl normalization (lowercase, `_` → `-`,
      * `.` kept). */
    def nameOf(k: Long): String = (k % 3) match {
      case 0 => s"Pkg_A$k"
      case 1 => s"pkg-b$k"
      case _ => s"PKG.c$k"
    }

    def uriOf(k: Long): String =
      s"http://mirror${k % 5}.example/pypi/${nameOf(k)}/json"

    /** Package JSON for the X1 visitor: 1+k%3 releases `0.i.(k%7)`;
      * k%17==0 → a releases-less document (payload, zero yields). */
    def packageJson(k: Long): String = {
      val rel =
        if (k % 17 == 0) ""
        else (0 until (1 + (k % 3)).toInt)
          .map(i => s""""0.$i.${k % 7}":[]""").mkString(",")
      s"""{"info":{"name":"${nameOf(k)}"},"releases":{$rel}}"""
    }

    /** Release JSON for the X2 mapper: every pypiPackages extraction
      * branch keyed off k — summary/description join, license vs
      * classifier fallback, keyword splitting, author/maintainer
      * parties, off-PyPI download_url vs the urls block with digests
      * and upload dates. Absent fields are empty strings (str()
      * filters those, matching the reference's `or None` habit). */
    def releaseJson(k: Long): String = {
      val name = s"Mp$k"
      val classifiers =
        if (k % 2 == 1)
          """"classifiers":["Development Status :: 4 - Beta",""" +
            """"License :: OSI Approved :: MIT License"],"""
        else ""
      val urls = (0 to (k % 2).toInt).map { i =>
        s"""{"url":"https://files.example/$name-$i.whl",""" +
          s""""size":${k * 10 + i},"md5_digest":"aa${k}x$i",""" +
          s""""digests":{"sha256":"ff${k}x$i"},""" +
          s""""upload_time":"2021-0${1 + k % 9}-1${i}T05:06:07"}"""
      }.mkString(",")
      s"""{"info":{"name":"$name","version":"1.${k % 9}",""" +
        s""""summary":"${if (k % 4 != 0) s"Sum $k" else ""}",""" +
        s""""description":"${if (k % 5 != 0) s"Long desc $k" else ""}",""" +
        s""""home_page":"${if (k % 6 != 0) s"https://home.example/$k" else ""}",""" +
        s""""license":"${if (k % 2 == 0) "MIT" else "UNKNOWN"}",""" +
        classifiers +
        s""""keywords":"${if (k % 3 == 0) s"alpha, beta$k ,, gamma" else ""}",""" +
        s""""author":"${if (k % 4 <= 1) s"Au $k" else ""}",""" +
        s""""author_email":"${if (k % 4 == 1 || k % 4 == 2) s"a$k@x.io" else ""}",""" +
        s""""maintainer":"${if (k % 7 == 0) s"Mn $k" else ""}",""" +
        s""""maintainer_email":"${if (k % 7 == 0) s"mn$k@x.io" else ""}",""" +
        s""""download_url":"${if (k % 4 == 0) s"http://ext.example/p$k.tar.gz" else "UNKNOWN"}"},""" +
        s""""urls":[$urls]}"""
    }

    /** Zero-egress transport: answers from the fixture; k%13 → error. */
    val transport: graft.miners.Transport = new graft.miners.Transport {
      def fetch(uri: String): Either[String, Array[Byte]] = {
        val k = "(\\d+)/json$".r.findFirstMatchIn(uri).get.group(1).toLong
        if (k % 13 == 0) Left(s"HTTP 404: $uri")
        else Right(packageJson(k).getBytes("UTF-8"))
      }
    }
  }

  /** X1 — the visitor generator contract under the driver oracle: one
    * frontier URI per part key visited by the real [[graft.miners.
    * HttpVisitor]] (robots.txt gate parsed by the real
    * `Robots.parse`, fetch errors in-band) expanding through the real
    * pypi package visitor (`minecode/miners/pypi.py:82-101`), i.e. the
    * reference's `Visitor.__call__` 3-tuple (uris, payload, error)
    * (`minecode/miners/__init__.py:137-188`). Error rows yield
    * nothing, releases-less payloads yield an empty expansion, and
    * each yielded URI carries the normalized purl — all re-derived in
    * closed form by the oracle. */
  val x1visitor = QueryDef(
    "x1_visitor_expand", "X1/S2/S3",
    "real HttpVisitor + pypi package visitor over a fixture registry",
    (s, dir) => {
      import s.implicits._
      import graft.miners.{HttpVisitor, RegistryVisitors}
      val robots = Map("mirror0.example" ->
        graft.sources.Robots.parse("User-agent: *\nDisallow: /pypi/"))
      val visitor = new HttpVisitor(
        PypiFixture.transport,
        bytes => RegistryVisitors
          .pypiPackageUris(new String(bytes, "UTF-8"), "seed").map(_.uri),
        robots)
      par(t(s, dir, "part").filter(col("p_partkey") < 180)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          val uri = PypiFixture.uriOf(k)
          val r = visitor.visit(uri)
          r.error match {
            case Some(e) =>
              Seq((uri, null: String, null: String, false, e))
            case None =>
              val vus = RegistryVisitors.pypiPackageUris(
                new String(r.payload.get, "UTF-8"), uri)
              if (vus.isEmpty)
                Seq((uri, null: String, null: String, true, null: String))
              else vus.map(v =>
                (uri, v.uri, v.packageUrl.orNull, true, null: String))
          }
        }
        .toDF("uri", "yielded_uri", "purl", "has_payload", "error")
        .orderBy("uri", "yielded_uri")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k,
          CASE p_partkey % 3
            WHEN 0 THEN 'Pkg_A' || CAST(p_partkey AS VARCHAR)
            WHEN 1 THEN 'pkg-b' || CAST(p_partkey AS VARCHAR)
            ELSE 'PKG.c' || CAST(p_partkey AS VARCHAR) END AS name
        FROM part WHERE p_partkey < 180),
      u AS (
        SELECT k, name,
          'http://mirror' || CAST(k % 5 AS VARCHAR) || '.example/pypi/'
            || name || '/json' AS uri
        FROM base),
      errs AS (
        SELECT uri, CAST(NULL AS VARCHAR) AS yielded_uri,
          CAST(NULL AS VARCHAR) AS purl, FALSE AS has_payload,
          CASE WHEN k % 5 = 0 THEN 'disallowed by robots.txt: ' || uri
               ELSE 'HTTP 404: ' || uri END AS error
        FROM u WHERE k % 5 = 0 OR k % 13 = 0),
      empties AS (
        SELECT uri, CAST(NULL AS VARCHAR) AS yielded_uri,
          CAST(NULL AS VARCHAR) AS purl, TRUE AS has_payload,
          CAST(NULL AS VARCHAR) AS error
        FROM u WHERE k % 5 <> 0 AND k % 13 <> 0 AND k % 17 = 0),
      vers AS (
        SELECT k, name, uri, i,
          '0.' || CAST(i AS VARCHAR) || '.' || CAST(k % 7 AS VARCHAR)
            AS ver
        FROM u, (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2) s
        WHERE k % 5 <> 0 AND k % 13 <> 0 AND k % 17 <> 0
          AND i <= k % 3),
      yields AS (
        SELECT uri,
          'https://pypi.python.org/pypi/' || name || '/' || ver
            || '/json' AS yielded_uri,
          'pkg:pypi/' || replace(lower(name), '_', '-') || '@' || ver
            AS purl,
          TRUE AS has_payload, CAST(NULL AS VARCHAR) AS error
        FROM vers)
      SELECT * FROM errs
      UNION ALL SELECT * FROM empties
      UNION ALL SELECT * FROM yields
      ORDER BY uri, yielded_uri"""))

  /** X2 — the mapper `get_packages` contract under the driver oracle:
    * the real [[graft.miners.Mappers.pypiPackages]] (the reference's
    * pypi mapper, `minecode/miners/pypi.py` via
    * `minecode/miners/__init__.py:249-266`) runs over a fixture
    * release document per part key; every extraction branch — the
    * summary+description join, license vs License-classifier fallback
    * with the saneyaml `': '` quoting, keyword splitting, author/
    * maintainer parties, off-PyPI download_url plus the urls block
    * with sizes, digests and date-only release timestamps — is
    * re-derived in closed form by the oracle. */
  val x2mapper = QueryDef(
    "x2_mapper_packages", "X2/X7",
    "real pypi mapper over fixture release documents",
    (s, dir) => {
      import s.implicits._
      par(t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          graft.miners.Mappers.pypiPackages(PypiFixture.releaseJson(k))
            .map { mp =>
              val r = mp.row
              (r.download_url, r.name, r.version, r.size, r.md5,
                r.sha256, r.release_date,
                r.declared_license_expression, r.description,
                r.homepage_url, mp.parties.size, r.keywords.size,
                r.keywords.mkString("|"))
            }
        }
        .toDF("download_url", "name", "version", "size", "md5",
          "sha256", "release_date", "license", "description",
          "homepage_url", "n_parties", "n_keywords", "kw")
        .orderBy("download_url")
    },
    Some("""WITH f AS (
        SELECT p_partkey AS k,
          'Mp' || CAST(p_partkey AS VARCHAR) AS name,
          '1.' || CAST(p_partkey % 9 AS VARCHAR) AS version,
          CASE
            WHEN p_partkey % 4 <> 0 AND p_partkey % 5 <> 0 THEN
              'Sum ' || CAST(p_partkey AS VARCHAR) || chr(10) ||
                'Long desc ' || CAST(p_partkey AS VARCHAR)
            WHEN p_partkey % 4 <> 0 THEN
              'Sum ' || CAST(p_partkey AS VARCHAR)
            WHEN p_partkey % 5 <> 0 THEN
              'Long desc ' || CAST(p_partkey AS VARCHAR)
          END AS description,
          CASE WHEN p_partkey % 6 <> 0 THEN
            'https://home.example/' || CAST(p_partkey AS VARCHAR)
          END AS homepage_url,
          CASE WHEN p_partkey % 2 = 0 THEN '- MIT' || chr(10)
            ELSE '- ''License :: OSI Approved :: MIT License'''
              || chr(10) END AS license,
          CAST(CASE WHEN p_partkey % 4 <> 3 THEN 1 ELSE 0 END
            + CASE WHEN p_partkey % 7 = 0 THEN 1 ELSE 0 END
            AS INTEGER) AS n_parties,
          CAST(CASE WHEN p_partkey % 3 = 0 THEN 3 ELSE 0 END
            AS INTEGER) AS n_keywords,
          CASE WHEN p_partkey % 3 = 0 THEN
            'alpha|beta' || CAST(p_partkey AS VARCHAR) || '|gamma'
          ELSE '' END AS kw
        FROM part WHERE p_partkey < 200),
      offp AS (
        SELECT 'http://ext.example/p' || CAST(k AS VARCHAR)
            || '.tar.gz' AS download_url,
          name, version, CAST(NULL AS BIGINT) AS size,
          CAST(NULL AS VARCHAR) AS md5, CAST(NULL AS VARCHAR) AS sha256,
          CAST(NULL AS TIMESTAMP) AS release_date,
          license, description, homepage_url, n_parties, n_keywords, kw
        FROM f WHERE k % 4 = 0),
      dl AS (
        SELECT 'https://files.example/' || name || '-'
            || CAST(i AS VARCHAR) || '.whl' AS download_url,
          name, version, CAST(k * 10 + i AS BIGINT) AS size,
          'aa' || CAST(k AS VARCHAR) || 'x' || CAST(i AS VARCHAR) AS md5,
          'ff' || CAST(k AS VARCHAR) || 'x' || CAST(i AS VARCHAR)
            AS sha256,
          CAST('2021-0' || CAST(1 + k % 9 AS VARCHAR) || '-1'
            || CAST(i AS VARCHAR) || ' 00:00:00' AS TIMESTAMP)
            AS release_date,
          license, description, homepage_url, n_parties, n_keywords, kw
        FROM f, (SELECT 0 AS i UNION ALL SELECT 1) s
        WHERE i <= k % 2)
      SELECT * FROM offp
      UNION ALL SELECT * FROM dl
      ORDER BY download_url"""))

  // --- s7 fixture: a three-level POM universe (child → par → top)
  // keyed off the part key, served by a zero-egress transport that
  // derives each POM from the requested coordinates.

  private[ops] object PomFixture {
    def childPom(k: Long): String = {
      val lic =
        if (k % 2 == 0)
          "<licenses><license><name>MIT License</name></license></licenses>"
        else ""
      val url =
        if (k % 5 == 0)
          // ${project.version} exercises the interpolation table
          s"<url>https://child.example/$k/v$${project.version}</url>"
        else ""
      val parent =
        if (k % 3 >= 1)
          s"<parent><groupId>com.par</groupId><artifactId>par$k" +
            "</artifactId><version>2.0</version></parent>"
        else ""
      s"<project>$parent<groupId>com.ex.g${k % 10}</groupId>" +
        s"<artifactId>art$k</artifactId><version>1.${k % 4}</version>" +
        s"<name>Art $k</name><description>D$k</description>$url$lic" +
        "</project>"
    }

    def parPom(k: Long): String = {
      val url =
        if (k % 7 != 0) s"<url>https://par.example/$k</url>" else ""
      val parent =
        if (k % 3 == 2)
          s"<parent><groupId>com.top</groupId><artifactId>top$k" +
            "</artifactId><version>3.0</version></parent>"
        else ""
      s"<project>$parent<groupId>com.par</groupId>" +
        s"<artifactId>par$k</artifactId><version>2.0</version>" +
        "<licenses><license><name>The Apache Software License, " +
        s"Version 2.0</name></license></licenses>$url</project>"
    }

    def topPom(k: Long): String = {
      // k%29==0: parent ref back to par — a cycle the ancestry walk
      // must terminate on (same ancestor list as the acyclic case)
      val parent =
        if (k % 29 == 0)
          s"<parent><groupId>com.par</groupId><artifactId>par$k" +
            "</artifactId><version>2.0</version></parent>"
        else ""
      s"<project>$parent<groupId>com.top</groupId>" +
        s"<artifactId>top$k</artifactId><version>3.0</version>" +
        "<licenses><license><name>Eclipse Public License</name>" +
        s"</license></licenses><url>https://top.example/$k</url></project>"
    }

    /** Serves `.../artifactId-version.pom` from the fixture POMs. */
    val transport: graft.miners.Transport = new graft.miners.Transport {
      def fetch(uri: String): Either[String, Array[Byte]] =
        "/([a-z]+)(\\d+)-[^/]+\\.pom$".r.findFirstMatchIn(uri) match {
          case Some(m) =>
            val k = m.group(2).toLong
            m.group(1) match {
              case "art" => Right(childPom(k).getBytes("UTF-8"))
              case "par" => Right(parPom(k).getBytes("UTF-8"))
              case "top" => Right(topPom(k).getBytes("UTF-8"))
              case _     => Left(s"404: $uri")
            }
          case None => Left(s"404: $uri")
        }
    }
  }

  /** S7 — POM parse + parent-ancestry merge under the driver oracle:
    * the real `MavenPom` machinery (XML parse with `${...}`
    * interpolation, license-name normalization, `getAncestry`'s
    * transport walk with its cycle guard, and `mergeAncestors`'
    * fill-only-when-empty fold with history notes —
    * `minecode/collectors/maven.py:162-260`) runs executor-side over
    * a three-level fixture POM universe. The oracle re-derives the
    * merged fields in closed form, including the oldest-ancestor-wins
    * fill order and the exact history messages. */
  val s7pom = QueryDef(
    "s7_pom_ancestry", "S7/X1",
    "real POM ancestry walk and merge over a fixture POM universe",
    (s, dir) => {
      import s.implicits._
      import graft.miners.MavenPom
      par(t(s, dir, "part").filter(col("p_partkey") < 150)
        .select(col("p_partkey").as("k"))).as[Long]
        .map { k =>
          val childPom = PomFixture.childPom(k)
          val pkg = MavenPom.toPackage(childPom).get
          val anc = MavenPom.getAncestry(childPom, PomFixture.transport)
          val merged = MavenPom.mergedAncestorPackage(
            pkg, PomFixture.transport)
          (k, merged.namespace, merged.name, merged.version,
            merged.declared_license_expression, merged.homepage_url,
            merged.description, anc.size,
            merged.history.map(_.message).mkString("; "))
        }
        .toDF("k", "namespace", "name", "version", "license",
          "homepage", "description", "n_ancestors", "history")
        .orderBy("k")
    },
    Some("""WITH f AS (
        SELECT p_partkey AS k, p_partkey % 3 AS d,
          p_partkey % 2 = 0 AS has_lic,
          p_partkey % 5 = 0 AS has_home
        FROM part WHERE p_partkey < 150),
      m AS (
        SELECT k, d, has_lic, has_home,
          CASE WHEN NOT has_lic AND d >= 1 THEN TRUE ELSE FALSE END
            AS lic_filled,
          CASE WHEN NOT has_lic AND d = 2 THEN 'top'
               WHEN NOT has_lic AND d = 1 THEN 'par' END AS lic_src,
          CASE WHEN NOT has_home AND (d = 2
                 OR (d = 1 AND k % 7 <> 0)) THEN TRUE ELSE FALSE END
            AS home_filled,
          CASE WHEN NOT has_home AND d = 2 THEN 'top'
               WHEN NOT has_home AND d = 1 AND k % 7 <> 0 THEN 'par'
          END AS home_src
        FROM f),
      msgs AS (
        SELECT k, d, has_lic, has_home,
          CASE lic_src
            WHEN 'top' THEN 'epl-1.0'
            WHEN 'par' THEN 'apache-2.0' END AS fill_lic,
          CASE home_src
            WHEN 'top' THEN 'https://top.example/' || CAST(k AS VARCHAR)
            WHEN 'par' THEN 'https://par.example/' || CAST(k AS VARCHAR)
          END AS fill_home,
          CASE WHEN lic_filled THEN
            'Field `declared_license_expression` has been updated ' ||
            'using values obtained from the parent POM pkg:maven/' ||
            CASE lic_src WHEN 'top' THEN 'com.top/top' ELSE 'com.par/par'
            END || CAST(k AS VARCHAR) ||
            CASE lic_src WHEN 'top' THEN '@3.0' ELSE '@2.0' END
          END AS lic_msg,
          CASE WHEN home_filled THEN
            'Field `homepage_url` has been updated using values ' ||
            'obtained from the parent POM pkg:maven/' ||
            CASE home_src WHEN 'top' THEN 'com.top/top'
              ELSE 'com.par/par' END || CAST(k AS VARCHAR) ||
            CASE home_src WHEN 'top' THEN '@3.0' ELSE '@2.0' END
          END AS home_msg
        FROM m)
      SELECT k,
        'com.ex.g' || CAST(k % 10 AS VARCHAR) AS namespace,
        'art' || CAST(k AS VARCHAR) AS name,
        '1.' || CAST(k % 4 AS VARCHAR) AS version,
        CASE WHEN has_lic THEN 'mit' ELSE fill_lic END AS license,
        CASE WHEN has_home THEN 'https://child.example/'
            || CAST(k AS VARCHAR) || '/v1.' || CAST(k % 4 AS VARCHAR)
          ELSE fill_home END AS homepage,
        'Art ' || CAST(k AS VARCHAR) || chr(10) || 'D'
          || CAST(k AS VARCHAR) AS description,
        CAST(d AS INTEGER) AS n_ancestors,
        COALESCE(
          CASE WHEN lic_msg IS NOT NULL AND home_msg IS NOT NULL
            THEN lic_msg || '; ' || home_msg END,
          lic_msg, home_msg, '') AS history
      FROM msgs ORDER BY k"""))

  /** S5/S6 — the real nexus full-index stream reader under the driver
    * oracle: each group of part keys is written into the exact
    * on-disk binary format (`writeEntries` — version byte, epoch
    * millis, per-field Lucene flag + readUTF name + int32-length
    * modified-UTF-8 value), given a TORN trailing record, gzipped and
    * given trailing garbage, then decoded back through
    * `GzipTolerant.readAll` → `readGzippedEntries` → each entry's
    * packed u/i fields expanded by `toArtifactRecord`
    * (`minecode/miners/maven.py:471-478,569-707,708-845`). Noise-only
    * records are skipped by the field filter; the torn tail and the
    * gzip trailer must vanish silently. The oracle re-derives every
    * surviving artifact record in closed form. */
  val s5nexus = QueryDef(
    "s5_nexus_stream", "S5/S6/X1",
    "real nexus index binary round-trip with torn tail + gzip garbage",
    (s, dir) => {
      import s.implicits._
      import graft.sources.{GzipTolerant, NexusIndexReader => NIR}
      par(t(s, dir, "part").filter(col("p_partkey") < 300)
        .select(col("p_partkey").as("k"), (col("p_partkey") % 20).as("g")))
        .as[(Long, Long)]
        .groupByKey(_._2)
        .flatMapGroups { (g, it) =>
          val entries = it.toSeq.map(_._1).sorted.map { k =>
            if (k % 9 == 0) Map("z" -> "noise")
            else {
              val u = s"com.g$g|art$k|1.${k % 4}|" +
                (if (k % 5 == 0) "sources" else "NA") +
                (if (k % 8 == 0) "|war" else "")
              val ext = if (k % 2 == 0) "jar" else "pom"
              Map("u" -> u,
                "i" -> s"$ext|1000|${k * 3}|0|0|0|$ext",
                "m" -> "5") ++
                (if (k % 3 != 0) Map("1" -> s"ab$k") else Map.empty) ++
                (if (k % 6 != 0) Map("n" -> s"Nämé $k") else Map.empty) ++
                (if (k % 7 != 0) Map("d" -> s"Desc $k") else Map.empty)
            }
          }
          val torn = Array[Byte](0, 0, 0, 2, 0) // record header, cut off
          val gz = GzipTolerant.gzip(NIR.writeEntries(entries) ++ torn) ++
            "TRAILING-GARBAGE".getBytes("UTF-8")
          NIR.readGzippedEntries(gz, NIR.EntryFields)
            .flatMap(NIR.toArtifactRecord)
            .map { r =>
              (g, r("groupId"), r("artifactId"), r("version"),
                r.get("classifier").orNull, r.get("extension").orNull,
                r.get("sha1").orNull, r.get("name").orNull,
                r.get("description").orNull, r.get("packaging").orNull,
                r.get("size").orNull)
            }
        }
        .toDF("g", "group_id", "artifact_id", "version", "classifier",
          "extension", "sha1", "name", "description", "packaging", "size")
        .orderBy("g", "artifact_id")
    },
    Some("""SELECT p_partkey % 20 AS g,
        'com.g' || CAST(p_partkey % 20 AS VARCHAR) AS group_id,
        'art' || CAST(p_partkey AS VARCHAR) AS artifact_id,
        '1.' || CAST(p_partkey % 4 AS VARCHAR) AS version,
        CASE WHEN p_partkey % 5 = 0 THEN 'sources' END AS classifier,
        CASE WHEN p_partkey % 8 = 0 THEN 'war'
             WHEN p_partkey % 2 = 0 THEN 'jar'
             ELSE 'pom' END AS extension,
        CASE WHEN p_partkey % 3 <> 0
          THEN 'ab' || CAST(p_partkey AS VARCHAR) END AS sha1,
        CASE WHEN p_partkey % 6 <> 0
          THEN 'Nämé ' || CAST(p_partkey AS VARCHAR) END AS name,
        CASE WHEN p_partkey % 7 <> 0
          THEN 'Desc ' || CAST(p_partkey AS VARCHAR) END AS description,
        CASE WHEN p_partkey % 2 = 0 THEN 'jar' ELSE 'pom' END
          AS packaging,
        CAST(p_partkey * 3 AS VARCHAR) AS size
      FROM part WHERE p_partkey < 300 AND p_partkey % 9 <> 0
      ORDER BY g, artifact_id"""))

  /** S15 — the publisher's deterministic plan under the driver
    * oracle: the real `GitPublisher.purlPath` sharding,
    * `renderPurlsYaml` (dedupe + sort + dash list) and
    * `commitMessage` numbering (`minecode/pipelines/__init__.py:
    * 118-134,150-348`) over a purl corpus, with the batch-of-100
    * commit assignment `publish` performs — full batches say
    * `(n/many)`, the final partial batch pins the total. Only the
    * git sink itself (single-writer, driver-side by design) stays
    * spec-covered in GitPublisherSpec. */
  val s15publish = QueryDef(
    "s15_publish_plan", "S15/O1",
    "real publisher path/render/commit-numbering plan over a purl corpus",
    (s, dir) => {
      import s.implicits._
      import graft.sources.GitPublisher
      import org.apache.spark.sql.expressions.Window
      val base = t(s, dir, "part").filter(col("p_partkey") < 250)
        .select(col("p_partkey").as("k")).as[Long]
        .map { k =>
          val ns = if (k % 3 == 0) Some(s"ns$k") else None
          val purl1 = "pkg:npm/" + ns.map(_ + "/").getOrElse("") +
            s"p$k@2.${k % 5}"
          val purls =
            if (k % 2 == 0) Seq(s"$purl1?os=linux", purl1, purl1)
            else Seq(purl1)
          val path = GitPublisher.purlPath("npm", ns, s"p$k",
            s"2.${k % 5}") + "/purls.yml"
          (path, GitPublisher.renderPurlsYaml(purls))
        }
        .toDF("path", "yml")
      base
        .withColumn("rank", row_number().over(Window.orderBy("path")))
        .withColumn("total", count("*").over(Window.partitionBy()))
        .withColumn("batch", (((col("rank") - 1) / 100) + 1).cast("int"))
        .as[(String, String, Int, Long, Int)]
        .map { case (path, yml, _, total, batch) =>
          val nb = ((total + 99) / 100).toInt
          val msg = GitPublisher.commitMessage(batch,
            if (batch == nb && total % 100 != 0) s"$nb" else "many")
          (path, yml, batch, msg)
        }
        .toDF("path", "yml", "batch", "commit_msg")
        .orderBy("path")
    },
    Some("""WITH f AS (
        SELECT p_partkey AS k,
          'npm/' || CASE WHEN p_partkey % 3 = 0
              THEN 'ns' || CAST(p_partkey AS VARCHAR) || '/' ELSE '' END
            || 'p' || CAST(p_partkey AS VARCHAR) || '/2.'
            || CAST(p_partkey % 5 AS VARCHAR) || '/purls.yml' AS path,
          'pkg:npm/' || CASE WHEN p_partkey % 3 = 0
              THEN 'ns' || CAST(p_partkey AS VARCHAR) || '/' ELSE '' END
            || 'p' || CAST(p_partkey AS VARCHAR) || '@2.'
            || CAST(p_partkey % 5 AS VARCHAR) AS purl
        FROM part WHERE p_partkey < 250),
      r AS (
        SELECT path,
          CASE WHEN k % 2 = 0 THEN
            '- ' || purl || chr(10) || '- ' || purl || '?os=linux'
              || chr(10)
          ELSE '- ' || purl || chr(10) END AS yml,
          ROW_NUMBER() OVER (ORDER BY path) AS rank,
          COUNT(*) OVER () AS total
        FROM f)
      SELECT path, yml,
        CAST((rank - 1) // 100 + 1 AS INTEGER) AS batch,
        'Add newly mined PackageURLs ('
          || CAST((rank - 1) // 100 + 1 AS VARCHAR) || '/'
          || CASE WHEN (rank - 1) // 100 + 1 = (total + 99) // 100
                AND total % 100 <> 0
              THEN CAST((total + 99) // 100 AS VARCHAR)
              ELSE 'many' END || ')' AS commit_msg
      FROM r ORDER BY path"""))

  /** S11 (debian flavor) — the real deb822 paragraph parser under the
    * driver oracle (`minecode/miners/debian.py:153-231` via
    * `EcosystemParsers.deb822Paragraphs`): each group of part keys
    * becomes one Packages-style control file whose paragraphs exercise
    * continuation-line folding (values keep their raw indented
    * lines), the empty-first-line block form (`MD5Sum:` — leading
    * newline and first indent dropped), lowercase key folding, and
    * colon-less garbage lines (dropped). The oracle re-derives every
    * field in closed form. */
  val s11deb = QueryDef(
    "s11_deb822", "S11/S4",
    "real deb822 paragraph parse over generated Packages files",
    (s, dir) => {
      import s.implicits._
      par(t(s, dir, "part").filter(col("p_partkey") < 250)
        .select(col("p_partkey").as("k"), (col("p_partkey") % 25).as("g")))
        .as[(Long, Long)]
        .groupByKey(_._2)
        .flatMapGroups { (g, it) =>
          val text = it.toSeq.map(_._1).sorted.map { k =>
            val garbage =
              if (k % 11 == 0) s"garbage line $k\n" else ""
            s"Package: pkg$k\n" + garbage +
              s"Version: 1.${k % 6}-${k % 3}\n" +
              s"Installed-Size: ${k * 2}\n" +
              s"Description: short $k\n long line one $k\n .\n" +
              " long line two\n" +
              s"MD5Sum:\n abc$k 123 path$k\n"
          }.mkString("\n")
          graft.sources.EcosystemParsers.deb822Paragraphs(text).map { p =>
            (g, p("package"), p("version"), p("installed-size"),
              p("description"), p("md5sum"))
          }
        }
        .toDF("g", "package", "version", "installed_size", "description",
          "md5sum")
        .orderBy("g", "package")
    },
    Some("""SELECT p_partkey % 25 AS g,
        'pkg' || CAST(p_partkey AS VARCHAR) AS package,
        '1.' || CAST(p_partkey % 6 AS VARCHAR) || '-'
          || CAST(p_partkey % 3 AS VARCHAR) AS version,
        CAST(p_partkey * 2 AS VARCHAR) AS installed_size,
        'short ' || CAST(p_partkey AS VARCHAR) || chr(10)
          || ' long line one ' || CAST(p_partkey AS VARCHAR) || chr(10)
          || ' .' || chr(10) || ' long line two' AS description,
        'abc' || CAST(p_partkey AS VARCHAR) || ' 123 path'
          || CAST(p_partkey AS VARCHAR) AS md5sum
      FROM part WHERE p_partkey < 250
      ORDER BY g, package"""))

  /** Minimal ustar builder for the ipk fixture — writes exactly the
    * header fields [[graft.sources.EcosystemParsers.tarEntries]]
    * consumes (name, octal size, '0' type flag), data padded to
    * 512-byte blocks, one zero terminator block. */
  private[ops] def buildTar(entries: Seq[(String, Array[Byte])])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val hdr = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, hdr, 0, nb.length)
      val size = ("%011o".format(data.length) + "\u0000").getBytes("US-ASCII")
      System.arraycopy(size, 0, hdr, 124, size.length)
      hdr(156) = '0'.toByte
      bos.write(hdr)
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](512))
    bos.toByteArray
  }

  /** S11 (openwrt flavor) — the real `.ipk` control chain under the
    * driver oracle (`minecode/miners/openwrt.py:98-113` via
    * `EcosystemParsers.ipkControl`): gzip tar → `./control.tar.gz` →
    * `./control`, each layer built per row and walked back by the
    * real ustar/gzip readers; a decoy `data.tar.gz` member and the
    * `./`-prefix stripping are exercised on the way. The oracle
    * re-derives the control fields in closed form. */
  val s11ipk = QueryDef(
    "s11_ipk_control", "S11/S6",
    "real nested ipk control walk over generated archives",
    (s, dir) => {
      import s.implicits._
      import graft.sources.{EcosystemParsers => EP, GzipTolerant}
      par(t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          val control =
            s"Package: ipk$k\nVersion: 3.${k % 7}\n" +
              s"Architecture: ${if (k % 2 == 0) "mips_24kc" else "all"}\n" +
              s"Installed-Size: ${k * 5}\n"
          val controlTarGz = GzipTolerant.gzip(buildTar(Seq(
            "./control" -> control.getBytes("UTF-8"))))
          val ipk = GzipTolerant.gzip(buildTar(Seq(
            "./data.tar.gz" -> GzipTolerant.gzip(Array[Byte](1, 2, 3)),
            "./control.tar.gz" -> controlTarGz)))
          EP.ipkControl(ipk).map { para =>
            val m = para.toMap
            (k, m("Package"), m("Version"), m("Architecture"),
              m("Installed-Size"))
          }
        }
        .toDF("k", "package", "version", "architecture", "installed_size")
        .orderBy("k")
    },
    Some("""SELECT p_partkey AS k,
        'ipk' || CAST(p_partkey AS VARCHAR) AS package,
        '3.' || CAST(p_partkey % 7 AS VARCHAR) AS version,
        CASE WHEN p_partkey % 2 = 0 THEN 'mips_24kc' ELSE 'all' END
          AS architecture,
        CAST(p_partkey * 5 AS VARCHAR) AS installed_size
      FROM part WHERE p_partkey < 200
      ORDER BY k"""))

  /** S11 (JSON registry flavors) — seven real collector parsers under
    * one driver oracle, each fed a fixture response and normalized to
    * a union row (eco, item, a, b, c): cran (timeline-wins release
    * dates), hackage (empty keys dropped), pub (pubspec fields),
    * github tags (nameless entries dropped), gitlab tags (commit
    * author fields), dockerhub (results page), huggingface (`.bin`
    * sibling filter + cardData license). References:
    * `minecode/collectors/{cran,hackage,github,gitlab,dockerhub,
    * huggingface}.py`, `minecode/miners/pub.py`. */
  val s11json = QueryDef(
    "s11_registry_json", "S11/S4/X1",
    "seven real JSON registry parsers over fixture responses",
    (s, dir) => {
      import s.implicits._
      import graft.sources.{EcosystemParsers => EP}
      par(t(s, dir, "part").filter(col("p_partkey") < 210)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          val n = (k % 2).toInt // extra items beyond the first
          def items[T](f: Int => T): Seq[T] = (0 to n).map(f)
          (k % 7) match {
            case 0 =>
              val vers = items(i =>
                s""""0.$i":{"Date/Publication":"D$k$i"}""").mkString(",")
              val json =
                s"""{"timeline":{"0.0":"T$k"},"versions":{$vers}}"""
              EP.cranVersions(json).map(v =>
                (k, "cran", v.value, v.releaseDate.orNull, null: String,
                  null: String))
            case 1 =>
              val vers = items(i => s""""1.$i":"normal"""").mkString(",")
              val json = s"""{"":"x",$vers}"""
              EP.hackageVersions(json).map(v =>
                (k, "hackage", v, null: String, null: String,
                  null: String))
            case 2 =>
              val vers = items { i =>
                val home =
                  if (i % 2 == 0) s""","homepage":"ph$k"""" else ""
                s"""{"version":"2.$i","published":"P$k$i",""" +
                  s""""pubspec":{"description":"pd $k"$home}}"""
              }.mkString(",")
              EP.pubVersions(s"""{"versions":[$vers]}""").map(v =>
                (k, "pub", v.version, v.description.orNull,
                  v.homepage.orNull, v.published.orNull))
            case 3 =>
              val tags = items(i => s"""{"name":"v$k.$i"}""")
                .mkString(",")
              EP.githubTags(s"""[$tags,{"noname":1}]""").map(t =>
                (k, "github", t, null: String, null: String,
                  null: String))
            case 4 =>
              val tags = items(i =>
                s"""{"name":"g$k.$i","commit":{"author_name":"A$k",""" +
                  s""""author_email":"a@e$k","created_at":"C$k$i"}}""")
                .mkString(",")
              EP.gitlabTags(s"""[$tags]""").map(t =>
                (k, "gitlab", t.name, t.author.orNull, t.email.orNull,
                  t.date.orNull))
            case 5 =>
              val res = items(i =>
                s"""{"name":"d$k.$i","digest":"sha256:$k$i",""" +
                  s""""full_size":${k * 7 + i},""" +
                  s""""tag_last_pushed":"U$k$i",""" +
                  s""""last_updater_username":"u$k"}""").mkString(",")
              EP.dockerhubTags(s"""{"results":[$res],"next":null}""")
                ._1.map(t =>
                  (k, "dockerhub", t.name, t.digest.orNull,
                    t.size.map(_.toString).orNull, t.lastPushed.orNull))
            case _ =>
              val json =
                s"""{"sha":"h$k","author":"au$k","createdAt":"M$k",""" +
                  s""""siblings":[{"rfilename":"model.bin"},""" +
                  s"""{"rfilename":"x.txt"},{"rfilename":"w$k.bin"}],""" +
                  s""""cardData":{"license":"mit"}}"""
              EP.huggingfaceModel(json).toSeq.flatMap(m =>
                m.binFiles.map(f =>
                  (k, "huggingface", f, m.sha.orNull, m.author.orNull,
                    m.license.orNull)))
          }
        }
        .toDF("k", "eco", "item", "a", "b", "c")
        .orderBy("k", "item")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k, p_partkey % 7 AS e,
          CAST(p_partkey % 2 AS BIGINT) AS n
        FROM part WHERE p_partkey < 210),
      ii AS (SELECT 0 AS i UNION ALL SELECT 1),
      multi AS (SELECT k, e, i FROM base JOIN ii ON i <= n),
      rows0 AS (
        SELECT k, 'cran' AS eco,
          '0.' || CAST(i AS VARCHAR) AS item,
          CASE WHEN i = 0 THEN 'T' || CAST(k AS VARCHAR)
            ELSE 'D' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR) END AS a,
          CAST(NULL AS VARCHAR) AS b, CAST(NULL AS VARCHAR) AS c
        FROM multi WHERE e = 0
        UNION ALL
        SELECT k, 'hackage', '1.' || CAST(i AS VARCHAR),
          NULL, NULL, NULL
        FROM multi WHERE e = 1
        UNION ALL
        SELECT k, 'pub', '2.' || CAST(i AS VARCHAR),
          'pd ' || CAST(k AS VARCHAR),
          CASE WHEN i % 2 = 0 THEN 'ph' || CAST(k AS VARCHAR) END,
          'P' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR)
        FROM multi WHERE e = 2
        UNION ALL
        SELECT k, 'github',
          'v' || CAST(k AS VARCHAR) || '.' || CAST(i AS VARCHAR),
          NULL, NULL, NULL
        FROM multi WHERE e = 3
        UNION ALL
        SELECT k, 'gitlab',
          'g' || CAST(k AS VARCHAR) || '.' || CAST(i AS VARCHAR),
          'A' || CAST(k AS VARCHAR), 'a@e' || CAST(k AS VARCHAR),
          'C' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR)
        FROM multi WHERE e = 4
        UNION ALL
        SELECT k, 'dockerhub',
          'd' || CAST(k AS VARCHAR) || '.' || CAST(i AS VARCHAR),
          'sha256:' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR),
          CAST(k * 7 + i AS VARCHAR),
          'U' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR)
        FROM multi WHERE e = 5
        UNION ALL
        SELECT k, 'huggingface', 'model.bin',
          'h' || CAST(k AS VARCHAR), 'au' || CAST(k AS VARCHAR), 'mit'
        FROM base WHERE e = 6
        UNION ALL
        SELECT k, 'huggingface',
          'w' || CAST(k AS VARCHAR) || '.bin',
          'h' || CAST(k AS VARCHAR), 'au' || CAST(k AS VARCHAR), 'mit'
        FROM base WHERE e = 6)
      SELECT k, eco, item, a, b, c FROM rows0
      ORDER BY k, item"""))

  /** S11 (remaining flavors) — six more real collector parsers under
    * one driver oracle: conda repodata (packages vs packages.conda
    * bucket by identifier suffix), cpan release-search (license
    * string-vs-array), nix package (release/platform/output walk,
    * outputs without a path dropped), bitbucket tags (display_name →
    * raw author fallback, date → target.date fallback), the gem
    * metadata chain (plain tar → gzipped `metadata.gz`), and
    * narinfo + `.PKGINFO` (repeatable keys, `#` comments).
    * References: `minecode/miners/{conda,nix,alpm,rubygems}.py`,
    * `minecode/collectors/{cpan,bitbucket}.py`. */
  val s11json2 = QueryDef(
    "s11_registry_json2", "S11/S4/S6",
    "conda/cpan/nix/bitbucket/gem/narinfo parsers over fixtures",
    (s, dir) => {
      import s.implicits._
      import graft.sources.{EcosystemParsers => EP, GzipTolerant}
      par(t(s, dir, "part").filter(col("p_partkey") < 180)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          (k % 6) match {
            case 0 =>
              val ident =
                if (k % 2 == 0) s"p$k-1.0.tar.bz2" else s"p$k-1.0.conda"
              val bucket =
                if (k % 2 == 0) "packages" else "packages.conda"
              val json = s"""{"$bucket":{"$ident":{"sha256":"cs$k",""" +
                s""""md5":"cm$k","size":${k * 11},"license":"BSD",""" +
                s""""depends":["python >=3.8","libc"]}}}"""
              EP.condaRepodata(json, ident).toSeq.map(m =>
                (k, "conda", ident, m.sha256.orNull, m.license.orNull,
                  m.depends.mkString("|")))
            case 1 =>
              val lic =
                if (k % 2 == 0) """["perl_5","mit"]""" else "\"artistic\""
              val json = s"""{"hits":{"hits":[{"_source":{""" +
                s""""version":"4.${k % 5}","download_url":"du$k",""" +
                s""""date":"dt$k","abstract":"ab $k","license":$lic,""" +
                s""""checksum_sha256":"ck$k","author":"AU$k"}},""" +
                s"""{"_source":{"version":"ignored"}}]}}"""
              EP.cpanRelease(json).toSeq.map(r =>
                (k, "cpan", r.version, r.downloadUrl.orNull,
                  r.licenses.mkString("|"), r.author.orNull))
            case 2 =>
              val lic =
                if (k % 2 == 0) """["mit","bsd"]""" else "\"gpl2\""
              val json = s"""{"summary":"ns $k","license":$lic,""" +
                s""""releases":[{"version":"5.${k % 4}","platforms":""" +
                s"""[{"system":"x86_64-linux","date":"nd$k",""" +
                s""""commit_hash":"ch$k","outputs":[""" +
                s"""{"name":"out","path":"/nix/store/p$k"},""" +
                s"""{"name":"dev"}]}]}]}"""
              EP.nixPackage(json).toSeq.flatMap(p => p.releases.map(r =>
                (k, "nix", r.version, p.summary.orNull,
                  p.licenses.mkString("|"),
                  r.platforms.flatMap(_.outputs)
                    .map(o => s"${o.name}:${o.storePath}")
                    .mkString("|"))))
            case 3 =>
              val author =
                if (k % 2 == 0)
                  s"""{"user":{"display_name":"DN$k"}}"""
                else s"""{"raw":"RAW$k"}"""
              val date =
                if (k % 3 == 0) s""""date":"bd$k",""" else ""
              val json = s"""{"values":[{"name":"b$k.1",$date""" +
                s""""target":{"author":$author,"date":"td$k"}}],""" +
                s""""next":"page2$k"}"""
              val (tags, next) = EP.bitbucketTags(json)
              tags.map(t =>
                (k, "bitbucket", t.name, t.author.orNull, t.date.orNull,
                  next.orNull))
            case 4 =>
              val yaml = s"name: gem$k\nversion: 1.${k % 3}\n"
              val gem = buildTar(Seq(
                "./checksums.yaml.gz" ->
                  GzipTolerant.gzip("x: 1\n".getBytes("UTF-8")),
                "./metadata.gz" ->
                  GzipTolerant.gzip(yaml.getBytes("UTF-8"))))
              EP.gemMetadataText(gem).toSeq.map(t =>
                (k, "gem", "metadata", t, null: String, null: String))
            case _ =>
              val nar = EP.narinfoUrl(
                s"StorePath: /nix/store/p$k\nURL: nar/x$k.nar.xz\n")
              val pi = EP.pkginfo(
                s"# generated\npkgname = a$k\nlicense = MIT\n" +
                  "license = GPL\nbadline\n")
              Seq((k, "narinfo_pkginfo", "nar", nar.orNull,
                pi.get("license").map(_.mkString("|")).orNull,
                pi.get("pkgname").map(_.mkString("|")).orNull))
          }
        }
        .toDF("k", "eco", "item", "a", "b", "c")
        .orderBy("k", "item")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k, p_partkey % 6 AS e
        FROM part WHERE p_partkey < 180)
      SELECT k, 'conda' AS eco,
        'p' || CAST(k AS VARCHAR) ||
          CASE WHEN k % 2 = 0 THEN '-1.0.tar.bz2'
            ELSE '-1.0.conda' END AS item,
        'cs' || CAST(k AS VARCHAR) AS a, 'BSD' AS b,
        'python >=3.8|libc' AS c
      FROM base WHERE e = 0
      UNION ALL
      SELECT k, 'cpan', '4.' || CAST(k % 5 AS VARCHAR),
        'du' || CAST(k AS VARCHAR),
        CASE WHEN k % 2 = 0 THEN 'perl_5|mit' ELSE 'artistic' END,
        'AU' || CAST(k AS VARCHAR)
      FROM base WHERE e = 1
      UNION ALL
      SELECT k, 'nix', '5.' || CAST(k % 4 AS VARCHAR),
        'ns ' || CAST(k AS VARCHAR),
        CASE WHEN k % 2 = 0 THEN 'mit|bsd' ELSE 'gpl2' END,
        'out:/nix/store/p' || CAST(k AS VARCHAR)
      FROM base WHERE e = 2
      UNION ALL
      SELECT k, 'bitbucket', 'b' || CAST(k AS VARCHAR) || '.1',
        CASE WHEN k % 2 = 0 THEN 'DN' || CAST(k AS VARCHAR)
          ELSE 'RAW' || CAST(k AS VARCHAR) END,
        CASE WHEN k % 3 = 0 THEN 'bd' || CAST(k AS VARCHAR)
          ELSE 'td' || CAST(k AS VARCHAR) END,
        'page2' || CAST(k AS VARCHAR)
      FROM base WHERE e = 3
      UNION ALL
      SELECT k, 'gem', 'metadata',
        'name: gem' || CAST(k AS VARCHAR) || chr(10) || 'version: 1.'
          || CAST(k % 3 AS VARCHAR) || chr(10),
        NULL, NULL
      FROM base WHERE e = 4
      UNION ALL
      SELECT k, 'narinfo_pkginfo', 'nar',
        'nar/x' || CAST(k AS VARCHAR) || '.nar.xz',
        'MIT|GPL', 'a' || CAST(k AS VARCHAR)
      FROM base WHERE e = 5
      ORDER BY k, item"""))

  /** Registry document JSON for the npm mapper fixture: every
    * npmOnePackage branch keyed off k — scoped vs plain names (the
    * tarball file name drops the scope), license string vs dict vs
    * legacy `licenses` list, repository string vs object with the
    * `git+` prefix rule and the gitHead suffix, bugs string vs
    * object, author object + contributor string/object + non-array
    * maintainers, scope-less `@bad` dependency dropped, scoped dep
    * purl percent-encoding, and empty devDependency requirements. */
  private def npmDocJson(k: Long): String = {
    val name = if (k % 4 == 0) s"@sc$k/nl$k" else s"nl$k"
    val versions = (0 to (k % 2).toInt).map { i =>
      val kw = (k % 3) match {
        case 0 => s""""keywords":["k1","k2$k"],"""
        case 1 => """"keywords":"solo","""
        case _ => ""
      }
      val home =
        if (k % 5 != 0) s""""homepage":"https://nh.example/$k",""" else ""
      val lic = (k % 4) match {
        case 0 => """"license":"MIT","""
        case 1 => """"license":{"type":"ISC","url":"https://isc.example"},"""
        case 2 => """"licenses":[{"type":"BSD","url":""}],"""
        case _ => ""
      }
      val repo =
        if (k % 2 == 0) s""""repository":"https://github.com/u/r$k","""
        else s""""repository":{"url":"git://gh/r$k"},"""
      val head = if (k % 3 == 0) s""""gitHead":"dh$k",""" else ""
      val bugs =
        if (k % 2 == 0) s""""bugs":{"url":"https://bugs.example/$k"},"""
        else s""""bugs":"https://bugsstr.example/$k","""
      s""""3.$i":{"name":"$name","version":"3.$i",""" +
        s""""description":"nd $k",$kw$home$lic$repo$head$bugs""" +
        s""""dist":{"shasum":"sha$k$i"},""" +
        s""""author":{"name":"An $k","email":"an$k@e"},""" +
        s""""contributors":["C One <c1$k@e> (https://c1)",""" +
        s"""{"name":"C2 $k"}],""" +
        s""""maintainers":{"name":"M $k"},""" +
        s""""dependencies":{"depa":"^1.0","@bad":"1.0","@sc/x":"2.0"},""" +
        s""""devDependencies":{"devd":""}}"""
    }.mkString(",")
    s"""{"versions":{$versions}}"""
  }

  /** X2 (npm flavor) — the reference's highest-traffic mapper under
    * the driver oracle: the real `Mappers.npmVersionPackages`
    * (`minecode/miners/npm.py:121-134`, behavior pinned upstream by
    * seven expected fixtures) over [[npmDocJson]] registry documents;
    * purls, canonical tarball URLs, YAML license statements, vcs
    * normalization, parties and scoped dependencies all re-derived in
    * closed form. */
  val x2npm = QueryDef(
    "x2_mapper_npm", "X2/X7/F1",
    "real npm version mapper over fixture registry documents",
    (s, dir) => {
      import s.implicits._
      par(t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          graft.miners.Mappers.npmVersionPackages(npmDocJson(k)).map { mp =>
            val r = mp.row
            (r.download_url, r.name, r.version.orNull, r.sha1.orNull,
              r.declared_license_expression.orNull, r.description.orNull,
              r.homepage_url.orNull, r.keywords.mkString("|"),
              mp.vcsUrl.orNull, mp.bugTrackingUrl.orNull,
              mp.dependencies.map(d => Seq(d.purl,
                d.extracted_requirement.getOrElse(""),
                d.scope.getOrElse("")).mkString(",")).mkString("|"),
              mp.parties.map(p => Seq(p.role.getOrElse(""),
                p.name.getOrElse(""), p.email.getOrElse(""))
                .mkString(":")).mkString("|"))
          }
        }
        .toDF("download_url", "name", "version", "sha1", "license",
          "description", "homepage", "kw", "vcs", "bugs", "deps",
          "parties")
        .orderBy("download_url")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k,
          CASE WHEN p_partkey % 4 = 0
            THEN '@sc' || CAST(p_partkey AS VARCHAR) || '/nl'
              || CAST(p_partkey AS VARCHAR)
            ELSE 'nl' || CAST(p_partkey AS VARCHAR) END AS name,
          'nl' || CAST(p_partkey AS VARCHAR) AS file_name
        FROM part WHERE p_partkey < 200),
      v AS (
        SELECT k, name, file_name, i, '3.' || CAST(i AS VARCHAR) AS ver
        FROM base, (SELECT 0 AS i UNION ALL SELECT 1) s
        WHERE i <= k % 2)
      SELECT
        'https://registry.npmjs.org/' || name || '/-/' || file_name
          || '-' || ver || '.tgz' AS download_url,
        name, ver AS version,
        'sha' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR) AS sha1,
        CASE k % 4
          WHEN 0 THEN '- MIT' || chr(10)
          WHEN 1 THEN '- type: ISC' || chr(10)
            || '  url: https://isc.example' || chr(10)
          WHEN 2 THEN '- type: BSD' || chr(10) || '  url:' || chr(10)
        END AS license,
        'nd ' || CAST(k AS VARCHAR) AS description,
        CASE WHEN k % 5 <> 0
          THEN 'https://nh.example/' || CAST(k AS VARCHAR)
        END AS homepage,
        CASE k % 3
          WHEN 0 THEN 'k1|k2' || CAST(k AS VARCHAR)
          WHEN 1 THEN 'solo' ELSE '' END AS kw,
        CASE WHEN k % 2 = 0
          THEN 'git+https://github.com/u/r' || CAST(k AS VARCHAR)
          ELSE 'git://gh/r' || CAST(k AS VARCHAR) END
          || CASE WHEN k % 3 = 0
            THEN '@dh' || CAST(k AS VARCHAR) ELSE '' END AS vcs,
        CASE WHEN k % 2 = 0
          THEN 'https://bugs.example/' || CAST(k AS VARCHAR)
          ELSE 'https://bugsstr.example/' || CAST(k AS VARCHAR)
        END AS bugs,
        'pkg:npm/depa,^1.0,dependencies|pkg:npm/%40sc/x,2.0,'
          || 'dependencies|pkg:npm/devd,,devDependencies' AS deps,
        'author:An ' || CAST(k AS VARCHAR) || ':an'
          || CAST(k AS VARCHAR) || '@e'
          || '|contributor:C One:c1' || CAST(k AS VARCHAR) || '@e'
          || '|contributor:C2 ' || CAST(k AS VARCHAR) || ':'
          || '|maintainer:M ' || CAST(k AS VARCHAR) || ':' AS parties
      FROM v ORDER BY download_url"""))

  /** X2 (packagist/cargo/gem flavors) — three more real mappers under
    * one driver oracle: packagist (composer names keep the vendor
    * prefix, git-only vcs with `git+`, duplicate licenses collapse to
    * a newline join), cargo (crates.io dl_path expansion, UNKNOWN
    * license dropped, published_by name→login fallback), and the
    * RubyGems versions API (summary-equal description suppressed,
    * date-only release timestamps, YAML license list).
    * References: `minecode/miners/{packagist,rubygems}.py`,
    * `minecode/collectors/cargo.py`. */
  val x2registry = QueryDef(
    "x2_mapper_registry", "X2/X7/F8",
    "real packagist, cargo and gem mappers over fixture responses",
    (s, dir) => {
      import s.implicits._
      import graft.miners.Mappers
      par(t(s, dir, "part").filter(col("p_partkey") < 210)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          def items(f: Int => String): String =
            (0 to (k % 2).toInt).map(f).mkString(",")
          val mapped: Seq[Mappers.MappedPackage] = (k % 3) match {
            case 0 =>
              val src =
                if (k % 2 == 0)
                  s""""source":{"type":"git","url":"https://gh/src$k"},"""
                else """"source":{"type":"svn","url":"https://svn/x"},"""
              val kw =
                if (k % 4 == 0) """"keywords":["pk1","pk2"],""" else ""
              val home =
                if (k % 5 != 0)
                  s""""homepage":"https://ph.example/$k",""" else ""
              val vers = items(i =>
                s""""1.$i":{"name":"ven$k/lib$k","version":"1.$i",""" +
                  s""""dist":{"url":"https://dist.example/$k-$i.zip",""" +
                  s""""shasum":"ps$k$i"},$src$kw$home""" +
                  s""""license":["MIT","MIT","GPL"],""" +
                  s""""authors":[{"name":"PA $k","email":"pa$k@e"}],""" +
                  s""""description":"pdesc $k"}""")
              Mappers.packagistPackages(
                s"""{"package":{"language":"PHP","versions":{$vers}}}""")
            case 1 =>
              val by =
                if (k % 2 == 0) """{"name":"CN"}""" else """{"login":"cl"}"""
              val lic =
                if (k % 2 == 0) """"license":"Apache-2.0","""
                else """"license":"UNKNOWN","""
              val home =
                if (k % 7 != 0)
                  s""""homepage":"https://ch.example/$k",""" else ""
              val vers = items(i =>
                s"""{"num":"0.$i.0","crate":"cr$k",""" +
                  s""""dl_path":"/api/v1/crates/cr$k/0.$i.0/download",""" +
                  s"""$lic$home"description":"cd $k",""" +
                  s""""crate_size":${k * 13 + i},"checksum":"cc$k$i",""" +
                  s""""published_by":$by}""")
              Mappers.cargoPackages(
                s"""{"crate":{"keywords":["ck$k"]},"versions":[$vers]}""",
                None)
            case _ =>
              val desc =
                if (k % 2 == 0) s"gs $k" else s"gl $k"
              val vers = items(i =>
                s"""{"number":"2.$i","summary":"gs $k",""" +
                  s""""description":"$desc","sha":"gh$k$i",""" +
                  s""""created_at":"2022-0${1 + k % 9}-15T10:00:00Z",""" +
                  s""""licenses":["MIT"],"authors":"GA $k"}""")
              Mappers.gemApiPackages(s"""[$vers]""", s"gm$k")
          }
          mapped.map { mp =>
            val r = mp.row
            (k, r.ptype, r.name, r.version.orNull, r.download_url,
              r.sha1.orElse(r.sha256).orNull,
              r.declared_license_expression.orNull, r.description.orNull,
              r.homepage_url.orNull, r.keywords.mkString("|"),
              mp.vcsUrl.orNull,
              mp.parties.headOption.flatMap(_.name).orNull,
              r.release_date.orNull)
          }
        }
        .toDF("k", "eco", "name", "version", "download_url", "checksum",
          "license", "description", "homepage", "kw", "vcs", "author",
          "release_date")
        .orderBy("k", "version")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k, p_partkey % 3 AS e
        FROM part WHERE p_partkey < 210),
      v AS (
        SELECT k, e, i FROM base,
          (SELECT 0 AS i UNION ALL SELECT 1) s
        WHERE i <= k % 2)
      SELECT k, 'composer' AS eco,
        'ven' || CAST(k AS VARCHAR) || '/lib' || CAST(k AS VARCHAR)
          AS name,
        '1.' || CAST(i AS VARCHAR) AS version,
        'https://dist.example/' || CAST(k AS VARCHAR) || '-'
          || CAST(i AS VARCHAR) || '.zip' AS download_url,
        'ps' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR) AS checksum,
        'MIT' || chr(10) || 'GPL' AS license,
        'pdesc ' || CAST(k AS VARCHAR) AS description,
        CASE WHEN k % 5 <> 0
          THEN 'https://ph.example/' || CAST(k AS VARCHAR)
        END AS homepage,
        CASE WHEN k % 4 = 0 THEN 'pk1|pk2' ELSE '' END AS kw,
        CASE WHEN k % 2 = 0
          THEN 'git+https://gh/src' || CAST(k AS VARCHAR) END AS vcs,
        'PA ' || CAST(k AS VARCHAR) AS author,
        CAST(NULL AS TIMESTAMP) AS release_date
      FROM v WHERE e = 0
      UNION ALL
      SELECT k, 'cargo', 'cr' || CAST(k AS VARCHAR),
        '0.' || CAST(i AS VARCHAR) || '.0',
        'https://crates.io/api/v1/crates/cr' || CAST(k AS VARCHAR)
          || '/0.' || CAST(i AS VARCHAR) || '.0/download',
        'cc' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR),
        CASE WHEN k % 2 = 0 THEN '- Apache-2.0' || chr(10) END,
        'cd ' || CAST(k AS VARCHAR),
        CASE WHEN k % 7 <> 0
          THEN 'https://ch.example/' || CAST(k AS VARCHAR) END,
        'ck' || CAST(k AS VARCHAR),
        CAST(NULL AS VARCHAR),
        CASE WHEN k % 2 = 0 THEN 'CN' ELSE 'cl' END,
        CAST(NULL AS TIMESTAMP)
      FROM v WHERE e = 1
      UNION ALL
      SELECT k, 'gem', 'gm' || CAST(k AS VARCHAR),
        '2.' || CAST(i AS VARCHAR), '',
        'gh' || CAST(k AS VARCHAR) || CAST(i AS VARCHAR),
        '- MIT' || chr(10),
        CASE WHEN k % 2 = 0 THEN 'gs ' || CAST(k AS VARCHAR)
          ELSE 'gs ' || CAST(k AS VARCHAR) || chr(10) || 'gl '
            || CAST(k AS VARCHAR) END,
        CAST(NULL AS VARCHAR), '', CAST(NULL AS VARCHAR),
        'GA ' || CAST(k AS VARCHAR),
        CAST('2022-0' || CAST(1 + k % 9 AS VARCHAR) || '-15 00:00:00'
          AS TIMESTAMP)
      FROM v WHERE e = 2
      ORDER BY k, version"""))

  /** X2 (bower/freebsd/fdroid/haxe flavors) — four more real mappers
    * under one driver oracle: bower (author vs `x: name` authors
    * fallback, licenses string-vs-array), the FreeBSD INDEX line
    * stream (non-JSON lines dropped, arch/origin qualifiers, the
    * python-dict-shaped license statement), f-droid (localized
    * name/summary/description prefix suppression, apk + src rows per
    * version), and haxelib (contributor profile parties,
    * percent-encoded pinned dependency purls).
    * References: `minecode/miners/{bower,freebsd,haxe}.py`,
    * `minecode/collectors/fdroid.py`. */
  val x2registry2 = QueryDef(
    "x2_mapper_registry2", "X2/X7/F11",
    "real bower, freebsd, fdroid and haxe mappers over fixtures",
    (s, dir) => {
      import s.implicits._
      import graft.miners.Mappers
      par(t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          val mapped: Seq[(Mappers.MappedPackage, String)] = (k % 4) match {
            case 0 =>
              val repo =
                if (k % 2 == 0)
                  s""""repository":{"type":"git","url":"https://gh/bw$k"},"""
                else """"repository":{"type":"git"},"""
              val lic = (k % 3) match {
                case 0 => """"licenses":["MIT","Apache-2.0"],"""
                case 1 => """"licenses":"GPL","""
                case _ => ""
              }
              val who =
                if (k % 2 == 0) s""""author":"BA $k","""
                else s""""authors":["x: BN $k","plain"],"""
              val json = s"""{"name":"bw$k","version":"0.${k % 5}",""" +
                repo + lic + who +
                s""""keywords":["bk$k"],"description":"bw desc $k",""" +
                s""""homepage":"https://bh.example/$k"}"""
              Mappers.bowerPackages(json, "u").map((_, null: String))
            case 1 =>
              val arch =
                if (k % 2 == 0) """"arch":"freebsd:13:x86:64",""" else ""
              val logic =
                if (k % 3 == 0) """"licenselogic":"single",""" else ""
              val line = s"""{"name":"fb$k","version":"4.${k % 3}",""" +
                arch + logic +
                s""""origin":"devel/fb$k","licenses":["BSD2CLAUSE"],""" +
                s""""desc":"fb desc $k","categories":["devel","net"]}"""
              val text = s"{\nnot json\n$line\n}\n"
              Mappers.freebsdIndexPackages(text)
                .map(mp => (mp, mp.row.qualifiers.orNull))
            case 2 =>
              val summary =
                if (k % 2 == 0) s"App $k plus" else s"Sum $k"
              val src =
                if (k % 3 == 0)
                  s""","src":{"name":"app$k-src.tar.gz","sha256":"ss$k"}"""
                else ""
              val json = s"""{"metadata":{""" +
                s""""name":{"en-US":"App $k"},""" +
                s""""summary":{"en-US":"$summary"},""" +
                s""""description":{"en-US":"Desc $k"},""" +
                s""""license":"GPL-3.0","categories":["cat$k"],""" +
                s""""webSite":"https://fw.example/$k",""" +
                s""""sourceCode":"https://src.example/$k",""" +
                s""""authorName":"FA $k"},""" +
                s""""versions":{"v":{""" +
                s""""manifest":{"versionCode":${100 + k % 9}},""" +
                s""""file":{"name":"/app$k.apk","sha256":"fs$k",""" +
                s""""size":${k * 17}}$src}}}"""
              Mappers.fdroidPackages(s"pkg:fdroid/app$k", json)
                .map((_, null: String))
            case _ =>
              val json = s"""{"name":"hx$k","version":"1.${k % 4}",""" +
                s""""contributors":["hc$k"],""" +
                s""""dependencies":{"dlib":"1.0 beta","dfree":""},""" +
                s""""description":"hx desc $k","license":"MIT"}"""
              Mappers.haxePackages(json).map(mp =>
                (mp, mp.dependencies.map(d =>
                  d.purl + (if (d.is_pinned) ",pinned" else ",unpinned"))
                  .mkString("|")))
          }
          mapped.map { case (mp, extra) =>
            val r = mp.row
            (k, r.ptype, r.name, r.version.orNull, r.download_url,
              r.declared_license_expression.orNull, r.description.orNull,
              r.homepage_url.orNull, r.keywords.mkString("|"),
              mp.vcsUrl.orNull,
              mp.parties.headOption.flatMap(_.name).orNull, extra)
          }
        }
        .toDF("k", "eco", "name", "version", "download_url", "license",
          "description", "homepage", "kw", "vcs", "author", "extra")
        .orderBy("k", "download_url")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k, p_partkey % 4 AS e
        FROM part WHERE p_partkey < 200)
      SELECT k, 'bower' AS eco, 'bw' || CAST(k AS VARCHAR) AS name,
        '0.' || CAST(k % 5 AS VARCHAR) AS version, '' AS download_url,
        CASE WHEN k % 3 = 0 THEN '- MIT' || chr(10) || '- Apache-2.0'
            || chr(10)
          WHEN k % 3 = 1 THEN '- GPL' || chr(10) END AS license,
        'bw desc ' || CAST(k AS VARCHAR) AS description,
        'https://bh.example/' || CAST(k AS VARCHAR) AS homepage,
        'bk' || CAST(k AS VARCHAR) AS kw,
        CASE WHEN k % 2 = 0
          THEN 'git+https://gh/bw' || CAST(k AS VARCHAR) END AS vcs,
        CASE WHEN k % 2 = 0 THEN 'BA ' || CAST(k AS VARCHAR)
          ELSE 'BN ' || CAST(k AS VARCHAR) END AS author,
        CAST(NULL AS VARCHAR) AS extra
      FROM base WHERE e = 0
      UNION ALL
      SELECT k, 'freebsd', 'fb' || CAST(k AS VARCHAR),
        '4.' || CAST(k % 3 AS VARCHAR),
        CASE WHEN k % 2 = 0
          THEN 'https://pkg.freebsd.org/freebsd:13:x86:64/latest/All/fb'
            || CAST(k AS VARCHAR) || '-4.' || CAST(k % 3 AS VARCHAR)
            || '.txz'
          ELSE '' END,
        '{''licenses'': [''BSD2CLAUSE'']' ||
          CASE WHEN k % 3 = 0 THEN ', ''licenselogic'': ''single''}'
            ELSE '}' END,
        'fb desc ' || CAST(k AS VARCHAR),
        CAST(NULL AS VARCHAR), 'devel|net', CAST(NULL AS VARCHAR),
        CAST(NULL AS VARCHAR),
        CASE WHEN k % 2 = 0
          THEN 'arch=freebsd:13:x86:64&origin=devel/fb'
            || CAST(k AS VARCHAR)
          ELSE 'origin=devel/fb' || CAST(k AS VARCHAR) END
      FROM base WHERE e = 1
      UNION ALL
      SELECT k, 'fdroid', 'app' || CAST(k AS VARCHAR),
        CAST(100 + k % 9 AS VARCHAR),
        'https://f-droid.org/repo/app' || CAST(k AS VARCHAR) || du,
        'GPL-3.0',
        CASE WHEN k % 2 = 0
          THEN 'App ' || CAST(k AS VARCHAR) || ' plus' || chr(10)
            || 'Desc ' || CAST(k AS VARCHAR)
          ELSE 'App ' || CAST(k AS VARCHAR) || chr(10) || 'Sum '
            || CAST(k AS VARCHAR) || chr(10) || 'Desc '
            || CAST(k AS VARCHAR) END,
        'https://fw.example/' || CAST(k AS VARCHAR),
        'cat' || CAST(k AS VARCHAR),
        'https://src.example/' || CAST(k AS VARCHAR),
        'FA ' || CAST(k AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM base, (SELECT '.apk' AS du UNION ALL
        SELECT '-src.tar.gz') s
      WHERE e = 2 AND (du = '.apk' OR k % 3 = 0)
      UNION ALL
      SELECT k, 'haxe', 'hx' || CAST(k AS VARCHAR),
        '1.' || CAST(k % 4 AS VARCHAR),
        'https://lib.haxe.org/p/hx' || CAST(k AS VARCHAR) || '/1.'
          || CAST(k % 4 AS VARCHAR) || '/download/',
        'MIT', 'hx desc ' || CAST(k AS VARCHAR),
        CAST(NULL AS VARCHAR), '', CAST(NULL AS VARCHAR),
        'hc' || CAST(k AS VARCHAR),
        'pkg:haxe/dlib@1.0%20beta,pinned|pkg:haxe/dfree,unpinned'
      FROM base WHERE e = 3
      ORDER BY k, download_url"""))

  /** X2 (github/golang/eclipse/apache flavors) — four more real
    * mappers under one driver oracle: the github repo record (one row
    * per download, per tag tarball AND zipball, per branch URL, plus
    * the reference's verbatim `git+('<url>',)` vcs quirk its own
    * fixtures assert), godoc+purl golang (github-namespace-gated
    * `git+` prefix, import-path homepage), eclipse projects JSON
    * (description[0].value with title fallback, one row per
    * download), and the apache projects record (maintainer parties,
    * one row per release revision with date-only timestamps).
    * References: `minecode/miners/{github,golang,eclipse,apache}.py`. */
  val x2registry3 = QueryDef(
    "x2_mapper_registry3", "X2/X7/J10",
    "real github, golang, eclipse and apache mappers over fixtures",
    (s, dir) => {
      import s.implicits._
      import graft.miners.Mappers
      par(t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k"))).as[Long]
        .flatMap { k =>
          val mapped: Seq[(Mappers.MappedPackage, String)] = (k % 4) match {
            case 0 =>
              val dls =
                if (k % 2 == 0)
                  s""""downloads":[{"html_url":"https://dl.example/gh$k-0.zip",""" +
                    s""""size":${k * 4},"created_at":"2020-03-04T05:06:07Z"}],"""
                else ""
              val brs =
                if (k % 3 == 0)
                  s""""branches_download_urls":["https://br.example/gh$k-main"],"""
                else ""
              val json = s"""{"full_name":"own$k/gh$k",""" +
                s""""git_url":"git://gh/own$k/gh$k.git","owner":"own$k",""" +
                s""""description":"gd $k","language":"C",""" +
                s""""html_url":"https://github.com/own$k/gh$k",""" +
                s""""size":${k * 3},$dls$brs""" +
                s""""tags":[{"name":"t1","sha1":"ts$k",""" +
                s""""tarball_url":"https://tb.example/gh$k-t1",""" +
                s""""zipball_url":"https://zb.example/gh$k-t1"}]}"""
              Mappers.githubPackages(json).map(mp => (mp, mp.vcsUrl.orNull))
            case 1 =>
              val host = if (k % 2 == 0) "github.com" else "bitbucket.org"
              val purl = s"pkg:golang/$host/own$k/go$k" +
                s"?vcs_repository=https://vr.example/$k"
              Mappers.golangPackage(s"""{"synopsis":"gosyn $k"}""", purl)
                .toSeq.map(mp => (mp, mp.vcsUrl.orNull))
            case 2 =>
              val desc =
                if (k % 2 == 0) """"description":[{"value":"ed"}],"""
                else ""
              val json = s"""{"projects":{"ecl$k":{$desc""" +
                s""""title":"et $k",""" +
                s""""website_url":[{"url":"https://ew.example/$k"}],""" +
                s""""bugzilla":[{"query_url":"https://eb.example/$k"}],""" +
                s""""licenses":[{"name":"EPL-2.0"}],""" +
                s""""download_url":[{"url":"https://edl.example/$k-a"},""" +
                s"""{"url":"https://edl.example/$k-b"}]}}}"""
              Mappers.eclipseJsonPackages(json)
                .map(mp => (mp, mp.bugTrackingUrl.orNull))
            case _ =>
              val rels = (0 to (k % 2).toInt).map(i =>
                s"""{"revision":"9.$i","created":"2021-07-2$i"}""")
                .mkString(",")
              val json = s"""{"ap$k":{""" +
                s""""maintainer":[{"name":"AM $k",""" +
                s""""mbox":"mailto:am$k@a.org"}],""" +
                s""""repository":["https://svn.apache.org/repos/asf/ap$k"],""" +
                s""""category":"db, lib$k",""" +
                s""""download-page":"https://ap.example/$k/dl",""" +
                s""""shortdesc":"as $k","description":"ad $k",""" +
                s""""license":"Apache-2.0",""" +
                s""""homepage":"https://ap.example/$k",""" +
                s""""release":[$rels]}}"""
              Mappers.apacheProjectsPackages(json)
                .map(mp => (mp, mp.codeViewUrl.orNull))
          }
          mapped.map { case (mp, extra) =>
            val r = mp.row
            (k, r.ptype, r.name, r.version.orNull, r.download_url,
              r.declared_license_expression.orNull, r.description.orNull,
              r.homepage_url.orNull,
              mp.parties.headOption.flatMap(_.name).orNull,
              r.release_date.orNull, extra)
          }
        }
        .toDF("k", "eco", "name", "version", "download_url", "license",
          "description", "homepage", "author", "release_date", "extra")
        .orderBy("k", "download_url", "version")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k, p_partkey % 4 AS e
        FROM part WHERE p_partkey < 200),
      gh AS (
        SELECT k, du, ver, sz, rd FROM base,
          (SELECT 'dl' AS fam UNION ALL SELECT 'tb' UNION ALL
           SELECT 'zb' UNION ALL SELECT 'br') fams,
          LATERAL (SELECT
            CASE fam
              WHEN 'dl' THEN 'https://dl.example/gh' || CAST(k AS VARCHAR)
                || '-0.zip'
              WHEN 'tb' THEN 'https://tb.example/gh' || CAST(k AS VARCHAR)
                || '-t1'
              WHEN 'zb' THEN 'https://zb.example/gh' || CAST(k AS VARCHAR)
                || '-t1'
              ELSE 'https://br.example/gh' || CAST(k AS VARCHAR)
                || '-main' END AS du,
            CASE WHEN fam IN ('tb', 'zb') THEN 't1' END AS ver,
            CASE WHEN fam = 'dl' THEN k * 4 ELSE k * 3 END AS sz,
            CASE WHEN fam = 'dl'
              THEN CAST('2020-03-04 05:06:07' AS TIMESTAMP) END AS rd) x
        WHERE e = 0 AND (fam IN ('tb', 'zb')
          OR (fam = 'dl' AND k % 2 = 0)
          OR (fam = 'br' AND k % 3 = 0)))
      SELECT k, 'github' AS eco, 'gh' || CAST(k AS VARCHAR) AS name,
        ver AS version, du AS download_url,
        CAST(NULL AS VARCHAR) AS license,
        'gd ' || CAST(k AS VARCHAR) AS description,
        'https://github.com/own' || CAST(k AS VARCHAR) || '/gh'
          || CAST(k AS VARCHAR) AS homepage,
        'own' || CAST(k AS VARCHAR) AS author,
        rd AS release_date,
        'git+(''git://gh/own' || CAST(k AS VARCHAR) || '/gh'
          || CAST(k AS VARCHAR) || '.git'',)' AS extra
      FROM gh
      UNION ALL
      SELECT k, 'golang', 'go' || CAST(k AS VARCHAR),
        CAST(NULL AS VARCHAR), '', CAST(NULL AS VARCHAR),
        'gosyn ' || CAST(k AS VARCHAR),
        'https://' || CASE WHEN k % 2 = 0 THEN 'github.com'
          ELSE 'bitbucket.org' END || '/own' || CAST(k AS VARCHAR)
          || '/go' || CAST(k AS VARCHAR),
        CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP),
        CASE WHEN k % 2 = 0 THEN 'git+' ELSE '' END
          || 'https://vr.example/' || CAST(k AS VARCHAR)
      FROM base WHERE e = 1
      UNION ALL
      SELECT k, 'eclipse', 'ecl' || CAST(k AS VARCHAR),
        CAST(NULL AS VARCHAR),
        'https://edl.example/' || CAST(k AS VARCHAR) || suf,
        '- EPL-2.0' || chr(10),
        CASE WHEN k % 2 = 0 THEN 'ed' ELSE 'et ' || CAST(k AS VARCHAR)
        END,
        'https://ew.example/' || CAST(k AS VARCHAR),
        CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP),
        'https://eb.example/' || CAST(k AS VARCHAR)
      FROM base, (SELECT '-a' AS suf UNION ALL SELECT '-b') s
      WHERE e = 2
      UNION ALL
      SELECT k, 'apache', 'ap' || CAST(k AS VARCHAR),
        '9.' || CAST(i AS VARCHAR),
        'https://ap.example/' || CAST(k AS VARCHAR) || '/dl',
        'Apache-2.0',
        'as ' || CAST(k AS VARCHAR) || chr(10) || 'ad '
          || CAST(k AS VARCHAR),
        'https://ap.example/' || CAST(k AS VARCHAR),
        'AM ' || CAST(k AS VARCHAR),
        CAST('2021-07-2' || CAST(i AS VARCHAR) || ' 00:00:00'
          AS TIMESTAMP),
        'https://svn.apache.org/repos/asf/ap' || CAST(k AS VARCHAR)
      FROM base, (SELECT 0 AS i UNION ALL SELECT 1) s
      WHERE e = 3 AND i <= k % 2
      ORDER BY k, download_url, version"""))

  /** Snapshot-to-snapshot corpus diff — the dataset-versioning CDC
    * pass a training pipeline runs between crawl snapshots (and the
    * same shape as the reference's changed-row detection in its
    * incremental syncs, `clearcode/sync.py` S10): classify every
    * doc_id as added / removed / modified / unchanged by comparing
    * content DIGESTS, never full text (at 100 TB the diff join
    * shuffles 16-byte md5s per side after column pruning; the full
    * outer join hash-partitions on doc_id). Snapshots are derived
    * deterministically from the one documents table: the "old"
    * snapshot lacks the doc_id%17 rows (later added) and carries
    * upper-cased text for doc_id%13 rows (later edited); the "new"
    * snapshot lacks doc_id%19 rows (since removed).
    */
  val snapshotDiff = QueryDef(
    "s_snapshot_diff", "S10/CDC + LLM-pipeline dataset versioning",
    "full-outer digest diff of two corpus snapshots → per-doc status",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 13 === 0, upper(col("text")))
            .otherwise(col("text"))).as("old_digest"))
      val neu = docs.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("new_digest"))
      old.join(neu, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("old_digest").isNull, lit("added"))
            .when(col("new_digest").isNull, lit("removed"))
            .when(col("old_digest") =!= col("new_digest"),
              lit("modified"))
            .otherwise(lit("unchanged")).as("status"))
        .orderBy("doc_id")
    },
    Some("""WITH old AS (
        SELECT doc_id,
          md5(CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END)
            AS old_digest
        FROM documents WHERE doc_id % 17 <> 0),
      neu AS (
        SELECT doc_id, md5(text) AS new_digest
        FROM documents WHERE doc_id % 19 <> 0)
      SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
        CASE WHEN old_digest IS NULL THEN 'added'
             WHEN new_digest IS NULL THEN 'removed'
             WHEN old_digest <> new_digest THEN 'modified'
             ELSE 'unchanged' END AS status
      FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
      ORDER BY doc_id"""))

  /** Format interop — the corpus round-trips through every built-in
    * columnar/row sink+source (ORC, header CSV with RFC-4180 quote
    * escaping, JSON lines) and each path must reproduce the parquet
    * path's per-source statistics EXACTLY, including a
    * content-sensitive column (character length of every text) and
    * the distinct-text count — a quoting/escaping/encoding bug in
    * any writer-reader pair breaks the hash compare. The oracle
    * reads only the parquet table and replicates its stats across
    * the format labels: agreement is the assertion. Writes land
    * under /tmp keyed by the input dir (overwrite — rerunnable). */
  val formatRoundtrip = QueryDef(
    "s_format_roundtrip", "S1/S16 + sink breadth: ORC/CSV/JSON interop",
    "documents through orc/csv/json sinks+sources; stats must match parquet",
    (s, dir) => {
      // the synthetic text is benign (space-separated tokens), so a
      // delimiter+quote tail is appended BEFORE writing: every row
      // now forces RFC-4180 quoting in CSV and \" escaping in JSON —
      // the oracle mirrors the 3-char append arithmetically
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), lit(",\"x")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      val base = s"/tmp/graft_roundtrip_${cacheKey(dir, "documents")}"
      docs.write.mode("overwrite").orc(s"$base/orc")
      docs.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(s"$base/csv")
      docs.write.mode("overwrite").json(s"$base/json")
      val schema = docs.schema
      val back = Seq(
        "parquet" -> docs,
        "orc" -> s.read.orc(s"$base/orc"),
        "csv" -> s.read.schema(schema)
          .option("header", "true").option("escape", "\"")
          .csv(s"$base/csv"),
        "json" -> s.read.schema(schema).json(s"$base/json"))
      back.map { case (f, df) =>
        df.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text")).cast("long")).as("sum_text_len"),
          countDistinct(col("text")).as("n_distinct_text"))
          .withColumn("format", lit(f))
      }.reduce(_ unionByName _)
        .select("format", "source", "n_docs", "sum_chars",
          "sum_text_len", "n_distinct_text")
        .orderBy("format", "source")
    },
    Some("""WITH stats AS (
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(len(text) + 3) AS BIGINT) AS sum_text_len,
          COUNT(DISTINCT text) AS n_distinct_text
        FROM documents GROUP BY source)
      SELECT f.format, s.source, s.n_docs, s.sum_chars,
        s.sum_text_len, s.n_distinct_text
      FROM stats s
      CROSS JOIN (SELECT unnest(['csv','json','orc','parquet']) AS format) f
      ORDER BY format, source"""))

  /** Corrupt-tolerant JSON ingestion — the S4 robustness contract a
    * registry miner actually needs (feeds are never 100% well-formed;
    * the reference wraps every parse in try/except and skips). Every
    * doc_id ≡ 0 (mod 7) row's JSON is truncated mid-string, so
    * malformation is known BY CONSTRUCTION and Spark's null-on-error
    * `from_json` behavior is audited against that ground truth: a
    * parser that silently salvages (or silently drops) a row moves a
    * count and fails the hash. Per-row parse, embarrassingly
    * parallel; one aggregation shuffle. */
  val jsonCorrupt = QueryDef(
    "s4_json_corrupt", "S4/S6 tolerant decode (miners' try-except contract)",
    "per-source parsed/corrupt split of a 1-in-7-malformed JSON feed",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val raw = docs.select(col("doc_id"), col("source"),
          to_json(struct(col("doc_id").as("id"), col("lang"))).as("js"))
        .withColumn("js",
          when(col("doc_id") % 7 === 0,
            expr("substring(js, 1, length(js) - 5)"))
            .otherwise(col("js")))
      // corruption is flagged via an explicit columnNameOfCorruptRecord
      // field, NOT id-nullness: under spark.sql.json.enablePartialResults
      // PERMISSIVE from_json may populate fields parsed before the
      // truncation point (id comes first in the payload), so id-nullness
      // is config/version-dependent while the corrupt-record column is
      // the documented contract
      import scala.jdk.CollectionConverters._
      raw.withColumn("p", from_json(col("js"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, lang STRING, _bad STRING"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_bad").asJava))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("p._bad").isNull, 1L).otherwise(0L)).as("n_parsed"),
          sum(when(col("p._bad").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(col("p._bad").isNull, col("p.id")).otherwise(lit(0L)))
            .as("sum_parsed_ids"))
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_rows,
        COUNT(*) FILTER (WHERE doc_id % 7 <> 0) AS n_parsed,
        CAST(COUNT(*) FILTER (WHERE doc_id % 7 = 0) AS BIGINT) AS n_corrupt,
        CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN doc_id ELSE 0 END)
          AS BIGINT) AS sum_parsed_ids
      FROM documents GROUP BY source ORDER BY source"""))

  /** Hive-layout lineitem partitioned by l_returnflag, written once
    * per input dir (the synthetic corpora are immutable within a
    * session). At 100 TB this directory layout is what turns a
    * predicate on the partition column into NOT READING the data at
    * all — file listing, not row filtering. */
  private def partitionedLineitem(s: SparkSession, dir: String): DataFrame = {
    val path = s"/tmp/graft_part_${cacheKey(dir, "lineitem")}/lineitem"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/_SUCCESS")))
      t(s, dir, "lineitem").write.mode("overwrite")
        .partitionBy("l_returnflag").parquet(path)
    s.read.parquet(path)
  }

  /** Static partition pruning: a filter on the partition column must
    * become a PartitionFilter (directory-level pruning — 1 of 3
    * partitions listed, 2/3 of the table never opened), not a row
    * predicate. PlanSpec pins the PartitionFilters entry. */
  val partitionPrune = QueryDef(
    "s_partition_prune", "S1 + hive-partitioned layout (partition pruning)",
    "flag='R' revenue by linestatus off a returnflag-partitioned table",
    (s, dir) => {
      // per-month output (~80 rows at sf0.01) instead of the former
      // 2-row linestatus split: same pruned scan, enough result
      // surface for an oracle mismatch to appear on
      partitionedLineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"))
        .orderBy("l_linestatus", "ship_month")
    },
    Some("""SELECT l_linestatus, strftime(l_shipdate, '%Y-%m') AS ship_month,
        COUNT(*) AS n_items,
        CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
          AS BIGINT) / 100.0 AS revenue
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Dynamic partition pruning: the filter lives on the DIM side, so
    * no static partition predicate exists — Spark must inject the
    * dim's surviving join keys as a runtime partition filter on the
    * fact scan (the star-schema optimization that decides whether a
    * 100 TB fact table is read once or one-third). PlanSpec pins the
    * dynamicpruning subquery on the scan. */
  val dppJoin = QueryDef(
    "j16_dynamic_partition_prune",
    "J1 + dynamic partition pruning (star-schema runtime prune)",
    "fact partitioned on the join key, pruned by a filtered dim at runtime",
    (s, dir) => {
      // the dim must be a FILE-backed scan with its filter pushed
      // into it for the pruning-benefit estimator to accept the
      // subquery (a LocalRelation never qualifies); the helper
      // writes the 3-row star dim next to the partitioned fact
      val base = s"/tmp/graft_part_${cacheKey(dir, "lineitem")}"
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$base/flag_dim/_SUCCESS")))
        t(s, dir, "lineitem").select(col("l_returnflag").as("flag"))
          .distinct()
          .withColumn("flag_class",
            when(col("flag") === "R", lit("returned")).otherwise(lit("kept")))
          .write.mode("overwrite").parquet(s"$base/flag_dim")
      val dim = s.read.parquet(s"$base/flag_dim")
        .filter(col("flag_class") === "returned")
      // group by ship month too: the single-flag_class row was a
      // 1-row gate with no surface for an oracle mismatch; ~80
      // month rows discriminate while the DPP plan shape (pinned in
      // PlanSpec) is unchanged
      partitionedLineitem(s, dir)
        .join(broadcast(dim), col("l_returnflag") === col("flag"))
        .groupBy(col("flag_class"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("flag_class", "ship_month")
    },
    Some("""SELECT 'returned' AS flag_class,
        strftime(l_shipdate, '%Y-%m') AS ship_month,
        COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem WHERE l_returnflag = 'R'
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  val defs: Seq[QueryDef] =
    Seq(s4json, s8html, s10sync, cdHarvest, cdResources, mmFeatures,
      mmImageStats, mmAudioStats, mmVideoFrames, s9ls, s11apk,
      x1visitor, x2mapper, s7pom, s5nexus, s15publish, s11deb, s11ipk,
      s11json, s11json2, x2npm, x2registry, x2registry2, x2registry3,
      snapshotDiff, formatRoundtrip, jsonCorrupt, partitionPrune, dppJoin)
}
