package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._

/** Driver-surface queries for the source-side operators that are
  * SQL-checkable: JSON codec (S4/F10) and HTML link scraping (S8),
  * plus the ClearlyDefined-style incremental dedup (S10/ST7) and the
  * multimodal feature plumbing (rows-only).
  */
object SourceOps {

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

  val mmFeatures = QueryDef(
    "mm_feature_extract", "LLM-pipeline: multimodal columns",
    "binary media payloads → batched feature extraction (stub codec)",
    (s, dir) => graft.multimodal.Multimodal.featureSummary(s, dir),
    None)

  val defs: Seq[QueryDef] = Seq(s4json, s8html, s10sync, mmFeatures)
}
