package graft.ops

import graft._
import graft.core._
import org.apache.spark.sql.functions._

/** Driver-oracle rows for the last §2 operators that were spec-only
  * through round 5: J10/F14 source-repo candidate purls, F7
  * combine_expressions, O2 queue claim ordering, X9 enhanced-package
  * fold, S14 CycloneDX component projection. Each query synthesizes a
  * domain-shaped frame from the TPC-H-ish tables (the CatalogOps
  * pattern) and mirrors the EXACT reference semantics in DuckDB SQL.
  */
object ContractOps {

  private def k = col("p_partkey")
  private def ks = col("p_partkey").cast("string")

  /** J10/F14 — repo URL → hosting purls
    * (`purl2vcs/src/purl2vcs/find_source_repo.py:249-311`): the
    * `git@host+`, `https+//`, `git+https://...@commit`, `.git`, and
    * `git://host:path` normalizations followed by the url-hint purl
    * emission, exercised over eight URL spellings (two of which must
    * yield nothing). The oracle mirrors each normalization step as a
    * SQL CTE — it re-derives the purls from the raw URLs, it does not
    * restate expected outputs. */
  val j10 = QueryDef(
    "j10_source_repo_candidates", "J10/F14",
    "source-repo URL normalization → candidate hosting purls",
    (s, dir) => {
      val toPurls = udf((u: String) =>
        graft.miners.SourceRepo.repoUrlToPurls(u))
      val raw = t(s, dir, "part").select(
        when(k % 8 === 0, concat(lit("git@github.com+https://github.com/ns"),
          ks, lit("/n"), ks, lit(".git")))
        .when(k % 8 === 1, concat(lit("https+//github.com/ns"),
          ks, lit("/n"), ks, lit(".git")))
        .when(k % 8 === 2, concat(lit("git+https://github.com/ns"),
          ks, lit("/n"), ks, lit(".git@abc"), ks))
        .when(k % 8 === 3, concat(lit("https://gitlab.com/ns"),
          ks, lit("/n"), ks, lit(".git")))
        .when(k % 8 === 4, concat(lit("git://github.com:ns"),
          ks, lit("/n"), ks))
        .when(k % 8 === 5, concat(lit("https://bitbucket.org/ns"),
          ks, lit("/n"), ks))
        .when(k % 8 === 6, concat(lit("https://example.com/ns"),
          ks, lit("/n"), ks))
        .otherwise(concat(lit("https://github.com/only"), ks))
        .as("source_url"))
      raw.select(col("source_url"),
          explode(toPurls(col("source_url"))).as("purl"))
        .orderBy("source_url", "purl")
    },
    Some("""WITH raw AS (
        SELECT CASE p_partkey % 8
          WHEN 0 THEN 'git@github.com+https://github.com/ns' || k || '/n' || k || '.git'
          WHEN 1 THEN 'https+//github.com/ns' || k || '/n' || k || '.git'
          WHEN 2 THEN 'git+https://github.com/ns' || k || '/n' || k || '.git@abc' || k
          WHEN 3 THEN 'https://gitlab.com/ns' || k || '/n' || k || '.git'
          WHEN 4 THEN 'git://github.com:ns' || k || '/n' || k
          WHEN 5 THEN 'https://bitbucket.org/ns' || k || '/n' || k
          WHEN 6 THEN 'https://example.com/ns' || k || '/n' || k
          ELSE 'https://github.com/only' || k END AS source_url
        FROM (SELECT CAST(p_partkey AS VARCHAR) AS k, p_partkey FROM part)),
      n1 AS (SELECT source_url,
        CASE WHEN starts_with(source_url, 'git@github.com+')
          THEN substr(source_url, strpos(source_url, '+') + 1)
          ELSE source_url END AS u FROM raw),
      n2 AS (SELECT source_url,
        CASE WHEN starts_with(u, 'https+//')
          THEN replace(u, 'https+//', 'https://') ELSE u END AS u FROM n1),
      n3 AS (SELECT source_url,
        CASE WHEN (starts_with(u, 'git+https://') OR starts_with(u, 'git://'))
            AND contains(u, '@')
          THEN regexp_replace(u, '@[^@]*$', '') ELSE u END AS u FROM n2),
      n4 AS (SELECT source_url,
        CASE WHEN u LIKE '%.git' THEN substr(u, 1, length(u) - 4)
          ELSE u END AS u FROM n3),
      n5 AS (SELECT source_url,
        CASE WHEN starts_with(u, 'git://')
          THEN 'https://' || replace(substr(u, 7), ':', '/')
          ELSE u END AS u FROM n4),
      parsed AS (SELECT source_url,
        regexp_extract(u, '://([^/]+)/', 1) AS netloc,
        string_split(regexp_extract(u, '://[^/]*(/.*)$', 1), '/') AS segs
        FROM n5),
      ok AS (SELECT source_url, netloc, segs[2] AS ns, segs[3] AS nm
        FROM parsed
        WHERE netloc <> '' AND len(segs) > 2 AND segs[3] <> '')
      SELECT source_url, 'pkg:' || hint || '/' || ns || '/' || nm AS purl
      FROM ok, (SELECT unnest(['github', 'gitlab', 'bitbucket']) AS hint) h
      WHERE contains(netloc, hint)
      ORDER BY source_url, purl"""))

  /** F7 — combine_expressions (`minecode/indexing.py:208-215` via the
    * license-expression lib): trim, drop empties, dedup, AND-join with
    * parenthesization of compound sub-expressions. Bucket 0 exercises
    * the single-expression identity, bucket 1 the all-empty → NULL
    * case, the rest the multi-expression combine. */
  val f7 = QueryDef(
    "f7_license_combine", "F7",
    "combine detected license expressions per package group",
    (s, dir) => {
      val combineUdf = udf((xs: Seq[String]) =>
        graft.functions.LicenseExpressions.combine(
          Option(xs).getOrElse(Seq.empty)).orNull)
      val e = t(s, dir, "part").select((k.cast("int") / 50).cast("int").as("bucket"),
        when(k < 50, when(k === 0, lit("mit")).otherwise(lit(null).cast("string")))
        .when(k < 100, lit(null).cast("string"))
        .when(k % 6 === 0, lit("mit"))
        .when(k % 6 === 1, lit("apache-2.0"))
        .when(k % 6 === 2, lit("gpl-2.0 OR mit"))
        .when(k % 6 === 3, lit("bsd-3-clause AND mit"))
        .when(k % 6 === 4, lit(null).cast("string"))
        .otherwise(lit("")).as("ex"))
      e.groupBy("bucket")
        .agg(combineUdf(sort_array(array_distinct(
          filter(collect_list(col("ex")), x => trim(x) =!= ""))))
          .as("combined"))
        .orderBy("bucket")
    },
    Some("""WITH e AS (
        SELECT CAST(p_partkey // 50 AS INTEGER) AS bucket,
          CASE WHEN p_partkey < 50 THEN
                 (CASE WHEN p_partkey = 0 THEN 'mit' END)
               WHEN p_partkey < 100 THEN NULL
               WHEN p_partkey % 6 = 0 THEN 'mit'
               WHEN p_partkey % 6 = 1 THEN 'apache-2.0'
               WHEN p_partkey % 6 = 2 THEN 'gpl-2.0 OR mit'
               WHEN p_partkey % 6 = 3 THEN 'bsd-3-clause AND mit'
               WHEN p_partkey % 6 = 4 THEN NULL
               ELSE '' END AS ex
        FROM part),
      d AS (SELECT DISTINCT bucket, ex FROM e
        WHERE ex IS NOT NULL AND trim(ex) <> ''),
      agg AS (
        SELECT bucket, COUNT(*) AS n, min(ex) AS single,
          string_agg(
            CASE WHEN upper(ex) LIKE '% OR %' OR upper(ex) LIKE '% AND %'
              THEN '(' || ex || ')' ELSE ex END,
            ' AND ' ORDER BY ex) AS joined
        FROM d GROUP BY bucket)
      SELECT b.bucket,
        CASE WHEN agg.n = 1 THEN agg.single ELSE agg.joined END AS combined
      FROM (SELECT DISTINCT bucket FROM e) b
      LEFT JOIN agg ON b.bucket = agg.bucket
      ORDER BY b.bucket"""))

  /** O2 — queue claim ordering (`minecode/models.py:272`):
    * visitables = wip_date IS NULL AND (never visited OR last visit
    * older than the 240 h revisit window), claimed in
    * (-priority, -uri) order — `Frontier.claim` end to end. */
  val o2 = QueryDef(
    "o2_queue_order", "O2/ST2",
    "frontier claim: visitables ordered by (-priority, -uri), top 50",
    (s, dir) => {
      val now = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      val frontier = t(s, dir, "part").select(
        concat(lit("https://repo"), (k % 7).cast("string"), lit("/p"), ks)
          .as("uri"),
        lower(concat(lit("https://repo"), (k % 7).cast("string"),
          lit("/p"), ks)).as("canonical"),
        concat(lit("repo"), (k % 7).cast("string")).as("host"),
        (k % 10).cast("int").as("priority"),
        when(k % 3 === 1,
          lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
        .when(k % 3 === 2,
          lit(java.sql.Timestamp.valueOf("2025-12-31 00:00:00")))
        .otherwise(lit(null).cast("timestamp")).as("last_visit_date"),
        lit(null).cast("timestamp").as("last_map_date"),
        when(k % 11 === 0, lit(now)).otherwise(lit(null).cast("timestamp"))
          .as("wip_date"),
        lit(null).cast("string").as("visit_error"))
      graft.streaming.Frontier.claim(frontier, now, 50)
        .select("uri", "priority")
        .orderBy(desc("priority"), desc("uri"))
    },
    Some("""WITH f AS (
        SELECT 'https://repo' || CAST(p_partkey % 7 AS VARCHAR) ||
            '/p' || CAST(p_partkey AS VARCHAR) AS uri,
          CAST(p_partkey % 10 AS INTEGER) AS priority,
          CASE WHEN p_partkey % 3 = 1 THEN TIMESTAMP '2025-01-01 00:00:00'
               WHEN p_partkey % 3 = 2 THEN TIMESTAMP '2025-12-31 00:00:00'
               END AS last_visit_date,
          CASE WHEN p_partkey % 11 = 0 THEN TIMESTAMP '2026-01-01 00:00:00'
               END AS wip_date
        FROM part)
      SELECT uri, priority FROM f
      WHERE wip_date IS NULL AND (last_visit_date IS NULL
        OR last_visit_date < TIMESTAMP '2025-12-22 00:00:00')
      ORDER BY priority DESC, uri DESC LIMIT 50"""))

  /** X9 — enhanced-package fold (`packagedb/api.py:643-721`): members
    * of a package set fill their empty fields from strictly-lower-rank
    * peers (SOURCE_ARCHIVE only from SOURCE_REPO), recording each
    * contributing peer in `enhanced_by` in (rank, url) iteration
    * order. Sets of four: SOURCE_REPO(3), SOURCE_ARCHIVE(4),
    * BINARY(5), and a NULL-content member — which passes through
    * UNENHANCED, because `get_enhanced_package` early-returns when
    * `package_content` is falsy (`packagedb/api.py:648-660`); the
    * issue-#490 BINARY default only applies to peers inside
    * `_get_enhanced_package`. */
  val x9 = QueryDef(
    "x9_enhanced_package", "X9/A6",
    "package-set enhance: fill empty fields from lower-rank set peers",
    (s, dir) => {
      val r = k % 4
      val members = t(s, dir, "part").select(
        concat(lit("set"), (k.cast("int") / 4).cast("int").cast("string"))
          .as("set_id"),
        concat(lit("http://repo/p"), ks).as("download_url"),
        when(r === 0, lit(3)).when(r === 1, lit(4))
          .when(r === 2, lit(5)).otherwise(lit(null).cast("int"))
          .as("package_content"),
        when(r === 0 && k % 3 =!= 0, concat(lit("src desc "), ks))
          .when(r === 2 && k % 3 === 0, concat(lit("bin desc "), ks))
          .otherwise(lit(null).cast("string")).as("description"),
        when(r === 0, concat(lit("http://src/"), ks))
          .when(r === 1 && k % 3 === 0, concat(lit("http://arch/"), ks))
          .otherwise(lit(null).cast("string")).as("homepage_url"),
        when(r === 0 && k % 5 =!= 0, lit("apache-2.0"))
          .otherwise(lit(null).cast("string"))
          .as("declared_license_expression"),
        when(r === 1, concat(lit("(c) arch "), ks))
          .otherwise(lit(null).cast("string")).as("copyright"))
      graft.catalog.Enhance.enhance(s, members)
        .select(col("set_id"), col("download_url"), col("description"),
          col("homepage_url"), col("declared_license_expression"),
          col("copyright"),
          concat_ws(",", col("enhanced_by")).as("enhanced_by"))
        .orderBy("download_url")
    },
    Some("""WITH m AS (
        SELECT p_partkey AS k, p_partkey % 4 AS r, p_partkey // 4 AS sid,
          'http://repo/p' || CAST(p_partkey AS VARCHAR) AS url
        FROM part),
      mem AS (SELECT sid, r, url, k,
        CASE WHEN r = 0 AND k % 3 <> 0 THEN 'src desc ' || CAST(k AS VARCHAR)
             WHEN r = 2 AND k % 3 = 0 THEN 'bin desc ' || CAST(k AS VARCHAR)
             END AS descr,
        CASE WHEN r = 0 THEN 'http://src/' || CAST(k AS VARCHAR)
             WHEN r = 1 AND k % 3 = 0 THEN 'http://arch/' || CAST(k AS VARCHAR)
             END AS home,
        CASE WHEN r = 0 AND k % 5 <> 0 THEN 'apache-2.0' END AS lic,
        CASE WHEN r = 1 THEN '(c) arch ' || CAST(k AS VARCHAR) END AS cop
        FROM m),
      p0 AS (SELECT sid, url AS url0, descr AS d0, home AS h0, lic AS l0,
          cop AS c0 FROM mem WHERE r = 0),
      p1 AS (SELECT sid, url AS url1, descr AS d1, home AS h1, lic AS l1,
          cop AS c1 FROM mem WHERE r = 1)
      SELECT 'set' || CAST(mem.sid AS VARCHAR) AS set_id,
        mem.url AS download_url,
        CASE WHEN mem.r = 1 THEN COALESCE(mem.descr, d0)
             WHEN mem.r = 2 THEN COALESCE(mem.descr, d0, d1)
             ELSE mem.descr END AS description,
        CASE WHEN mem.r = 1 THEN COALESCE(mem.home, h0)
             WHEN mem.r = 2 THEN COALESCE(mem.home, h0, h1)
             ELSE mem.home END AS homepage_url,
        CASE WHEN mem.r = 1 THEN COALESCE(mem.lic, l0)
             WHEN mem.r = 2 THEN COALESCE(mem.lic, l0, l1)
             ELSE mem.lic END
          AS declared_license_expression,
        CASE WHEN mem.r = 1 THEN COALESCE(mem.cop, c0)
             WHEN mem.r = 2 THEN COALESCE(mem.cop, c0, c1)
             ELSE mem.cop END AS copyright,
        CASE WHEN mem.r IN (1, 2) THEN concat_ws(',',
          CASE WHEN (mem.descr IS NULL AND d0 IS NOT NULL)
            OR (mem.home IS NULL AND h0 IS NOT NULL)
            OR (mem.lic IS NULL AND l0 IS NOT NULL)
            OR (mem.cop IS NULL AND c0 IS NOT NULL) THEN url0 END,
          CASE WHEN mem.r = 2 AND (
               (mem.descr IS NULL AND d0 IS NULL AND d1 IS NOT NULL)
            OR (mem.home IS NULL AND h0 IS NULL AND h1 IS NOT NULL)
            OR (mem.lic IS NULL AND l0 IS NULL AND l1 IS NOT NULL)
            OR (mem.cop IS NULL AND c0 IS NULL AND c1 IS NOT NULL))
            THEN url1 END) ELSE '' END AS enhanced_by
      FROM mem
      LEFT JOIN p0 ON mem.sid = p0.sid
      LEFT JOIN p1 ON mem.sid = p1.sid
      ORDER BY download_url"""))

  /** S14 — CycloneDX component projection (`packagedb/sbom.py`,
    * `packagedb/models.py:802-887`): one component JSON per catalog
    * row, null fields omitted, hashes in SHA-1/MD5/SHA-256 order. The
    * oracle rebuilds the exact JSON string with SQL concatenation. */
  val s14 = QueryDef(
    "s14_sbom_rows", "S14",
    "catalog rows → CycloneDX component JSON (scan + projection)",
    (s, dir) => {
      val pkgs = t(s, dir, "part").select(
        lit("maven").as("ptype"),
        when(k % 4 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("ns"), (k % 5).cast("string")))
          .as("namespace"),
        regexp_replace(col("p_name"), " ", "-").as("name"),
        concat(lit("1."), (k % 10).cast("string")).as("version"),
        when(k % 6 === 0, col("p_brand")).otherwise(lit(null).cast("string"))
          .as("description"),
        when(k % 2 === 0, md5(col("p_name"))).otherwise(lit(null).cast("string"))
          .as("sha1"),
        when(k % 3 === 0, md5(col("p_type"))).otherwise(lit(null).cast("string"))
          .as("md5"),
        when(k % 5 === 0, sha2(col("p_name"), 256))
          .otherwise(lit(null).cast("string")).as("sha256"),
        when(k % 7 === 0, concat(lit("http://home/"), ks))
          .otherwise(lit(null).cast("string")).as("homepage_url"),
        when(k % 11 === 0, lit("mit OR apache-2.0"))
          .otherwise(lit(null).cast("string"))
          .as("declared_license_expression"))
      graft.catalog.Sbom.toCycloneDx(pkgs)
        .orderBy("purl", "component")
    },
    Some("""WITH pkg AS (
        SELECT p_partkey AS k,
          CASE WHEN p_partkey % 4 = 0 THEN NULL
               ELSE 'ns' || CAST(p_partkey % 5 AS VARCHAR) END AS ns,
          replace(p_name, ' ', '-') AS name,
          '1.' || CAST(p_partkey % 10 AS VARCHAR) AS version,
          CASE WHEN p_partkey % 6 = 0 THEN p_brand END AS descr,
          CASE WHEN p_partkey % 2 = 0 THEN md5(p_name) END AS sha1,
          CASE WHEN p_partkey % 3 = 0 THEN md5(p_type) END AS md5,
          CASE WHEN p_partkey % 5 = 0 THEN sha256(p_name) END AS sha256,
          CASE WHEN p_partkey % 7 = 0
               THEN 'http://home/' || CAST(p_partkey AS VARCHAR) END AS home,
          CASE WHEN p_partkey % 11 = 0 THEN 'mit OR apache-2.0' END AS lic
        FROM part),
      purled AS (
        SELECT *,
          'pkg:maven/' ||
            CASE WHEN ns IS NULL OR ns = '' THEN '' ELSE ns || '/' END ||
            name || '@' || version AS purl
        FROM pkg)
      SELECT purl,
        '{"bom-ref":"' || purl || '","type":"library","name":"' || name ||
        '","version":"' || version || '","purl":"' || purl || '"' ||
        CASE WHEN descr IS NOT NULL
          THEN ',"description":"' || descr || '"' ELSE '' END ||
        ',"hashes":[' || concat_ws(',',
          CASE WHEN sha1 IS NOT NULL
            THEN '{"alg":"SHA-1","content":"' || sha1 || '"}' END,
          CASE WHEN md5 IS NOT NULL
            THEN '{"alg":"MD5","content":"' || md5 || '"}' END,
          CASE WHEN sha256 IS NOT NULL
            THEN '{"alg":"SHA-256","content":"' || sha256 || '"}' END) ||
        ']' ||
        CASE WHEN lic IS NOT NULL
          THEN ',"licenses":[{"expression":"' || lic || '"}]' ELSE '' END ||
        CASE WHEN home IS NOT NULL
          THEN ',"externalReferences":[{"type":"website","url":"' ||
            home || '"}]' ELSE '' END ||
        '}' AS component
      FROM purled
      ORDER BY purl, component"""))

  /** J11 — JS source-map key widening
    * (`matchcode/pipes/matching.py:306-308`): `.map` resources carry
    * the sha1s of their referenced sources; those explode into extra
    * exact-match join keys attributed back to the carrying resource.
    * Every third query row is a `.map` with two referenced sha1s (one
    * of which may be its own direct sha1 — the (path, sha1) dedup must
    * fold that); the index holds every fourth sha1. */
  val j11 = QueryDef(
    "j11_sourcemap_join", "J11/J4",
    "source-map sha1 widening → exact index join",
    (s, dir) => {
      val queries = t(s, dir, "part").select(
        concat(lit("src/f"), ks,
          when(k % 3 === 0, lit(".js.map")).otherwise(lit(".js")))
          .as("path"),
        when(k % 2 === 0, md5(concat(lit("blob"), ks)))
          .otherwise(lit(null).cast("string")).as("sha1"),
        when(k % 3 === 0,
          array(md5(concat(lit("blob"), (k + 4).cast("string"))),
            md5(concat(lit("blob"), k.cast("string")))))
          .otherwise(lit(null).cast("array<string>"))
          .as("source_map_sha1s"))
      val index = t(s, dir, "part")
        .filter(k % 4 === 0)
        .select(md5(concat(lit("blob"), ks)).as("sha1"),
          concat(lit("http://pkg/"), (k % 50).cast("string"))
            .as("download_url"),
          concat(lit("lib/f"), ks).as("path"))
      graft.matching.Matching.exactMatchWithSourceMaps(queries, index)
        .orderBy("q_path", "sha1", "matched_path")
    },
    Some("""WITH q AS (
        SELECT p_partkey AS k,
          'src/f' || CAST(p_partkey AS VARCHAR) ||
            CASE WHEN p_partkey % 3 = 0 THEN '.js.map' ELSE '.js' END
            AS path,
          CASE WHEN p_partkey % 2 = 0
            THEN md5('blob' || CAST(p_partkey AS VARCHAR)) END AS sha1
        FROM part),
      widened AS (
        SELECT path, sha1 FROM q WHERE sha1 IS NOT NULL
        UNION
        SELECT path, md5('blob' || CAST(k + 4 AS VARCHAR)) FROM q
        WHERE k % 3 = 0
        UNION
        SELECT path, md5('blob' || CAST(k AS VARCHAR)) FROM q
        WHERE k % 3 = 0),
      idx AS (
        SELECT md5('blob' || CAST(p_partkey AS VARCHAR)) AS sha1,
          'http://pkg/' || CAST(p_partkey % 50 AS VARCHAR)
            AS download_url,
          'lib/f' || CAST(p_partkey AS VARCHAR) AS path
        FROM part WHERE p_partkey % 4 = 0)
      SELECT w.path AS q_path, w.sha1 AS sha1, idx.download_url,
        idx.path AS matched_path
      FROM widened w JOIN idx ON w.sha1 = idx.sha1
      ORDER BY q_path, w.sha1, matched_path"""))

  /** X7 — nexus index entry → artifact classification
    * (`minecode/miners/maven.py:569-707` build_artifact +
    * `:388-446` is_worthy_artifact / is_source): pipe-split `u`/`i`
    * records, NA/null sentinel folding, the 3-branch extension
    * inference (7th i-field wins; classifier-or-pom/war/ear takes the
    * packaging — even when that is NULL; else "jar"), java epoch-ms →
    * ISO-8601+00:00 timestamps with fractional seconds only when
    * needed, the 13-shape worthiness table, and the source-classifier
    * test. The REAL builder runs per row; the oracle re-derives every
    * field from the same generation arithmetic. */
  val x7 = QueryDef(
    "x7_build_artifact", "X7",
    "nexus u|i records → classified artifacts (worthy/source flags)",
    (s, dir) => {
      import s.implicits._
      val cls5 = k % 5
      val u = concat(lit("grp"), (k % 20).cast("string"), lit("|art"), ks,
        lit("|"),
        when(k % 10 === 0, lit("archetypes"))
          .otherwise(concat(lit("1."), (k % 4).cast("string"))),
        lit("|"),
        when(cls5 === 1, lit("sources")).when(cls5 === 3, lit("src"))
          .otherwise(lit("NA")),
        when(cls5 === 4, lit("|zip")).otherwise(lit("")))
      val i = concat(
        when(k % 4 === 0, lit("jar")).when(k % 4 === 1, lit("pom"))
          .when(k % 4 === 2, lit("NA")).otherwise(lit("war")),
        lit("|"),
        when(k % 6 === 0, lit("0"))
          .otherwise((lit(1700000000000L) + k * 1000 +
            when(k % 8 === 0, lit(123L)).otherwise(lit(0L)))
            .cast("string")),
        lit("|"),
        when(k % 7 === 0, lit("")).otherwise((k * 10).cast("string")),
        lit("|"), (k % 2).cast("string"),
        lit("|"), when(k % 3 === 0, lit("1")).otherwise(lit("0")),
        lit("|"), when(k % 11 === 0, lit("1")).otherwise(lit("0")),
        when(k % 9 === 0, lit("|tar.gz")).otherwise(lit("")))
      t(s, dir, "part").select(k.as("k"), u.as("u"), i.as("i"))
        .as[(Long, String, String)]
        .map { case (kk, uv, iv) =>
          val a = graft.miners.MavenIndexArtifacts
            .buildArtifact(Map("u" -> uv, "i" -> iv)).get
          (kk, a.groupId, a.artifactId, a.version, a.packaging,
            a.classifier, a.extension, a.lastModified, a.size,
            a.srcExist, a.jdocExist, a.sigExist,
            graft.miners.MavenIndexArtifacts.isWorthyArtifact(a),
            graft.miners.MavenIndexArtifacts.isSource(a.classifier))
        }
        .toDF("k", "group_id", "artifact_id", "version", "packaging",
          "classifier", "extension", "last_modified", "size",
          "src_exist", "jdoc_exist", "sig_exist", "worthy", "is_source")
        .orderBy("k")
    },
    Some("""WITH m AS (
        SELECT p_partkey AS k,
          CASE WHEN p_partkey % 10 = 0 THEN 'archetypes'
            ELSE '1.' || CAST(p_partkey % 4 AS VARCHAR) END AS version,
          CASE WHEN p_partkey % 5 = 1 THEN 'sources'
               WHEN p_partkey % 5 = 3 THEN 'src' END AS classifier,
          CASE WHEN p_partkey % 4 = 0 THEN 'jar'
               WHEN p_partkey % 4 = 1 THEN 'pom'
               WHEN p_partkey % 4 = 2 THEN NULL
               ELSE 'war' END AS packaging
        FROM part),
      e AS (
        SELECT k, version, classifier, packaging,
          CASE WHEN k % 9 = 0 THEN 'tar.gz'
               WHEN classifier IS NOT NULL
                 OR packaging IN ('pom', 'war') THEN packaging
               ELSE 'jar' END AS extension,
          CASE WHEN k % 6 = 0 THEN NULL
            ELSE strftime(make_timestamp((1700000000 + k) * 1000000),
                '%Y-%m-%dT%H:%M:%S') ||
              CASE WHEN k % 8 = 0 THEN '.123000' ELSE '' END ||
              '+00:00' END AS last_modified,
          CASE WHEN k % 7 = 0 THEN NULL ELSE k * 10 END AS size
        FROM m)
      SELECT k, 'grp' || CAST(k % 20 AS VARCHAR) AS group_id,
        'art' || CAST(k AS VARCHAR) AS artifact_id,
        version, packaging, classifier, extension, last_modified, size,
        k % 2 = 1 AS src_exist, k % 3 = 0 AS jdoc_exist,
        k % 11 = 0 AS sig_exist,
        version <> 'archetypes' AND
          concat_ws('/', COALESCE(packaging, '~'),
            COALESCE(classifier, '~'), COALESCE(extension, '~')) IN
          ('jar/sources/jar', 'jar/~/jar', 'bundle/~/jar', 'war/~/war',
           'zip/source-release/zip', 'maven-plugin/~/jar', 'aar/~/aar',
           'jar/sources-commercial/jar', 'zip/src/zip',
           'tar.gz/src/tar.gz', 'jar/~/zip', 'zip/project-src/zip',
           'jar/src/jar') AS worthy,
        COALESCE(classifier LIKE '%source%' OR classifier LIKE '%src%',
          FALSE) AS is_source
      FROM e ORDER BY k"""))

  val defs: Seq[QueryDef] = Seq(j10, f7, o2, x9, s14, j11, x7)
}
