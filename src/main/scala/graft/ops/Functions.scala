package graft.ops

import graft._
import graft.core._
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 — scalar function surface: PURL codec, hex/binary,
  * hamming, version-hint regexes, date/path/array/map ops. Each query
  * projects the function over a table so the oracle can check value
  * semantics row by row.
  */
object Functions {

  val f1 = QueryDef(
    "f1_purl_roundtrip", "F1",
    "purl_build → purl_parse roundtrip via the custom Catalyst expression",
    (s, dir) => {
      val withPurl = t(s, dir, "part")
        .withColumn("version",
          concat(pmod(col("p_partkey"), lit(3)).cast("string"), lit("."),
            pmod(col("p_partkey"), lit(12)).cast("string")))
        .withColumn("purl", purl_build(
          lit("generic"),
          lower(regexp_replace(col("p_brand"), "#", "")),
          regexp_replace(col("p_name"), " ", "-"),
          col("version")))
      withPurl
        .withColumn("parsed", purl_parse(col("purl")))
        .select(
          col("p_partkey"), col("purl"),
          col("parsed.ptype").as("ptype"),
          col("parsed.namespace").as("namespace"),
          col("parsed.name").as("name"),
          col("parsed.version").as("version"))
        .orderBy("p_partkey")
    },
    Some("""WITH built AS (
        SELECT p_partkey,
          'pkg:generic/' || lower(replace(p_brand, '#', '')) || '/' ||
            replace(p_name, ' ', '-') || '@' ||
            CAST(p_partkey % 3 AS VARCHAR) || '.' || CAST(p_partkey % 12 AS VARCHAR)
            AS purl,
          lower(replace(p_brand, '#', '')) AS ns,
          replace(p_name, ' ', '-') AS nm,
          CAST(p_partkey % 3 AS VARCHAR) || '.' || CAST(p_partkey % 12 AS VARCHAR) AS ver
        FROM part)
      SELECT p_partkey, purl, 'generic' AS ptype, ns AS namespace,
        nm AS name, ver AS version
      FROM built ORDER BY p_partkey"""))

  val f3 = QueryDef(
    "f3_hex_binary", "F3",
    "hex ↔ binary roundtrip on digest strings",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("fp", md5(col("text")))
        .select(col("doc_id"), col("fp"),
          hex(unhex(col("fp"))).as("fp_upper"),
          length(unhex(col("fp"))).as("n_bytes"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(text) AS fp,
        hex(unhex(md5(text))) AS fp_upper,
        CAST(octet_length(unhex(md5(text))) AS INTEGER) AS n_bytes
      FROM documents ORDER BY doc_id"""))

  val f4 = QueryDef(
    "f4_hamming", "F4",
    "popcount-of-XOR hamming distance + similarity ratio",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("bit_count(l_partkey ^ l_suppkey)").as("hd"),
          (asDouble(lit(64) - expr("bit_count(l_partkey ^ l_suppkey)")) / 64.0)
            .as("similarity"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
        bit_count(xor(l_partkey, l_suppkey)) AS hd,
        CAST(64 - bit_count(xor(l_partkey, l_suppkey)) AS DOUBLE)/64.0
          AS similarity
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  val f5 = QueryDef(
    "f5_version_hint", "F5",
    "extract version from an artifact path via regex battery",
    (s, dir) =>
      t(s, dir, "part")
        .withColumn("path",
          concat(lit("repo/"), regexp_replace(col("p_name"), " ", "-"),
            lit("-"), pmod(col("p_partkey"), lit(9)).cast("string"),
            lit("."), pmod(col("p_partkey"), lit(7)).cast("string"),
            lit(".tar.gz")))
        .select(col("p_partkey"), col("path"),
          regexp_extract(col("path"), "-([0-9]+\\.[0-9]+)\\.tar\\.gz$", 1)
            .as("version_hint"))
        .orderBy("p_partkey"),
    Some("""WITH p AS (
        SELECT p_partkey,
          'repo/' || replace(p_name, ' ', '-') || '-' ||
          CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 7 AS VARCHAR)
          || '.tar.gz' AS path
        FROM part)
      SELECT p_partkey, path,
        COALESCE(regexp_extract(path, '-([0-9]+\.[0-9]+)\.tar\.gz$', 1), '')
          AS version_hint
      FROM p ORDER BY p_partkey"""))

  val f8 = QueryDef(
    "f8_date_ops", "F8",
    "date parsing/truncation/extraction/arithmetic",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"),
            lit("1995-01-01").cast("timestamp")).as("days_since"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
        CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
        date_trunc('month', o_orderdate) AS month_start,
        CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
          AS days_since
      FROM orders ORDER BY o_orderkey"""))

  val f9 = QueryDef(
    "f9_path_ops", "F9",
    "file_name / extension / parent extraction from paths",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("path",
          concat(col("source"), lit("/doc_"), col("doc_id").cast("string"),
            lit(".txt")))
        .select(col("doc_id"), col("path"),
          substring_index(col("path"), "/", -1).as("file_name"),
          substring_index(substring_index(col("path"), "/", -1), ".", -1)
            .as("extension"),
          substring_index(col("path"), "/", 1).as("parent"))
        .orderBy("doc_id"),
    Some("""WITH p AS (
        SELECT doc_id,
          source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS path
        FROM documents)
      SELECT doc_id, path,
        string_split(path, '/')[-1] AS file_name,
        string_split(string_split(path, '/')[-1], '.')[-1] AS extension,
        string_split(path, '/')[1] AS parent
      FROM p ORDER BY doc_id"""))

  val f11 = QueryDef(
    "f11_normalize_qualifiers", "F11",
    "canonical qualifier encoding: split, sort pairs, re-join",
    (s, dir) =>
      t(s, dir, "part")
        .withColumn("quals",
          concat(lit("size="), col("p_size").cast("string"),
            lit("&type="), lower(col("p_type")),
            lit("&brand="), lower(regexp_replace(col("p_brand"), "#", "")))
        )
        .select(col("p_partkey"), col("quals"),
          array_join(array_sort(split(col("quals"), "&")), "&")
            .as("quals_norm"))
        .orderBy("p_partkey"),
    Some("""WITH q AS (
        SELECT p_partkey,
          'size=' || CAST(p_size AS VARCHAR) || '&type=' || lower(p_type) ||
          '&brand=' || lower(replace(p_brand, '#', '')) AS quals
        FROM part)
      SELECT p_partkey, quals,
        array_to_string(list_sort(string_split(quals, '&')), '&') AS quals_norm
      FROM q ORDER BY p_partkey"""))

  val f13 = QueryDef(
    "f13_go_purl", "F13",
    "golang import line → purl components (string-split expression)",
    (s, dir) =>
      t(s, dir, "supplier")
        .withColumn("goline",
          concat(lit("github.com/org"),
            pmod(col("s_suppkey"), lit(5)).cast("string"),
            lit("/repo"), col("s_suppkey").cast("string"),
            lit(" v1."), pmod(col("s_suppkey"), lit(4)).cast("string"),
            lit(".0")))
        .select(col("s_suppkey"), col("goline"),
          concat(lit("pkg:golang/"),
            substring_index(col("goline"), " ", 1), lit("@"),
            substring_index(col("goline"), " ", -1)).as("purl"))
        .orderBy("s_suppkey"),
    Some("""WITH g AS (
        SELECT s_suppkey,
          'github.com/org' || CAST(s_suppkey % 5 AS VARCHAR) ||
          '/repo' || CAST(s_suppkey AS VARCHAR) ||
          ' v1.' || CAST(s_suppkey % 4 AS VARCHAR) || '.0' AS goline
        FROM supplier)
      SELECT s_suppkey, goline,
        'pkg:golang/' || string_split(goline, ' ')[1] || '@' ||
          string_split(goline, ' ')[2] AS purl
      FROM g ORDER BY s_suppkey"""))

  val f16 = QueryDef(
    "f16_array_ops", "F16",
    "array ops over token lists: distinct size, contains, slice",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("words",
          filter(split(col("text"), " "), w => w =!= ""))
        .select(col("doc_id"),
          size(col("words")).as("n_words"),
          size(array_distinct(col("words"))).as("n_unique"),
          array_contains(col("words"), "spark").as("has_spark"),
          array_join(slice(array_sort(array_distinct(col("words"))), 1, 3), ",")
            .as("first3"))
        .orderBy("doc_id"),
    Some("""WITH w AS (
        SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS words
        FROM documents)
      SELECT doc_id,
        CAST(len(words) AS INTEGER) AS n_words,
        CAST(len(list_distinct(words)) AS INTEGER) AS n_unique,
        list_contains(words, 'spark') AS has_spark,
        array_to_string(list_sort(list_distinct(words))[1:3], ',') AS first3
      FROM w ORDER BY doc_id"""))

  val st1 = QueryDef(
    "st_tumbling_window", "ST1-ST3 (batch view)",
    "tumbling 1h event-time window aggregation (streaming-compatible)",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (asDouble(sum(cents(col("value")))) / 100.0).as("sum_value"))
        .select(col("win.start").as("ws"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy("ws", "event_type"),
    Some("""SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
        CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      FROM events GROUP BY date_trunc('hour', ts), event_type
      ORDER BY ws, event_type"""))

  /** Session windows — the gap-based event grouping every
    * clickstream/telemetry pipeline needs, via Spark's NATIVE
    * `session_window` (streaming-compatible: the same expression runs
    * under `readStream` with a watermark, merging sessions across
    * micro-batches in state). A session extends while the next event
    * arrives strictly before last_ts + gap; window end = last_ts +
    * gap. The oracle rebuilds the identical semantics with the
    * classic gaps-and-islands construction (break when the gap ≥ 6 h,
    * running sum of breaks = session id).
    *
    * 100 TB shape: one shuffle on user_id (the session assignment is
    * a per-key sort — Spark plans exactly that), aggregates map-side
    * combined; 6 h over the synthetic corpus merges ~43% of events so
    * the merge logic is actually exercised. */
  val stSession = QueryDef(
    "st_session_window", "ST1-ST3 (batch view) + LLM-pipeline sessions",
    "6h-gap session windows per user (Spark-native session_window)",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("spend_cents"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"),
          col("spend_cents"))
        .orderBy("user_id", "session_start"),
    Some("""WITH o AS (
        SELECT user_id, ts, value, event_id,
          CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w >= INTERVAL '6 hours' THEN 1
               ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, value,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM o)
      SELECT user_id, MIN(ts) AS session_start,
        MAX(ts) + INTERVAL '6 hours' AS session_end,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
          AS spend_cents
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** Sliding (hopping) windows — the third of Spark's three
    * event-time window kinds (tumbling `st_tumbling_window`, session
    * `st_session_window`): 1 h windows every 15 min, so each event
    * lands in 4 overlapping windows. The oracle expands the same
    * 4-window membership per event explicitly (generate_series of the
    * window starts that cover each ts). Streaming-compatible like the
    * others — the same expression runs under readStream. */
  val stSliding = QueryDef(
    "st_sliding_window", "ST1-ST3 (batch view) + sliding windows",
    "1h windows sliding every 15min per event_type",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("cents_sum"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"),
          col("cents_sum"))
        .orderBy("ws", "event_type"),
    Some("""WITH e AS (
        SELECT ts, event_type, value,
          date_trunc('hour', ts) - INTERVAL '1 hour'
            + to_minutes(CAST(15 * k AS BIGINT)) AS ws
        FROM events,
          (SELECT unnest(range(0, 8)) AS k)
        WHERE date_trunc('hour', ts) - INTERVAL '1 hour'
            + to_minutes(CAST(15 * k AS BIGINT)) <= ts
          AND ts < date_trunc('hour', ts) - INTERVAL '1 hour'
            + to_minutes(CAST(15 * k AS BIGINT)) + INTERVAL '1 hour')
      SELECT ws, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
          AS cents_sum
      FROM e GROUP BY ws, event_type
      ORDER BY ws, event_type"""))

  val f2 = QueryDef(
    "f2_canonical_url", "F2",
    "URL canonicalization: case, default port, dot segments, fragment",
    (s, dir) => {
      // codegen'd Catalyst expression (static-forwarder doGenCode) —
      // no UDF serialization barrier in the plan
      val canonical = graft.functions.GraftFunctions.canonical_url _
      t(s, dir, "documents")
        .withColumn("raw",
          concat(lit("HTTP://Example.COM:80/"), col("source"), lit("/x/../doc/"),
            col("doc_id").cast("string"), lit("#frag")))
        .select(col("doc_id"), col("raw"), canonical(col("raw")).as("canon"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        'HTTP://Example.COM:80/' || source || '/x/../doc/' ||
          CAST(doc_id AS VARCHAR) || '#frag' AS raw,
        'http://example.com/' || source || '/doc/' ||
          CAST(doc_id AS VARCHAR) AS canon
      FROM documents ORDER BY doc_id"""))

  val f15 = QueryDef(
    "f15_vers_range", "F15",
    "vers-range membership over synthesized versions (union-of-intervals)",
    (s, dir) => {
      t(s, dir, "part")
        .withColumn("version",
          concat(pmod(col("p_partkey"), lit(3)).cast("string"), lit("."),
            pmod(col("p_partkey"), lit(12)).cast("string")))
        .select(col("p_partkey"), col("version"),
          coalesce(graft.functions.GraftFunctions.vers_contains(
            lit("vers:generic/>=0.4|<2.2"), col("version")), lit(false))
            .as("in_range"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
        CAST(p_partkey % 3 AS VARCHAR) || '.' || CAST(p_partkey % 12 AS VARCHAR)
          AS version,
        ((p_partkey % 3 > 0) OR (p_partkey % 3 = 0 AND p_partkey % 12 >= 4))
          AND ((p_partkey % 3 < 2) OR (p_partkey % 3 = 2 AND p_partkey % 12 < 2))
          AS in_range
      FROM part ORDER BY p_partkey"""))

  /** sign of the scheme-aware version comparison — the VersCmp
    * Catalyst expression (static-forwarder codegen; the recursive-
    * descent parsing runs inside whole-stage codegen, no UDF
    * serialization barrier). */
  private def vcmp(scheme: org.apache.spark.sql.Column,
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.vers_cmp(scheme, a, b)

  /** F15/pep440 — versions synthesized so the expected comparison
    * against the pivot "1.2" is computable in plain SQL: epoch beats
    * all; at the pivot release the tag decides
    * (dev < a < b < rc < final < post). */
  val f15pep = QueryDef(
    "f15_vers_pep440", "F15",
    "pep440 ordering: epoch/dev/pre/post tags vs a pivot release",
    (s, dir) => {
      val tag = element_at(
        array(lit(""), lit(".dev1"), lit("a1"), lit("b1"), lit("rc1"),
          lit(".post1")),
        (pmod(col("p_partkey"), lit(6)) + 1).cast("int"))
      val version = concat(
        when(pmod(col("p_partkey"), lit(7)) === 0, lit("1!")).otherwise(lit("")),
        pmod(col("p_partkey"), lit(3)).cast("string"), lit(".2"), tag)
      t(s, dir, "part")
        .withColumn("version", version)
        .select(col("p_partkey"), col("version"),
          vcmp(lit("pypi"), col("version"), lit("1.2")).as("cmp"))
        .orderBy("p_partkey")
    },
    Some("""WITH v AS (
        SELECT p_partkey,
          CASE WHEN p_partkey % 7 = 0 THEN '1!' ELSE '' END ||
          CAST(p_partkey % 3 AS VARCHAR) || '.2' ||
          CASE p_partkey % 6 WHEN 0 THEN '' WHEN 1 THEN '.dev1'
            WHEN 2 THEN 'a1' WHEN 3 THEN 'b1' WHEN 4 THEN 'rc1'
            ELSE '.post1' END AS version
        FROM part)
      SELECT p_partkey, version,
        CASE WHEN p_partkey % 7 = 0 THEN 1
             WHEN p_partkey % 3 < 1 THEN -1
             WHEN p_partkey % 3 > 1 THEN 1
             ELSE CASE p_partkey % 6 WHEN 0 THEN 0 WHEN 5 THEN 1
                  ELSE -1 END
        END AS cmp
      FROM v ORDER BY p_partkey"""))

  /** F15/debian — dpkg ordering: epoch, `~` pre-markers (sort before
    * the base), revisions and `+` suffixes (sort after). */
  val f15deb = QueryDef(
    "f15_vers_debian", "F15",
    "debian dpkg ordering: epoch, tilde, revision vs a pivot",
    (s, dir) => {
      val tag = element_at(
        array(lit(""), lit("~~"), lit("~rc1"), lit("-1"), lit("+b2")),
        (pmod(col("p_partkey"), lit(5)) + 1).cast("int"))
      val version = concat(
        when(pmod(col("p_partkey"), lit(11)) === 0, lit("1:"))
          .otherwise(lit("")),
        pmod(col("p_partkey"), lit(3)).cast("string"), lit(".2"), tag)
      t(s, dir, "part")
        .withColumn("version", version)
        .select(col("p_partkey"), col("version"),
          vcmp(lit("deb"), col("version"), lit("1.2")).as("cmp"))
        .orderBy("p_partkey")
    },
    Some("""WITH v AS (
        SELECT p_partkey,
          CASE WHEN p_partkey % 11 = 0 THEN '1:' ELSE '' END ||
          CAST(p_partkey % 3 AS VARCHAR) || '.2' ||
          CASE p_partkey % 5 WHEN 0 THEN '' WHEN 1 THEN '~~'
            WHEN 2 THEN '~rc1' WHEN 3 THEN '-1' ELSE '+b2' END AS version
        FROM part)
      SELECT p_partkey, version,
        CASE WHEN p_partkey % 11 = 0 THEN 1
             WHEN p_partkey % 3 < 1 THEN -1
             WHEN p_partkey % 3 > 1 THEN 1
             WHEN p_partkey % 5 IN (1, 2) THEN -1
             WHEN p_partkey % 5 IN (3, 4) THEN 1
             ELSE 0
        END AS cmp
      FROM v ORDER BY p_partkey"""))

  /** F15/maven — ComparableVersion qualifier table: alpha < beta <
    * milestone < rc(=cr) < SNAPSHOT < release < sp. */
  val f15mvn = QueryDef(
    "f15_vers_maven", "F15",
    "maven qualifier ordering vs a pivot release",
    (s, dir) => {
      val qual = element_at(
        array(lit("-alpha"), lit("-beta"), lit("-milestone"), lit("-cr"),
          lit("-SNAPSHOT"), lit(""), lit("-sp")),
        (pmod(col("p_partkey"), lit(7)) + 1).cast("int"))
      val version = concat(
        pmod(col("p_partkey"), lit(3)).cast("string"), lit(".2"), qual)
      t(s, dir, "part")
        .withColumn("version", version)
        .select(col("p_partkey"), col("version"),
          vcmp(lit("maven"), col("version"), lit("1.2")).as("cmp"))
        .orderBy("p_partkey")
    },
    Some("""WITH v AS (
        SELECT p_partkey,
          CAST(p_partkey % 3 AS VARCHAR) || '.2' ||
          CASE p_partkey % 7 WHEN 0 THEN '-alpha' WHEN 1 THEN '-beta'
            WHEN 2 THEN '-milestone' WHEN 3 THEN '-cr'
            WHEN 4 THEN '-SNAPSHOT' WHEN 5 THEN '' ELSE '-sp' END AS version
        FROM part)
      SELECT p_partkey, version,
        CASE WHEN p_partkey % 3 < 1 THEN -1
             WHEN p_partkey % 3 > 1 THEN 1
             WHEN p_partkey % 7 < 5 THEN -1
             WHEN p_partkey % 7 = 5 THEN 0
             ELSE 1
        END AS cmp
      FROM v ORDER BY p_partkey"""))

  /** F15/semver — prerelease identifier ordering, build metadata
    * ignored for precedence. */
  val f15sem = QueryDef(
    "f15_vers_semver", "F15",
    "semver prerelease ordering and build-metadata equality vs a pivot",
    (s, dir) => {
      val pre = element_at(
        array(lit("-alpha"), lit("-alpha.1"), lit("-beta"), lit(""),
          lit("+build42")),
        (pmod(col("p_partkey"), lit(5)) + 1).cast("int"))
      val version = concat(
        pmod(col("p_partkey"), lit(3)).cast("string"), lit(".2.0"), pre)
      t(s, dir, "part")
        .withColumn("version", version)
        .select(col("p_partkey"), col("version"),
          vcmp(lit("npm"), col("version"), lit("1.2.0")).as("cmp"))
        .orderBy("p_partkey")
    },
    Some("""WITH v AS (
        SELECT p_partkey,
          CAST(p_partkey % 3 AS VARCHAR) || '.2.0' ||
          CASE p_partkey % 5 WHEN 0 THEN '-alpha' WHEN 1 THEN '-alpha.1'
            WHEN 2 THEN '-beta' WHEN 3 THEN '' ELSE '+build42' END AS version
        FROM part)
      SELECT p_partkey, version,
        CASE WHEN p_partkey % 3 < 1 THEN -1
             WHEN p_partkey % 3 > 1 THEN 1
             WHEN p_partkey % 5 IN (0, 1, 2) THEN -1
             ELSE 0
        END AS cmp
      FROM v ORDER BY p_partkey"""))

  /** F14 — the source-repo candidate generator under the driver
    * oracle: the real `SourceRepo.candidateUrls` (purl2vcs
    * `get_repo_urls`/`get_urls_from_purl_type`, `purl2vcs/src/
    * purl2vcs/find_source_repo.py`) and
    * `convertApacheSvnToGithubUrl` (`:84-113`) run executor-side over
    * a corpus that hits every branch — VCS vs non-VCS homepages with
    * `.git` stripping, the github/golang/maven/other/no-namespace
    * guess families (golang's two spellings collapse under distinct),
    * and valid vs short Apache SVN tag URLs — each re-derived in
    * closed form by the oracle. */
  val f14candidates = QueryDef(
    "f14_candidate_urls", "F14/J10",
    "real candidate-URL generator + apache-svn conversion per branch",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k")).as[Long]
        .flatMap { k =>
          import graft.miners.SourceRepo
          val ptype = Seq("github", "golang", "maven", "pypi",
            "npm")((k % 5).toInt)
          val ns =
            if (k % 4 == 0) None
            else ptype match {
              case "golang" => Some(s"github.com/org$k")
              case "maven"  => Some(s"com.example.org$k")
              case _        => Some(s"org$k")
            }
          val homepage = (k % 3) match {
            case 0 => Some(s"https://github.com/h$k/repo.git")
            case 1 => Some(s"https://example.com/site$k")
            case _ => None
          }
          val svn =
            if (k % 2 == 0)
              s"svn+https://svn.apache.org/repos/asf/proj$k/tags/v$k/sub"
            else s"https://svn.apache.org/repos/asf/proj$k/trunk"
          val gh = SourceRepo.convertApacheSvnToGithubUrl(svn).orNull
          SourceRepo.candidateUrls(ptype, ns, s"n$k", homepage)
            .map(c => (k, c, gh))
        }
        .toDF("k", "candidate", "apache_github")
        .orderBy("k", "candidate")
    },
    Some("""WITH base AS (
        SELECT p_partkey AS k,
          CASE WHEN p_partkey % 4 = 0 THEN 'n' || CAST(p_partkey AS VARCHAR)
               ELSE 'org' || CAST(p_partkey AS VARCHAR) END AS owner,
          CASE WHEN p_partkey % 2 = 0 THEN
            'https://github.com/apache/proj' || CAST(p_partkey AS VARCHAR)
              || '/tree/v' || CAST(p_partkey AS VARCHAR)
          END AS apache_github
        FROM part WHERE p_partkey < 200),
      cands AS (
        SELECT k,
          'https://github.com/h' || CAST(k AS VARCHAR) || '/repo'
            AS candidate, apache_github
        FROM base WHERE k % 3 = 0
        UNION ALL
        SELECT k,
          'https://github.com/' || owner || '/n' || CAST(k AS VARCHAR),
          apache_github
        FROM base)
      SELECT k, candidate, apache_github FROM cands
      ORDER BY k, candidate"""))

  /** Windowed cardinality monitoring — event-time windows composed
    * with the HLL++ distinct sketch, the streaming shape of
    * `a_sketch_distinct`: per (day, event_type), distinct active
    * users. Under `readStream` + watermark the HLL partial is
    * precisely what Spark keeps in window state (mergeable,
    * fixed-size) — an exact distinct would hold every user id per
    * open window in state instead. This batch view carries BOTH
    * branches and emits the exact count plus the 5σ error gate (same
    * discriminating-gate contract as the other sketch rows); the
    * oracle recomputes the exact side (tumbling 1-day windows are
    * epoch-aligned, so `window(ts, '1 day')` ≡ `date_trunc('day')`
    * both engines). */
  val stWindowDistinct = QueryDef(
    "st_window_distinct", "ST1/A3 + HLL (streaming cardinality)",
    "per-day windowed distinct users: exact vs HLL++ 5σ gate",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
        .select(col("win.start").as("ws"), col("event_type"),
          col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) <=
            asDouble(col("n_exact")) * (5 * 0.02)).as("gate_ok"))
        .orderBy("ws", "event_type"),
    Some("""SELECT date_trunc('day', ts) AS ws, event_type,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        TRUE AS gate_ok
      FROM events GROUP BY 1, 2 ORDER BY ws, event_type"""))

  val defs: Seq[QueryDef] =
    Seq(f1, f2, f3, f4, f5, f8, f9, f11, f13, f15, f15pep, f15deb, f15mvn,
      f15sem, f16, st1, stSession, stSliding, stWindowDistinct,
      f14candidates)
}
