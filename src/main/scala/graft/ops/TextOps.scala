package graft.ops

import graft._
import graft.core._
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: token
  * counting, quality scoring, language-ID heuristic, and winnowed
  * document fingerprints. All run over the `documents` table.
  */
object TextOps {

  private def words = filter(split(col("text"), " "), w => w =!= "")

  val tok = QueryDef(
    "t_token_count", "LLM-pipeline: token counting",
    "whitespace tokens + BPE-ish regex tokens + chars per doc",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(words).as("n_ws_tokens"),
          expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").as("n_re_tokens"),
          length(col("text")).as("n_text_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INTEGER)
          AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_re_tokens,
        CAST(length(text) AS INTEGER) AS n_text_chars
      FROM documents ORDER BY doc_id"""))

  val quality = QueryDef(
    "t_quality_score", "LLM-pipeline: quality scoring",
    "stopword ratio + mean word length + length factor → quality score",
    (s, dir) => {
      val nWords = size(words)
      val nStop = size(filter(split(col("text"), " "),
        w => w === "the" || w === "a" || w === "of"))
      val meanLen = asDouble(length(regexp_replace(col("text"), " ", ""))) /
        asDouble(nWords)
      val stopRatio = asDouble(nStop) / asDouble(nWords)
      t(s, dir, "documents")
        .select(col("doc_id"),
          nWords.as("n_words"),
          nStop.as("n_stop"),
          stopRatio.as("stop_ratio"),
          meanLen.as("mean_word_len"),
          ((stopRatio * 0.5) + (meanLen / 10.0) * 0.5).as("quality_score"))
        .filter(nWords > 0)
        .orderBy("doc_id")
    },
    Some("""WITH q AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INTEGER)
            AS n_words,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w = 'the' OR w = 'a' OR w = 'of')) AS INTEGER) AS n_stop,
          CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_letters
        FROM documents)
      SELECT doc_id, n_words, n_stop,
        CAST(n_stop AS DOUBLE)/CAST(n_words AS DOUBLE) AS stop_ratio,
        CAST(n_letters AS DOUBLE)/CAST(n_words AS DOUBLE) AS mean_word_len,
        (CAST(n_stop AS DOUBLE)/CAST(n_words AS DOUBLE)) * 0.5 +
          ((CAST(n_letters AS DOUBLE)/CAST(n_words AS DOUBLE)) / 10.0) * 0.5
          AS quality_score
      FROM q WHERE n_words > 0 ORDER BY doc_id"""))

  val langid = QueryDef(
    "t_langid", "LLM-pipeline: language ID",
    "marker-token language scores → argmax label with deterministic ties",
    (s, dir) => {
      def score(markers: Seq[String]) =
        size(filter(split(col("text"), " "),
          w => markers.map(m => w === m).reduce(_ || _)))
      val en = score(Seq("the", "a", "of", "and"))
      val fr = score(Seq("le", "la", "et", "les"))
      val de = score(Seq("der", "die", "und", "das"))
      t(s, dir, "documents")
        .select(col("doc_id"), en.as("en_score"), fr.as("fr_score"),
          de.as("de_score"),
          when(en >= fr && en >= de && en > 0, "en")
            .when(fr >= de && fr > 0, "fr")
            .when(de > 0, "de")
            .otherwise("und").as("predicted"))
        .orderBy("doc_id")
    },
    Some("""WITH sc AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and')) AS INTEGER)
            AS en_score,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w = 'le' OR w = 'la' OR w = 'et' OR w = 'les')) AS INTEGER)
            AS fr_score,
          CAST(len(list_filter(string_split(text, ' '),
            w -> w = 'der' OR w = 'die' OR w = 'und' OR w = 'das')) AS INTEGER)
            AS de_score
        FROM documents)
      SELECT doc_id, en_score, fr_score, de_score,
        CASE WHEN en_score >= fr_score AND en_score >= de_score
               AND en_score > 0 THEN 'en'
             WHEN fr_score >= de_score AND fr_score > 0 THEN 'fr'
             WHEN de_score > 0 THEN 'de'
             ELSE 'und' END AS predicted
      FROM sc ORDER BY doc_id"""))

  /** Winnowed document fingerprints (X6 family) with a fully
    * oracle-mirrorable hash: word 4-grams → md5 prefix → window-16
    * minimum (standard winnowing: every window of 16 consecutive gram
    * hashes contributes its minimum), distinct + sorted. md5 and
    * lexicographic-min over fixed-width hex behave identically in
    * Spark and DuckDB, so the winnowing algebra itself is checked
    * end-to-end. (The matching pipeline's `rollhash_fps` custom
    * expression keeps its own Rabin-Karp hash — exercised by
    * m_snippet_match and its specs.) */
  val fingerprint = QueryDef(
    "t_doc_fingerprint", "LLM-pipeline: doc fingerprinting (X6-like)",
    "winnowed md5 word-4-gram fingerprints (window 16) per doc",
    (s, dir) =>
      t(s, dir, "documents")
        .withColumn("w", words)
        .withColumn("hs", expr(
          """transform(
               transform(sequence(1, greatest(size(w) - 3, 1)),
                 i -> array_join(slice(w, i, 4), ' ')),
               g -> substring(md5(g), 1, 8))"""))
        .withColumn("fps", expr(
          """array_sort(array_distinct(
               transform(sequence(1, greatest(size(hs) - 15, 1)),
                 p -> array_min(slice(hs, p, 16)))))"""))
        .select(col("doc_id"), size(col("fps")).as("n_fps"),
          element_at(col("fps"), 1).as("min_fp"),
          element_at(col("fps"), size(col("fps"))).as("max_fp"))
        .orderBy("doc_id"),
    Some("""WITH w AS (
        SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents),
      hs AS (
        SELECT doc_id,
          list_transform(
            list_transform(range(1, greatest(len(ws) - 3, 1) + 1),
              i -> array_to_string(ws[i:i+3], ' ')),
            g -> substr(md5(g), 1, 8)) AS hl
        FROM w),
      fps AS (
        SELECT doc_id,
          list_sort(list_distinct(
            list_transform(range(1, greatest(len(hl) - 15, 1) + 1),
              p -> list_min(hl[p:p+15])))) AS fl
        FROM hs)
      SELECT doc_id, CAST(len(fl) AS INTEGER) AS n_fps,
        fl[1] AS min_fp, fl[len(fl)] AS max_fp
      FROM fps ORDER BY doc_id"""))

  /** Real char-trigram language ID (Cavnar-Trenkle rank-order over
    * built-in profiles) — the production classifier next to the
    * SQL-mirrorable marker heuristic above. The DuckDB oracle
    * reimplements the whole classifier in SQL — normalization,
    * trigram rank profiles (docs AND the built-in seed corpora),
    * out-of-place distance with the 300 cap, (distance, lang)
    * tie-break, und-floor — so the UDF is value-checked end-to-end. */
  val langidNgram = QueryDef(
    "t_langid_ngram", "LLM-pipeline: language ID (char n-gram)",
    "trigram rank-profile classification per document",
    (s, dir) => {
      val predict = graft.functions.GraftFunctions.langid _
      par(t(s, dir, "documents"))
        .select(col("doc_id"), predict(col("text")).as("predicted"))
        .orderBy("doc_id")
    },
    Some("""WITH seeds(lang, stext) AS (VALUES
        ('en', 'the quick brown fox jumps over the lazy dog and then it was said that all of the people who were there could not have known what would happen next because they had never seen anything like this before in their lives and it is what it is for the most part'),
        ('es', 'el rápido zorro marrón salta sobre el perro perezoso y entonces se dijo que toda la gente que estaba allí no podía haber sabido lo que pasaría después porque nunca habían visto nada como esto antes en sus vidas y es lo que es en la mayoría de los casos'),
        ('de', 'der schnelle braune fuchs springt über den faulen hund und dann wurde gesagt dass alle leute die dort waren nicht wissen konnten was als nächstes passieren würde weil sie so etwas noch nie in ihrem leben gesehen hatten und es ist was es ist'),
        ('fr', 'le rapide renard brun saute par dessus le chien paresseux et puis il a été dit que tous les gens qui étaient là ne pouvaient pas savoir ce qui allait se passer ensuite parce qu''ils n''avaient jamais rien vu de tel auparavant dans leur vie et c''est comme ça')),
      nd AS (
        SELECT doc_id,
          ' ' || trim(regexp_replace(lower(text), '[^\p{L}'']+', ' ', 'g'))
            || ' ' AS t
        FROM documents),
      dg AS (
        SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS g
        FROM (SELECT doc_id, t,
            unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS i
          FROM nd)),
      dp AS (
        SELECT doc_id, g, rn - 1 AS rank FROM (
          SELECT doc_id, g, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn
          FROM (SELECT doc_id, g, COUNT(*) AS cnt
            FROM dg GROUP BY doc_id, g))
        WHERE rn <= 300),
      ns AS (
        SELECT lang,
          ' ' || trim(regexp_replace(lower(stext), '[^\p{L}'']+', ' ', 'g'))
            || ' ' AS t
        FROM seeds),
      sg AS (
        SELECT lang, substr(t, CAST(i AS INTEGER), 3) AS g
        FROM (SELECT lang, t,
            unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS i
          FROM ns)),
      lp AS (
        SELECT lang, g, rn - 1 AS rank FROM (
          SELECT lang, g, ROW_NUMBER() OVER (
              PARTITION BY lang ORDER BY cnt DESC, g) AS rn
          FROM (SELECT lang, g, COUNT(*) AS cnt
            FROM sg GROUP BY lang, g))
        WHERE rn <= 300),
      dsz AS (SELECT doc_id, COUNT(*) AS n FROM dp GROUP BY doc_id),
      dist AS (
        SELECT d.doc_id, l.lang,
          SUM(CASE WHEN lp.rank IS NULL THEN 300
              ELSE LEAST(300, ABS(lp.rank - d.rank)) END) AS dist
        FROM dp d
        CROSS JOIN (SELECT DISTINCT lang FROM lp) l
        LEFT JOIN lp ON lp.lang = l.lang AND lp.g = d.g
        GROUP BY d.doc_id, l.lang),
      best AS (
        SELECT doc_id, lang, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY dist, lang) AS rn
        FROM dist)
      SELECT docs.doc_id,
        CASE WHEN dsz.n IS NULL OR dsz.n < 5 THEN 'und'
             ELSE b.lang END AS predicted
      FROM documents docs
      LEFT JOIN dsz ON docs.doc_id = dsz.doc_id
      LEFT JOIN best b ON b.doc_id = docs.doc_id AND b.rn = 1
      ORDER BY docs.doc_id"""))

  /** CCNet/Gopher-style repetition filter: the fraction of a
    * document's word bigrams taken by its single most frequent bigram,
    * plus the distinct-bigram ratio. Highly repetitive machine text
    * concentrates mass in few n-grams; the published filters drop
    * documents above a top-fraction threshold (0.18 here). One
    * explode + one map-side-combining groupBy per doc — the shape
    * scales linearly with corpus size. */
  val repetition = QueryDef(
    "t_repetition", "LLM-pipeline: repetition filter",
    "top word-bigram mass + distinct-bigram ratio per doc",
    (s, dir) => {
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), words.as("w"))
        .select(col("doc_id"),
          explode(expr(
            """transform(sequence(1, greatest(size(w) - 1, 1)),
                 i -> array_join(slice(w, i, 2), ' '))""")).as("g"))
      grams
        .groupBy("doc_id", "g")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_bigrams"),
          max("cnt").as("top_count"),
          count(lit(1)).as("uniq_bigrams"))
        .select(col("doc_id"), col("n_bigrams"), col("top_count"),
          col("uniq_bigrams"),
          (asDouble(col("top_count")) / asDouble(col("n_bigrams")))
            .as("top_frac"),
          (asDouble(col("uniq_bigrams")) / asDouble(col("n_bigrams")))
            .as("uniq_frac"),
          (asDouble(col("top_count")) / asDouble(col("n_bigrams")) >= 0.18)
            .as("repetitive"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (
        SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents),
      grams AS (
        SELECT doc_id,
          unnest(list_transform(range(1, greatest(len(ws) - 1, 1) + 1),
            i -> array_to_string(ws[i:i+1], ' '))) AS g
        FROM w),
      cnts AS (
        SELECT doc_id, g, COUNT(*) AS cnt FROM grams GROUP BY 1, 2),
      agg AS (
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
          CAST(MAX(cnt) AS BIGINT) AS top_count,
          CAST(COUNT(*) AS BIGINT) AS uniq_bigrams
        FROM cnts GROUP BY 1)
      SELECT doc_id, n_bigrams, top_count, uniq_bigrams,
        CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_frac,
        CAST(uniq_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS uniq_frac,
        CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE) >= 0.18
          AS repetitive
      FROM agg ORDER BY doc_id"""))

  /** Duplicate-segment fraction (the line/paragraph-dedup signal of
    * the published corpus filters, applied to sentence-ish segments):
    * fraction of segments that are repeats of an earlier identical
    * segment, and the fraction of characters inside those repeats. */
  val dupSegments = QueryDef(
    "t_dup_segments", "LLM-pipeline: duplicate-segment filter",
    "repeated sentence-segment and char fractions per doc",
    (s, dir) => {
      val segs = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr(
            "filter(transform(split(text, '\\\\. '), x -> trim(x)), x -> x <> '')"))
            .as("seg"))
      segs
        .groupBy("doc_id", "seg")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("seg_len", length(col("seg")))
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_segs"),
          sum(col("cnt") - 1).as("n_dup_segs"),
          sum(col("seg_len") * col("cnt")).as("n_chars"),
          sum(col("seg_len") * (col("cnt") - 1)).as("n_dup_chars"))
        .select(col("doc_id"), col("n_segs"), col("n_dup_segs"),
          (asDouble(col("n_dup_segs")) / asDouble(col("n_segs")))
            .as("dup_seg_frac"),
          (asDouble(col("n_dup_chars")) / asDouble(col("n_chars")))
            .as("dup_char_frac"))
        .orderBy("doc_id")
    },
    Some("""WITH segs AS (
        SELECT doc_id,
          unnest(list_filter(list_transform(string_split(text, '. '),
            x -> trim(x)), x -> x <> '')) AS seg
        FROM documents),
      cnts AS (
        SELECT doc_id, seg, COUNT(*) AS cnt, length(seg) AS seg_len
        FROM segs GROUP BY 1, 2),
      agg AS (
        SELECT doc_id,
          CAST(SUM(cnt) AS BIGINT) AS n_segs,
          CAST(SUM(cnt - 1) AS BIGINT) AS n_dup_segs,
          CAST(SUM(seg_len * cnt) AS BIGINT) AS n_chars,
          CAST(SUM(seg_len * (cnt - 1)) AS BIGINT) AS n_dup_chars
        FROM cnts GROUP BY 1)
      SELECT doc_id, n_segs, n_dup_segs,
        CAST(n_dup_segs AS DOUBLE) / CAST(n_segs AS DOUBLE) AS dup_seg_frac,
        CAST(n_dup_chars AS DOUBLE) / CAST(n_chars AS DOUBLE) AS dup_char_frac
      FROM agg ORDER BY doc_id"""))

  /** HTML → text extraction (boilerplate strip): drop script/style
    * blocks wholesale, strip the remaining tags, decode the common
    * entities, collapse whitespace. Runs as a chain of codegen'd
    * regexp_replace calls — no UDF in the hot path — over an
    * html-wrapped rendering of the documents (the synthetic corpus
    * ships plain text; the wrap gives the stripper something real to
    * undo, and the oracle mirrors both sides). */
  val htmlToText = QueryDef(
    "t_html_to_text", "LLM-pipeline: HTML-to-text extraction",
    "script/style removal → tag strip → entity decode → whitespace collapse",
    (s, dir) => {
      val html = concat(
        lit("<html><head><title>d</title><style>p{color:red}</style></head>"),
        lit("<body><h1>Doc &amp; more</h1><p class=\"x\">"), col("text"),
        lit("</p><script>var x = 1 < 2;</script><br/></body></html>"))
      // script and style stripped separately: the oracle's RE2 engine
      // has no backreferences, so no `</\1>` on either side
      val stripped =
        regexp_replace(
          regexp_replace(
            regexp_replace(html, "(?s)<script\\b[^>]*>.*?</script>", " "),
            "(?s)<style\\b[^>]*>.*?</style>", " "),
          "<[^>]+>", " ")
      val decoded =
        regexp_replace(
          regexp_replace(
            regexp_replace(stripped, "&amp;", "&"),
            "&lt;", "<"),
          "&gt;", ">")
      t(s, dir, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(decoded, "\\s+", " ")).as("clean_text"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        trim(regexp_replace(
          replace(replace(replace(
            regexp_replace(
              regexp_replace(
                '<html><head><title>d</title><style>p{color:red}</style></head>'
                  || '<body><h1>Doc &amp; more</h1><p class="x">' || text
                  || '</p><script>var x = 1 < 2;</script><br/></body></html>',
                '(?s)<script\b[^>]*>.*?</script>|(?s)<style\b[^>]*>.*?</style>',
                ' ', 'g'),
              '<[^>]+>', ' ', 'g'),
            '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
          '\s+', ' ', 'g')) AS clean_text
      FROM documents ORDER BY doc_id"""))

  /** PII scrubbing: emails and phone-shaped numbers are replaced with
    * typed placeholder tokens. Vectorized regexp_replace, both
    * patterns mirrored byte-for-byte in the oracle; the synthetic
    * corpus carries no PII, so deterministic contact lines derived
    * from doc_id are appended first — the scrub itself is the
    * operator under test. */
  val piiScrub = QueryDef(
    "t_pii_scrub", "LLM-pipeline: PII scrubbing",
    "email + phone redaction with placeholder tokens, counts per doc",
    (s, dir) => {
      val withPii = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-010"), col("doc_id").cast("string"))
      val emailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRx = "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]"
      t(s, dir, "documents")
        .withColumn("pii_text", withPii)
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("pii_text"), emailRx, "<EMAIL>"),
            phoneRx, "<PHONE>").as("scrubbed"),
          // occurrence count as split-segments − 1 (split keeps
          // trailing empties at limit -1, so the count is exact) —
          // avoids SQL-literal escaping of the pattern
          (size(split(col("pii_text"), emailRx)) - 1).as("n_emails"),
          (size(split(col("pii_text"), phoneRx)) - 1).as("n_phones"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example.com or +1-555-010' || CAST(doc_id AS VARCHAR)
            AS pii_text
        FROM documents)
      SELECT doc_id,
        regexp_replace(
          regexp_replace(pii_text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+?[0-9][0-9()\-\s]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
        CAST(len(regexp_extract_all(pii_text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
          AS n_emails,
        CAST(len(regexp_extract_all(pii_text,
          '\+?[0-9][0-9()\-\s]{6,}[0-9]')) AS INTEGER) AS n_phones
      FROM p ORDER BY doc_id"""))

  /** Deterministic stratified sampling: per-source keep rates applied
    * via an md5-of-key threshold — reproducible across engines and
    * runs (no RNG), shuffle-free (a pure filter on the scan), and the
    * exact pattern that downsamples over-represented sources in a
    * 100 TB corpus mix. */
  val stratifiedSample = QueryDef(
    "a_stratified_sample", "LLM-pipeline: deterministic stratified sampling",
    "per-source md5-threshold keep rates, no RNG, filter-only plan",
    (s, dir) => {
      val bucket = substring(md5(concat(col("source"), lit(":"),
        col("doc_id").cast("string"))), 1, 2)
      val threshold = when(col("source") === "web", lit("20"))
        .when(col("source") === "books", lit("80"))
        .otherwise(lit("40"))
      t(s, dir, "documents")
        .filter(bucket < threshold)
        .select(col("doc_id"), col("source"), bucket.as("bucket"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, source,
        substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents
      WHERE substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) <
        CASE WHEN source = 'web' THEN '20'
             WHEN source = 'books' THEN '80' ELSE '40' END
      ORDER BY doc_id"""))

  /** Corpus vocabulary: top tokens by document frequency and raw
    * count — the first pass of tokenizer training / OOV analysis.
    * One explode + one map-side-combined groupBy; the top-k is a
    * global sort of the (small) distinct-token frame, not the corpus. */
  val vocabulary = QueryDef(
    "t_vocabulary", "LLM-pipeline: corpus vocabulary",
    "explode tokens → count + doc-frequency → deterministic top 100",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(words).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(100),
    Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        w -> w <> '')) AS token FROM documents)
      GROUP BY token
      ORDER BY n_occurrences DESC, token
      LIMIT 100"""))

  /** BPE tokenizer training, first R merges — the natural next step
    * after `t_vocabulary`: start from character symbols over the
    * (small) distinct-word frame, and per round (1) count adjacent
    * symbol pairs weighted by word frequency (one explode + one
    * map-side-combined groupBy), (2) take the top pair (count desc,
    * then lexicographic — fully deterministic), (3) re-merge every
    * greedy non-overlapping occurrence via a pure-column aggregate()
    * fold. The per-round collect() is ONE row — the trained artifact,
    * the same driver-loop shape as K-Means/IVF training; the corpus
    * itself is touched once (word-count shuffle), every round after
    * that runs on the localCheckpointed distinct-word frame (tiny vs
    * corpus — at 100 TB the vocabulary still fits executors easily).
    *
    * The DuckDB oracle unrolls the identical five rounds (top-pair CTE
    * + list_reduce re-merge per round), so the merge table is checked
    * end to end. */
  /** The BPE training loop shared by `t_bpe_merges` and
    * `t_bpe_encode`: returns the final (word, freq, syms) state and
    * the ordered merge list. */
  private def trainBpe(s: org.apache.spark.sql.SparkSession, dir: String,
      rounds: Int): (org.apache.spark.sql.DataFrame,
      Seq[(Int, String, String, String, Long)]) = {
    var state = t(s, dir, "documents")
      .select(explode(words).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (rank <- 1 to rounds) {
      val top = state.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1), i ->
               struct(element_at(syms, i) AS l,
                      element_at(syms, i + 1) AS r))""")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()(0)
      val (l, r, cnt) = (top.getString(0), top.getString(1),
        top.getLong(2))
      merges += ((rank, l, r, l + r, cnt))
      // greedy left-to-right non-overlapping re-merge: compare the
      // fold's last element (slice, never element_at — safe on the
      // empty accumulator under ANSI) against the merge pair
      state = state.withColumn("syms",
        aggregate(col("syms"), array().cast("array<string>"),
          (acc, x) =>
            when(slice(acc, -1, 1) === array(lit(l)) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(lit(l + r))))
            .otherwise(concat(acc, array(x)))))
        .localCheckpoint(true)
    }
    (state, merges.result())
  }

  val bpeMerges = QueryDef(
    "t_bpe_merges", "LLM-pipeline: BPE merge training",
    "5 rounds: adjacent-pair counts → deterministic top pair → re-merge",
    (s, dir) => {
      import s.implicits._
      trainBpe(s, dir, 5)._2
        .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
        .orderBy("merge_rank")
    },
    Some("""WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '),
          x -> x <> '')) AS word
        FROM documents),
      vocab AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
      s0 AS (SELECT freq,
        list_transform(range(1, length(word) + 1),
          i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
        FROM vocab),
      p1 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s0, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
      s1 AS (SELECT freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t1.l AND x[1] = t1.r
            THEN list_append(acc[1:len(acc)-1], t1.l || t1.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s0, t1),
      p2 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s1, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
      s2 AS (SELECT freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t2.l AND x[1] = t2.r
            THEN list_append(acc[1:len(acc)-1], t2.l || t2.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s1, t2),
      p3 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s2, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1),
      s3 AS (SELECT freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t3.l AND x[1] = t3.r
            THEN list_append(acc[1:len(acc)-1], t3.l || t3.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s2, t3),
      p4 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s3, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t4 AS (SELECT l, r, cnt FROM p4 ORDER BY cnt DESC, l, r LIMIT 1),
      s4 AS (SELECT freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t4.l AND x[1] = t4.r
            THEN list_append(acc[1:len(acc)-1], t4.l || t4.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s3, t4),
      p5 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s4, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t5 AS (SELECT l, r, cnt FROM p5 ORDER BY cnt DESC, l, r LIMIT 1)
      SELECT merge_rank, lhs, rhs, lhs || rhs AS merged,
        CAST(cnt AS BIGINT) AS pair_count
      FROM (
        SELECT 1 AS merge_rank, l AS lhs, r AS rhs, cnt FROM t1
        UNION ALL SELECT 2, l, r, cnt FROM t2
        UNION ALL SELECT 3, l, r, cnt FROM t3
        UNION ALL SELECT 4, l, r, cnt FROM t4
        UNION ALL SELECT 5, l, r, cnt FROM t5)
      ORDER BY merge_rank"""))

  /** Apply the trained BPE merges: per-document token counts under the
    * learned vocabulary — the "how many tokens will this corpus cost"
    * measurement every training pipeline runs after tokenizer training. The
    * encode itself happens ONCE per distinct word (the trained state
    * frame), then joins back to the corpus — the corpus pass is one
    * explode + one broadcastable join + one map-side-combined sum, no
    * per-document re-encoding. */
  val bpeEncode = QueryDef(
    "t_bpe_encode", "LLM-pipeline: BPE encode (token counts)",
    "apply the 5 trained merges per distinct word → per-doc token sums",
    (s, dir) => {
      val (state, _) = trainBpe(s, dir, 5)
      val vocabTokens = state
        .select(col("word"), size(col("syms")).as("n_sub"))
      t(s, dir, "documents")
        .select(col("doc_id"), explode(words).as("word"))
        .join(broadcast(vocabTokens), Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("n_sub").as("n_bpe_tokens"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '),
          x -> x <> '')) AS word
        FROM documents),
      vocab AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
      s0 AS (SELECT word, freq,
        list_transform(range(1, length(word) + 1),
          i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
        FROM vocab),
      p1 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s0, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
      s1 AS (SELECT word, freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t1.l AND x[1] = t1.r
            THEN list_append(acc[1:len(acc)-1], t1.l || t1.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s0, t1),
      p2 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s1, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
      s2 AS (SELECT word, freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t2.l AND x[1] = t2.r
            THEN list_append(acc[1:len(acc)-1], t2.l || t2.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s1, t2),
      p3 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s2, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1),
      s3 AS (SELECT word, freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t3.l AND x[1] = t3.r
            THEN list_append(acc[1:len(acc)-1], t3.l || t3.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s2, t3),
      p4 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s3, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t4 AS (SELECT l, r, cnt FROM p4 ORDER BY cnt DESC, l, r LIMIT 1),
      s4 AS (SELECT word, freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t4.l AND x[1] = t4.r
            THEN list_append(acc[1:len(acc)-1], t4.l || t4.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s3, t4),
      p5 AS (SELECT syms[CAST(i AS INTEGER)] AS l,
          syms[CAST(i AS INTEGER) + 1] AS r, SUM(freq) AS cnt
        FROM s4, LATERAL (SELECT unnest(range(1, len(syms))) AS i)
        GROUP BY 1, 2),
      t5 AS (SELECT l, r, cnt FROM p5 ORDER BY cnt DESC, l, r LIMIT 1),
      s5 AS (SELECT word, freq, list_reduce(list_transform(syms, x -> [x]),
          (acc, x) -> CASE WHEN acc[-1] = t5.l AND x[1] = t5.r
            THEN list_append(acc[1:len(acc)-1], t5.l || t5.r)
            ELSE list_concat(acc, x) END) AS syms
        FROM s4, t5),
      enc AS (SELECT word, len(syms) AS n_sub FROM s5),
      dw AS (SELECT doc_id,
        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens
      FROM dw JOIN enc USING (word)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Sequence packing — the training-data step after tokenization:
    * documents are joined into one EOS-separated token stream in
    * doc_id order and the stream is cut into fixed-length (L=512)
    * training sequences (GPT-style concat-and-chunk packing; greedy
    * fill in doc order, long documents span sequences). Output: each
    * document's global start offset and the sequence span it lands in.
    *
    * Scale shape: the global token prefix-sum is computed as a
    * DISTRIBUTED two-phase scan — per-bucket window cumsum (buckets
    * hash-partition) plus a broadcast join against the per-bucket
    * offsets (one tiny row per bucket; the only global-ordered window
    * runs over that bucket frame, never the corpus). No
    * single-partition window over the documents, no driver loop. */
  val seqPack = QueryDef(
    "t_seq_pack", "LLM-pipeline: sequence packing",
    "EOS-joined token stream → fixed-length (512) training sequences",
    (s, dir) => {
      val L = 512
      val bucketW = 64
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          (size(words) + 1).cast("long").as("n_tokens"))
        .withColumn("bucket", expr(s"doc_id DIV $bucketW"))
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("doc_id")
      val inBucket = docs.withColumn("cum_in", sum("n_tokens").over(wIn))
      // one row per bucket; the ordered window over it is driver-tiny
      val wB = org.apache.spark.sql.expressions.Window.orderBy("bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offsets = docs.groupBy("bucket")
        .agg(sum("n_tokens").as("btot"))
        .withColumn("boff", coalesce(sum("btot").over(wB), lit(0L)))
        .select("bucket", "boff")
      inBucket.join(broadcast(offsets), "bucket")
        .withColumn("start_off", col("boff") + col("cum_in") - col("n_tokens"))
        .withColumn("first_seq", expr(s"start_off DIV $L"))
        .withColumn("last_seq", expr(s"(start_off + n_tokens - 1) DIV $L"))
        .select(col("doc_id"), col("n_tokens"), col("start_off"),
          col("first_seq"), col("last_seq"),
          (col("last_seq") - col("first_seq") + 1).as("n_seqs"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
            + 1 AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_tokens AS BIGINT) AS start_off
        FROM d)
      SELECT doc_id, n_tokens, start_off,
        start_off // 512 AS first_seq,
        (start_off + n_tokens - 1) // 512 AS last_seq,
        (start_off + n_tokens - 1) // 512 - start_off // 512 + 1 AS n_seqs
      FROM c ORDER BY doc_id"""))

  /** Training-shard manifest — the last step of a curation pipeline
    * before the trainer reads the corpus: deterministic hash-sharding
    * plus the per-shard integrity manifest (doc count, char mass,
    * token mass, id range, order-independent checksum) that streaming
    * loaders verify before consuming a shard. Shard assignment is the
    * same fixed LCG permutation the mixture sampler uses
    * (engine-portable, no RNG), folded to 64 shards; the checksum is
    * `bit_xor` over a per-doc fingerprint — commutative, so it is
    * insensitive to row order WITHIN a shard and computable map-side.
    * 100 TB shape: the manifest is ONE map-side-combined groupBy to 64
    * rows; the physical shard write is
    * `repartition(n, shard) → sortWithinPartitions(doc_id) → write`
    * (exercised in ShardManifestSpec, which re-derives this manifest
    * from the written files and asserts byte-identical totals) — a
    * single corpus shuffle, no collect, no skew (the LCG spreads
    * doc_ids uniformly). */
  val shardManifest = QueryDef(
    "t_shard_manifest", "LLM-pipeline: training-shard manifest",
    "LCG hash → 64 shards; per-shard docs/chars/tokens/id-range/xor checksum",
    (s, dir) => {
      val h = expr("(doc_id * 1103515245L + 12345L) % 2147483648L")
      t(s, dir, "documents")
        .withColumn("h", h)
        .withColumn("shard", col("h") % 64)
        .withColumn("fp", (col("h") * 31L + col("n_chars")) % 2147483648L)
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(words).cast("long")).as("total_tokens"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"),
          expr("bit_xor(fp)").as("checksum"))
        .orderBy("shard")
    },
    Some("""WITH d AS (
        SELECT doc_id, n_chars,
          (doc_id * 1103515245 + 12345) % 2147483648 AS h,
          CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
            AS BIGINT) AS n_tokens
        FROM documents)
      SELECT h % 64 AS shard,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        MIN(doc_id) AS min_doc_id,
        MAX(doc_id) AS max_doc_id,
        CAST(bit_xor((h * 31 + n_chars) % 2147483648) AS BIGINT) AS checksum
      FROM d GROUP BY h % 64 ORDER BY shard"""))

  /** Unicode + whitespace normalization — the canonicalization pass
    * that runs BEFORE hashing/dedup so canonically-equivalent byte
    * sequences collapse to one form (a decomposed "e"+U+0301 and the
    * precomposed U+00E9 are different md5s but the same text). NFC is
    * the custom codegen expression [[graft.functions.NfcNormalize]]
    * (JDK Normalizer, UAX #15 — DuckDB's `nfc_normalize` is the
    * oracle's independent implementation of the same spec); casefold
    * and whitespace-collapse are built-ins. The synthetic corpus is
    * ASCII (already NFC), so each doc gets a deterministic DECOMPOSED
    * suffix appended — the gate then discriminates: n_norm < n_raw on
    * every row iff composition actually happened, and the composed
    * codepoint must round-trip DuckDB's parquet read exactly.
    * 100 TB shape: pure per-row map, no shuffle except the output
    * sort; NFC's isNormalized fast path makes the pass a byte scan on
    * the (dominant) ASCII fraction. */
  val normalize = QueryDef(
    "t_normalize", "LLM-pipeline: unicode/whitespace normalization",
    "NFC (custom codegen expr) + casefold + whitespace collapse",
    (s, dir) => {
      // "cafe" + combining acute: NFC composes the final "é" to
      // "é", shortening the string by exactly one codepoint
      val raw = concat(col("text"), lit("  café  MIXED Case"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(
            lower(graft.functions.GraftFunctions.unicode_nfc(raw)),
            "\\s+", " ")).as("norm"),
          length(raw).as("n_raw"))
        .withColumn("n_norm", length(col("norm")))
        .orderBy("doc_id")
    },
    Some("""WITH r AS (
        SELECT doc_id,
          text || '  cafe' || chr(769) || '  MIXED Case' AS raw
        FROM documents)
      SELECT doc_id,
        trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g'))
          AS norm,
        CAST(length(raw) AS INTEGER) AS n_raw,
        CAST(length(trim(regexp_replace(lower(nfc_normalize(raw)),
          '\s+', ' ', 'g'))) AS INTEGER) AS n_norm
      FROM r ORDER BY doc_id"""))

  /** Heavy-hitters gate — the exact top-20 corpus tokens verified
    * against the mergeable Misra-Gries summary
    * ([[graft.functions.MisraGries]], capacity 256). The sketch's
    * deterministic guarantee — every token with true frequency above
    * N/(k+1) survives any merge tree — is checked from first
    * principles: the exact side recomputes true counts and asserts
    * summary membership for precisely the rows the bound covers
    * (below the bound the sketch promises nothing and the gate is
    * vacuously true). Only exact counts and the boolean cross the
    * oracle — the sketch's (order/partitioning-dependent)
    * lower-bound counts never do.
    * 100 TB shape: the sketch pass carries ≤ 2×256 map entries per
    * partition and merges map-side (one scalar row out); the exact
    * side is one map-side-combined groupBy — and is the branch a
    * production job drops, keeping token-frequency monitoring at
    * O(k) state. */
  val heavyHitters = QueryDef(
    "t_heavy_hitters", "LLM-pipeline: heavy-hitters sketch gate",
    "exact top-20 tokens; MG-summary presence gated where guaranteed",
    (s, dir) => {
      val kPlus1 = graft.functions.MisraGries.DefaultK + 1
      // cached: the explode feeds both the sketch pass and the exact
      // counts — tokenize once, not twice. n_total reduces over the
      // vocabulary-sized counts frame, not a third corpus scan.
      val tokens = par(t(s, dir, "documents"))
        .select(explode(words).as("token"))
        .cache()
      val summary = tokens
        .agg(graft.functions.MisraGries.misra_gries(col("token"))
          .as("summary"))
        .select(explode(map_keys(col("summary"))).as("token"),
          lit(true).as("in_summary"))
      val counts = tokens.groupBy("token").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("n_total"))
      // gate_ok encodes the guarantee EXACTLY: a token above the
      // N/(k+1) bound must be in the summary; below it the sketch
      // promises nothing and the gate is vacuously true. The
      // top-of-distribution rows keep the gate discriminating at
      // every corpus scale (a fixed absolute threshold goes empty
      // once growth dilutes relative frequencies).
      counts
        .crossJoin(broadcast(total))
        .join(broadcast(summary), Seq("token"), "left")
        .select(col("token"), col("n"), col("n_total"),
          (coalesce(col("in_summary"), lit(false)) ||
            col("n") * kPlus1 <= col("n_total")).as("gate_ok"))
        .orderBy(col("n").desc, col("token")).limit(20)
    },
    Some("""WITH tok AS (
        SELECT unnest(list_filter(string_split(text, ' '), w -> w <> ''))
          AS token
        FROM documents),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok),
      counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token)
      SELECT token, n, n_total, TRUE AS gate_ok
      FROM counts, tot ORDER BY n DESC, token LIMIT 20"""))

  /** Corpus-LM quality scoring — the statistical half of a
    * CCNet-style quality filter: train a bigram MLE model ON the
    * corpus itself (count(w1,w2)/count(w1)), then score each document
    * by its mean transition probability; documents whose transitions
    * are unusual relative to the corpus (noise, boilerplate,
    * wrong-language) score low and fall to the cut. Determinism is
    * engineered the house way: each transition probability is ONE
    * IEEE double division then floor-quantized to integer micro-units
    * (both engines perform the identical op sequence), per-doc
    * aggregation is integer-exact, and the mean is a single final
    * division. 100 TB shape: two map-side-combined count frames
    * (bigrams, unigrams — vocabulary-sized, not corpus-sized), one
    * equi-join of the corpus transitions against them, one per-doc
    * groupBy. No windows, no collect; the model "training" and the
    * scoring are the same declarative plan. */
  val lmScore = QueryDef(
    "t_lm_score", "LLM-pipeline: corpus-bigram LM quality score",
    "bigram MLE transitions, micro-unit quantized, per-doc mean",
    (s, dir) => {
      val docs = par(t(s, dir, "documents"))
        .select(col("doc_id"), words.as("ws"))
        .filter(size(col("ws")) >= 2)
      val bigrams = docs.select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, size(ws) - 1), i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
          .as(Seq("pos", "bg")))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val bgCounts = bigrams.groupBy("w1", "w2")
        .agg(count(lit(1)).as("c_bg"))
      val uniCounts = bigrams.groupBy("w1")
        .agg(count(lit(1)).as("c_uni"))
      bigrams
        .join(bgCounts, Seq("w1", "w2"))
        .join(uniCounts, Seq("w1"))
        .withColumn("p_micro",
          floor(asDouble(col("c_bg")) / asDouble(col("c_uni")) * 1000000.0
            + 0.5).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_transitions"),
          sum(col("p_micro")).as("sum_micro"))
        .select(col("doc_id"), col("n_transitions"),
          (asDouble(col("sum_micro")) /
            asDouble(col("n_transitions")) / 1000000.0).as("mean_p"))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (
        SELECT doc_id,
          list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents),
      bg AS (
        SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1,
          ws[CAST(i AS INTEGER) + 1] AS w2
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
              FROM w WHERE len(ws) >= 2)),
      cbg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_bg
        FROM bg GROUP BY w1, w2),
      cuni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c_uni
        FROM bg GROUP BY w1),
      scored AS (
        SELECT b.doc_id,
          CAST(FLOOR(CAST(c.c_bg AS DOUBLE) / CAST(u.c_uni AS DOUBLE)
            * 1000000.0 + 0.5) AS BIGINT) AS p_micro
        FROM bg b
        JOIN cbg c ON b.w1 = c.w1 AND b.w2 = c.w2
        JOIN cuni u ON b.w1 = u.w1)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
        CAST(SUM(p_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          / 1000000.0 AS mean_p
      FROM scored GROUP BY doc_id ORDER BY doc_id"""))

  /** Stride-overlap context chunking — the OTHER training-prep cut
    * (t_seq_pack concatenates short docs into fixed windows; this
    * splits long docs into overlapping windows): each document's
    * token sequence becomes ceil-covering chunks of W=32 tokens at
    * stride S=24 (8-token overlap), the standard shape for
    * long-context pretraining and for embedding-model passage
    * windows. Pure per-row explode — no shuffle until the final
    * order — so it scales embarrassingly: chunk count is
    * tokens/S-linear and each task emits its own rows.
    *
    * Boundary semantics (mirrored exactly by the oracle): n ≤ W →
    * one chunk; otherwise 1 + ceil((n-W)/S) chunks, the last one
    * truncated (never empty, always ≥ n-W mod S tokens). */
  val chunkWindows = QueryDef(
    "t_chunk_windows", "LLM-pipeline: context chunking (stride windows)",
    "split documents into 32-token windows at stride 24 (8-token overlap)",
    (s, dir) => {
      val W = 32
      val S = 24
      t(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_chunks",
          expr(s"1 + (greatest(size(toks) - $W, 0) + ${S - 1}) div $S"))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
        .withColumn("ck", expr(s"slice(toks, chunk_id * $S + 1, $W)"))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          size(col("ck")).cast("long").as("n_tokens"),
          array_join(col("ck"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents),
      n AS (SELECT doc_id, toks,
          1 + (GREATEST(len(toks) - 32, 0) + 23) // 24 AS n_chunks FROM d),
      c AS (SELECT doc_id, i AS chunk_id, toks[i*24+1 : i*24+32] AS ck
        FROM n, UNNEST(range(0, n_chunks)) AS t(i))
      SELECT doc_id, chunk_id, CAST(len(ck) AS BIGINT) AS n_tokens,
        array_to_string(ck, ' ') AS chunk_text
      FROM c ORDER BY doc_id, chunk_id"""))

  /** Rarity-weighted keyword extraction — tf-idf with a LINEAR idf
    * (tf·N/df) kept in exact integer micro-units
    * (`(tf*N*1_000_000) div df`), so scores are bit-identical in any
    * engine: no logarithm (libm last-ulp drift between engines) and
    * no order-dependent float accumulation anywhere. One explode +
    * two hash aggregations; the document-frequency frame broadcasts
    * (vocabulary-sized), the scalar N rides a 1-row broadcast
    * nested-loop join. */
  val keywordExtract = QueryDef(
    "t_keyword_extract", "LLM-pipeline retrieval: rarity-weighted keywords",
    "top-5 keywords per document by exact-integer tf·N/df micro-units",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val tf = docs.select(col("doc_id"), explode(words).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfF = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(desc("score_u"), col("word"))
      tf.join(broadcast(dfF), "word").crossJoin(broadcast(n))
        .withColumn("score_u", expr("(tf * n_docs * 1000000) div df"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("rn").cast("long").as("rn"), col("word"),
          col("tf"), col("df"), col("score_u"))
        .orderBy("doc_id", "rn")
    },
    Some("""WITH dw AS (
        SELECT doc_id,
          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents),
      tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM dw GROUP BY 1, 2),
      dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT t.doc_id, t.word, t.tf, d.df,
          (t.tf * n.n_docs * 1000000) // d.df AS score_u
        FROM tf t JOIN dfreq d USING (word), n)
      SELECT doc_id, rn, word, tf, df, score_u FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY score_u DESC, word) AS rn FROM scored)
      WHERE rn <= 5 ORDER BY doc_id, rn"""))

  /** Ranked retrieval over the same integer scoring: the query is the
    * corpus's three RAREST terms (derived, not hardcoded — the
    * discriminating end of the df distribution), documents rank by
    * the exact-integer sum of per-term scores. Top-20 is
    * TakeOrderedAndProject (distributed sort-limit); the rank window
    * runs over the 20 survivors only, never the corpus. */
  val searchRank = QueryDef(
    "t_search_rank", "LLM-pipeline retrieval: ranked term search (P5-adjacent)",
    "top-20 documents for the 3 rarest corpus terms, exact-integer scores",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val tf = docs.select(col("doc_id"), explode(words).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfF = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val q = dfF.orderBy(col("df"), col("word")).limit(3)
      val hits = tf.join(broadcast(q), "word").crossJoin(broadcast(n))
        .withColumn("term_score", expr("(tf * n_docs * 1000000) div df"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum("term_score").as("score_u"))
      hits.orderBy(desc("score_u"), col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
          .Window.orderBy(desc("score_u"), col("doc_id"))))
        .select(col("rank").cast("long").as("rank"), col("doc_id"),
          col("n_terms"), col("score_u"))
        .orderBy("rank")
    },
    Some("""WITH dw AS (
        SELECT doc_id,
          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents),
      tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM dw GROUP BY 1, 2),
      dfreq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      q AS (SELECT word, df FROM dfreq ORDER BY df, word LIMIT 3),
      hits AS (
        SELECT t.doc_id, COUNT(*) AS n_terms,
          CAST(SUM((t.tf * n.n_docs * 1000000) // q.df) AS BIGINT) AS score_u
        FROM tf t JOIN q USING (word), n
        GROUP BY t.doc_id)
      SELECT rank, doc_id, n_terms, score_u FROM (
        SELECT doc_id, n_terms, score_u,
          ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id) AS rank
        FROM hits) WHERE rank <= 20 ORDER BY rank"""))

  /** HYBRID retrieval with reciprocal-rank fusion — the standard
    * two-ranker recipe of modern RAG / training-data curation
    * stacks (lexical recall + semantic recall, fused rank-only so
    * neither score scale dominates). Ranker A is lexical: exact
    * integer token-set Jaccard of each query doc against every doc
    * sharing ≥1 token (candidates via the shared-word equi-join —
    * never all-pairs; zero-overlap docs can't outrank overlapping
    * ones under Jaccard, so the join IS the candidate generator at
    * any corpus scale). Ranker B is semantic: quantized-integer
    * cosine over the embedding column (brute force here — 10
    * broadcast queries × corpus, linear and shuffle-free; a
    * deployment swaps in the [[SimilarityOps.ivfAnn]] /
    * [[graft.ops.IvfIndexStore]] probe, which changes the
    * candidate generator, not the fusion). Fusion is RRF
    * (Cormack et al.): score = Σ_r 1000000 div (60 + rank_r) over
    * the rankers that surfaced the candidate in their top-20 —
    * integer div, so the fused score is exact and the DuckDB
    * oracle replays tokenize → Jaccard → cosine → both rank
    * windows → fusion bit-for-bit. Per-ranker ranks ride the
    * output (0 = not surfaced), gating WHICH ranker found each
    * fused hit, not just the final order. */
  val hybridRrf = QueryDef(
    "t_hybrid_rrf",
    "LLM-pipeline retrieval: hybrid lexical+vector RRF fusion",
    "token-Jaccard top-20 ⊕ cosine top-20 → RRF(60) top-10 per query",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = SimilarityOps.quantized(s, dir)
      val dot = graft.functions.GraftFunctions.dot_long _
      // lexical ranker: distinct token sets, shared-word candidates
      val dw = docs.select(col("doc_id"), explode(words).as("word"))
        .distinct()
      val sizes = dw.groupBy("doc_id").agg(count(lit(1)).as("nw"))
      val qdw = dw.filter(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("word"))
      val inter = qdw.join(dw, Seq("word"))
        .filter(col("doc_id") =!= col("qid"))
        .groupBy("qid", "doc_id").agg(count(lit(1)).as("ni"))
      val qsz = sizes.select(col("doc_id").as("qid"),
        col("nw").as("qnw"))
      val lexScored = inter
        .join(broadcast(qsz), Seq("qid"))
        .join(sizes, Seq("doc_id"))
        .withColumn("ju", expr("(1000000 * ni) div (qnw + nw - ni)"))
      val wLex = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("ju"), col("doc_id"))
      val lex = lexScored.withColumn("lrank", row_number().over(wLex))
        .filter(col("lrank") <= 20)
        .select(col("qid"), col("doc_id").as("did"), col("lrank"))
      // semantic ranker: broadcast queries, one linear corpus scan
      val qv = broadcast(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("n2").as("qn2")))
      val vecScored = qv.join(emb, col("vec_id") =!= col("qid"))
        .withColumn("dp", dot(col("qv"), col("v")))
        .withColumn("cosine",
          asDouble(col("dp")) /
            (sqrt(asDouble(col("qn2"))) * sqrt(asDouble(col("n2")))))
      val wVec = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("cosine"), col("vec_id"))
      val vec = vecScored.withColumn("vrank", row_number().over(wVec))
        .filter(col("vrank") <= 20)
        .select(col("qid"), col("vec_id").as("did"), col("vrank"))
      // RRF fusion: rank-only, missing ranker contributes 0
      val fused = lex.join(vec, Seq("qid", "did"), "full_outer")
        .withColumn("lex_rank", coalesce(col("lrank"), lit(0)))
        .withColumn("vec_rank", coalesce(col("vrank"), lit(0)))
        .withColumn("rrf_u",
          coalesce(expr("1000000 div (60 + lrank)"), lit(0)) +
            coalesce(expr("1000000 div (60 + vrank)"), lit(0)))
      val wF = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("rrf_u"), col("did"))
      fused.withColumn("rn", row_number().over(wF))
        .filter(col("rn") <= 10)
        .select(col("qid"), col("did"), col("rrf_u"),
          col("lex_rank"), col("vec_rank"), col("rn"))
        .orderBy("qid", "rn")
    },
    Some("""WITH dw AS (
        SELECT DISTINCT doc_id,
          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS nw FROM dw GROUP BY doc_id),
      inter AS (
        SELECT q.doc_id AS qid, d.doc_id, COUNT(*) AS ni
        FROM dw q JOIN dw d ON d.word = q.word AND d.doc_id <> q.doc_id
        WHERE q.doc_id < 10
        GROUP BY q.doc_id, d.doc_id),
      lexscored AS (
        SELECT i.qid, i.doc_id,
          (1000000 * i.ni) // (qs.nw + ds.nw - i.ni) AS ju
        FROM inter i
        JOIN sizes qs ON qs.doc_id = i.qid
        JOIN sizes ds ON ds.doc_id = i.doc_id),
      lex AS (
        SELECT qid, doc_id AS did, lrank FROM (
          SELECT qid, doc_id,
            ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY ju DESC, doc_id) AS lrank
          FROM lexscored) WHERE lrank <= 20),
      u AS (
        SELECT vec_id, i,
          CAST(FLOOR(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(1000000 AS DOUBLE) + 0.5) AS BIGINT) AS x
        FROM (SELECT vec_id, embedding,
                unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings)),
      nrm AS (
        SELECT vec_id, CAST(SUM(x*x) AS BIGINT) AS n2 FROM u GROUP BY vec_id),
      dots AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
          CAST(SUM(a.x*b.x) AS BIGINT) AS dp
        FROM u a JOIN u b ON a.i = b.i
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id),
      cos AS (
        SELECT qid, nid,
          CAST(dp AS DOUBLE) /
            (sqrt(CAST(qa.n2 AS DOUBLE)) * sqrt(CAST(qb.n2 AS DOUBLE))) AS cosine
        FROM dots
        JOIN nrm qa ON qa.vec_id = qid
        JOIN nrm qb ON qb.vec_id = nid),
      vec AS (
        SELECT qid, nid AS did, vrank FROM (
          SELECT qid, nid,
            ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine DESC, nid) AS vrank
          FROM cos) WHERE vrank <= 20),
      fused AS (
        SELECT COALESCE(l.qid, v.qid) AS qid,
          COALESCE(l.did, v.did) AS did,
          COALESCE(1000000 // (60 + l.lrank), 0) +
            COALESCE(1000000 // (60 + v.vrank), 0) AS rrf_u,
          COALESCE(l.lrank, 0) AS lex_rank,
          COALESCE(v.vrank, 0) AS vec_rank
        FROM lex l FULL OUTER JOIN vec v
          ON v.qid = l.qid AND v.did = l.did)
      SELECT qid, did, rrf_u, lex_rank, vec_rank, rn FROM (
        SELECT qid, did, rrf_u, lex_rank, vec_rank,
          ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY rrf_u DESC, did) AS rn
        FROM fused) WHERE rn <= 10
      ORDER BY qid, rn"""))

  val defs: Seq[QueryDef] = Seq(htmlToText, piiScrub, stratifiedSample,
    vocabulary, tok, quality, langid, langidNgram, fingerprint,
    repetition, dupSegments, bpeMerges, bpeEncode, seqPack, shardManifest,
    normalize, heavyHitters, lmScore, chunkWindows, keywordExtract,
    searchRank, hybridRrf)
}
