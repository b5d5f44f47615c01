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

  val fingerprint = QueryDef(
    "t_doc_fingerprint", "LLM-pipeline: doc fingerprinting (X6-like)",
    "winnowed rolling-hash fingerprints (window 16, keep 8) per doc",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          rollhash_fps(words, 16, 8).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fps"),
          // surface the min fingerprint as a scalar for the rows check
          element_at(col("fps"), 1).as("min_fp"))
        .orderBy("doc_id"),
    None)

  /** Real char-trigram language ID (Cavnar-Trenkle rank-order over
    * built-in profiles) — the production classifier next to the
    * SQL-mirrorable marker heuristic above. Rows-only check; value
    * behavior covered in DomainSpec. */
  val langidNgram = QueryDef(
    "t_langid_ngram", "LLM-pipeline: language ID (char n-gram)",
    "trigram rank-profile classification per document",
    (s, dir) => {
      val predict = udf((t: String) => graft.functions.LangId.predict(t))
      t(s, dir, "documents")
        .select(col("doc_id"), predict(col("text")).as("predicted"))
        .orderBy("doc_id")
    },
    None)

  val defs: Seq[QueryDef] = Seq(tok, quality, langid, langidNgram, fingerprint)
}
