package graft.functions

/** Character-n-gram language identification (Cavnar-Trenkle style
  * rank-order classification, the standard n-gram heuristic): each
  * language has a profile of its most frequent character trigrams,
  * built here from small built-in seed corpora; a document is scored
  * by the rank-distance between its own trigram profile and each
  * language profile, lowest distance wins.
  *
  * Self-contained (no models/libraries), deterministic, executor-safe.
  */
object LangId {

  private val seeds: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and then it was " +
      "said that all of the people who were there could not have known " +
      "what would happen next because they had never seen anything like " +
      "this before in their lives and it is what it is for the most part"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso y " +
      "entonces se dijo que toda la gente que estaba allí no podía haber " +
      "sabido lo que pasaría después porque nunca habían visto nada como " +
      "esto antes en sus vidas y es lo que es en la mayoría de los casos"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund und " +
      "dann wurde gesagt dass alle leute die dort waren nicht wissen " +
      "konnten was als nächstes passieren würde weil sie so etwas noch " +
      "nie in ihrem leben gesehen hatten und es ist was es ist"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux " +
      "et puis il a été dit que tous les gens qui étaient là ne pouvaient " +
      "pas savoir ce qui allait se passer ensuite parce qu'ils n'avaient " +
      "jamais rien vu de tel auparavant dans leur vie et c'est comme ça"))

  val ProfileSize = 300
  private val MaxPenalty = ProfileSize

  /** Ranked trigram profile: trigram → rank (0 = most frequent). */
  private[functions] def profile(text: String): Map[String, Int] = {
    val norm = " " + text.toLowerCase.replaceAll("[^\\p{L}']+", " ").trim + " "
    val counts = scala.collection.mutable.Map.empty[String, Int]
    var i = 0
    while (i + 3 <= norm.length) {
      val g = norm.substring(i, i + 3)
      counts(g) = counts.getOrElse(g, 0) + 1
      i += 1
    }
    counts.toSeq
      .sortBy { case (g, c) => (-c, g) } // deterministic tie order
      .take(ProfileSize)
      .zipWithIndex
      .map { case ((g, _), rank) => g -> rank }
      .toMap
  }

  private val langProfiles: Map[String, Map[String, Int]] =
    seeds.map { case (lang, text) => lang -> profile(text) }

  /** Rank-order distance between a document profile and a language
    * profile (out-of-place measure; missing trigram = max penalty). */
  private def distance(doc: Map[String, Int],
      lang: Map[String, Int]): Long =
    doc.foldLeft(0L) { case (acc, (g, docRank)) =>
      acc + math.min(MaxPenalty,
        math.abs(lang.getOrElse(g, MaxPenalty + docRank) - docRank))
    }

  /** Predict the language of `text`; "und" (undetermined) below a
    * minimal evidence floor. */
  def predict(text: String): String = {
    val doc = profile(text)
    if (doc.size < 5) return "und"
    langProfiles
      .map { case (lang, p) => (distance(doc, p), lang) }
      .minBy(identity) // (distance, lang) — deterministic ties
      ._2
  }

  def supported: Seq[String] = seeds.keys.toSeq.sorted
}
