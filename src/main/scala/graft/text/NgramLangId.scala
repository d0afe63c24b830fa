package graft.text

/** Character-trigram language profiles — the classic n-gram-rank heuristic
  * (Cavnar–Trenkle-style, simplified): score a text against per-language
  * trigram sets built from each language's highest-frequency function
  * words, pick the best-overlapping profile.
  *
  * Deterministic and driver-side-free: runs inside executor tasks via a
  * UDF (the profiles are a few hundred bytes, serialized into the
  * closure). At 100 TB this stays a map-only scan.
  */
object NgramLangId {

  private def trigrams(s: String): Set[String] = {
    val padded = " " + s.toLowerCase.replaceAll("[^a-zà-ÿ ]", "") + " "
    (0 to padded.length - 3).map(i => padded.substring(i, i + 3)).toSet
  }

  /** Profiles seeded from top function words per language. */
  val profiles: Map[String, Set[String]] = Map(
    "en" -> trigrams("the and of to in is it for on with as at by that this from"),
    "es" -> trigrams("el la de que y en los del se las por un para con una su"),
    "de" -> trigrams("der die und in den von zu das mit sich des auf ist nicht"),
    "fr" -> trigrams("le de la et les des en un du une que est pour qui dans"),
    "it" -> trigrams("di e il la che in un per del con non una sono gli")
  )

  /** Jaccard-overlap score against each profile; 'und' when nothing
    * clears the floor.
    */
  def classify(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val tg = trigrams(text)
    if (tg.isEmpty) return "und"
    val scored = profiles.toSeq
      .map { case (lang, prof) => (lang, tg.intersect(prof).size.toDouble / prof.size) }
      .sortBy { case (lang, sc) => (-sc, lang) }
    val (bestLang, bestScore) = scored.head
    if (bestScore < 0.05) "und" else bestLang
  }
}
