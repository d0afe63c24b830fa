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

  // precompiled: classify runs per row in a corpus-scale map — a
  // String.replaceAll would recompile this pattern per document
  private val cleanup = java.util.regex.Pattern.compile("[^a-zà-ÿ ]")

  private def trigrams(s: String): Set[String] = {
    val padded = " " + cleanup.matcher(s.toLowerCase).replaceAll("") + " "
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

  private val profilesSorted: Seq[(String, Set[String])] = profiles.toSeq.sortBy(_._1)

  /** Jaccard-overlap score against each profile; 'und' when nothing
    * clears the floor. Running argmax over the alphabetically-sorted
    * profiles (strictly-greater replaces ⇒ ties keep the first lang —
    * identical to the previous sortBy((-score, lang)).head, without the
    * per-row seq/sort allocation; r3 self-review).
    */
  def classify(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val tg = trigrams(text)
    if (tg.isEmpty) return "und"
    var bestLang  = "und"
    var bestScore = Double.NegativeInfinity
    profilesSorted.foreach { case (lang, prof) =>
      val sc = tg.intersect(prof).size.toDouble / prof.size
      if (sc > bestScore) { bestScore = sc; bestLang = lang }
    }
    if (bestScore < 0.05) "und" else bestLang
  }
}
