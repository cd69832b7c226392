package graft.core

/** Fuzzy L1 taxonomy classification — port of the reference's
  * `clean_criterion` / `match_criterion_to_l1`
  * (reference: src/v3_stable/step_5_pivot_table.py:7-54).
  */
object CriterionTaxonomy {

  /** The 10 fixed L1 criteria (reference: step_5_pivot_table.py:7-9). */
  val StandardL1Criteria: Vector[String] = Vector(
    "Strategic Relevance", "Quality of Project Design", "Nature of External Context",
    "Effectiveness", "Financial Management", "Efficiency", "Monitoring and Reporting",
    "Sustainability", "Factors Affecting Performance", "Overall Project Performance Rating")

  /** Strip leading "1." / "2.1 " numbering and collapse whitespace
    * (reference: step_5_pivot_table.py:12-24). null -> "". */
  def cleanCriterion(text: String): String = {
    if (text == null) return ""
    val stripped = text.replaceFirst("^\\d+\\.?\\d*\\.?\\s*", "")
    stripped.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** Best-matching L1 criterion, or null when no score reaches the
    * threshold. Scores use max(fuzz.ratio, fuzz.partial_ratio) on
    * lowercased strings; a strictly-greater score is required to displace
    * the current best, so the FIRST criterion in list order wins ties
    * (reference: step_5_pivot_table.py:27-54). */
  def matchL1(criterion: String, threshold: Int = 80): String = {
    if (criterion == null || criterion.isEmpty) return null
    val cleaned = cleanCriterion(criterion)
    if (cleaned.isEmpty) return null
    val lc = cleaned.toLowerCase
    var bestMatch: String = null
    var bestScore = 0
    StandardL1Criteria.foreach { l1 =>
      val ll = l1.toLowerCase
      val score = math.max(
        TextSimilarity.fuzzRatio(lc, ll),
        TextSimilarity.fuzzPartialRatio(lc, ll))
      if (score > bestScore && score >= threshold) {
        bestScore = score
        bestMatch = l1
      }
    }
    bestMatch
  }
}
