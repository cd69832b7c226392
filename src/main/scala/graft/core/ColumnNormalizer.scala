package graft.core

/** Corpus-sheet column-name normalization — port of the reference's
  * `normalize_column_name` (reference: src/v3_stable/step_4_dump_tables.py:19-31):
  *   - collapse newlines/whitespace runs to single spaces, trim;
  *   - names starting with "rating" (case-insensitive) -> "Rating";
  *   - difflib ratio vs "SummaryAssessment" > 0.8 -> "SummaryAssessment";
  *   - difflib ratio vs "Criterion"        > 0.8 -> "Criterion";
  *   - otherwise the collapsed name (a null header stringifies to "None",
  *     matching Python str(None)).
  */
object ColumnNormalizer {

  private def similarity(a: String, b: String): Double =
    TextSimilarity.difflibRatio(a.toLowerCase, b.toLowerCase)

  def normalize(col: String): String = {
    val collapsed = Blank.pyStr(col).replace("\n", " ").split("\\s+")
      .filter(_.nonEmpty).mkString(" ").trim
    if (collapsed.toLowerCase.startsWith("rating")) "Rating"
    else if (similarity(collapsed, "SummaryAssessment") > 0.8) "SummaryAssessment"
    else if (similarity(collapsed, "Criterion") > 0.8) "Criterion"
    else collapsed
  }
}
