package graft.core

import java.util.regex.Pattern

/** Publish-month extraction from page-1 text — port of the reference's
  * `find_month` (reference: src/v3_stable/step_6_update_publish_month.py:11-49).
  *
  * Semantics preserved exactly:
  *   - loop over FULL month names January..December; the first MONTH (in
  *     list order, NOT text position!) whose `Month[,]? \d{4}` pattern
  *     matches anywhere wins — "January 2020" beats an earlier-positioned
  *     "February 2019";
  *   - only if no full month matches, loop over abbreviations Jan..Dec with
  *     `Mon[.]?[,]? \d{4}`, and expand the abbreviation to the full name via
  *     str.replace — which KEEPS the period: "Dec. 2024" -> "December. 2024"
  *     (step_6_update_publish_month.py:47);
  *   - no match -> null.
  */
object MonthFinder {

  val Months: Vector[String] = Vector(
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December")

  val AbbrMonths: Vector[String] = Vector(
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private val fullPatterns = Months.map(m => Pattern.compile(m + "[,]?\\s+\\d{4}"))
  private val abbrPatterns = AbbrMonths.map(m => Pattern.compile(m + "[.]?[,]?\\s+\\d{4}"))

  def findMonth(text: String): String = {
    if (text == null) return null
    var i = 0
    while (i < fullPatterns.length) {
      val m = fullPatterns(i).matcher(text)
      if (m.find()) return m.group(0)
      i += 1
    }
    i = 0
    while (i < abbrPatterns.length) {
      val m = abbrPatterns(i).matcher(text)
      if (m.find()) return m.group(0).replace(AbbrMonths(i), Months(i))
      i += 1
    }
    null
  }
}
