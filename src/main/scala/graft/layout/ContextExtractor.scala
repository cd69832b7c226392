package graft.layout

/** Table context extraction — caption and header-region text, the v1
  * capabilities (reference: src/v1_plain/table_finder.py:92-114,160-188).
  *
  * The reference clips pixel rectangles (100px above the table, top 50px of
  * the table); in line-grid coordinates we use the equivalent line windows
  * (12px/line in the reference's PDFs): 8 lines above, first 4 lines.
  */
object ContextExtractor {

  val PrecedingWindowLines = 8
  val HeaderRegionLines = 4

  /** Nearest caption text above the table: prefer the first block containing
    * "Table", else the block closest to the table top (max y1)
    * (table_finder.py:92-114). */
  def precedingText(page: Page, table: DetectedTable): String = {
    val top = table.bbox._2.toInt
    val from = math.max(0, top - PrecedingWindowLines)
    val blocks = page.spans.slice(from, top).zipWithIndex
      .filter { case (s, _) => s.kind == "text" && s.text.trim.nonEmpty }
    if (blocks.isEmpty) return ""
    blocks.find(_._1.text.contains("Table")) match {
      case Some((s, _)) => s.text.trim
      case None => blocks.maxBy(_._2)._1.text.trim // closest to the table
    }
  }

  /** Header candidates from the table's top region: split each line on
    * double spaces, drop lines containing "Table", dedupe keeping first
    * occurrence (dict.fromkeys) (table_finder.py:160-188). */
  def headerRegion(page: Page, table: DetectedTable): Vector[String] = {
    val top = table.bbox._2.toInt
    val until = math.min(page.spans.length, top + HeaderRegionLines)
    val headers = Vector.newBuilder[String]
    page.spans.slice(top, until).foreach { s =>
      if (s.kind == "text" || s.kind == "rule") {
        val t = s.text.trim
        if (t.nonEmpty && !t.contains("Table")) {
          t.split("  ").iterator.map(_.trim)
            .filter(n => n.nonEmpty && !n.forall(c => c == '+' || c == '-' || c == '=' || c == '|'))
            .foreach(headers += _)
        }
      }
    }
    headers.result().distinct // keep-order dedupe
  }
}
