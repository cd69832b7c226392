package graft.layout

/** v1 cross-page table machinery, re-expressed as document-local pure folds
  * (session-window logic over the page stream — document-local, so an
  * ordered foldLeft inside a per-doc group, no global state).
  *
  * Two reference variants are covered:
  *   - the bbox-based continuation test + merge of TableFinder
  *     (reference: src/v1_plain/table_finder.py:137-158)
  *   - the content-based spanning state machine of parse_table
  *     (reference: src/v1_plain/parse_table.py:203-264, driver loop :37-71)
  */
object CrossPage {

  /** Same-width/same-x0 within 20 units, consecutive pages
    * (table_finder.py:137-150). */
  def isContinuedBBox(prevEndPage: Int, prevBBox: (Double, Double, Double, Double),
      page: Int, bbox: (Double, Double, Double, Double)): Boolean = {
    if (page != prevEndPage + 1) false
    else {
      val prevWidth = prevBBox._3 - prevBBox._1
      val currWidth = bbox._3 - bbox._1
      val xDiff = math.abs(prevBBox._1 - bbox._1)
      math.abs(prevWidth - currWidth) < 20 && xDiff < 20
    }
  }

  /** Union-ish bbox merge: min x0, KEEP original y0, max x1, new y1
    * (table_finder.py:152-158). */
  def mergeBBoxes(b1: (Double, Double, Double, Double),
      b2: (Double, Double, Double, Double)): (Double, Double, Double, Double) =
    (math.min(b1._1, b2._1), b1._2, math.max(b1._3, b2._3), b2._4)

  /** A spanning table accumulated by the content-based state machine. */
  final case class SpanningTable(
      pageNumbers: List[Int],
      bbox: (Double, Double, Double, Double),
      content: Vector[Vector[String]],
      confidence: Double,
      isSpanning: Boolean)

  /** Same column count => continued (parse_table.py:210-224; the reference's
    * `_is_table_spanning_to_next_page` is literally `return True`, :207). */
  def isContinuedByColumns(prev: SpanningTable, next: DetectedTable): Boolean = {
    val prevCols = if (prev.content.nonEmpty) prev.content.head.length else 0
    val currCols = if (next.body.nonEmpty) next.body.head.length else 0
    prevCols == currCols
  }

  /** >80% of cells equal case-insensitively => repeated header row
    * (parse_table.py:255-264). */
  def isHeaderRow(row1: Seq[String], row2: Seq[String]): Boolean = {
    if (row1.length != row2.length) false
    else if (row1.isEmpty) false
    else {
      val same = row1.zip(row2).count { case (a, b) =>
        Option(a).getOrElse("").trim.toLowerCase == Option(b).getOrElse("").trim.toLowerCase
      }
      same.toDouble / row1.length > 0.8
    }
  }

  /** Merge continuation: extend content (dropping a repeated header), append
    * page, min confidence, keep original bbox (parse_table.py:227-252). */
  def mergeSpanning(prev: SpanningTable, next: DetectedTable): SpanningTable = {
    val nextContent =
      if (next.body.nonEmpty && prev.content.nonEmpty &&
          isHeaderRow(next.body.head, prev.content.head)) next.body.tail
      else next.body
    SpanningTable(
      pageNumbers = prev.pageNumbers :+ next.page,
      bbox = prev.bbox,
      content = prev.content ++ nextContent,
      confidence = math.min(prev.confidence, 1.0),
      isSpanning = true)
  }

  /** The parse_table state machine over a document's pages: every page-final
    * table tentatively spans; a next-page table with the same column count
    * continues it (parse_table.py driver loop :37-71). Pure fold. */
  def extractSpanningTables(pages: Seq[Page]): Vector[SpanningTable] = {
    var tables = Vector.empty[SpanningTable]
    var current: Option[SpanningTable] = None
    pages.foreach { page =>
      var pageTables = TableDetector.findTables(page)
      current match {
        case Some(cur) if pageTables.nonEmpty && isContinuedByColumns(cur, pageTables.head) =>
          current = Some(mergeSpanning(cur, pageTables.head))
          pageTables = pageTables.tail
        case Some(cur) =>
          tables :+= cur
          current = None
        case None =>
      }
      pageTables.foreach { t =>
        // _is_table_spanning_to_next_page is `return True`: the LAST table
        // of the page becomes the tentative spanning carry; earlier ones close
        current.foreach(c => tables :+= c)
        current = Some(SpanningTable(List(t.page), t.bbox, t.body, 1.0, isSpanning = false))
      }
    }
    current.foreach(c => tables :+= c)
    tables
  }
}
