package graft.layout

/** The v1 TableFinder flow — `find_tables_with_context`
  * (reference: src/v1_plain/table_finder.py:23-90) — composed from the parts
  * this package already provides: per-page detection ([[TableDetector]]),
  * the bbox continuation test + merge (M4/M5, [[CrossPage]]), caption and
  * header-region extraction (P7/P8, [[ContextExtractor]]), and the
  * next-page lookahead (M7, table_finder.py:210-217).
  *
  * Faithful quirks:
  *  - a second table on the SAME page always closes the current one (the
  *    continuation test requires page == end_page + 1);
  *  - a table-less page does NOT close an open table by itself — only the
  *    lookahead does (the reference's in-loop "no tables" close-out at
  *    table_finder.py:72-76 sits inside `for rect in table_rects` and is
  *    therefore dead code; the live close path is `_has_next_page_table`);
  *  - the lookahead checks whether the next page has ANY table, not whether
  *    it continues this one.
  *
  * Document-local pure fold — invoked per doc from flatMap; never needs
  * global state, so it parallelizes per document like everything else.
  */
object TableFinder {

  final case class TableInfo(
      startPage: Int,
      endPage: Int,
      bbox: (Double, Double, Double, Double),
      precedingText: String,
      headers: Vector[String])

  def findTablesWithContext(pages: Seq[Page]): Vector[TableInfo] = {
    val perPage: Vector[(Page, Vector[DetectedTable])] =
      pages.toVector.map(p => p -> TableDetector.findTables(p))

    def open(page: Page, t: DetectedTable): TableInfo =
      TableInfo(page.number, page.number, t.bbox,
        ContextExtractor.precedingText(page, t),
        ContextExtractor.headerRegion(page, t))

    var out = Vector.empty[TableInfo]
    var current: Option[TableInfo] = None
    perPage.zipWithIndex.foreach { case ((page, tables), i) =>
      tables.foreach { t =>
        current match {
          case None =>
            current = Some(open(page, t))
          case Some(cur)
              if CrossPage.isContinuedBBox(cur.endPage, cur.bbox, page.number, t.bbox) =>
            current = Some(cur.copy(endPage = page.number,
              bbox = CrossPage.mergeBBoxes(cur.bbox, t.bbox)))
          case Some(cur) =>
            out :+= cur
            current = Some(open(page, t))
        }
      }
      // M7 lookahead: close unless the NEXT page has some table
      val nextHasTable = i + 1 < perPage.length && perPage(i + 1)._2.nonEmpty
      if (current.isDefined && !nextHasTable) {
        out :+= current.get
        current = None
      }
    }
    current.foreach(out :+= _)
    out
  }
}
