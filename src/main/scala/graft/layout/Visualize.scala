package graft.layout

/** Deterministic SVG rendering of a page's detected tables — the
  * engine-side analog of the reference's table-detection visualizer
  * (scripts/visualization_of_find_tables.py:55-64: green rect on each
  * table bbox, red rects on the header cells, printed header names).
  * No pixmap/matplotlib in this environment, so the output is plain
  * SVG text: byte-deterministic, diffable, viewable in any browser,
  * and cheap enough to emit as a column (one string per page) from a
  * debugging query — no driver-side rendering loop.
  */
object Visualize {

  private def fmt(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite) d.toLong.toString else d.toString

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** One SVG document per page: a light page frame, a green rect per
    * detected table bbox, red ticks for the header row band, and the
    * header names as a caption (the same three things the reference
    * draws). `pageW`/`pageH` default to US-Letter points. */
  def pageSvg(page: Page, pageW: Double = 612, pageH: Double = 792): String = {
    val tables = TableDetector.findTables(page)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${fmt(pageW)}" height="${fmt(pageH)}" viewBox="0 0 ${fmt(pageW)} ${fmt(pageH)}">\n"""
    sb ++= s"""  <rect x="0" y="0" width="${fmt(pageW)}" height="${fmt(pageH)}" fill="white" stroke="#cccccc"/>\n"""
    sb ++= s"""  <text x="8" y="16" font-size="10" fill="#888888">page ${page.number}</text>\n"""
    tables.zipWithIndex.foreach { case (t, i) =>
      val (x0, y0, x1, y1) = t.bbox
      sb ++= s"""  <rect x="${fmt(x0)}" y="${fmt(y0)}" width="${fmt(x1 - x0)}" height="${fmt(y1 - y0)}" fill="none" stroke="green" stroke-width="1"/>\n"""
      // header band: the first body row's vertical extent, reference-style
      // red marking; cell x-splits are not modeled, so the band is one rect
      val headerH = math.min(14.0, y1 - y0)
      sb ++= s"""  <rect x="${fmt(x0)}" y="${fmt(y0)}" width="${fmt(x1 - x0)}" height="${fmt(headerH)}" fill="none" stroke="red" stroke-width="0.5"/>\n"""
      sb ++= s"""  <text x="${fmt(x0)}" y="${fmt(math.max(y0 - 3, 10))}" font-size="8" fill="green">Table $i: ${esc(t.names.mkString(", "))}</text>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** All pages of a document, keyed for sinking to one .svg file per
    * page: (page_number, svg). */
  def docSvgs(doc: DocRow): Vector[(Int, String)] =
    SpanDoc.pages(doc.spans).map(p => (p.number, pageSvg(p))).toVector
}
