package graft.io

import org.apache.spark.sql.DataFrame
import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.collection.immutable.ListMap

/** Minimal xlsx sink/source (zip + SpreadsheetML, JDK-only — no POI in this
  * environment), matching the shape the reference's sheets actually use:
  * strings as INLINE strings (`<c t="inlineStr"><is><t>..`), numbers as
  * `t="n"`, null/NaN as an omitted cell — exactly what
  * `data/terminal-evaluation-report_0.1.0*.xlsx` contain (S5,
  * step_4_dump_tables.py:97 / step_5_pivot_table.py:92 `to_excel`).
  *
  * The writer collects the frame to the driver: the reference's sheets are
  * inherently driver-side single files (pandas to_excel), and they live at
  * SHEET scale (extracted rows, orders of magnitude below corpus scale).
  * Corpus-scale outputs go to parquet; this sink exists so a user of the
  * reference can keep their .xlsx consumers.
  */
object Xlsx {

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  private def colName(i: Int): String = {
    // 0 -> A, 25 -> Z, 26 -> AA ...
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  /** Write the DataFrame as sheet1 of a new xlsx file (header row first). */
  def write(df: DataFrame, path: String): Unit = {
    val cols = df.columns
    val rows = df.collect()

    def cell(ref: String, v: Any): String = v match {
      case null => ""
      case n: Number => s"""<c r="$ref" t="n"><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
    }

    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    sheet.append("<row r=\"1\">")
    cols.zipWithIndex.foreach { case (c, i) => sheet.append(cell(s"${colName(i)}1", c)) }
    sheet.append("</row>")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheet.append(s"""<row r="${ri + 2}">""")
      cols.indices.foreach { ci =>
        val v = r.get(ci)
        if (v != null) sheet.append(cell(s"${colName(ci)}${ri + 2}", v))
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")

    val parts = ListMap(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
          """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>"""),
      "xl/worksheets/sheet1.xml" -> sheet.toString)

    val zip = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try parts.foreach { case (name, content) =>
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    } finally zip.close()
  }

  /** Read sheet1 back as (header, rows) of raw cell strings; an absent cell
    * is null, an empty inline string is "" (the distinction the pivot
    * differential relies on). Handles the two cell kinds the reference's
    * own files use: inlineStr and numeric <v>. */
  def read(path: String): (Vector[String], Vector[Vector[String]]) = {
    val zf = new java.util.zip.ZipFile(path)
    val all =
      try {
        val entry = zf.getEntry("xl/worksheets/sheet1.xml")
        require(entry != null, s"$path has no sheet1")
        val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        val doc = dbf.newDocumentBuilder().parse(zf.getInputStream(entry))
        val rowNodes = doc.getElementsByTagName("row")
        (0 until rowNodes.getLength).map { ri =>
          val row = rowNodes.item(ri).asInstanceOf[org.w3c.dom.Element]
          val cells = row.getElementsByTagName("c")
          // ref column letters -> 0-based index
          def colIdx(ref: String): Int =
            ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1
          val m = scala.collection.mutable.Map.empty[Int, String]
          var width = 0
          (0 until cells.getLength).foreach { ci =>
            val c = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
            val idx = colIdx(c.getAttribute("r"))
            width = math.max(width, idx + 1)
            val v = c.getAttribute("t") match {
              case "inlineStr" =>
                val ts = c.getElementsByTagName("t")
                (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
              case _ =>
                val vs = c.getElementsByTagName("v")
                if (vs.getLength == 0) null else vs.item(0).getTextContent
            }
            if (v != null) m(idx) = v
          }
          (m, width)
        }.toVector
      } finally zf.close()
    if (all.isEmpty) return (Vector.empty, Vector.empty)
    val width = all.map(_._2).max
    val grid = all.map { case (m, _) => Vector.tabulate(width)(i => m.get(i).orNull) }
    (grid.head.map(v => if (v == null) "" else v), grid.tail)
  }
}
